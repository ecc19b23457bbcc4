"""BACS-TPU: a TPU-native continual semantic segmentation framework.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of
``mostafaelaraby/BACS-Continual-Semantic-Segmentation`` (reference mounted at
/root/reference), re-designed TPU-first:

- Networks are Flax modules in NHWC layout with a fused norm+activation (ABN)
  layer whose cross-replica statistics ride ``lax.pmean`` over the data mesh
  axis (replacing the reference's CUDA ``inplace_abn`` extension).
- The continual-learning machinery (task loop, classifier-head growth, replay
  buffer, prototypes, distillation losses) is pure-functional: all mutable
  state lives in a single train-state pytree that a jitted/shard_map'ped train
  step carries, instead of the reference's PyTorch-Lightning callback web
  (reference: training/trainer.py, learner/, loss/).
- Parallelism is a ``jax.sharding.Mesh`` + ``shard_map`` data axis; gradients
  and BN statistics are psum/pmean'ed over ICI by XLA (replacing CustomDDP /
  NCCL, reference training/trainer.py:24-54).
"""

__version__ = "0.1.0"
