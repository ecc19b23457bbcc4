"""Tiny end-to-end Trainer runs (the reference's debug-mode smoke, §4).

Covers the full stack: config → datamodule → task loop → method → metrics.
Shapes are minimal (24px crops, 3-layer UNet) to keep compile time sane.
"""

import numpy as np
import pytest

from bacs_tpu.config.core import Config
from bacs_tpu.train.loop import Trainer


def _config(loss_target, **training_extra):
    training = {
        "name": "test",
        "batch_size": 2,
        "epochs": 1,
        "seed": 7,
        "debug": True,
        "initial_increment": 2,
        "increment": 1,
        "mode": "overlap",
        "learner": {"_target_": "learner.MultiHeadLearner"},
    }
    training.update(training_extra)
    return Config._wrap(
        {
            "dataset": {
                "_target_": "dataloaders.SyntheticDataModule",
                "dataset": {
                    "num_classes": 4,
                    "crop_size": 24,
                    "n_train": 12,
                    "n_val": 4,
                },
            },
            "network": {
                "_target_": "networks.UNet",
                "num_layers": 3,
                "bilinear": True,
            },
            "optimizer": {
                "_target_": "torch.optim.SGD",
                "lr": 0.05,
                "momentum": 0.9,
                "nesterov": True,
                "weight_decay": 1e-4,
            },
            "scheduler": {"_target_": "training.PolyLR", "power": 0.9},
            "training": training,
            "loss": dict(loss_target),
        }
    )


def test_joint_crossentropy_runs():
    cfg = _config(
        {"_target_": "loss.CrossEntropy"},
        initial_increment=0,
        increment=0,
        epochs=2,
    )
    cfg["training"].pop("learner")
    miou = Trainer(cfg).fit()
    assert 0.0 <= miou <= 1.0


def test_continual_bacs_full_stack():
    """BACS with bg detector + buffer across 3 tasks."""
    cfg = _config(
        {
            "_target_": "loss.BACSLoss",
            "buffer_size": 6,
            "replay_minibatch_size": 2,
            "alpha": 0.5,
            "beta": 0.5,
        },
        bg_detector=True,
    )
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    assert trainer.n_tasks == 2  # bg + 2 initial fg + 1 increment
    # regression: zero-norm teacher-distill gradients once NaN'ed task 1
    import jax
    import jax.numpy as jnp

    assert not any(
        bool(jnp.any(jnp.isnan(x))) for x in jax.tree.leaves(trainer.state.params)
    )
    # buffer was populated at task ends
    assert int(trainer.state.buffer.valid.sum()) > 0
    # prev model cached for distillation
    assert trainer.state.prev_params is not None
    # prototypes accumulated
    assert float(np.asarray(trainer.state.proto_counts).sum()) > 0


def test_continual_sdr_runs():
    cfg = _config(
        {"_target_": "loss.SDR"},
        learner={"_target_": "learner.SingleHeadLearner"},
    )
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    assert trainer.state.class_prototypes is not None


def test_continual_er_same_task_partitions():
    cfg = _config(
        {
            "_target_": "loss.ExperienceReplay",
            "buffer_size": 4,
            "replay_minibatch_size": 2,
            "same_task": True,
        },
    )
    trainer = Trainer(cfg)
    trainer.fit()
    buf = trainer.state.buffer
    assert buf.size == 4 * trainer.n_tasks
    # at least the first two task partitions were populated
    valid = np.asarray(buf.valid)
    assert valid[:4].any() and valid[4:8].any()


def test_continual_transeg_with_transformer_learner():
    """TranSeg class-token growth through the full Trainer."""
    cfg = _config(
        {"_target_": "loss.MiB"},
        learner={"_target_": "learner.TransformerLearner"},
        new_token_init="mean",
    )
    cfg["network"] = Config._wrap(
        {
            "_target_": "networks.TranSeg",
            "backbone": "resnet18",
            "transformer": {
                "hidden_dim": 32,
                "nhead": 2,
                "num_decoder_layers": 1,
                "dim_feedforward": 64,
            },
        }
    )
    # crop must be divisible by 16 for the patch grid
    cfg["dataset"]["dataset"]["crop_size"] = 32
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    tokens = trainer.state.params["base_classifier"]["class_tokens"]
    assert tokens.shape[0] == 4  # full allocation


def test_continual_mib_runs():
    """MiB: UCE + UKD vs prev model through the full task loop
    (reference: loss/mib.py:70-84)."""
    cfg = _config({"_target_": "loss.MiB"})
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    assert trainer.state.prev_params is not None  # teacher installed


def test_continual_plop_runs():
    """PLOP: median-entropy pseudo-labels + local POD
    (reference: loss/plop_loss.py)."""
    cfg = _config({"_target_": "loss.PlopLoss"})
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    assert trainer.state.plop_thresholds is not None


def test_continual_icarl_runs():
    """iCaRL: BCE with distilled old-class targets
    (reference: loss/icarl_loss.py)."""
    cfg = _config({"_target_": "loss.IcarlLoss"})
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0


def test_continual_sdr_atrous_encoder_runs():
    """SDR with the real ResNet_Atrous encoder through the Trainer: 6
    attention maps (5 backbone + ASPP), sync-BN momentum 3e-4
    (reference: +network.atrous_encoder=true)."""
    cfg = _config(
        {"_target_": "loss.SDR"},
        learner={"_target_": "learner.SingleHeadLearner"},
    )
    cfg["network"] = {
        "_target_": "networks.DeepLabV3",
        "backbone": "resnet50",  # atrous variants exist for rn50/101/152 only
        "atrous_encoder": True,
    }
    trainer = Trainer(cfg)
    model = trainer._make_model(trainer._task_info(0))
    assert model.atrous_encoder
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0


def test_bacs_mixup_path_runs():
    cfg = _config(
        {
            "_target_": "loss.BACSLoss",
            "buffer_size": 6,
            "replay_minibatch_size": 2,
            "alpha": 0.5,
            "beta": 0.5,
            "mixup": True,
        },
    )
    miou = Trainer(cfg).fit()
    assert 0.0 <= miou <= 1.0

def test_continual_bacs_boundary_gc_runs():
    """training.boundary_gc drops dead per-task executables at each task
    boundary (loop.py _run_task) — the capacity knob for near-OOM paper
    footprints.  Must leave the CL state machinery intact: buffer
    populated, teacher installed, finite params."""
    cfg = _config(
        {
            "_target_": "loss.BACSLoss",
            "buffer_size": 6,
            "replay_minibatch_size": 2,
            "alpha": 0.5,
            "beta": 0.5,
        },
        bg_detector=True,
        boundary_gc=True,
    )
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert 0.0 <= miou <= 1.0
    assert trainer.boundary_gc
    import jax
    import jax.numpy as jnp

    assert not any(
        bool(jnp.any(jnp.isnan(x)))
        for x in jax.tree.leaves(trainer.state.params)
    )
    assert int(trainer.state.buffer.valid.sum()) > 0
    assert trainer.state.prev_params is not None
