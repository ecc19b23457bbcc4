"""Learner layer: classifier-head lifecycle as parameter surgery.

Functional redesign of the reference learner callbacks (reference: learner/):
heads are allocated at the FINAL class count up front, so "creating a new
head" becomes initializing the new class rows of the padded head at each task
boundary:

- MultiHeadLearner → MiB imprinting init: new-class kernel rows copy the
  background row; new biases (and the bg bias itself) become
  bg_bias − log(new_classes + 1) (reference: learner/multiheadlearner.py:13-36).
- SingleHeadLearner → plain init, nothing to do per task
  (reference: learner/singleheadlearner.py:5-17).
- TransformerLearner → class-token growth init modes random/background/mean
  + fresh mask-norm entries (reference: learner/transformerlearner.py:48-135).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from bacs_tpu.train.state import TaskInfo, TrainState


def _find_head(params: Any):
    """Locate the classifier head param dict (kernel [1,1,D,C], bias [C])."""
    if "classifier_head" in params:
        return params["classifier_head"]
    raise KeyError("classifier_head not found in params")


def multihead_init(state: TrainState, task: TaskInfo) -> TrainState:
    """MiB-style imprinting for the classes introduced at `task.task_id`."""
    if task.task_id == 0:
        return state
    params = jax.tree.map(lambda x: x, state.params)  # shallow-copy tree
    head = dict(_find_head(state.params))
    kernel, bias = head["kernel"], head["bias"]
    lo = task.old_classes
    hi = task.nb_current_classes
    n_new = hi - lo
    bg_kernel = kernel[..., 0:1]
    new_bias = bias[0] - math.log(n_new + 1)
    kernel = kernel.at[..., lo:hi].set(
        jnp.broadcast_to(bg_kernel, kernel[..., lo:hi].shape)
    )
    bias = bias.at[lo:hi].set(new_bias)
    bias = bias.at[0].set(new_bias)  # bg bias also updated (ref :35)
    head["kernel"] = kernel
    head["bias"] = bias
    params = dict(params)
    params["classifier_head"] = head
    return state.replace(params=params)


def singlehead_init(state: TrainState, task: TaskInfo) -> TrainState:
    return state


def transformer_init(
    state: TrainState, task: TaskInfo, new_token_init: str = "random"
) -> TrainState:
    """Class-token growth (reference: learner/transformerlearner.py:48-135)."""
    if task.task_id == 0:
        return state
    params = dict(state.params)
    head = dict(params["base_classifier"])
    tokens = head["class_tokens"]
    lo, hi = task.old_classes, task.nb_current_classes
    if new_token_init == "background":
        head["class_tokens"] = tokens.at[lo:hi].set(
            jnp.broadcast_to(tokens[0:1], tokens[lo:hi].shape)
        )
    elif new_token_init == "mean":
        mean_tok = jnp.mean(tokens[:lo], axis=0, keepdims=True)
        head["class_tokens"] = tokens.at[lo:hi].set(
            jnp.broadcast_to(mean_tok, tokens[lo:hi].shape)
        )
    # "random": keep the (truncated-normal) allocation-time values
    # fresh mask-norm entries for the new classes (fresh LayerNorm per task)
    head["mask_norm_scale"] = head["mask_norm_scale"].at[lo:hi].set(1.0)
    head["mask_norm_bias"] = head["mask_norm_bias"].at[lo:hi].set(0.0)
    params["base_classifier"] = head
    return state.replace(params=params)


LEARNERS = {
    "learner.multiheadlearner": multihead_init,
    "multiheadlearner": multihead_init,
    "multihead": multihead_init,
    "learner.singleheadlearner": singlehead_init,
    "singleheadlearner": singlehead_init,
    "singlehead": singlehead_init,
    "learner.baselearner": singlehead_init,
    "baselearner": singlehead_init,
    "learner.transformerlearner": transformer_init,
    "transformerlearner": transformer_init,
    "transformer": transformer_init,
}


def get_learner(target: str):
    key = target.lower().replace("_", "")
    key = key if key in LEARNERS else key.rsplit(".", 1)[-1]
    if key not in LEARNERS:
        raise ValueError(f"unknown learner {target!r}")
    return LEARNERS[key]
