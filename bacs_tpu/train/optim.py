"""Optimizers and LR schedules as optax transforms.

Replaces the reference's torch optimizers/schedulers
(reference: training/schedulers.py:7-124; conf/*/optimizer/*.yaml):

- PolyLR: lr = base * (1 - step/max_iters)^power
  (reference: schedulers.py:29-43; falls to end_learning_rate past max)
- WarmupPoly: linear/constant warmup fraction, then poly, optional constant
  ending (reference: schedulers.py:46-124)
- SGD nesterov + coupled weight decay (torch semantics: wd added to the
  gradient before the momentum update), Adam
- gradient clip by VALUE 2.0 (reference: trainer.py:347-348)
- gradient accumulation via optax.MultiSteps
  (reference: PL accumulate_grad_batches, trainer.py:308-312)
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import optax


def poly_schedule(
    base_lr: float,
    max_iters: int,
    power: float = 0.9,
    end_learning_rate: float = 0.0001,
) -> optax.Schedule:
    def schedule(step):
        frac = jnp.clip(step / jnp.maximum(max_iters, 1), 0.0, 1.0)
        lr = base_lr * (1.0 - frac) ** power
        return jnp.where(step > max_iters, end_learning_rate, lr)

    return schedule


def warmup_poly_schedule(
    base_lr: float,
    max_iters: int,
    power: float = 0.9,
    warmup_factor: float = 0.001,
    warmup_iters_percentage: float = 0.1,
    warmup_method: str = "linear",
    constant_ending: float = 0.0,
) -> optax.Schedule:
    warmup_iters = max_iters * warmup_iters_percentage

    def schedule(step):
        if warmup_method == "linear":
            alpha = jnp.minimum(step / jnp.maximum(warmup_iters, 1e-8), 1.0)
            wf = jnp.where(
                step >= warmup_iters, 1.0, warmup_factor * (1 - alpha) + alpha
            )
        else:  # constant
            wf = jnp.where(step >= warmup_iters, 1.0, warmup_factor)
        poly = (1.0 - jnp.clip(step / jnp.maximum(max_iters, 1), 0.0, 1.0)) ** power
        lr = base_lr * wf * poly
        if constant_ending > 0:
            lr = jnp.where(
                (wf == 1.0) & (poly < constant_ending),
                base_lr * constant_ending,
                lr,
            )
        return lr

    return schedule


def make_schedule(
    scheduler_cfg: Mapping[str, Any] | None,
    base_lr: float,
    max_iters: int,
) -> optax.Schedule:
    """Build a schedule from a reference-style scheduler config dict."""
    if not scheduler_cfg:
        return lambda step: base_lr
    target = str(scheduler_cfg.get("_target_", "training.PolyLR"))
    short = target.rsplit(".", 1)[-1].lower()
    if short in ("polylr", "poly"):
        return poly_schedule(
            base_lr, max_iters, power=float(scheduler_cfg.get("power", 0.9))
        )
    if short in ("warmuppoly", "warmup_poly"):
        return warmup_poly_schedule(
            base_lr,
            max_iters,
            power=float(scheduler_cfg.get("power", 0.9)),
            warmup_factor=float(scheduler_cfg.get("warmup_factor", 0.001)),
            warmup_iters_percentage=float(
                scheduler_cfg.get("warmup_iters_percentage", 0.1)
            ),
            warmup_method=str(scheduler_cfg.get("warmup_method", "linear")),
            constant_ending=float(scheduler_cfg.get("constant_ending", 0.0)),
        )
    if short in ("exponentiallr", "exponential"):
        gamma = float(scheduler_cfg.get("gamma", 0.9))
        return lambda step: base_lr * gamma ** (step / jnp.maximum(max_iters, 1))
    if short in ("cycliclr", "cyclic"):
        # triangular cyclic LR (torch CyclicLR default mode)
        base = float(scheduler_cfg.get("base_lr", base_lr * 0.1))
        max_lr = float(scheduler_cfg.get("max_lr", base_lr))
        step_size = float(scheduler_cfg.get("step_size_up", max(max_iters // 4, 1)))

        def cyclic(step):
            cycle = jnp.floor(1 + step / (2 * step_size))
            frac = jnp.abs(step / step_size - 2 * cycle + 1)
            return base + (max_lr - base) * jnp.maximum(0.0, 1.0 - frac)

        return cyclic
    raise ValueError(f"unknown scheduler {target!r}")


def make_optimizer(
    optimizer_cfg: Mapping[str, Any],
    schedule: optax.Schedule,
    grad_clip_value: float = 2.0,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """Build the full gradient transform chain from an optimizer config."""
    target = str(optimizer_cfg.get("_target_", "torch.optim.SGD"))
    short = target.rsplit(".", 1)[-1].lower()
    wd = float(optimizer_cfg.get("weight_decay", 0.0))
    parts = []
    if grad_clip_value:
        parts.append(optax.clip(grad_clip_value))
    if wd and short != "adamw":
        # torch couples wd into the gradient before momentum
        parts.append(optax.add_decayed_weights(wd))
    if short == "sgd":
        momentum = float(optimizer_cfg.get("momentum", 0.0)) or None
        parts.append(
            optax.sgd(
                learning_rate=schedule,
                momentum=momentum,
                nesterov=bool(optimizer_cfg.get("nesterov", False)),
            )
        )
    elif short == "adam":
        parts.append(
            optax.adam(
                learning_rate=schedule,
                b1=float(optimizer_cfg.get("betas", (0.9, 0.999))[0]),
                b2=float(optimizer_cfg.get("betas", (0.9, 0.999))[1]),
                eps=float(optimizer_cfg.get("eps", 1e-8)),
            )
        )
    elif short == "adamw":
        parts.append(optax.adamw(learning_rate=schedule, weight_decay=wd))
    else:
        raise ValueError(f"unknown optimizer {target!r}")
    tx = optax.chain(*parts)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
