"""Optimizer/schedule formula parity with the reference's torch schedulers."""

import numpy as np
import torch

from bacs_tpu.train.optim import (
    make_optimizer,
    make_schedule,
    poly_schedule,
    warmup_poly_schedule,
)


def test_poly_matches_reference_formula():
    """(reference: training/schedulers.py:29-43)"""
    base_lr, max_iters, power = 0.01, 100, 0.9
    s = poly_schedule(base_lr, max_iters, power)
    for step in [0, 1, 50, 99, 100]:
        expected = base_lr * (1 - step / max_iters) ** power
        np.testing.assert_allclose(float(s(step)), expected, rtol=1e-6)
    # past max_iters → end lr (reference: schedulers.py:33-39)
    np.testing.assert_allclose(float(s(101)), 0.0001, rtol=1e-5)


def test_warmup_poly_matches_reference_formula():
    """(reference: training/schedulers.py:46-124)"""
    base_lr, max_iters = 0.01, 200
    s = warmup_poly_schedule(base_lr, max_iters, power=0.9,
                             warmup_factor=0.001,
                             warmup_iters_percentage=0.1)
    warmup_iters = max_iters * 0.1
    for step in [0, 5, 19, 20, 100]:
        if step >= warmup_iters:
            wf = 1.0
        else:
            alpha = step / warmup_iters
            wf = 0.001 * (1 - alpha) + alpha
        expected = base_lr * wf * (1 - step / max_iters) ** 0.9
        np.testing.assert_allclose(float(s(step)), expected, rtol=1e-5)


def test_sgd_nesterov_matches_torch():
    """One optimizer step must match torch.optim.SGD(nesterov, wd)."""
    import jax.numpy as jnp
    import optax

    w0 = np.array([1.0, -2.0, 3.0], np.float32)
    g = np.array([0.5, 0.1, -0.3], np.float32)
    lr, mom, wd = 0.1, 0.9, 1e-2

    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": lr, "momentum": mom,
         "nesterov": True, "weight_decay": wd},
        lambda step: lr, grad_clip_value=0.0,
    )
    params = {"w": jnp.asarray(w0)}
    opt_state = tx.init(params)
    for _ in range(3):
        updates, opt_state = tx.update({"w": jnp.asarray(g)}, opt_state, params)
        params = optax.apply_updates(params, updates)

    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.SGD([wt], lr=lr, momentum=mom, nesterov=True,
                          weight_decay=wd)
    for _ in range(3):
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()
    np.testing.assert_allclose(
        np.asarray(params["w"]), wt.detach().numpy(), rtol=1e-5
    )


def test_grad_clip_by_value():
    import jax.numpy as jnp
    import optax

    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 1.0},
        lambda s: 1.0, grad_clip_value=2.0,
    )
    params = {"w": jnp.zeros(3)}
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([5.0, -7.0, 1.0])}, opt_state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), [-2.0, 2.0, -1.0])


def test_make_schedule_targets():
    for cfg, step, check in [
        ({"_target_": "training.PolyLR", "power": 0.9}, 0, 0.01),
        ({"_target_": "training.ExponentialLR", "gamma": 0.5}, 0, 0.01),
        ({"_target_": "torch.optim.lr_scheduler.CyclicLR",
          "base_lr": 0.001, "max_lr": 0.01}, 0, 0.001),
        ({"_target_": "training.WarmupPoly"}, 100, None),
    ]:
        s = make_schedule(cfg, 0.01, 100)
        v = float(s(step))
        if check is not None:
            np.testing.assert_allclose(v, check, rtol=1e-5)
        assert 0 <= v <= 0.011
