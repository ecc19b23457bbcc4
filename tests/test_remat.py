"""`network.remat` (jax.checkpoint over ResNet blocks) must be a pure
memory/speed trade — identical params, outputs, and gradients.

Measured on the real chip (docs/PERF.md): remat costs ~15% throughput
(227.5 -> 192.5 img/s) and exists as a capacity option for larger
crops/batches, not a default.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.models import create_network

KW = dict(
    num_classes=6,
    n_tasks=1,
    norm="abn",
    axis_name=None,
    backbone="resnet50",
    crop_size=32,
)


def _init(net, x):
    return net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        train=False,
    )


def test_remat_is_transparent_to_params_outputs_and_grads():
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    )
    net = create_network("deeplab", **KW)
    net_r = create_network("deeplab", remat=True, **KW)

    variables = _init(net, x)
    variables_r = _init(net_r, x)

    # identical parameter pytree (same paths, same init values)
    jax.tree.map(
        np.testing.assert_array_equal, variables["params"],
        variables_r["params"],
    )

    def loss_fn(params, model, stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean(out.sem_logits.astype(jnp.float32) ** 2), mut

    stats = variables["batch_stats"]
    (l0, mut0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"], net, stats
    )
    (l1, mut1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"], net_r, stats
    )

    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0,
        g1,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        mut0["batch_stats"],
        mut1["batch_stats"],
    )


def test_selective_stage_remat_is_transparent():
    """`network.remat=[2,3]` (stage-selective jax.checkpoint) must be the
    same pure memory/speed trade as full remat: identical params, loss,
    grads, and batch stats. Stage selection itself is unit-checked via
    stage_remat."""
    from bacs_tpu.models.resnet import stage_remat

    assert stage_remat(True, 1) and stage_remat(True, 4)
    assert not stage_remat(False, 1)
    assert stage_remat((3,), 3) and not stage_remat((3,), 2)
    assert stage_remat([2, 3], 2) and not stage_remat([2, 3], 4)

    x = jnp.asarray(
        np.random.RandomState(1).rand(2, 32, 32, 3).astype(np.float32)
    )
    net = create_network("deeplab", **KW)
    net_s = create_network("deeplab", remat=[2, 3], **KW)
    assert net_s.remat == (2, 3)  # normalized to a hashable tuple

    variables = _init(net, x)
    variables_s = _init(net_s, x)
    jax.tree.map(
        np.testing.assert_array_equal, variables["params"],
        variables_s["params"],
    )

    def loss_fn(params, model, stats):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats},
            x,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.mean(out.sem_logits.astype(jnp.float32) ** 2), mut

    stats = variables["batch_stats"]
    (l0, mut0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"], net, stats
    )
    (l1, mut1), g1 = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"], net_s, stats
    )
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0,
        g1,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        mut0["batch_stats"],
        mut1["batch_stats"],
    )
