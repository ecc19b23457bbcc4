"""Jitted train/eval step factories, single-chip or shard_map'ped DP.

Replaces the reference's Lightning Model.step + DDP backward
(reference: training/model.py:294-374, trainer.py:24-54): one pure function
carries the whole TrainState; under a `jax.sharding.Mesh` the step is
shard_map'ped over the `data` axis — gradients, BN statistics and prototype
sums ride ICI via `lax.pmean/psum` emitted by XLA (SURVEY.md §2.9).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bacs_tpu.methods.base import Method, ModelContext
from bacs_tpu.ops.confusion import confusion_matrix
from bacs_tpu.train.state import TrainState

Array = jax.Array


def _train_step_impl(
    ctx: ModelContext,
    method: Method,
    tx: optax.GradientTransformation,
    state: TrainState,
    batch: Dict[str, Array],
) -> Tuple[TrainState, Dict[str, Array]]:
    rng, step_rng = jax.random.split(state.rng)
    if ctx.axis_name is not None:
        # decorrelate per-device randomness (dropout, replay sampling)
        step_rng = jax.random.fold_in(step_rng, jax.lax.axis_index(ctx.axis_name))

    def loss_fn(params):
        return method.compute_loss(ctx, params, state, batch, True, step_rng)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

    batch_stats = aux.batch_stats
    if ctx.axis_name is not None:
        grads = jax.lax.pmean(grads, ctx.axis_name)
        loss = jax.lax.pmean(loss, ctx.axis_name)
        # keep running BN stats identical across replicas even for the
        # non-sync norm variants
        batch_stats = jax.lax.pmean(batch_stats, ctx.axis_name)

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    new_state = state.replace(
        step=state.step + 1,
        epoch_step=state.epoch_step + 1,
        params=new_params,
        opt_state=new_opt_state,
        batch_stats=batch_stats,
        rng=rng,
        **aux.state_updates,
    )
    metrics = {"loss": loss, **aux.metrics}
    return new_state, metrics


def _eval_step_impl(
    ctx: ModelContext,
    method: Method,
    num_classes: int,
    state: TrainState,
    conf_mat: Array,
    batch: Dict[str, Array],
) -> Tuple[Array, Array]:
    loss, aux = method.compute_loss(
        ctx, state.params, state, batch, False, state.rng
    )
    label_hw = batch["label"].shape[1:3]
    if (
        aux.sem_logits is not None
        and aux.sem_logits.shape[1:3] != tuple(label_hw)
        and ctx.fused_ce
    ):
        # fused upsample+argmax+confusion — full-res logits never exist
        from bacs_tpu.ops.upsample_ce import spatial_shapes_ok

        if ctx.spatial_mesh is not None and spatial_shapes_ok(
            ctx.spatial_mesh, batch["label"].shape[0], label_hw[0],
            aux.sem_logits.shape[1],
        ):
            from bacs_tpu.ops.upsample_confusion import (
                spatial_upsampled_confusion,
            )

            cm = spatial_upsampled_confusion(
                aux.sem_logits, batch["label"], tuple(label_hw),
                ctx.spatial_mesh, num_classes, method.ignore_index,
            )
        elif ctx.spatial_mesh is not None:
            # mesh-indivisible shapes: composed global path (GSPMD-safe)
            preds = jnp.argmax(aux.logits, axis=-1)
            cm = confusion_matrix(
                preds, batch["label"], num_classes,
                ignore_index=method.ignore_index,
            )
        else:
            from bacs_tpu.ops.upsample_confusion import upsampled_confusion

            cm = upsampled_confusion(
                aux.sem_logits, batch["label"], tuple(label_hw), num_classes,
                method.ignore_index,
            )
    else:
        preds = jnp.argmax(aux.logits, axis=-1)
        cm = confusion_matrix(
            preds, batch["label"], num_classes, ignore_index=method.ignore_index
        )
    if ctx.axis_name is not None:
        cm = jax.lax.psum(cm, ctx.axis_name)
        loss = jax.lax.pmean(loss, ctx.axis_name)
    return conf_mat + cm, loss


def _multi_step_impl(ctx, method, tx, state, batches):
    """lax.scan over K stacked batches — ONE dispatch per K optimizer steps.

    Host→device dispatch of the full state pytree costs ~70 ms per call on
    tunneled TPU runtimes (measured, scripts/profile_step.py), which halves
    512² throughput when paid per step; scanning K steps inside the jit
    amortizes it to ~70/K ms.
    """

    def body(state, batch):
        state, metrics = _train_step_impl(ctx, method, tx, state, batch)
        return state, metrics["loss"]

    state, losses = jax.lax.scan(body, state, batches)
    return state, {"loss": losses[-1], "loss_mean": jnp.mean(losses)}


def make_multi_step(
    ctx: ModelContext,
    method: Method,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
):
    """Scanned train step over batches stacked on a leading K axis."""
    impl = partial(_multi_step_impl, ctx, method, tx)
    if mesh is None:
        return jax.jit(impl, donate_argnums=(0,))
    axis = ctx.axis_name or "data"
    batch_spec = {"image": P(None, axis), "label": P(None, axis)}
    sm = jax.shard_map(
        impl,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sm, donate_argnums=(0,))


def make_steps(
    ctx: ModelContext,
    method: Method,
    tx: optax.GradientTransformation,
    num_classes: int,
    mesh: Optional[Mesh] = None,
) -> Tuple[Callable, Callable, Callable]:
    """Build (train_step, eval_step, put_batch) for one task.

    Without a mesh: plain jit with donated state.
    With a mesh: shard_map over the `data` axis — state replicated, batch
    sharded on its leading dim; XLA inserts the ICI collectives.
    """
    train_impl = partial(_train_step_impl, ctx, method, tx)
    eval_impl = partial(_eval_step_impl, ctx, method, num_classes)

    if mesh is None:
        train_step = jax.jit(train_impl, donate_argnums=(0,))
        eval_step = jax.jit(eval_impl, donate_argnums=(1,))
        return train_step, eval_step, lambda batch: batch

    axis = ctx.axis_name or "data"
    repl = P()
    shard = P(axis)
    batch_spec = {"image": shard, "label": shard}

    train_sm = jax.shard_map(
        train_impl,
        mesh=mesh,
        in_specs=(repl, batch_spec),
        out_specs=(repl, repl),
        check_vma=False,
    )
    eval_sm = jax.shard_map(
        eval_impl,
        mesh=mesh,
        in_specs=(repl, repl, batch_spec),
        out_specs=(repl, repl),
        check_vma=False,
    )
    train_step = jax.jit(train_sm, donate_argnums=(0,))
    eval_step = jax.jit(eval_sm, donate_argnums=(1,))

    batch_sharding = NamedSharding(mesh, shard)

    if jax.process_count() > 1:
        # multihost: each process feeds its own contiguous slice of the
        # global batch (DataModule process_shard=True); JAX assembles the
        # global array across hosts (a device_put cannot address other
        # hosts' devices — reference analogue: DistributedSampler shards)
        import numpy as np

        def put_batch(batch: Dict[str, Any]) -> Dict[str, Array]:
            return {
                k: jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(v)
                )
                for k, v in batch.items()
            }
    else:

        def put_batch(batch: Dict[str, Any]) -> Dict[str, Array]:
            return {
                k: jax.device_put(v, batch_sharding) for k, v in batch.items()
            }

    return train_step, eval_step, put_batch


def make_gspmd_steps(
    ctx: ModelContext,
    method: Method,
    tx: optax.GradientTransformation,
    num_classes: int,
    mesh: Mesh,
) -> Tuple[Callable, Callable, Callable]:
    """(train_step, eval_step, put_batch) under GSPMD spatial partitioning.

    The batch is sharded `P('data', 'space')` — N over the data axis, image
    HEIGHT over the space axis — and the step body is the plain
    single-program impl (ctx must have axis_name=None): XLA's SPMD
    partitioner inserts the convolution halo exchanges, turns the global
    `jnp.mean` BN statistics into cross-chip reductions (sync-BN for free,
    exactly), and all-reduces the gradients.  No shard_map, no named-axis
    collectives.

    Pallas custom calls cannot be spatially partitioned by GSPMD itself, so
    the fused upsample+CE/confusion kernels run shard_map'ped per
    space-shard with halo exchange instead (ops/upsample_ce.py spatial_*
    wrappers, selected via ctx.spatial_mesh); `fused_abn` is pure-jnp
    custom_vjp and shards fine.
    """
    assert ctx.axis_name is None, "GSPMD path uses global (unnamed) reductions"
    assert ctx.spatial_mesh is mesh, "ctx.spatial_mesh must be the step mesh"
    assert mesh.axis_names == ("data", "space"), mesh.axis_names
    if jax.process_count() > 1:
        raise NotImplementedError(
            "spatial_partition > 1 is single-host only: a multihost batch "
            "would need per-process (data, space) blocks — use pure data "
            "parallelism (training.spatial_partition=0) on pods"
        )
    train_impl = partial(_train_step_impl, ctx, method, tx)
    eval_impl = partial(_eval_step_impl, ctx, method, num_classes)

    repl = NamedSharding(mesh, P())
    nhwc = NamedSharding(mesh, P("data", "space"))
    batch_sh = {"image": nhwc, "label": nhwc}

    train_step = jax.jit(
        train_impl,
        in_shardings=(repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
    eval_step = jax.jit(
        eval_impl,
        in_shardings=(repl, repl, batch_sh),
        out_shardings=(repl, repl),
        donate_argnums=(1,),
    )

    def put_batch(batch: Dict[str, Any]) -> Dict[str, Array]:
        return {k: jax.device_put(v, nhwc) for k, v in batch.items()}

    return train_step, eval_step, put_batch
