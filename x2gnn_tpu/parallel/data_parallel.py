"""Molecule-level data parallelism over a `jax.sharding.Mesh`.

Design: the unit of sharding is the *molecule*, not a raw array axis —
graph index arrays are intra-batch-local, so sharding a flat GraphBatch
along nodes/edges would break index locality. Instead, D per-device
GraphBatches (identical static shapes) are stacked on a leading device
axis and `shard_map`ped over the 'data' mesh axis; each device computes its
own graphs and gradients are `pmean`ed over ICI. Parameters, optimizer and
EMA state are replicated.

This is the TPU replacement for the DP the reference never had
(SURVEY §2.3); the NCCL-free collective path is compiled by XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from x2gnn_tpu.data.batching import GraphBatch
from x2gnn_tpu.train.loss import smooth_l1_loss, masked_mae
from x2gnn_tpu.train.optim import apply_update_skip_nonfinite


def stack_batches(batches: Sequence[GraphBatch]) -> GraphBatch:
    """Stack D same-shape GraphBatches onto a leading device axis."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)


def shard_batches(batches: Sequence[GraphBatch], mesh: Mesh) -> GraphBatch:
    """Stack and lay out a stacked batch so the device axis lands on the
    'data' mesh axis."""
    stacked = stack_batches(batches)
    sharding = jax.sharding.NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), stacked)


def empty_like_batch(batch: GraphBatch) -> GraphBatch:
    """A fully-masked copy of `batch` (same static shapes, no real
    graphs) — used to pad the final device group of an epoch."""
    return batch.replace(
        node_mask=jnp.zeros_like(jnp.asarray(batch.node_mask)),
        edge_mask=jnp.zeros_like(jnp.asarray(batch.edge_mask)),
        trip_mask=jnp.zeros_like(jnp.asarray(batch.trip_mask)),
        graph_mask=jnp.zeros_like(jnp.asarray(batch.graph_mask)),
        in_mask=jnp.zeros_like(jnp.asarray(batch.in_mask)),
        out_mask=jnp.zeros_like(jnp.asarray(batch.out_mask)),
        y=jnp.zeros_like(jnp.asarray(batch.y)),
    )


def dp_batch_iterator(batches, n_dev: int, mesh: Mesh):
    """Group a stream of same-shape GraphBatches into device groups of
    n_dev, padding the final group with fully-masked batches, and yield
    stacked + sharded (D, ...) batches."""
    group = []
    for b in batches:
        group.append(b)
        if len(group) == n_dev:
            yield shard_batches(group, mesh)
            group = []
    if group:
        filler = empty_like_batch(group[-1])
        while len(group) < n_dev:
            group.append(filler)
        yield shard_batches(group, mesh)


def make_dp_train_step(model, optimizer, ema_decay: float,
                       mesh: Mesh, dropout: float = 0.0,
                       rng_seed: int = 0) -> Callable:
    """Jitted data-parallel train step.

    state: replicated TrainState; batch: stacked (D, ...) GraphBatch sharded
    on 'data'. Returns (state, mean loss).

    dropout > 0 threads a per-device, per-step dropout rng into the model
    (deterministic and resume-stable: derived from rng_seed, the step
    counter, and the device's mesh position).
    """

    def per_device(state, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)  # (1,...)->()

        def loss_fn(params):
            if dropout > 0:
                key = jax.random.fold_in(
                    jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                       state.step),
                    jax.lax.axis_index("data"))
                pred = model.apply(params, batch, deterministic=False,
                                   rngs={"dropout": key})
            else:
                pred = model.apply(params, batch)
            return smooth_l1_loss(pred, batch.y, mask=batch.graph_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # weight each device by its REAL graph count: the final ragged
        # group is padded with all-masked filler batches whose zero
        # losses/grads must not dilute the global mean (loss and update
        # then equal the single-device step on the union of real graphs)
        cnt = batch.graph_mask.sum().astype(jnp.float32)
        total = jnp.maximum(jax.lax.psum(cnt, "data"), 1.0)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g * cnt, "data") / total, grads)
        loss = jax.lax.psum(jnp.where(cnt > 0, loss, 0.0) * cnt,
                            "data") / total
        # failure detection: a non-finite global loss leaves params AND
        # opt_state untouched and counts in bad_steps
        return apply_update_skip_nonfinite(state, loss, grads, optimizer,
                                           ema_decay)

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=0)


def make_dp_eval_step(model, mesh: Mesh, std: float = 1.0) -> Callable:
    """Jitted data-parallel eval: returns (sum abs err * std, graph count)
    psummed over devices."""

    def per_device(ema_params, batch):
        batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        pred = model.apply(ema_params, batch)
        err = masked_mae(pred, batch.y, mask=batch.graph_mask, scale=std)
        cnt = batch.graph_mask.sum().astype(jnp.float32)
        return (jax.lax.psum(err, "data"), jax.lax.psum(cnt, "data"))

    sharded = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded)
