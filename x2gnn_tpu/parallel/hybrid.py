"""Hybrid DP x EP training on a 2D device mesh ('dp', 'data').

Composes the two scaling modes this framework provides (the reference has
neither — SURVEY §2.3: no distributed training of any kind exists in
zfwangDP/X2-GNN, trainer.py:14 pins one CUDA device):

  * 'dp' axis — molecule-level data parallelism: each dp row of the mesh
    holds its own group of whole molecules (`data_parallel.py` semantics);
  * 'data' axis — edge partitioning within each group: the group's batched
    graph's atom axis (and every blocked edge table riding on it) is
    sharded across the row (`ep_model.py` semantics — the SP analogue).

The EP forward (`_ep_forward_local`) runs UNCHANGED inside each dp row:
all of its collectives (K/V all-gather or ppermute ring, psum'ed norm
statistics, reduce-scattered readouts) name the 'data' axis, so on the 2D
mesh they reduce only across that axis — dp rows never synchronize inside
the forward. Gradient synchronization across 'dp' falls out of the
shard_map transpose: parameters enter with spec P() (replicated over the
whole mesh), so their cotangents are summed over BOTH axes — the dp
all-reduce and the ep reduce-scatter in one transposed program, no
hand-written pmean.

Loss semantics: one global masked mean over every real molecule in every
dp group — identical to training the union of the groups on one device.

Typical production shape: dp = number of hosts/slices (molecule groups
ride DCN-cheap, gradient all-reduce once per step), ep = chips per host
(K/V exchange rides ICI every layer) — exactly the "collectives on ICI,
not DCN" layout rule.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.parallel.ep_model import (
    AXIS, EPBatch, _ep_forward_local)
from x2gnn_tpu.train.loss import masked_mae, smooth_l1_loss
from x2gnn_tpu.train.optim import apply_update_skip_nonfinite

DP_AXIS = "dp"
_REPLICATED_OVER_EP = ("y", "graph_mask")


def make_hybrid_mesh(dp: int, ep: int,
                     devices: Optional[Sequence] = None) -> Mesh:
    """A (dp, ep) mesh with axes ('dp', 'data'). The 'data' axis name is
    shared with ep_model so the EP forward's collectives bind to it."""
    devs = list(devices if devices is not None else jax.devices())
    if dp * ep != len(devs):
        raise ValueError(f"dp*ep = {dp * ep} != {len(devs)} devices")
    return Mesh(np.asarray(devs).reshape(dp, ep), (DP_AXIS, AXIS))


def stack_ep_batches(epbs: Sequence[EPBatch]) -> EPBatch:
    """Stack per-dp-group EPBatches along a new leading 'dp group' axis.
    All groups must share shapes (same composition-independent pad
    budgets — data/batching.py guarantees this for fixed batch_size)."""
    return EPBatch(**{
        f: np.stack([np.asarray(getattr(b, f)) for b in epbs])
        for f in EPBatch.__annotations__})


def _hybrid_spec(field: str) -> P:
    if field in _REPLICATED_OVER_EP:
        return P(DP_AXIS)
    return P(DP_AXIS, AXIS)


def shard_hybrid_batch(stacked: EPBatch, mesh: Mesh) -> EPBatch:
    """Lay out a stacked EPBatch on the 2D mesh: leading group axis over
    'dp', atom axis over 'data'; y/graph_mask replicated within a row."""
    def put(name, x):
        return jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, _hybrid_spec(name)))

    return EPBatch(**{f: put(f, getattr(stacked, f))
                      for f in EPBatch.__annotations__})


def make_hybrid_forward(cfg: ModelConfig, mesh: Mesh,
                        num_atoms_global: int,
                        kv_exchange: str = "allgather",
                        with_dropout: bool = False) -> Callable:
    """fn(params, stacked-sharded EPBatch) -> (n_groups, G) predictions.

    Parameter tree == X2GNN's. Requires one EP group per dp shard
    (n_groups == mesh dp size); run several steps for larger batches.
    with_dropout=True returns fn(params, epb, dropout_key): the key is
    folded with the dp row index here and the ep shard index inside
    _ep_forward_local, so every chip draws independent pair masks.
    """
    assert DP_AXIS in mesh.axis_names and AXIS in mesh.axis_names
    ep = mesh.shape[AXIS]
    assert num_atoms_global % ep == 0
    assert kv_exchange in ("allgather", "ring")

    def local_fwd(params, epb: EPBatch, key=None):
        assert epb.y.shape[0] == 1, (
            "one EP group per dp shard: stack exactly mesh.shape['dp'] "
            "EPBatches")
        group = jax.tree_util.tree_map(lambda x: x[0], epb)
        if key is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(DP_AXIS))
        pred = _ep_forward_local(params, group, cfg=cfg,
                                 num_atoms_global=num_atoms_global,
                                 kv_exchange=kv_exchange,
                                 dropout_key=key)
        return pred[None]

    batch_spec = EPBatch(**{f: _hybrid_spec(f)
                            for f in EPBatch.__annotations__})
    if with_dropout:
        sharded = shard_map(
            local_fwd, mesh=mesh, in_specs=(P(), batch_spec, P()),
            out_specs=P(DP_AXIS), check_vma=False)
    else:
        sharded = shard_map(
            lambda params, epb: local_fwd(params, epb), mesh=mesh,
            in_specs=(P(), batch_spec),
            out_specs=P(DP_AXIS), check_vma=False)
    return jax.jit(sharded)


def make_hybrid_train_step(cfg: ModelConfig, optimizer, ema_decay: float,
                           mesh: Mesh, num_atoms_global: int,
                           kv_exchange: str = "allgather",
                           rng_seed: int = 0) -> Callable:
    """Jitted hybrid training step. state: TrainState; batch: stacked +
    sharded EPBatch. Loss = masked mean over all groups' real molecules;
    non-finite losses skip the update (failure containment, as in the DP
    and EP steps). cfg.dropout > 0 threads a per-step, per-chip
    attention-dropout rng (the DP/EP scheme)."""
    dropout = cfg.dropout > 0
    fwd = make_hybrid_forward(cfg, mesh, num_atoms_global, kv_exchange,
                              with_dropout=dropout)

    def step(state, epb: EPBatch):
        def loss_fn(params):
            if dropout:
                key = jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                         state.step)
                pred = fwd(params, epb, key)              # (dp, G)
            else:
                pred = fwd(params, epb)                   # (dp, G)
            return smooth_l1_loss(pred.reshape(-1), epb.y.reshape(-1),
                                  mask=epb.graph_mask.reshape(-1))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_update_skip_nonfinite(state, loss, grads, optimizer,
                                           ema_decay)

    return jax.jit(step, donate_argnums=0)


def make_hybrid_eval_step(cfg: ModelConfig, mesh: Mesh,
                          num_atoms_global: int, std: float = 1.0,
                          kv_exchange: str = "allgather") -> Callable:
    """fn(ema_params, batch) -> (sum |err|·std over real molecules,
    count) — the EMA-eval MAE accumulator (trainer.py:52-58 semantics)."""
    fwd = make_hybrid_forward(cfg, mesh, num_atoms_global, kv_exchange)

    def evaluate(ema_params, epb: EPBatch):
        pred = fwd(ema_params, epb).reshape(-1)
        mask = epb.graph_mask.reshape(-1)
        return (masked_mae(pred, epb.y.reshape(-1), mask=mask, scale=std),
                mask.sum())

    return jax.jit(evaluate)
