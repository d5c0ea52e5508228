"""Edge-partitioned attention — the graph analogue of sequence parallelism.

For batched graphs too large for one chip, activations are sharded rather
than replicated: atoms (and with them the attention's destination rows)
are partitioned contiguously across the mesh's 'data' axis, K/V edge
features are sharded by a balanced edge split, and each device all-gathers
the K/V rows over ICI before computing its own atoms' blocked attention —
softmax stays chip-local because normalization is per destination row
(SURVEY §5: partition by destination segment; communication = gathering
source-edge features).

This is the op-level building block (BASELINE configs[4]); the full
edge-partitioned training step composes it with reduce-scattered readouts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from x2gnn_tpu.ops.attention import blocked_attention


def atom_shard_size(n_atoms: int, n_dev: int) -> int:
    assert n_atoms % n_dev == 0, (
        f"pad atom budget {n_atoms} to a multiple of {n_dev}")
    return n_atoms // n_dev


def make_ep_blocked_attention(mesh: Mesh, heads: int):
    """Edge-partitioned blocked attention over mesh axis 'data'.

    Sharded inputs (leading dim sharded over 'data'):
      q, k, v:    (E, H, C) per-edge projections, edge-sharded
      G:          (E, L, H, C) edge-sharded
      e_atom:     (N, H, C) atom-sharded
      cbf:        (N, D, D, L) atom-sharded
      in_edges/out_edges: (N, D) GLOBAL edge ids, atom-sharded
      pair_mask:  (N, D, D) atom-sharded
    Replicated: s_bias (H, C).

    Returns out in blocked layout (N, D, H, C), atom-sharded — each real
    edge's output lives at its (dst atom, slot) position on the dst atom's
    owner device.
    """

    def per_device(q, k, v, e_atom, G, s_bias, cbf,
                   in_edges, out_edges, pair_mask):
        # gather K/V/G source rows over ICI; Q stays local to the
        # destination shard (flash/ring-attention analogue)
        k_full = jax.lax.all_gather(k, "data", axis=0, tiled=True)
        v_full = jax.lax.all_gather(v, "data", axis=0, tiled=True)
        q_full = jax.lax.all_gather(q, "data", axis=0, tiled=True)
        G_full = jax.lax.all_gather(G, "data", axis=0, tiled=True)
        N_local, D = in_edges.shape
        H = q.shape[1]
        C = q.shape[2]
        # local blocked attention with global tables; keep the blocked
        # (atom, slot) output layout — no cross-device scatter needed
        q_blk = q_full[in_edges]
        k_blk = k_full[out_edges] + e_atom[:, None]
        v_blk = v_full[out_edges] + e_atom[:, None]
        scores = jnp.einsum("nihc,nkhc->nikh", q_blk, k_blk)
        scores = scores / jnp.sqrt(float(C))
        neg = -1e30
        scores = jnp.where(pair_mask[..., None], scores, neg)
        smax = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), neg / 2)
        ex = jnp.exp(scores - smax)
        ex = jnp.where(pair_mask[..., None], ex, 0.0)
        denom = jnp.maximum(ex.sum(axis=2, keepdims=True), 1e-16)
        alpha = ex / denom
        L = cbf.shape[-1]
        out = jnp.einsum("nikh,nkhc->nihc", alpha, v_blk) * s_bias
        for l in range(L):
            wl = alpha * cbf[..., l][..., None]
            out = out + jnp.einsum(
                "nikh,nkhc->nihc", wl, v_blk * G_full[out_edges][:, :, l])
        return out

    return jax.jit(shard_map(
        per_device, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                  P(), P("data"), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False))
