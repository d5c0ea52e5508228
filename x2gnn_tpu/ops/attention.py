"""Line-graph attention layouts.

`segment_attention` — COO triplet layout + masked segment primitives (the
XLA-scatter baseline, semantics of sbftransformer_conv.py:138-162).

`padded_attention` — the TPU performance path: per-destination-edge
neighbor tables (E, D) turn the segment softmax into a plain masked softmax
over a static axis and the scatter-aggregation into a dense sum — fully
regular compute with gathers as the only irregular op. Equivalent math,
verified against the segment path in tests/test_attention_layouts.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from x2gnn_tpu.ops.segment import segment_softmax, segment_sum

_NEG = -1e30


def _int_zeros(x):
    """Symbolic-zero cotangent for integer/bool primal args (the float0
    convention custom_vjp requires)."""
    return jnp.zeros(x.shape, dtype=jax.dtypes.float0)


@jax.custom_vjp
def injective_gather(x, table, inv_pos, row_mask):
    """x[table] where `table` (N, D) lists each real row of x exactly once
    (pad slots point at row 0) and `inv_pos` (E,) gives each row's flat
    slot n*D + d. Because the mapping is injective, the backward pass is
    a GATHER of the cotangent at inv_pos — never a scatter-add. This is
    what makes the blocked layout scatter-free end to end.

    `row_mask` (E,) marks real rows: pad rows' inv_pos points at slot 0
    (a real slot), so their backward reads must be masked out — without
    it, slot 0's cotangent would leak into pad-row gradients.

    The index/mask operands are explicit custom_vjp arguments (threaded
    through the residuals) rather than closure captures: a bwd that
    closes over tracers leaks across jax.checkpoint/nn.remat tracing.
    """
    return x[table]


def _injective_gather_fwd(x, table, inv_pos, row_mask):
    return x[table], (table.shape, inv_pos, row_mask)


def _injective_gather_bwd(res, g):
    (N, D), inv_pos, row_mask = res
    flat = g.reshape((N * D,) + g.shape[2:])
    out = flat[inv_pos]
    m = row_mask.reshape(row_mask.shape + (1,) * (out.ndim - 1))
    return (jnp.where(m, out, 0.0),
            jnp.zeros((N, D), dtype=jax.dtypes.float0),
            _int_zeros(inv_pos), _int_zeros(row_mask))


injective_gather.defvjp(_injective_gather_fwd, _injective_gather_bwd)


@jax.custom_vjp
def blocked_to_edges(x_blk, pos, table, mask):
    """Inverse of injective_gather: read E edge rows out of a blocked
    (N, D, ...) array at flat slots `pos` (E,). Backward fills each
    blocked slot from its (unique) edge via `table` (N, D) + `mask` —
    again a gather, never a scatter."""
    N, D = table.shape
    return x_blk.reshape((N * D,) + x_blk.shape[2:])[pos]


def _blocked_to_edges_fwd(x_blk, pos, table, mask):
    return blocked_to_edges(x_blk, pos, table, mask), (pos, table, mask)


def _blocked_to_edges_bwd(res, g):
    pos, table, mask = res
    blk = g[table]                           # (N, D, ...)
    m = mask.reshape(mask.shape + (1,) * (blk.ndim - mask.ndim))
    return (jnp.where(m, blk, 0.0), _int_zeros(pos), _int_zeros(table),
            _int_zeros(mask))


blocked_to_edges.defvjp(_blocked_to_edges_fwd, _blocked_to_edges_bwd)


def segment_attention(q, k, v, e, s, trip_src, trip_dst, trip_mask,
                      num_edges: int):
    """q/k/v: (E, H, C); e/s: (T, H, C) per-triplet edge-attr and sbf
    projections; returns (E, H, C)."""
    C = q.shape[-1]
    q_i = q[trip_dst]
    k_j = k[trip_src] + e
    v_j = v[trip_src] + e
    alpha = (q_i * k_j).sum(-1) / jnp.sqrt(float(C))     # (T, H) SDDMM
    alpha = segment_softmax(alpha, trip_dst, num_edges, mask=trip_mask)
    msg = v_j * s * alpha[..., None]
    return segment_sum(msg, trip_dst, num_edges, mask=trip_mask)


def blocked_attention_core(q_blk, k_blk, v_blk, e_atom, G_blk, s_bias, cbf,
                           pair_mask, dropout_mask=None,
                           return_alpha=False):
    """Attention math on pre-blocked tables (all inputs already in the
    atom-blocked layout). q_blk: (N, D, H, C) in-table rows; k_blk/v_blk/
    G_blk: (N, D, H, C) / (N, D, L, H, C) out-table rows; e_atom:
    (N, H, C); cbf: (N, D, D, L); pair_mask: (N, Di, Dk). Returns
    (N, D, H, C) in the in-table layout.

    dropout_mask: optional (N, Di, Do, H) multiplicative mask (already
    scaled by 1/keep) applied to the softmax weights AFTER they are
    computed (sbftransformer_conv.py:153 applies dropout to alpha).
    return_alpha: also return the PRE-dropout weights (N, Di, Do, H) —
    PyG's return_attention_weights saves alpha before dropout."""
    C = q_blk.shape[-1]
    L = cbf.shape[-1]
    k_blk = k_blk + e_atom[:, None]
    v_blk = v_blk + e_atom[:, None]
    scores = jnp.einsum("nihc,nkhc->nikh", q_blk, k_blk) / jnp.sqrt(float(C))
    scores = jnp.where(pair_mask[..., None], scores, _NEG)
    smax = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), _NEG / 2)
    ex = jnp.exp(scores - smax)
    ex = jnp.where(pair_mask[..., None], ex, 0.0)
    denom = jnp.maximum(ex.sum(axis=2, keepdims=True), 1e-16)
    alpha = ex / denom                                   # (N, Di, Do, H)
    alpha_used = (alpha if dropout_mask is None
                  else alpha * dropout_mask)
    out = jnp.einsum("nikh,nkhc->nihc", alpha_used, v_blk) * s_bias
    for l in range(L):
        wl = alpha_used * cbf[..., l][..., None]         # (N, Di, Do, H)
        out = out + jnp.einsum("nikh,nkhc->nihc", wl, v_blk * G_blk[:, :, l])
    if return_alpha:
        return out, alpha
    return out


def blocked_attention(q, k, v, e_atom, G, s_bias, cbf,
                      in_edges, out_edges, pair_mask, edge_inpos):
    """Atom-blocked dense attention — the fastest layout.

    All triplets whose destination edge is (i -> j) share media atom j:
    their K/V sources are exactly j's out-edges, and the reference's
    per-triplet edge_attr is a pure function of j (xgnn.py:57-58). So the
    conv is, per atom j, a dense (deg_in x deg_out) masked attention:

      q/k/v:      (E, H, C) per-edge projections
      e_atom:     (N, H, C) lin_edge(edgenn(atom_emb)) per atom
      G:          (E, L, H, C) factored sbf: G[e,l] = sum_n W[l,n] rbf_env[e,l,n]
      s_bias:     (H, C) lin_sbf bias
      cbf:        (N, D, D, L) Y_l(theta) per (in-slot, out-slot) pair
      in_edges/out_edges: (N, D) atom edge tables
      pair_mask:  (N, D, D) valid & non-backtracking pairs
      edge_inpos: (E,) flat position of each edge in the in-table

    The per-triplet sbf modulation factorizes as
      s[t] = sum_l cbf[j, i_slot, k_slot, l] * G[jk, l] + s_bias,
    contracted inside the output reduction — no (T, ...) tensor is ever
    materialized. Returns (E, H, C).
    """
    N, D = in_edges.shape
    H, C = q.shape[1], q.shape[2]
    out = blocked_attention_core(q[in_edges], k[out_edges], v[out_edges],
                                 e_atom, G[out_edges], s_bias, cbf,
                                 pair_mask)
    return out.reshape(N * D, H, C)[edge_inpos]


def padded_attention(q, k, v, e, s, nbr_trip, nbr_src, nbr_mask,
                     dropout_mask=None):
    """Dense neighbor-table attention.

    q/k/v: (E, H, C); e/s: (T, H, C); nbr_trip/nbr_src/nbr_mask: (E, D).
    Returns (E, H, C). Rows with no real neighbors yield 0.
    dropout_mask: optional (E, D, H) keep mask pre-scaled by 1/keep,
    applied to the softmax weights after normalization
    (sbftransformer_conv.py:153) — gather it from the canonical pair
    space via `pair_dropout_mask(...)[drop_pair_pos][nbr_trip]` so all
    layouts drop identical weights under one rng.
    """
    C = q.shape[-1]
    k_n = k[nbr_src] + e[nbr_trip]                        # (E, D, H, C)
    v_n = v[nbr_src] + e[nbr_trip]
    s_n = s[nbr_trip]
    alpha = jnp.einsum("ehc,edhc->edh", q, k_n) / jnp.sqrt(float(C))
    alpha = jnp.where(nbr_mask[..., None], alpha, _NEG)
    amax = jnp.max(alpha, axis=1, keepdims=True)          # (E, 1, H)
    amax = jnp.maximum(amax, _NEG / 2)
    ex = jnp.exp(alpha - amax)
    ex = jnp.where(nbr_mask[..., None], ex, 0.0)
    denom = jnp.maximum(ex.sum(axis=1, keepdims=True), 1e-16)
    w = ex / denom                                        # (E, D, H)
    if dropout_mask is not None:
        w = w * dropout_mask
    msg = v_n * s_n * w[..., None]                        # (E, D, H, C)
    return msg.sum(axis=1)


def pair_dropout_mask(rng, rate: float, N: int, D: int, H: int):
    """Attention-dropout keep mask in the canonical PAIR space
    (atom j, in-slot, out-slot, head) — the one coordinate system every
    layout can address: the blocked core indexes it directly, the segment
    layout gathers per-triplet values via `triplet_pair_positions`. Both
    draw THIS shape from the same rng stream, so matched keys drop
    identical weights across layouts (sbftransformer_conv.py:153).
    Returned mask is already scaled by 1/keep_prob."""
    keep = jax.random.bernoulli(rng, 1.0 - rate, (N, D, D, H))
    return keep.astype(jnp.float32) / (1.0 - rate)


def triplet_pair_positions(trip_dst, trip_src, edge_inpos, edge_outpos,
                           D: int):
    """Flat pair-space position (j*D*D + in_slot*D + out_slot) of every
    triplet: the dst edge (i->j) occupies in-slot `edge_inpos[dst] % D` of
    row j, the src edge (j->k) out-slot `edge_outpos[src] % D`."""
    return (edge_inpos[trip_dst] * D + edge_outpos[trip_src] % D)


def pairs_to_triplet_weights(alpha_pairs, pair_pos):
    """Gather per-pair attention weights (N, Di, Do, H) into per-triplet
    weights (T, H) — the segment layout's return_attention_weights shape
    (sbftransformer_conv.py:129-134)."""
    N, Di, Do, H = alpha_pairs.shape
    return alpha_pairs.reshape(N * Di * Do, H)[pair_pos]


def beta_gate(out, skip, lin_beta_apply):
    """Beta-gated skip connection (sbftransformer_conv.py:122-125):
    out = b*skip + (1-b)*out with b = sigmoid(lin_beta([out, skip,
    out - skip])). Shared by all three conv implementations — the
    layout-equivalence invariant requires them bit-identical.
    `lin_beta_apply`: callable applying the bias-free (3C -> 1) linear."""
    b = jax.nn.sigmoid(lin_beta_apply(
        jnp.concatenate([out, skip, out - skip], axis=-1)))
    return b * skip + (1.0 - b) * out
