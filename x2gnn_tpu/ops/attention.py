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


def padded_attention(q, k, v, e, s, nbr_trip, nbr_src, nbr_mask):
    """Dense neighbor-table attention.

    q/k/v: (E, H, C); e/s: (T, H, C); nbr_trip/nbr_src/nbr_mask: (E, D).
    Returns (E, H, C). Rows with no real neighbors yield 0.
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
    msg = v_n * s_n * w[..., None]                        # (E, D, H, C)
    return msg.sum(axis=1)
