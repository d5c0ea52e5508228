"""Masked segment primitives — the XLA baseline for the irregular ops.

The reference delegates these to third-party CUDA kernels: torch-scatter
`scatter_add`/`scatter_mean` (readout.py:3, model.py:9) and PyG's segment
`softmax` (sbftransformer_conv.py:12,151). Here the baseline is
`jax.ops.segment_sum` under jit (XLA scatter); the performance path lives in
`x2gnn_tpu.ops.pallas`.

All ops take an optional boolean `mask`; masked-out rows contribute nothing
regardless of their segment id, which is how padding (segment id 0 by
convention, see data/batching.py) stays inert.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray],
                fill: float = 0.0) -> jnp.ndarray:
    if mask is None:
        return data
    shape = mask.shape + (1,) * (data.ndim - mask.ndim)
    return jnp.where(mask.reshape(shape), data, fill)


def segment_sum(data, segment_ids, num_segments, mask=None):
    """Sum `data` rows into `num_segments` buckets (torch-scatter
    scatter_add equivalent, e.g. readout.py:37)."""
    return jax.ops.segment_sum(
        _apply_mask(data, mask), segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, mask=None):
    """Masked mean per segment (torch-scatter scatter_mean, readout.py:69)."""
    total = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(data.shape[0], dtype=data.dtype)
    count = segment_sum(ones, segment_ids, num_segments, mask)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (data.ndim - 1))


def segment_max(data, segment_ids, num_segments, mask=None):
    """Masked max per segment; empty segments give a large negative."""
    return jax.ops.segment_max(
        _apply_mask(data, mask, fill=_NEG_INF), segment_ids,
        num_segments=num_segments)


def segment_softmax(scores, segment_ids, num_segments, mask=None):
    """Numerically-stable softmax within segments (PyG `softmax`,
    sbftransformer_conv.py:151).

    scores: (T, ...) with segment_ids (T,). Masked rows get weight 0; empty
    segments produce 0 (not NaN).
    """
    scores = _apply_mask(scores, mask, fill=_NEG_INF)
    seg_max = segment_max(scores, segment_ids, num_segments)
    # guard fully-masked segments so exp(score - max) stays finite
    seg_max = jnp.maximum(seg_max, _NEG_INF / 2)
    shifted = scores - seg_max[segment_ids]
    expd = jnp.exp(shifted)
    expd = _apply_mask(expd, mask, fill=0.0)
    denom = segment_sum(expd, segment_ids, num_segments)
    denom = jnp.maximum(denom, 1e-16)
    return expd / denom[segment_ids]
