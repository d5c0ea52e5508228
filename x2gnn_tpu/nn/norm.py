"""Graph-wise LayerNorm matching PyG 2.1 semantics.

The reference normalizes line-graph node features per *graph* — mean and
variance taken over all (nodes x channels) elements of each molecule's
edge set (model.py:24,46 passes the batch vector; PyG LayerNorm with
affine=False, eps=1e-8; biased variance, eps added before sqrt). The
model.py:24 comment records that forgetting `batch` was a bug — so graph
mode is the required semantics.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from x2gnn_tpu.ops.segment import segment_sum


class GraphLayerNorm(nn.Module):
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, graph_ids, num_graphs: int, mask=None):
        """x: (E, C); graph_ids: (E,) molecule id; mask: (E,) valid rows."""
        feat = x.shape[-1]
        ones = jnp.ones(x.shape[0], x.dtype)
        count = segment_sum(ones, graph_ids, num_graphs, mask) * feat
        count = jnp.maximum(count, 1.0)

        mean = segment_sum(x.sum(-1), graph_ids, num_graphs, mask) / count
        centered = x - mean[graph_ids][:, None]
        var = segment_sum(
            (centered * centered).sum(-1), graph_ids, num_graphs, mask
        ) / count
        out = centered / jnp.sqrt(var + self.eps)[graph_ids][:, None]
        if mask is not None:
            out = jnp.where(mask[:, None], out, 0.0)
        return out
