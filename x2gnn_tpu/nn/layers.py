"""Core NN building blocks (flax.linen).

Reference parity notes are in each docstring; all blocks operate on padded
static-shape arrays and never branch on data.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from x2gnn_tpu.nn.init import (
    glorot_orthogonal, torch_linear_kernel_init, torch_linear_bias_init)
from x2gnn_tpu.ops.basis import radial_frequencies_init


class Dense(nn.Module):
    """Linear with Glorot-orthogonal kernel + zero bias (the reference's
    standard recipe, e.g. xgnn.py:26-36, residual_layer.py:16-19).

    `dtype`: computation dtype (params stay float32); None = float32."""

    features: int
    use_bias: bool = True
    scale: float = 2.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=glorot_orthogonal(self.scale),
            bias_init=nn.initializers.zeros,
        )(x)


class TorchDense(nn.Module):
    """Linear with torch.nn.Linear default init — used where the reference
    leaves PyG Linear at its default (attention projections,
    sbftransformer_conv.py:52-66; MolWise MLP, readout.py:62-64)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init,
            bias_init=torch_linear_bias_init(fan_in),
        )(x)


class ResidualLayer(nn.Module):
    """x + silu(lin1(silu(lin0(x)))) (residual_layer.py:5-27)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = Dense(self.features, name="lin0")(x)
        h = jax.nn.silu(h)
        h = Dense(self.features, name="lin1")(h)
        h = jax.nn.silu(h)
        return h + x


@jax.custom_vjp
def _freq_scaled_lookup(table, idx):
    """Embedding lookup whose backward scales each row's gradient by the
    inverse frequency of that index in the batch — functional equivalent of
    torch's `scale_grad_by_freq=True` — and zeroes the gradient of row 0
    like torch's `padding_idx=0` (atom_embedding.py:14; without this the
    padding row would drift off zero under weight-coupled updates). `idx`
    is an explicit custom_vjp argument (float0 cotangent), never a closure
    capture — closed-over tracers leak under jax.checkpoint/nn.remat."""
    return table[idx]


def _freq_scaled_lookup_fwd(table, idx):
    return table[idx], (table.shape, idx)


def _freq_scaled_lookup_bwd(res, g):
    tbl_shape, idx = res
    counts = jnp.zeros(tbl_shape[0], g.dtype).at[idx].add(1.0)
    scale = 1.0 / jnp.maximum(counts[idx], 1.0)
    # padding_idx=0: lookups of row 0 contribute no gradient (torch zeroes
    # the padding row's grad; padded atoms all carry Z=0)
    scale = jnp.where(idx == 0, 0.0, scale)
    dtbl = jnp.zeros(tbl_shape, g.dtype).at[idx].add(g * scale[:, None])
    return dtbl, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


_freq_scaled_lookup.defvjp(_freq_scaled_lookup_fwd, _freq_scaled_lookup_bwd)


class EmbeddingBlock(nn.Module):
    """silu(Dense(embed(Z))) atom embedding (atom_embedding.py:10-25).

    torch semantics replicated functionally:
      * padding_idx=0: row 0 is zero-initialised; padded atoms (Z=0) embed
        to ~0 and receive no gradient (no real atom has Z=0).
      * max_norm=3.0: torch renormalises looked-up rows in place; here the
        renorm is applied to the table inside the forward pass (same
        effective embedding, gradient additionally flows through the
        projection — documented divergence).
      * scale_grad_by_freq: custom VJP dividing each row's gradient by its
        occurrence count in the batch.
    """

    embedding_size: int = 128
    vocab: int = 10
    max_norm: float = 3.0
    scale_grad_by_freq: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, numbers):
        def embed_init(key, shape, dtype=jnp.float32):
            w = jax.random.normal(key, shape, dtype)  # torch N(0,1) default
            return w.at[0].set(0.0)

        table = self.param(
            "embedding", embed_init, (self.vocab, self.embedding_size))
        # safe norm: row 0 is all-zero (padding) and d||x||/dx = x/||x|| is
        # NaN at 0 — keep the sqrt away from zero so gradients stay finite
        norms = jnp.sqrt(jnp.sum(table * table, -1, keepdims=True) + 1e-24)
        table = table * jnp.minimum(1.0, self.max_norm / norms)
        if self.scale_grad_by_freq:
            h = _freq_scaled_lookup(table, numbers)
        else:
            h = table[numbers]
        h = Dense(self.embedding_size, name="lin")(h)
        return jax.nn.silu(h) if self.activation else h


class MLPHead(nn.Module):
    """(depth-1) x [Linear, SiLU] + Linear(num_target) (readout.py:16-21).

    `torch_default_init=True` reproduces MolWise, whose reset_parameters
    forgets the MLP and leaves torch-default init (readout.py:62-64);
    AtomWise re-initialises everything Glorot-orthogonal (readout.py:29-32).
    """

    features: int
    num_target: int = 1
    depth: int = 3
    torch_default_init: bool = False

    @nn.compact
    def __call__(self, x):
        cls = TorchDense if self.torch_default_init else Dense
        for i in range(self.depth - 1):
            x = cls(self.features, name=f"mlp_{i}")(x)
            x = jax.nn.silu(x)
        return cls(self.num_target, name="mlp_out")(x)


class RadialBasisLayer(nn.Module):
    """sin(freq_n * d / cutoff) with trainable frequencies initialised to
    n*pi (radial_basis_layer.py:26-40)."""

    rbf_dim: int = 6
    cutoff: float = 5.0

    @nn.compact
    def __call__(self, d):
        freqs = self.param(
            "frequencies",
            lambda key, shape: jnp.asarray(
                radial_frequencies_init(self.rbf_dim)),
            (self.rbf_dim,))
        return jnp.sin(freqs * (d * (1.0 / self.cutoff))[..., None])
