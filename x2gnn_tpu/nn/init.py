"""Parameter initializers with reference-parity statistics.

The reference initializes every purpose-built Linear with "Glorot-
orthogonal" — an orthogonal matrix rescaled so that
var(W) * (fan_in + fan_out) = scale (initializer.py:29-34) — and leaves the
attention projections at torch's default kaiming-uniform (PyG Linear with
weight_initializer=None, sbftransformer_conv.py:84-88).

Exact bitwise parity with torch RNG is out of scope (different generators);
parity tests load identical weights explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot_orthogonal(scale: float = 2.0):
    """Orthogonal init rescaled so var(W) * (fan_in + fan_out) = scale.

    Matches Glorot_Ortho_ (initializer.py:29-34) including the *empirical*
    unbiased variance in the denominator.
    """

    def init(key, shape, dtype=jnp.float32):
        assert len(shape) == 2, "glorot_orthogonal expects 2D weights"
        w = jax.nn.initializers.orthogonal()(key, shape, jnp.float32)
        var = jnp.var(w, ddof=1)
        w = w * jnp.sqrt(scale / ((shape[0] + shape[1]) * var))
        return w.astype(dtype)

    return init


def he_orthogonal(scale: float = 1.0):
    """Orthogonal init standardized then scaled by 1/sqrt(fan_in)
    (initializer.py:15-27 — present in the reference but unused by its
    model path; provided for completeness/experimentation)."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.nn.initializers.orthogonal()(key, shape, jnp.float32)
        mean = jnp.mean(w, axis=0, keepdims=True)
        var = jnp.var(w, axis=0, ddof=1, keepdims=True)
        w = (w - mean) / jnp.sqrt(var + 1e-6)
        fan_in = shape[0]
        return (w * jnp.sqrt(scale / fan_in)).astype(dtype)

    return init


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)). shape is flax (in, out)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    """torch.nn.Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
