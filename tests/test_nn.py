"""NN building-block tests: init statistics, residual math, graph norm
oracle, embedding semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.nn.init import glorot_orthogonal
from x2gnn_tpu.nn.layers import ResidualLayer, EmbeddingBlock, MLPHead
from x2gnn_tpu.nn.norm import GraphLayerNorm


def test_glorot_orthogonal_statistics():
    key = jax.random.PRNGKey(0)
    w = glorot_orthogonal(scale=2.0)(key, (128, 256))
    # var(W) * (fan_in + fan_out) == scale (initializer.py:29-34)
    got = np.var(np.asarray(w), ddof=1) * (128 + 256)
    assert got == pytest.approx(2.0, rel=1e-5)
    # still orthogonal up to the scalar rescale: W W^T ~ c I
    wwt = np.asarray(w @ w.T)
    off = wwt - np.diag(np.diag(wwt))
    assert np.abs(off).max() < 1e-4 * np.abs(np.diag(wwt)).mean()


def test_residual_layer_math():
    layer = ResidualLayer(16)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 16)),
                    jnp.float32)
    params = layer.init(jax.random.PRNGKey(1), x)
    out = layer.apply(params, x)
    # out = x + silu(lin1(silu(lin0 x))) — recompute manually
    p = params["params"]
    w0 = p["lin0"]["Dense_0"]["kernel"]
    b0 = p["lin0"]["Dense_0"]["bias"]
    w1 = p["lin1"]["Dense_0"]["kernel"]
    b1 = p["lin1"]["Dense_0"]["bias"]
    h = jax.nn.silu(x @ w0 + b0)
    expect = x + jax.nn.silu(h @ w1 + b1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-6)


def test_embedding_padding_row_zero():
    block = EmbeddingBlock(embedding_size=32)
    z = jnp.asarray([0, 1, 6, 9], jnp.int32)
    params = block.init(jax.random.PRNGKey(0), z)
    table = params["params"]["embedding"]
    np.testing.assert_allclose(np.asarray(table[0]), 0.0)


def test_embedding_max_norm():
    block = EmbeddingBlock(embedding_size=128, activation=False)
    z = jnp.asarray([1, 6], jnp.int32)
    params = block.init(jax.random.PRNGKey(0), z)
    # effective looked-up rows have norm <= 3 before the linear layer:
    # check via the internal renorm by zeroing the linear to identity
    table = params["params"]["embedding"]
    norms = np.linalg.norm(np.asarray(table), axis=-1)
    assert norms[1:].max() > 3.0  # raw init N(0,1) at 128 dims exceeds 3
    # forward must be finite and differ from raw lookup (renorm active)
    out = block.apply(params, z)
    assert np.isfinite(np.asarray(out)).all()


def test_embedding_grad_by_freq():
    block = EmbeddingBlock(embedding_size=8, activation=False,
                           scale_grad_by_freq=True)
    z = jnp.asarray([1, 1, 1, 6], jnp.int32)  # '1' appears 3x, '6' once
    params = block.init(jax.random.PRNGKey(0), z)

    def loss(p):
        return block.apply(p, z).sum()

    g = jax.grad(loss)(params)["params"]["embedding"]
    block2 = EmbeddingBlock(embedding_size=8, activation=False,
                            scale_grad_by_freq=False)

    def loss2(p):
        return block2.apply(p, z).sum()

    g2 = jax.grad(loss2)(params)["params"]["embedding"]
    # row 1 accumulated 3 lookups; freq scaling divides by 3
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(g2[1]) / 3.0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g[6]), np.asarray(g2[6]),
                               rtol=1e-5)


def test_graph_layer_norm_oracle(rng):
    """PyG 2.1 graph-mode semantics: mean/var over ALL elements of each
    graph's rows (biased var, eps inside sqrt)."""
    E, C, G = 20, 8, 3
    x = rng.normal(size=(E, C)).astype(np.float32)
    gid = rng.integers(0, G, size=E).astype(np.int32)
    mask = rng.random(E) > 0.15
    norm = GraphLayerNorm()
    out = norm.apply({}, jnp.asarray(x), jnp.asarray(gid), G,
                     mask=jnp.asarray(mask))
    out = np.asarray(out)
    for g in range(G):
        sel = (gid == g) & mask
        if not sel.sum():
            continue
        vals = x[sel]
        mean = vals.mean()
        var = vals.var()          # biased, over all elements
        expect = (vals - mean) / np.sqrt(var + 1e-8)
        np.testing.assert_allclose(out[sel], expect, rtol=1e-4, atol=1e-5)
    assert (out[~mask] == 0).all()


def test_mlp_head_output_shape():
    head = MLPHead(16, num_target=1, depth=3)
    x = jnp.zeros((7, 16))
    params = head.init(jax.random.PRNGKey(0), x)
    assert head.apply(params, x).shape == (7, 1)
