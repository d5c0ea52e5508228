"""Readout oracles: edge->atom gating/scatter semantics and molecule
pooling options (reference readout.py:7-76)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.nn.readout import AtomWiseReadout, MolWiseReadout


def _problem(rng, E=14, N=6, K=4, C=16):
    x = rng.normal(size=(E, C)).astype(np.float32)
    rbf = rng.normal(size=(E, K)).astype(np.float32)
    edge_src = rng.integers(0, N, size=E).astype(np.int32)
    mask = rng.random(E) > 0.2
    return x, rbf, edge_src, mask


def test_atomwise_oracle(rng):
    C, N = 16, 6
    x, rbf, edge_src, mask = _problem(rng, C=C, N=N)
    ro = AtomWiseReadout(C)
    args = (jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(edge_src), N)
    params = ro.init(jax.random.PRNGKey(0), *args,
                     edge_mask=jnp.asarray(mask))
    out = np.asarray(ro.apply(params, *args, edge_mask=jnp.asarray(mask)))
    assert out.shape == (N, 1)

    # oracle: gate edges, scatter-add to source atoms, apply the MLP
    p = params["params"]
    w = np.asarray(p["lin_rbf"]["Dense_0"]["kernel"])
    b = np.asarray(p["lin_rbf"]["Dense_0"]["bias"])
    gated = (rbf @ w + b) * x
    atoms = np.zeros((N, C), np.float32)
    for e in range(len(x)):
        if mask[e]:
            atoms[edge_src[e]] += gated[e]
    h = atoms
    for i in range(2):
        q = p["mlp"][f"mlp_{i}"]["Dense_0"]
        z = h @ np.asarray(q["kernel"]) + np.asarray(q["bias"])
        h = z * (1.0 / (1.0 + np.exp(-z)))   # silu
    q = p["mlp"]["mlp_out"]["Dense_0"]
    expect = h @ np.asarray(q["kernel"]) + np.asarray(q["bias"])
    np.testing.assert_allclose(out, expect, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("pool", ["mean", "add"])
def test_molwise_pooling(rng, pool):
    C, N, G = 16, 6, 2
    x, rbf, edge_src, mask = _problem(rng, C=C, N=N)
    atom_gid = (np.arange(N) // 3).astype(np.int32)
    node_mask = np.ones(N, bool)
    ro = MolWiseReadout(C, pool=pool)
    args = (jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(edge_src),
            jnp.asarray(atom_gid), N, G)
    kw = dict(edge_mask=jnp.asarray(mask), node_mask=jnp.asarray(node_mask))
    params = ro.init(jax.random.PRNGKey(1), *args, **kw)
    out = np.asarray(ro.apply(params, *args, **kw))
    assert out.shape == (G, 1)
    assert np.isfinite(out).all()


def test_molwise_rejects_bad_pool():
    ro = MolWiseReadout(8, pool="max")
    with pytest.raises(AssertionError):
        ro.init(jax.random.PRNGKey(0), jnp.zeros((4, 8)),
                jnp.zeros((4, 3)), jnp.zeros(4, jnp.int32),
                jnp.zeros(5, jnp.int32), 5, 2)
