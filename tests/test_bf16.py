"""bf16 compute-path test: model runs with bfloat16 conv computation and
stays reasonably close to the f32 result (params remain f32)."""

import dataclasses

import numpy as np
import jax

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.models import X2GNN

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32, heads=4,
                  sbf_dim=3, rbf_dim=4, edge_feat_dim=16,
                  attention_layout="segment")


def _batch(make_molecule, rng):
    gs = []
    for i in range(3):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=16)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        gs.append(g)
    return pad_graphs(gs, pad_budget_for(gs, 3))


def _check(cfg, b):
    m32 = X2GNN(cfg)
    m16 = X2GNN(dataclasses.replace(cfg, compute_dtype="bfloat16"))
    params = m32.init(jax.random.PRNGKey(0), b)
    # params stay f32 in both
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == np.float32
    out32 = np.asarray(m32.apply(params, b))
    out16 = np.asarray(m16.apply(params, b))
    assert out16.dtype == np.float32     # cast back after the conv stack
    scale = max(np.abs(out32).max(), 1.0)
    np.testing.assert_allclose(out16 / scale, out32 / scale, atol=0.05)
    # gradients exist and are finite through the bf16 stack
    import jax.numpy as jnp

    def loss(p):
        return (m16.apply(p, b) ** 2).sum()

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert leaf.dtype == np.float32
        assert np.isfinite(np.asarray(leaf)).all()


def test_bf16_close_to_f32(make_molecule, rng):
    _check(CFG, _batch(make_molecule, rng))


def test_bf16_blocked_xla(make_molecule, rng):
    cfg = dataclasses.replace(CFG, attention_layout="blocked",
                              use_pallas=False)
    _check(cfg, _batch(make_molecule, rng))


def test_bf16_blocked_pallas(make_molecule, rng):
    cfg = dataclasses.replace(CFG, attention_layout="blocked",
                              use_pallas=True)   # interpret mode on CPU
    _check(cfg, _batch(make_molecule, rng))
