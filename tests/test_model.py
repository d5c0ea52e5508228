"""End-to-end model tests: shapes, finiteness, and the two invariances that
certify the padding/masking design — outputs must not depend on pad budgets
or on which other molecules share the batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.models import X2GNN

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32, heads=4,
                  sbf_dim=3, rbf_dim=4, edge_feat_dim=338)


def _graphs(make_molecule, k, rng):
    gs = []
    for i in range(k):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(4, 10)))
        edge_count = None
        g = build_mol_graph(numbers, pos, y=np.array([float(i)]), index=i)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(np.float32)
        gs.append(g)
    return gs


@pytest.fixture(scope="module")
def model():
    return X2GNN(CFG)


def _init_and_apply(model, batch, key=0):
    params = model.init(jax.random.PRNGKey(key), batch)
    return params, np.asarray(model.apply(params, batch))


def test_forward_shape_and_finite(model, make_molecule, rng):
    gs = _graphs(make_molecule, 4, rng)
    batch = pad_graphs(gs, pad_budget_for(gs, 4))
    params, out = _init_and_apply(model, batch)
    assert out.shape == (4,)
    assert np.isfinite(out).all()


def test_padding_invariance(model, make_molecule, rng):
    """Same molecules, bigger pad budgets -> bitwise-equivalent predictions
    (up to float assoc.). This certifies the masking design."""
    gs = _graphs(make_molecule, 3, rng)
    n, e, t, d = pad_budget_for(gs, 3)[:4]
    small = pad_graphs(gs, (n, e, t, d))
    big = pad_graphs(gs, (n + 64, e + 256, t + 1024, d + 8), n_graph=5)
    params = model.init(jax.random.PRNGKey(0), small)
    out_small = np.asarray(model.apply(params, small))
    out_big = np.asarray(model.apply(params, big))
    np.testing.assert_allclose(out_small, out_big[:3], rtol=2e-4, atol=1e-5)
    # padded graph slots predict *something* but are masked by graph_mask
    assert np.isfinite(out_big).all()


def test_batch_composition_invariance(model, make_molecule, rng):
    """A molecule's prediction must not depend on its batch partners."""
    gs = _graphs(make_molecule, 3, rng)
    n, e, t, d = pad_budget_for(gs, 3)[:4]
    together = pad_graphs(gs, (n, e, t, d))
    params = model.init(jax.random.PRNGKey(1), together)
    out_together = np.asarray(model.apply(params, together))
    for i, g in enumerate(gs):
        alone = pad_graphs([g], (n, e, t, d))
        out_alone = np.asarray(model.apply(params, alone))
        np.testing.assert_allclose(out_alone[0], out_together[i],
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("readout", ["molwise_mean", "molwise_add"])
def test_molwise_variants(readout, make_molecule, rng):
    cfg = CFG.replace(readout=readout) if hasattr(CFG, "replace") else None
    import dataclasses
    cfg = dataclasses.replace(CFG, readout=readout)
    model = X2GNN(cfg)
    gs = _graphs(make_molecule, 3, rng)
    batch = pad_graphs(gs, pad_budget_for(gs, 3))
    params, out = _init_and_apply(model, batch)
    assert out.shape == (3,)
    assert np.isfinite(out).all()


def test_gradients_finite(model, make_molecule, rng):
    gs = _graphs(make_molecule, 3, rng)
    batch = pad_graphs(gs, pad_budget_for(gs, 3))
    params = model.init(jax.random.PRNGKey(2), batch)

    def loss(p):
        pred = model.apply(p, batch)
        return jnp.where(batch.graph_mask, (pred - batch.y) ** 2, 0.0).sum()

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_jit_forward(model, make_molecule, rng):
    gs = _graphs(make_molecule, 3, rng)
    batch = pad_graphs(gs, pad_budget_for(gs, 3))
    params = model.init(jax.random.PRNGKey(0), batch)
    eager = np.asarray(model.apply(params, batch))
    jitted = np.asarray(jax.jit(model.apply)(params, batch))
    np.testing.assert_allclose(eager, jitted, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("layout", ["segment", "blocked"])
def test_remat_matches_no_remat(layout, make_molecule, rng):
    """cfg.remat recomputes the conv in the backward pass — outputs and
    parameter gradients must be identical to the stored-activation path."""
    import dataclasses
    gs = _graphs(make_molecule, 3, rng)
    batch = pad_graphs(gs, pad_budget_for(gs, 3))
    cfg = dataclasses.replace(CFG, attention_layout=layout,
                              use_pallas=False)
    m0 = X2GNN(cfg)
    m1 = X2GNN(dataclasses.replace(cfg, remat=True))
    params = m0.init(jax.random.PRNGKey(0), batch)
    # compare in f64 (conftest enables x64): f32 leaves with heavy
    # cancellation amplify the reduction-order differences remat's
    # recompute introduces, hiding real bugs behind loose tolerances
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float64), params)

    def loss(m):
        return lambda p: (m.apply(p, batch) ** 2).sum()

    l0, g0 = jax.value_and_grad(loss(m0))(params)
    l1, g1 = jax.value_and_grad(loss(m1))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-9)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-9)
