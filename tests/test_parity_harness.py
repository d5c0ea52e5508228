"""Parity-dump harness tests: intermediates captured, dumps comparable."""

import numpy as np
import jax
import pytest

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.utils.parity import (
    dump_activations, compare_dumps, export_params_flat)

CFG = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16, heads=2,
                  sbf_dim=2, rbf_dim=2, edge_feat_dim=8)


def _setup(make_molecule, rng):
    gs = []
    for i in range(2):
        numbers, pos = make_molecule(n_atoms=6)
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        gs.append(g)
    b = pad_graphs(gs, pad_budget_for(gs, 2))
    model = X2GNN(CFG)
    params = model.init(jax.random.PRNGKey(0), b)
    return model, params, b


def test_dump_and_compare(make_molecule, rng, tmp_path):
    model, params, b = _setup(make_molecule, rng)
    p1 = str(tmp_path / "a.npz")
    p2 = str(tmp_path / "b.npz")
    shapes = dump_activations(model, params, b, p1)
    dump_activations(model, params, b, p2)
    # captures per-layer outputs incl. conv and readouts
    assert any("conv_0" in k for k in shapes)
    assert any("readout" in k for k in shapes)
    assert "__output__" in shapes
    report = compare_dumps(p1, p2)
    assert report and all(ok for _, _, ok in report)


def test_compare_detects_mismatch(make_molecule, rng, tmp_path):
    model, params, b = _setup(make_molecule, rng)
    p1 = str(tmp_path / "a.npz")
    dump_activations(model, params, b, p1)
    # perturb one parameter -> some layer must mismatch
    import jax.numpy as jnp
    bad = jax.tree_util.tree_map(lambda x: x + 0.1, params)
    p2 = str(tmp_path / "c.npz")
    dump_activations(model, bad, b, p2)
    report = compare_dumps(p1, p2)
    assert any(not ok for _, _, ok in report)


def test_export_params_flat(make_molecule, rng):
    model, params, b = _setup(make_molecule, rng)
    flat = export_params_flat(params)
    assert any("conv_0/lin_query" in k for k in flat)
    assert all(isinstance(v, np.ndarray) for v in flat.values())
