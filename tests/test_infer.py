"""Serving API (x2gnn_tpu/infer.py): checkpoint restore -> batched
prediction with a closed set of compiled shapes."""

import json
import os

import numpy as np
import pytest

from x2gnn_tpu.data.batching import Budgets, pad_budget_for
from x2gnn_tpu.infer import Predictor, load_run_configs, quantize_budgets
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.train.trainer import Trainer

from tests.test_train import TINY_MODEL, TINY_TRAIN, _tiny_dataset


def test_quantize_budgets_closed_grid():
    b = quantize_budgets(Budgets(37, 190, 2900, 12, 8, 16))
    assert b == Budgets(64, 256, 4096, 16, 0, 0)
    # idempotent: already-quantized budgets are fixed points
    assert quantize_budgets(b) == b


def _trained_run(make_molecule, rng, tmp_path):
    import dataclasses
    graphs, targets = _tiny_dataset(make_molecule, rng)
    tcfg = dataclasses.replace(TINY_TRAIN, ckpt_after_epoch=0)
    wd = tmp_path / "serve_run"
    trainer = Trainer(X2GNN(TINY_MODEL), TINY_MODEL, tcfg, graphs,
                      targets, workdir=str(wd))
    trainer.fit(epochs=2)
    return trainer, graphs, str(wd)


def test_predictor_from_run_matches_trainer_eval(make_molecule, rng,
                                                 tmp_path):
    trainer, graphs, wd = _trained_run(make_molecule, rng, tmp_path)
    pred = Predictor.from_run(wd, batch_size=4)
    out = pred.predict(graphs)
    assert out.shape == (len(graphs),)
    assert np.isfinite(out).all()

    # must agree with the trainer's own EMA forward on the same graphs
    state = trainer.restore(os.path.join(wd, "ckpt_best"))
    import jax
    from x2gnn_tpu.data.batching import batch_iterator
    budgets = quantize_budgets(pad_budget_for(graphs, 4))
    ref = []
    for batch in batch_iterator(graphs, 4, budgets=budgets):
        p = np.asarray(trainer.model.apply(state.ema.params, batch))
        ref.append(p[np.asarray(batch.graph_mask).astype(bool)])
    np.testing.assert_allclose(out, np.concatenate(ref), rtol=1e-5,
                               atol=1e-5)


def test_predictor_live_params_differ_from_ema(make_molecule, rng,
                                               tmp_path):
    _, graphs, wd = _trained_run(make_molecule, rng, tmp_path)
    ema = Predictor.from_run(wd).predict(graphs)
    live = Predictor.from_run(wd, use_ema=False).predict(graphs)
    assert not np.allclose(ema, live)


def test_predictor_destandardizes(make_molecule, rng, tmp_path):
    _, graphs, wd = _trained_run(make_molecule, rng, tmp_path)
    base = Predictor.from_run(wd).predict(graphs)
    with open(os.path.join(wd, "standardization.json"), "w") as f:
        json.dump({"mu": 10.0, "sigma": 2.0}, f)
    scaled = Predictor.from_run(wd).predict(graphs)
    np.testing.assert_allclose(scaled, base * 2.0 + 10.0, rtol=1e-6)


def test_predict_molecules_roundtrip(make_molecule, rng, tmp_path):
    """End-to-end serving: raw molecules -> featurize -> predict, using a
    model trained on the standard 338-dim feature path (zero backend)."""
    import dataclasses
    from x2gnn_tpu.data.dataset import featurize_molecules
    from x2gnn_tpu.data.molecule import Molecule
    mols = [Molecule(*make_molecule(n_atoms=5), labels=float(i), index=i)
            for i in range(8)]
    graphs = featurize_molecules(mols, backend="zero")
    targets = np.array([g.num_atoms for g in graphs], dtype=np.float32)
    mcfg = dataclasses.replace(TINY_MODEL, edge_feat_dim=338)
    tcfg = dataclasses.replace(TINY_TRAIN, ckpt_after_epoch=0,
                               batch_size=4)
    wd = tmp_path / "serve338"
    Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, targets,
            workdir=str(wd)).fit(epochs=1)
    out = Predictor.from_run(str(wd)).predict_molecules(mols[:3],
                                                        backend="zero")
    assert out.shape == (3,) and np.isfinite(out).all()


def test_load_run_configs_reference_schema(tmp_path):
    # the reference's flat config.json schema is accepted unchanged
    cfg = {"embedding_size": 32, "conv_layers": 2, "batch_size": 16}
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    mcfg, tcfg = load_run_configs(str(p))
    assert mcfg.embedding_size == 32 and mcfg.conv_layers == 2
    assert tcfg.batch_size == 16


def test_packed_transfer_matches_default(make_molecule, rng, tmp_path):
    """packed_transfer=True (two-buffer request shipping) must produce
    identical predictions to the default per-array path."""
    trainer, graphs, wd = _trained_run(make_molecule, rng, tmp_path)
    base = Predictor.from_run(wd).predict(graphs)
    packed = Predictor.from_run(wd, packed_transfer=True).predict(graphs)
    np.testing.assert_allclose(packed, base, rtol=1e-6, atol=1e-7)


def test_predictor_refuses_basis_mismatch(make_molecule, rng):
    """A run trained on pyscf-basis features must not silently accept
    native/zero-featurized molecules (VERDICT: the bases are not
    numerically interchangeable)."""
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.molecule import Molecule
    import jax

    cfg = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16,
                      heads=2, sbf_dim=2, rbf_dim=2)
    numbers, pos = make_molecule(n_atoms=5)
    from x2gnn_tpu.data.graphs import build_mol_graph
    g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                        edge_feat_dim=cfg.edge_feat_dim)
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    batch = pad_graphs([g], pad_budget_for([g], 1))
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    pred = Predictor(cfg, params, basis="6-311+g(3df,2p)")
    mols = [Molecule(numbers, pos, np.array([0.0]))]
    with pytest.raises(ValueError, match="basis mismatch"):
        pred.predict_molecules(mols, backend="zero")
    # explicit override works (warning, not error)
    pred2 = Predictor(cfg, params, basis="6-311+g(3df,2p)",
                      allow_basis_mismatch=True)
    with pytest.warns(UserWarning, match="basis mismatch"):
        out = pred2.predict_molecules(mols, backend="zero")
    assert out.shape == (1,)
    # matching basis passes silently; unknown provenance is not checked
    Predictor(cfg, params, basis="zero").predict_molecules(
        mols, backend="zero")
    Predictor(cfg, params).predict_molecules(mols, backend="zero")
