"""Reference-checkpoint bridge: naming, round-trip, and CLI import.

The expected state_dict keys are derived from the reference sources:
xgnn.py:20-34 (mat_trans/emb_trans/emb_block/rbf_layer/fin_model),
model.py:16-22 (edgenn Sequential with SiLU at odd indices, convs,
readouts, bf_skip, af_skip of two ResidualLayers, dense_bf_skip),
sbftransformer_conv.py:50-73 (lin_{key,query,value,edge,skip,sbf,rbf}),
readout.py:15-22 (mlp ModuleList interleaving SiLU -> Linears at 0,2,4),
atom_embedding.py:14-15, residual_layer.py:8-9,
radial_basis_layer.py:32 (trainable frequencies).
"""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.data.synthetic import synthetic_dataset
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.utils.torch_ckpt import (
    export_torch_state_dict, import_torch_state_dict, name_map)

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                  heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8)


def _init(cfg=CFG):
    gs = synthetic_dataset(2, mean_atoms=6, seed=1, edge_feat_dim=8)
    b = pad_graphs(gs, pad_budget_for(gs, 2))
    model = X2GNN(cfg)
    return model, b, model.init(jax.random.PRNGKey(0), b)


def test_names_match_reference_module_tree():
    _, _, params = _init()
    keys = set(name_map(params, mlp_depth=CFG.mlp_depth).values())
    expected_subset = {
        "mat_trans.weight", "mat_trans.bias",
        "emb_trans.weight", "emb_trans.bias",
        "emb_block.embedding.weight",
        "emb_block.lin.weight", "emb_block.lin.bias",
        "rbf_layer.frequencies",
        "fin_model.edgenn.0.weight", "fin_model.edgenn.2.bias",
        "fin_model.convs.0.lin_query.weight",
        "fin_model.convs.1.lin_key.bias",
        "fin_model.convs.0.lin_edge.weight",
        "fin_model.convs.0.lin_sbf.weight",
        "fin_model.convs.0.lin_sbf.bias",
        "fin_model.convs.0.lin_rbf.weight",
        "fin_model.convs.1.lin_skip.weight",
        "fin_model.readouts.0.lin_rbf.weight",
        "fin_model.readouts.2.mlp.0.weight",
        "fin_model.readouts.2.mlp.2.weight",
        "fin_model.readouts.2.mlp.4.bias",   # SiLU at odd indices
        "fin_model.bf_skip.0.lin0.weight",
        "fin_model.af_skip.1.0.lin1.bias",
        "fin_model.af_skip.1.1.lin0.weight",
        "fin_model.dense_bf_skip.1.weight",
    }
    missing = expected_subset - keys
    assert not missing, f"missing reference keys: {sorted(missing)}"


def test_roundtrip_export_import_identity():
    model, b, params = _init()
    sd = export_torch_state_dict(params, mlp_depth=CFG.mlp_depth)
    # torch Linear weights must be (out, in)
    assert sd["mat_trans.weight"].shape == (2 * CFG.embedding_size,
                                            CFG.edge_feat_dim)
    assert sd["emb_block.embedding.weight"].shape == (
        10, CFG.embedding_size)
    restored, report = import_torch_state_dict(sd, params,
                                               mlp_depth=CFG.mlp_depth)
    assert not report["missing"] and not report["unused"]
    for a, c in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    ref = np.asarray(model.apply(params, b))
    got = np.asarray(model.apply(restored, b))
    np.testing.assert_array_equal(got, ref)


def test_import_reports_dead_and_unused_keys():
    _, _, params = _init()
    sd = export_torch_state_dict(params, mlp_depth=CFG.mlp_depth)
    sd["rbf_trans.weight"] = np.zeros((32, 4), np.float32)   # dead (ref)
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    restored, report = import_torch_state_dict(sd, params,
                                               mlp_depth=CFG.mlp_depth)
    assert report["dead"] == ["rbf_trans.weight"]
    assert report["unused"] == ["mystery.weight"]
    assert not report["missing"]


def test_import_rejects_shape_mismatch():
    _, _, params = _init()
    sd = export_torch_state_dict(params, mlp_depth=CFG.mlp_depth)
    sd["mat_trans.weight"] = sd["mat_trans.weight"][:, :4]
    with pytest.raises(ValueError, match="shape mismatch"):
        import_torch_state_dict(sd, params, mlp_depth=CFG.mlp_depth)


def test_cli_import_then_predict(tmp_path):
    """Full flow: a reference-format .pth -> scripts/import_torch_ckpt.py
    -> Predictor.from_run predictions == model.apply(original params)."""
    import torch

    model, b, params = _init()
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in export_torch_state_dict(
              params, mlp_depth=CFG.mlp_depth).items()}
    pth = tmp_path / "ref_ckpt.pth"
    torch.save({"model": sd, "optimizer": {}, "scheduler": {},
                "epoch": 123}, str(pth))
    cfg_json = tmp_path / "config.json"
    import json
    cfg_json.write_text(json.dumps({
        "conv_layers": CFG.conv_layers, "in_channels": CFG.in_channels,
        "embedding_size": CFG.embedding_size, "heads": CFG.heads,
        "sbf_dim": CFG.sbf_dim, "rbf_dim": CFG.rbf_dim,
        "edge_feat_dim": CFG.edge_feat_dim}))
    out = tmp_path / "imported"
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo")
    res = subprocess.run(
        [sys.executable, "/root/repo/scripts/import_torch_ckpt.py",
         "--pth", str(pth), "--config", str(cfg_json), "--out", str(out)],
        env=env, capture_output=True, text=True, timeout=420)
    assert res.returncode == 0, res.stderr
    assert (out / "ckpt_best").is_dir()

    from x2gnn_tpu.infer import Predictor
    pred = Predictor.from_checkpoint(str(out / "ckpt_best"))
    graphs = synthetic_dataset(3, mean_atoms=6, seed=4, edge_feat_dim=8)
    got = pred.predict(graphs)
    ref = []
    for g in graphs:
        bb = pad_graphs([g], pad_budget_for([g], 1))
        ref.append(float(model.apply(params, bb)[0]))
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=1e-5)
