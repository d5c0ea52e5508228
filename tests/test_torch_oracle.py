"""Cross-framework numerics parity: the JAX model vs a plain-PyTorch
transcription of the reference forward with transplanted weights
(BASELINE's per-layer allclose north star, as far as this environment
allows — PyG/torch-scatter are not installable, core torch is)."""

import dataclasses

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.utils.parity import export_params_flat
from x2gnn_tpu.utils.torch_oracle import torch_forward

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                  heads=4, sbf_dim=4, rbf_dim=3, edge_feat_dim=12,
                  attention_layout="segment")


def _setup(make_molecule, rng, readout="atomwise"):
    cfg = dataclasses.replace(CFG, readout=readout)
    gs = []
    for i in range(3):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=12)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        gs.append(g)
    b = pad_graphs(gs, pad_budget_for(gs, 3))
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), b)
    return cfg, model, params, b


@pytest.mark.parametrize("readout", ["atomwise", "molwise_mean",
                                     "molwise_add"])
def test_torch_oracle_output_matches(make_molecule, rng, readout):
    cfg, model, params, b = _setup(make_molecule, rng, readout)
    ref = np.asarray(model.apply(params, b))
    out, _ = torch_forward(export_params_flat(params), b, cfg)
    np.testing.assert_allclose(out.numpy(), ref, rtol=2e-4, atol=2e-5)


def test_torch_oracle_per_layer(make_molecule, rng):
    """Per-layer activations agree — checks every basis formula, the
    segment softmax, the graph LayerNorm, and the readouts separately."""
    cfg, model, params, b = _setup(make_molecule, rng)
    _, state = model.apply(params, b, capture_intermediates=True,
                           mutable=["intermediates"])
    inter = state["intermediates"]
    _, acts = torch_forward(export_params_flat(params), b, cfg)
    em = np.asarray(b.edge_mask)

    def jx(path):
        node = inter
        for part in path:
            node = node[part]
        return np.asarray(node["__call__"][0])

    for i in range(cfg.conv_layers):
        ours = jx((f"conv_{i}",))
        theirs = acts[f"conv_{i}"]
        np.testing.assert_allclose(
            theirs[em], ours[em], rtol=2e-4, atol=2e-5,
            err_msg=f"conv_{i} activations diverge")
        ours_n = jx((f"norm_{i}",))
        np.testing.assert_allclose(
            acts[f"norm_{i}"][em], ours_n[em], rtol=5e-4, atol=5e-5,
            err_msg=f"norm_{i} activations diverge")
    np.testing.assert_allclose(
        acts["readout_0"], jx(("readout_0",)), rtol=2e-4, atol=2e-5,
        err_msg="readout_0 diverges")
    np.testing.assert_allclose(
        acts["sbf"], np.asarray(
            jnp_sbf(cfg, b)), rtol=2e-4, atol=2e-5,
        err_msg="2D basis diverges")


def jnp_sbf(cfg, b):
    """The JAX-side per-triplet basis for the same batch (the quantity
    feeding lin_sbf), recomputed standalone."""
    import jax.numpy as jnp
    from x2gnn_tpu.ops.basis import sbf_2d
    pos = b.positions
    edge_mask = jnp.asarray(b.edge_mask)
    diff = pos[b.edge_src] - pos[b.edge_dst]
    d = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 1e-24))
    d_safe = jnp.where(edge_mask, d, 1.0)
    ji = pos[b.trip_i] - pos[b.trip_j]
    jk = pos[b.trip_k] - pos[b.trip_j]
    cos_a = (ji * jk).sum(-1)
    sin_a = jnp.sqrt(jnp.maximum((jnp.cross(ji, jk) ** 2).sum(-1), 1e-24))
    theta = jnp.arctan2(sin_a, cos_a)
    return sbf_2d(d_safe, theta, b.trip_src_edge, cfg.sbf_dim, cfg.rbf_dim,
                  cfg.cutoff, cfg.envelope_exponent, edge_mask=edge_mask)
