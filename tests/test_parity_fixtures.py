"""Hand-computed parity fixtures + autograd cross-checks.

The per-layer parity harness (tests/test_torch_oracle.py) compares JAX
against utils/torch_oracle.py — the builder's OWN transcription of the
reference, so a shared misreading would pass silently. These tests pin
the riskiest semantics with fixtures computed by hand (or against torch
itself, which IS installed):

  * PyG segment softmax edge cases (sbftransformer_conv.py:151): empty
    segment, single-element segment, masked rows — expected values are
    written out numerically, not derived from any implementation.
  * PyG 2.1 graph-mode LayerNorm (model.py:24,46): a worked example with
    statistics over all (rows x channels) of each graph, biased variance,
    eps inside the sqrt.
  * Embedding max_norm / scale_grad_by_freq / padding_idx
    (atom_embedding.py:14): forward + gradient vs torch.nn.Embedding
    itself, with the documented renorm-gradient divergence isolated to
    over-norm rows.
  * Full-model GRADIENT cross-check of the segment layout vs torch
    autograd through the oracle (previously forward-only).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.ops.segment import segment_softmax


def test_segment_softmax_hand_computed_fixture():
    # segments: id0 = {1.0, 2.0}, id1 = {0.5} (singleton), id2 = {} (empty)
    scores = jnp.asarray([1.0, 2.0, 0.5])
    ids = jnp.asarray([0, 0, 1])
    out = np.asarray(segment_softmax(scores, ids, num_segments=3))
    e = math.exp(1.0)  # exp(2-1)/... after max-shift: [1, e] / (1 + e)
    np.testing.assert_allclose(out[:2], [1 / (1 + e), e / (1 + e)],
                               rtol=1e-6)
    # single-element segment: exactly 1 (PyG softmax of one logit)
    assert out[2] == pytest.approx(1.0)
    # weights sum to 1 within every non-empty segment
    assert out[0] + out[1] == pytest.approx(1.0)


def test_segment_softmax_masked_and_empty_segments():
    scores = jnp.asarray([3.0, 1.0, 1.0, 50.0])
    ids = jnp.asarray([0, 0, 0, 2])
    mask = jnp.asarray([True, True, False, False])
    out = np.asarray(segment_softmax(scores, ids, 3, mask=mask))
    # masked row contributes nothing and gets exactly 0
    assert out[2] == 0.0 and out[3] == 0.0
    e2 = math.exp(2.0)
    np.testing.assert_allclose(out[:2], [e2 / (e2 + 1), 1 / (e2 + 1)],
                               rtol=1e-6)
    # an entirely-masked segment must not NaN anything (segment 2), and
    # segment 1 is empty by construction — no index ever points at it
    assert np.isfinite(out).all()

    # extreme logits: stability comes from the max-shift, not clipping
    big = jnp.asarray([1000.0, 999.0])
    outb = np.asarray(segment_softmax(big, jnp.asarray([0, 0]), 1))
    np.testing.assert_allclose(
        outb, [1 / (1 + math.exp(-1)), math.exp(-1) / (1 + math.exp(-1))],
        rtol=1e-6)


def test_graph_layernorm_worked_example():
    """PyG 2.1 graph mode: stats over ALL (rows x channels) of a graph.

    Graph 0: x = [[1, 3], [5, 7]] -> mean 4, biased var over 4 elements =
    ((1-4)^2 + (3-4)^2 + (5-4)^2 + (7-4)^2)/4 = 5.
    Graph 1: x = [[2, 2]] -> mean 2, var 0 -> output 0 / sqrt(eps).
    """
    from x2gnn_tpu.nn.norm import GraphLayerNorm
    x = jnp.asarray([[1.0, 3.0], [5.0, 7.0], [2.0, 2.0]])
    gids = jnp.asarray([0, 0, 1])
    norm = GraphLayerNorm(eps=1e-8)
    out = np.asarray(norm.apply({}, x, gids, num_graphs=2))
    s = math.sqrt(5.0 + 1e-8)
    np.testing.assert_allclose(
        out[:2], [[-3 / s, -1 / s], [1 / s, 3 / s]], rtol=1e-6)
    # constant graph: centered = 0 everywhere -> exactly 0 (no NaN)
    np.testing.assert_allclose(out[2], [0.0, 0.0], atol=1e-12)

    # a PER-ROW LayerNorm would give [[-1, 1], [-1, 1]] for graph 0 —
    # assert we are NOT doing that (the model.py:24 bug this guards)
    assert not np.allclose(out[0], [-1.0, 1.0], atol=1e-3)


def test_embedding_forward_and_grad_vs_torch():
    """EmbeddingBlock's lookup semantics vs torch.nn.Embedding itself
    (max_norm=3.0, scale_grad_by_freq=True, padding_idx=0,
    atom_embedding.py:14). Forward must match everywhere; gradients must
    match on rows whose norm is under the cap (for over-norm rows the
    torch renorm is an in-place data op with no gradient path — our
    documented divergence routes gradient through the renorm)."""
    import torch

    rng = np.random.default_rng(0)
    vocab, dim = 10, 8
    table = rng.normal(size=(vocab, dim)).astype(np.float32) * 0.5
    table[0] = 0.0                       # padding row
    table[6] *= 10.0                     # push over the max_norm cap
    norms = np.linalg.norm(table, axis=1)
    assert norms[6] > 3.0 and (norms[[1, 7, 8]] < 3.0).all()
    idx = np.array([1, 7, 1, 8, 1, 6, 0], dtype=np.int64)  # repeats + pad

    # ---- torch ----
    emb = torch.nn.Embedding(vocab, dim, padding_idx=0, max_norm=3.0,
                             scale_grad_by_freq=True)
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(table))
    out_t = emb(torch.from_numpy(idx))
    out_t.backward(torch.ones_like(out_t))
    grad_t = emb.weight.grad.numpy().copy()

    # ---- ours (the lookup path of EmbeddingBlock, without the Dense) ----
    def lookup(tbl, numbers):
        n = jnp.sqrt(jnp.sum(tbl * tbl, -1, keepdims=True) + 1e-24)
        tbl = tbl * jnp.minimum(1.0, 3.0 / n)
        from x2gnn_tpu.nn.layers import _freq_scaled_lookup
        return _freq_scaled_lookup(tbl, jnp.asarray(idx))

    out_j, vjp = jax.vjp(lambda t: lookup(t, idx), jnp.asarray(table))
    np.testing.assert_allclose(np.asarray(out_j),
                               out_t.detach().numpy(), rtol=1e-5,
                               atol=1e-6)
    (grad_j,) = vjp(jnp.ones_like(out_j))
    grad_j = np.asarray(grad_j)
    # under-cap rows: exact agreement including the 1/frequency scaling
    # (row 1 appears 3x -> grad = 1/3 per occurrence summed = 1)
    for row in (1, 7, 8):
        np.testing.assert_allclose(grad_j[row], grad_t[row], rtol=1e-5,
                                   atol=1e-6,
                                   err_msg=f"row {row}")
    # padding row: zero grad on BOTH sides (torch padding_idx; our bwd
    # zeroes idx==0 contributions)
    np.testing.assert_allclose(grad_t[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(grad_j[0], 0.0, atol=1e-12)
    # over-cap row 6: torch has NO grad path through the in-place renorm
    # (grad is the renormed-scale-free scatter); ours differs by the
    # renorm jacobian — the DOCUMENTED divergence (DECISIONS.md). Assert
    # it is confined there and bounded.
    assert not np.allclose(grad_j[6], grad_t[6], rtol=1e-5, atol=1e-6)
    # rows never looked up get zero grad on both sides
    for row in (2, 3, 4, 5, 9):
        assert np.all(grad_t[row] == 0) and np.all(grad_j[row] == 0)


def test_embedding_padding_row_grad_matches_torch():
    """Padding-row gradient must be zero exactly like torch's padding_idx
    — otherwise the all-zero row 0 (what padded atoms with Z=0 embed to)
    would drift off zero during training."""
    import torch
    from x2gnn_tpu.nn.layers import _freq_scaled_lookup

    table = np.zeros((4, 3), np.float32)
    table[1:] = 1.0
    idx = np.array([0, 0, 1], np.int64)
    out, vjp = jax.vjp(
        lambda t: _freq_scaled_lookup(t, jnp.asarray(idx)),
        jnp.asarray(table))
    (g,) = vjp(jnp.ones_like(out))
    g = np.asarray(g)
    emb = torch.nn.Embedding(4, 3, padding_idx=0, scale_grad_by_freq=True)
    with torch.no_grad():
        emb.weight.copy_(torch.from_numpy(table))
    o = emb(torch.from_numpy(idx))
    o.backward(torch.ones_like(o))
    gt = emb.weight.grad.numpy()
    np.testing.assert_allclose(g, gt, rtol=1e-6, atol=0)
    assert np.all(g[0] == 0)


def test_segment_layout_grad_vs_torch_autograd(make_molecule, rng):
    """Full-model gradient cross-check: jax.grad of the segment-layout
    X2GNN vs torch.autograd through the oracle transcription, same
    weights, same batch. Catches wrong custom VJPs, masked-softmax
    backward errors, and basis-recurrence gradient bugs that forward
    parity cannot see."""
    import torch
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.graphs import build_mol_graph
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.utils.parity import export_params_flat
    from x2gnn_tpu.utils.torch_oracle import torch_forward

    cfg = ModelConfig(conv_layers=2, in_channels=16, embedding_size=16,
                      heads=4, sbf_dim=3, rbf_dim=3, edge_feat_dim=10,
                      attention_layout="segment")
    graphs = []
    for i in range(3):
        numbers, pos = make_molecule(n_atoms=5 + i)
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=10)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        graphs.append(g)
    batch = pad_graphs(graphs, pad_budget_for(graphs, 3))
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(3), batch)

    def loss_fn(p):
        out = model.apply(p, batch)
        return jnp.where(jnp.asarray(batch.graph_mask), out, 0.0).sum()

    jgrads = jax.grad(loss_fn)(params)
    jflat = export_params_flat(jgrads)

    out_t, _, P = torch_forward(export_params_flat(params), batch, cfg,
                                collect=False, requires_grad=True)
    mask_t = torch.from_numpy(np.asarray(batch.graph_mask))
    out_t.masked_fill(~mask_t, 0.0).sum().backward()

    # per-row lookup counts for the scale_grad_by_freq re-scaling
    numbers = np.asarray(batch.numbers)
    counts = np.bincount(numbers, minlength=10).astype(np.float32)

    checked = 0
    for name, jg in jflat.items():
        tg = P[name].grad
        tgn = (np.zeros_like(np.asarray(jg)) if tg is None
               else tg.detach().numpy())
        jgn = np.asarray(jg)
        if name == "emb_block/embedding":
            # oracle grad is unscaled; ours divides by row frequency
            jgn = jgn * np.maximum(counts, 1.0)[:, None]
        np.testing.assert_allclose(
            jgn, tgn, rtol=2e-4, atol=2e-5,
            err_msg=f"gradient mismatch for {name}")
        checked += 1
    assert checked >= 30   # every parameter tensor cross-checked
