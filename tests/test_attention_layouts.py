"""Layout equivalence: padded neighbor-table attention must match the COO
segment path exactly (same math, different data layout), at the op level
and through the full model."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.ops.attention import segment_attention, padded_attention

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32, heads=4,
                  sbf_dim=3, rbf_dim=4, edge_feat_dim=24)


def _batch(make_molecule, rng, k=4):
    gs = []
    for i in range(k):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 12)))
        g = build_mol_graph(numbers, pos, y=np.array([float(i)]),
                            edge_feat_dim=24)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(np.float32)
        gs.append(g)
    return pad_graphs(gs, pad_budget_for(gs, k))


def test_op_level_equivalence(make_molecule, rng):
    b = _batch(make_molecule, rng)
    E = b.edge_src.shape[0]
    T = b.trip_src_edge.shape[0]
    H, C = 4, 8
    q = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(E, H, C)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(T, H, C)), jnp.float32)
    s = jnp.asarray(rng.normal(size=(T, H, C)), jnp.float32)

    seg = segment_attention(q, k, v, e, s,
                            jnp.asarray(b.trip_src_edge),
                            jnp.asarray(b.trip_dst_edge),
                            jnp.asarray(b.trip_mask), E)
    pad = padded_attention(q, k, v, e, s,
                           jnp.asarray(b.nbr_trip),
                           jnp.asarray(b.nbr_src),
                           jnp.asarray(b.nbr_mask))
    np.testing.assert_allclose(np.asarray(seg), np.asarray(pad),
                               rtol=2e-4, atol=1e-5)


def test_model_level_equivalence(make_molecule, rng):
    b = _batch(make_molecule, rng)
    model_seg = X2GNN(dataclasses.replace(CFG, attention_layout="segment"))
    model_pad = X2GNN(dataclasses.replace(CFG, attention_layout="padded"))
    params = model_seg.init(jax.random.PRNGKey(0), b)
    out_seg = np.asarray(model_seg.apply(params, b))
    out_pad = np.asarray(model_pad.apply(params, b))
    np.testing.assert_allclose(out_seg, out_pad, rtol=2e-4, atol=1e-5)


def test_blocked_model_equivalence(make_molecule, rng):
    """Atom-blocked layout must match the segment layout with the SAME
    parameter tree (init with one, apply with the other)."""
    b = _batch(make_molecule, rng)
    model_seg = X2GNN(dataclasses.replace(CFG, attention_layout="segment"))
    model_blk = X2GNN(dataclasses.replace(CFG, attention_layout="blocked"))
    params = model_seg.init(jax.random.PRNGKey(0), b)
    # same param tree structure
    params_blk = model_blk.init(jax.random.PRNGKey(0), b)
    a = jax.tree_util.tree_structure(params)
    btree = jax.tree_util.tree_structure(params_blk)
    assert a == btree, "parameter trees must be interchangeable"
    out_seg = np.asarray(model_seg.apply(params, b))
    out_blk = np.asarray(model_blk.apply(params, b))
    np.testing.assert_allclose(out_seg, out_blk, rtol=5e-4, atol=5e-5)


def test_injective_gather_grads(make_molecule, rng):
    """Custom-VJP gathers must match plain-gather autodiff exactly."""
    import jax.numpy as jnp
    from x2gnn_tpu.ops.attention import blocked_to_edges, injective_gather
    b = _batch(make_molecule, rng)
    E = b.edge_src.shape[0]
    N, D = b.in_edges.shape
    x = jnp.asarray(rng.normal(size=(E, 16)), jnp.float32)
    tbl = jnp.asarray(b.out_edges)
    pos = jnp.asarray(b.edge_outpos)
    em = jnp.asarray(b.edge_mask)
    om = jnp.asarray(b.out_mask)

    # forward identical
    np.testing.assert_array_equal(
        np.asarray(injective_gather(x, tbl, pos, em)), np.asarray(x[tbl]))

    # backward: compare against autodiff of the plain gather, with
    # cotangents masked like real attention grads (pad slots zero)
    g_blk = jnp.asarray(rng.normal(size=(N, D, 16)), jnp.float32)
    g_blk = jnp.where(om[..., None], g_blk, 0.0)

    def loss_plain(x):
        return (x[tbl] * g_blk).sum()

    def loss_inj(x):
        return (injective_gather(x, tbl, pos, em) * g_blk).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_inj)(x)),
        np.asarray(jax.grad(loss_plain)(x)), rtol=1e-6, atol=1e-6)

    # blocked_to_edges: fwd + bwd vs plain indexing
    xb = jnp.asarray(rng.normal(size=(N, D, 16)), jnp.float32)
    ipos = jnp.asarray(b.edge_inpos)
    itbl = jnp.asarray(b.in_edges)
    imask = jnp.asarray(b.in_mask)
    np.testing.assert_array_equal(
        np.asarray(blocked_to_edges(xb, ipos, itbl, imask)),
        np.asarray(xb.reshape(N * D, 16)[ipos]))
    ge = jnp.asarray(rng.normal(size=(E, 16)), jnp.float32)
    ge = jnp.where(em[:, None], ge, 0.0)   # pad edges carry no cotangent

    def loss_plain2(xb):
        return (xb.reshape(N * D, 16)[ipos] * ge).sum()

    def loss_b2e(xb):
        return (blocked_to_edges(xb, ipos, itbl, imask) * ge).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_b2e)(xb)),
        np.asarray(jax.grad(loss_plain2)(xb)), rtol=1e-6, atol=1e-6)


def test_blocked_tables_consistent(make_molecule, rng):
    b = _batch(make_molecule, rng)
    em = b.edge_mask
    # every real edge appears exactly once in the in-table and out-table
    in_listed = b.in_edges[b.in_mask]
    out_listed = b.out_edges[b.out_mask]
    E_real = int(em.sum())
    assert sorted(in_listed.tolist()) == list(range(E_real))
    assert sorted(out_listed.tolist()) == list(range(E_real))
    rows, cols = np.nonzero(b.in_mask)
    np.testing.assert_array_equal(b.edge_dst[b.in_edges[rows, cols]], rows)
    rows, cols = np.nonzero(b.out_mask)
    np.testing.assert_array_equal(b.edge_src[b.out_edges[rows, cols]], rows)
    # edge_inpos inverts the in-table
    D = b.in_edges.shape[1]
    flat = b.in_edges.reshape(-1)
    for e in np.nonzero(em)[0][:50]:
        assert flat[b.edge_inpos[e]] == e


def test_neighbor_tables_consistent(make_molecule, rng):
    b = _batch(make_molecule, rng)
    T = int(b.trip_mask.sum())
    # every real triplet appears exactly once in the neighbor tables
    listed = b.nbr_trip[b.nbr_mask]
    assert sorted(listed.tolist()) == list(range(T))
    # and in the row of its destination edge with the right source edge
    rows, cols = np.nonzero(b.nbr_mask)
    np.testing.assert_array_equal(b.trip_dst_edge[b.nbr_trip[rows, cols]],
                                  rows)
    np.testing.assert_array_equal(b.nbr_src[rows, cols],
                                  b.trip_src_edge[b.nbr_trip[rows, cols]])


def test_beta_layout_equivalence(make_molecule, rng):
    """The beta-gated skip must stay layout-equivalent (same param tree)."""
    b = _batch(make_molecule, rng)
    cfg_s = dataclasses.replace(CFG, attention_layout="segment", beta=True)
    cfg_b = dataclasses.replace(CFG, attention_layout="blocked", beta=True)
    model_seg = X2GNN(cfg_s)
    model_blk = X2GNN(cfg_b)
    params = model_seg.init(jax.random.PRNGKey(0), b)
    out_seg = np.asarray(model_seg.apply(params, b))
    out_blk = np.asarray(model_blk.apply(params, b))
    np.testing.assert_allclose(out_seg, out_blk, rtol=5e-4, atol=5e-5)
