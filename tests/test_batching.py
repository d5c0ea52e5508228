"""Batching tests: padding invariants and index-offset correctness."""

import numpy as np
import pytest

from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for, batch_iterator


def _graphs(make_molecule, k=5):
    gs = []
    for i in range(k):
        numbers, pos = make_molecule()
        gs.append(build_mol_graph(numbers, pos, y=np.array([float(i)]),
                                  index=i))
    return gs


def test_pad_graphs_offsets(make_molecule):
    """Concatenation-order layout — holds when the degree splits are
    disabled (both the two-tier split and the rectangular tiers relabel
    atoms by descending degree; see
    test_pad_graphs_degree_sort_is_pure_relabeling for that contract)."""
    gs = _graphs(make_molecule, 3)
    budgets = pad_budget_for(gs, batch_size=3)._replace(
        n_deg_lo=0, n_hi=0, tiers=())
    b = pad_graphs(gs, budgets)
    a0 = e0 = 0
    for gid, g in enumerate(gs):
        na, ne, nt = g.num_atoms, g.num_edges, g.num_triplets
        np.testing.assert_array_equal(b.numbers[a0:a0 + na], g.numbers)
        np.testing.assert_array_equal(
            b.edge_src[e0:e0 + ne], g.edge_index[0] + a0)
        np.testing.assert_array_equal(
            b.edge_dst[e0:e0 + ne], g.edge_index[1] + a0)
        assert (b.atom_gid[a0:a0 + na] == gid).all()
        assert (b.edge_gid[e0:e0 + ne] == gid).all()
        assert b.y[gid] == pytest.approx(g.y[0])
        a0 += na
        e0 += ne
    # padding region
    assert (b.numbers[a0:] == 0).all()
    assert b.node_mask.sum() == a0
    assert b.edge_mask.sum() == e0
    assert b.graph_mask.sum() == 3


def test_pad_graphs_triplet_indices_point_at_real_edges(make_molecule):
    gs = _graphs(make_molecule, 4)
    b = pad_graphs(gs, pad_budget_for(gs, batch_size=4))
    tm = b.trip_mask
    # real triplets reference real edges, and edge endpoints agree with atoms
    assert b.edge_mask[b.trip_src_edge[tm]].all()
    assert b.edge_mask[b.trip_dst_edge[tm]].all()
    np.testing.assert_array_equal(
        b.edge_src[b.trip_dst_edge[tm]], b.trip_i[tm])
    np.testing.assert_array_equal(
        b.edge_dst[b.trip_dst_edge[tm]], b.trip_j[tm])
    np.testing.assert_array_equal(
        b.edge_src[b.trip_src_edge[tm]], b.trip_j[tm])
    np.testing.assert_array_equal(
        b.edge_dst[b.trip_src_edge[tm]], b.trip_k[tm])


def test_budget_overflow_raises(make_molecule):
    gs = _graphs(make_molecule, 2)
    with pytest.raises(ValueError):
        pad_graphs(gs, (1, 1, 1))


def test_batch_iterator_shapes_static(make_molecule):
    gs = _graphs(make_molecule, 7)
    batches = list(batch_iterator(gs, batch_size=3))
    assert len(batches) == 3
    shapes = {tuple(b.numbers.shape + b.edge_src.shape +
                    b.trip_src_edge.shape) for b in batches}
    assert len(shapes) == 1, "all batches must share one static shape"
    assert batches[-1].graph_mask.sum() == 1  # 7 = 3+3+1


def test_batch_iterator_targets_override(make_molecule):
    gs = _graphs(make_molecule, 4)
    targets = np.arange(4, dtype=np.float32) * 10
    batches = list(batch_iterator(gs, batch_size=2, targets=targets))
    np.testing.assert_allclose(batches[0].y[:2], [0.0, 10.0])
    np.testing.assert_allclose(batches[1].y[:2], [20.0, 30.0])


def test_pad_graphs_degree_sort_is_pure_relabeling(make_molecule):
    """With the two-tier split active, atoms are relabeled by descending
    degree. The relabeling must be pure: same per-graph atom multisets,
    every edge maps to the same (Z_src, Z_dst, distance) endpoints, and
    rows >= n_hi in the blocked table have degree <= d_lo."""
    gs = _graphs(make_molecule, 4)
    budgets = pad_budget_for(gs, batch_size=4)
    plain = pad_graphs(gs, budgets._replace(n_deg_lo=0, n_hi=0,
                                            tiers=()))
    b = pad_graphs(gs, budgets)
    if budgets.n_hi == 0:   # split disabled for this composition
        pytest.skip("degree split not active for these molecules")

    # per-graph atom multisets preserved
    for gid in range(len(gs)):
        np.testing.assert_array_equal(
            np.sort(b.numbers[(b.atom_gid == gid) & b.node_mask]),
            np.sort(gs[gid].numbers))
    # edges carry identical endpoint content (compare as multisets of
    # (gid, Z_src, Z_dst, quantized distance) tuples)
    def edge_set(bb):
        d = np.linalg.norm(bb.positions[bb.edge_src]
                           - bb.positions[bb.edge_dst], axis=1)
        em = bb.edge_mask
        rows = np.stack([bb.edge_gid[em], bb.numbers[bb.edge_src[em]],
                         bb.numbers[bb.edge_dst[em]],
                         np.round(d[em] * 1e5).astype(np.int64)])
        return sorted(map(tuple, rows.T))
    assert edge_set(b) == edge_set(plain)
    # two-tier guarantee: rows >= n_hi have degree <= d_lo
    deg = np.maximum(b.in_mask.sum(1), b.out_mask.sum(1))
    assert (deg[b.n_hi:] <= b.d_lo).all()
    assert b.n_hi == budgets.n_hi and b.d_lo == budgets.n_deg_lo


def test_pad_graphs_without_triplets(make_molecule):
    """with_triplets=False: trip_*/nbr_* emitted empty; everything the
    blocked layout reads is identical to the full batch."""
    gs = _graphs(make_molecule, 3)
    budgets = pad_budget_for(gs, batch_size=3)
    full = pad_graphs(gs, budgets)
    lean = pad_graphs(gs, budgets, with_triplets=False)
    assert lean.trip_src_edge.shape == (0,)
    assert lean.trip_mask.shape == (0,)
    assert lean.nbr_trip.shape[0] == 0
    for f in ("numbers", "positions", "edge_src", "edge_dst", "edge_feat",
              "atom_gid", "edge_gid", "node_mask", "edge_mask", "y",
              "graph_mask", "in_edges", "in_mask", "out_edges", "out_mask",
              "edge_inpos", "edge_outpos"):
        np.testing.assert_array_equal(getattr(lean, f), getattr(full, f),
                                      err_msg=f)
    assert lean.n_hi == full.n_hi and lean.d_lo == full.d_lo


def test_blocked_model_runs_without_triplets(make_molecule):
    """The blocked X2GNN forward works on a triplet-free batch and matches
    the full-batch output (serving fast path)."""
    import jax
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.models import X2GNN
    gs = _graphs(make_molecule, 3)
    budgets = pad_budget_for(gs, batch_size=3)
    full = pad_graphs(gs, budgets)
    lean = pad_graphs(gs, budgets, with_triplets=False)
    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4,
                      edge_feat_dim=gs[0].edge_feat.shape[1],
                      attention_layout="blocked", use_pallas=False)
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), lean)
    np.testing.assert_allclose(np.asarray(model.apply(params, lean)),
                               np.asarray(model.apply(params, full)),
                               rtol=1e-6)


def test_size_bucketed_plan_covers_and_fits():
    from x2gnn_tpu.data.batching import (
        Budgets, pad_budget_for, pad_graphs, size_bucketed_plan)
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    # strongly heterogeneous sizes
    graphs = (synthetic_dataset(20, mean_atoms=6, seed=1)
              + synthetic_dataset(20, mean_atoms=16, seed=2)
              + synthetic_dataset(20, mean_atoms=26, seed=3))
    base = pad_budget_for(graphs, 8)
    idx = np.arange(len(graphs))
    chunks, budgets, stats = size_bucketed_plan(graphs, idx, 8, 4, base)
    # every molecule exactly once
    got = np.sort(np.concatenate(chunks))
    np.testing.assert_array_equal(got, idx)
    assert len(budgets) == len(chunks)
    assert stats["shapes"] <= 4
    # each chunk fits its budget and pads successfully
    for chunk, bud in zip(chunks, budgets):
        gs = [graphs[i] for i in chunk]
        assert sum(g.num_atoms for g in gs) <= bud.n_node
        assert sum(g.num_edges for g in gs) <= bud.n_edge
        assert sum(g.num_triplets for g in gs) <= bud.n_trip
        b = pad_graphs(gs, bud, n_graph=8)
        assert b.trip_mask.sum() == sum(g.num_triplets for g in gs)
    # bucketing must clearly beat the single worst-case budget on
    # occupancy (with only 8 chunks / 2 per class the headroom is modest;
    # at dataset scale the classes are much tighter)
    n_batches = len(chunks)
    single_padded = base.n_trip * n_batches
    occ_single = stats["real"][2] / single_padded
    occ_bucketed = stats["real"][2] / stats["padded"][2]
    assert occ_bucketed > occ_single * 1.3
    assert occ_bucketed > 0.75


def test_trainer_bucketed_budgets_learn_and_log(tmp_path):
    import json
    import os
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer
    import dataclasses
    graphs = (synthetic_dataset(12, mean_atoms=5, seed=4, edge_feat_dim=12)
              + synthetic_dataset(12, mean_atoms=14, seed=5,
                                  edge_feat_dim=12))
    targets = np.array([g.num_atoms for g in graphs], dtype=np.float32)
    mcfg = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16,
                       heads=2, sbf_dim=2, rbf_dim=2, edge_feat_dim=12)
    tcfg = TrainConfig(batch_size=4, max_lr=5e-3, warmup_steps=5,
                       division=(3, 6), ckpt_after_epoch=0,
                       bucket_shapes=3)
    wd = str(tmp_path / "bucketed")
    trainer = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, targets,
                      workdir=wd)
    state, summary = trainer.fit(epochs=2)
    assert np.isfinite(summary["best_val_mae"])
    rec = [json.loads(l) for l in open(os.path.join(wd,
                                                    "metrics.jsonl"))][-1]
    assert rec["occupancy_triplets"] > 0.75
    assert 1 <= rec["budget_shapes"] <= 3
    assert rec["triplets_per_sec"] > 0
    # a mesh with bucketing auto-upgrades to mixed-FFD packing (one
    # shape stacks across devices; round 5, VERDICT r4 #10)
    import jax
    if jax.device_count() > 1:
        from x2gnn_tpu.parallel import make_mesh
        import pytest as _pytest
        with _pytest.warns(UserWarning, match="pack-mixed"):
            tr2 = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, targets,
                          workdir=wd, mesh=make_mesh())
        assert tr2.pack_mixed and tr2.bucket_shapes == 0


def test_geometry_standin_matches_featurized_structure():
    """featurize=False must reproduce the featurized dataset's STRUCTURE
    exactly (the precompile-ahead trick depends on identical budgets)."""
    from x2gnn_tpu.data.synthetic import synthetic_labeled_graph
    for i in (0, 5):
        a = synthetic_labeled_graph(i, featurize=False)
        b = synthetic_labeled_graph(i, featurize=True)
        np.testing.assert_array_equal(a.numbers, b.numbers)
        np.testing.assert_allclose(a.positions, b.positions)
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.triplet_index, b.triplet_index)
        assert np.isfinite(b.y).all() and b.edge_feat.any()
        assert not a.edge_feat.any()


def test_pack_to_budget_plan_covers_fits_and_fills():
    from x2gnn_tpu.data.batching import pad_budget_for, size_bucketed_plan
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    graphs = (synthetic_dataset(30, mean_atoms=6, seed=11)
              + synthetic_dataset(30, mean_atoms=16, seed=12)
              + synthetic_dataset(30, mean_atoms=26, seed=13))
    base = pad_budget_for(graphs, 8)
    idx = np.arange(len(graphs))
    fixed = size_bucketed_plan(graphs, idx, 8, 4, base, pack=False)
    packed = size_bucketed_plan(graphs, idx, 8, 4, base, pack=True)
    chunks, budgets, stats = packed
    # every molecule exactly once
    np.testing.assert_array_equal(np.sort(np.concatenate(chunks)), idx)
    for chunk, bud in zip(chunks, budgets):
        gs = [graphs[i] for i in chunk]
        assert sum(g.num_atoms for g in gs) <= bud.n_node
        assert sum(g.num_edges for g in gs) <= bud.n_edge
        assert sum(g.num_triplets for g in gs) <= bud.n_trip
        assert bud.n_graph >= len(chunk)
    # fewer steps, strictly better occupancy than fixed-count batches,
    # and no new compute shapes
    assert len(chunks) < len(fixed[0])
    occ_fixed = fixed[2]["real"][0] / fixed[2]["padded"][0]
    occ_packed = stats["real"][0] / stats["padded"][0]
    assert occ_packed > occ_fixed
    # tiny 90-molecule set: few batches per class caps the gain; at
    # dataset scale (50k stand-in) the planner measures 0.98 nodes
    assert occ_packed > 0.8
    fixed_nshapes = {(b.n_node, b.n_edge, b.n_trip) for b in fixed[1]}
    packed_nshapes = {(b.n_node, b.n_edge, b.n_trip) for b in budgets}
    assert packed_nshapes == fixed_nshapes
    # deterministic
    again = size_bucketed_plan(graphs, idx, 8, 4, base, pack=True)
    for a, b in zip(chunks, again[0]):
        np.testing.assert_array_equal(a, b)


def test_trainer_pack_budget_trains_and_counts_steps(tmp_path):
    import json
    import os
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer
    graphs = (synthetic_dataset(16, mean_atoms=5, seed=21, edge_feat_dim=12)
              + synthetic_dataset(16, mean_atoms=14, seed=22,
                                  edge_feat_dim=12))
    targets = np.array([g.num_atoms for g in graphs], dtype=np.float32)
    mcfg = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16,
                       heads=2, sbf_dim=2, rbf_dim=2, edge_feat_dim=12,
                       attention_layout="blocked")
    tcfg = TrainConfig(batch_size=4, max_lr=5e-3, warmup_steps=5,
                       division=(4, 8), ckpt_after_epoch=0,
                       bucket_shapes=3, pack_budget=True)
    wd = str(tmp_path / "packed")
    trainer = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, targets,
                      workdir=wd)
    assert trainer._steps_per_epoch() <= -(-24 // 4)
    state, summary = trainer.fit(epochs=2)
    assert np.isfinite(summary["best_val_mae"])
    rec = [json.loads(l) for l in open(os.path.join(wd,
                                                    "metrics.jsonl"))][-1]
    assert rec["occupancy_nodes"] > 0.8
    # pack without buckets must refuse loudly
    import dataclasses
    import pytest as _pytest
    with _pytest.raises(ValueError, match="pack_budget"):
        Trainer(X2GNN(mcfg), mcfg,
                dataclasses.replace(tcfg, bucket_shapes=0),
                graphs, targets, workdir=wd)


def test_mixed_packed_plan(rng, make_molecule):
    """Round-3 mixed-composition FFD packing: one shape, every molecule
    placed exactly once, budgets respected, batches span sizes."""
    from x2gnn_tpu.data.batching import (mixed_packed_plan, pad_budget_for,
                                         pad_graphs)
    from x2gnn_tpu.data.graphs import build_mol_graph
    gs = []
    for i in range(60):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(4, 20)))
        gs.append(build_mol_graph(numbers, pos, y=np.array([float(i)]),
                                  edge_feat_dim=8))
    base = pad_budget_for(gs, 8)
    idx = np.arange(60)
    chunks, budgets, stats = mixed_packed_plan(gs, idx, 8, base)
    # exact cover
    seen = np.concatenate(chunks)
    assert sorted(seen.tolist()) == list(range(60))
    # one shape
    assert stats["shapes"] == 1
    b = budgets[0]
    for c in chunks:
        assert sum(gs[i].num_atoms for i in c) <= b.n_node
        assert sum(gs[i].num_edges for i in c) <= b.n_edge
        assert sum(gs[i].num_triplets for i in c) <= b.n_trip
        assert len(c) <= (b.n_graph or 8)
        # pads and trains
        batch = pad_graphs([gs[i] for i in c], b,
                           n_graph=b.n_graph or 8,
                           targets=np.array([gs[i].y[0] for i in c],
                                            np.float32))
        assert batch.numbers.shape[0] == b.n_node
    # composition diversity: at least one batch mixes small and large
    spans = [max(gs[i].num_atoms for i in c) - min(gs[i].num_atoms
             for i in c) for c in chunks if len(c) > 2]
    assert spans and max(spans) >= 5


def test_trainer_pack_mixed_end_to_end(tmp_path, rng):
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer
    graphs = synthetic_dataset(80, mean_atoms=10, seed=9)
    y = np.array([g.y[0] for g in graphs], np.float32)
    y = (y - y.mean()) / (y.std() + 1e-9)
    mcfg = ModelConfig(attention_layout="blocked", conv_layers=2,
                       in_channels=32, embedding_size=32, heads=4,
                       sbf_dim=3, rbf_dim=4)
    tcfg = TrainConfig(batch_size=8, warmup_steps=5, ckpt_after_epoch=0,
                       pack_mixed=True)
    tr = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, y,
                 workdir=str(tmp_path))
    state, summary = tr.fit(epochs=2)
    assert np.isfinite(summary["best_val_mae"])
    import json
    rec = json.loads(open(str(tmp_path) + "/metrics.jsonl"
                          ).readlines()[-1])
    assert rec["budget_shapes"] == 1
    assert "occupancy_pairs" in rec


def test_trainer_pack_mixed_composes_with_dp_mesh(tmp_path, rng):
    """Round-4 (VERDICT r3 #6): --pack-mixed (ONE shape per bin) stacks
    under a DP mesh; bucket_shapes (multi-shape) stays rejected."""
    import pytest
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import make_mesh
    from x2gnn_tpu.train.trainer import Trainer
    graphs = synthetic_dataset(64, mean_atoms=10, seed=9)
    y = np.array([g.y[0] for g in graphs], np.float32)
    y = (y - y.mean()) / (y.std() + 1e-9)
    mcfg = ModelConfig(attention_layout="blocked", conv_layers=2,
                       in_channels=32, embedding_size=32, heads=4,
                       sbf_dim=3, rbf_dim=4)
    tcfg = TrainConfig(batch_size=8, warmup_steps=5, ckpt_after_epoch=0,
                       pack_mixed=True)
    mesh = make_mesh(4)
    tr = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, y,
                 workdir=str(tmp_path / "dp"), mesh=mesh)
    state, summary = tr.fit(epochs=2)
    assert np.isfinite(summary["best_val_mae"])
    import json
    losses = [json.loads(l)["loss"]
              for l in open(tmp_path / "dp" / "metrics.jsonl")]
    assert losses[-1] < losses[0]
    # multi-shape plans on a mesh auto-upgrade to mixed-FFD packing
    with pytest.warns(UserWarning, match="pack-mixed"):
        tr2 = Trainer(X2GNN(mcfg), mcfg,
                      TrainConfig(batch_size=8, bucket_shapes=4),
                      graphs, y, workdir=str(tmp_path / "x"), mesh=mesh)
    assert tr2.pack_mixed and tr2.bucket_shapes == 0


def test_trainer_pack_mixed_with_edge_partition(tmp_path, rng):
    """pack-mixed bins share one shape, so the EP path (one bin per
    step) just works; fp16 feature wire now allowed on EP too."""
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import make_mesh
    from x2gnn_tpu.train.trainer import Trainer
    graphs = synthetic_dataset(32, mean_atoms=8, seed=4, edge_feat_dim=8)
    y = np.array([g.y[0] for g in graphs], np.float32)
    mcfg = ModelConfig(attention_layout="blocked", conv_layers=2,
                       in_channels=32, embedding_size=32, heads=4,
                       sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                       use_pallas=False)
    tcfg = TrainConfig(batch_size=8, warmup_steps=3, ckpt_after_epoch=0,
                       pack_mixed=True)
    tr = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, y,
                 workdir=str(tmp_path), mesh=make_mesh(8),
                 edge_partition="allgather", feat_dtype="float16")
    state, summary = tr.fit(epochs=1)
    assert np.isfinite(summary["best_val_mae"])


def test_ep_fp16_features_close_to_f32(rng, make_molecule):
    """fp16 feature wire on the EP path: forward within fp16 tolerance
    of the f32 wire."""
    import jax
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.graphs import build_mol_graph
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import (
        make_mesh, make_ep_batch, shard_ep_batch, make_ep_forward)
    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                      attention_layout="blocked", use_pallas=False)
    graphs = []
    for i in range(4):
        numbers, pos = make_molecule(n_atoms=6 + i)
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        graphs.append(g)
    batch = pad_graphs(graphs, pad_budget_for(graphs, 4))
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(8)
    epb32 = make_ep_batch(batch, 8)
    b16 = batch.replace(edge_feat=np.asarray(batch.edge_feat,
                                             np.float16))
    epb16 = make_ep_batch(b16, 8)
    assert epb16.feat_blk.dtype == np.float16
    fwd = make_ep_forward(cfg, mesh, epb32.numbers.shape[0])
    a = np.asarray(fwd(params, shard_ep_batch(epb32, mesh)))
    b = np.asarray(fwd(params, shard_ep_batch(epb16, mesh)))
    np.testing.assert_allclose(b, a, rtol=2e-2, atol=2e-2)


def test_plan_degree_tiers_invariants():
    """Tier DP: increasing 8-aligned boundaries ending at n_node,
    di exact / dk = round8(di), capacity never above the square window,
    and never above the two-tier optimum for the same counts."""
    from x2gnn_tpu.data.batching import plan_degree_tiers
    rng = np.random.default_rng(0)
    for trial in range(20):
        n_node = int(rng.integers(4, 60)) * 8
        cap = int(rng.integers(4, 40))
        # synthetic exceed-count profile: decreasing in d
        raw = np.sort(rng.integers(0, n_node, size=cap + 1))[::-1]
        raw[cap] = 0   # nothing exceeds the cap
        tiers = plan_degree_tiers(n_node, cap, raw)
        if not tiers:
            continue
        prev_end, prev_di = 0, 10 ** 9
        capacity = 0
        for (end, di, dk) in tiers:
            assert end > prev_end
            assert end == n_node or end % 8 == 0
            assert di < prev_di
            assert dk == ((di + 7) // 8) * 8
            # guarantee feasible: rows exceeding di fit above the tier
            need = ((int(raw[di]) + 7) // 8) * 8 if di < len(raw) else 0
            assert min(need, n_node) <= prev_end
            capacity += (end - prev_end) * di * dk
            prev_end, prev_di = end, di
        assert prev_end == n_node
        square = n_node * cap * (((cap + 7) // 8) * 8)
        assert capacity <= square


def test_pad_graphs_tier_guarantee(make_molecule):
    """After the degree sort, every tier's rows respect its di bound."""
    gs = _graphs(make_molecule, 4)
    bud = pad_budget_for(gs, batch_size=4)
    if not bud.tiers:
        pytest.skip("no tiers for this composition")
    b = pad_graphs(gs, bud)
    deg = np.maximum(
        np.bincount(b.edge_dst[b.edge_mask], minlength=len(b.numbers)),
        np.bincount(b.edge_src[b.edge_mask], minlength=len(b.numbers)))
    prev = 0
    for (end, di, dk) in b.tiers:
        assert deg[prev:end].max(initial=0) <= di
        prev = end
    assert prev == len(b.numbers)


def test_mixed_packed_plan_emits_tiers(make_molecule):
    """pack-mixed budgets carry tiers whose capacity is at most the
    two-tier capacity the round-4 plan would have used."""
    from x2gnn_tpu.data.batching import mixed_packed_plan
    gs = _graphs(make_molecule, 24)
    base = pad_budget_for(gs, batch_size=6)
    chunks, budgets, stats = mixed_packed_plan(
        gs, np.arange(len(gs)), 6, base)
    bud = budgets[0]
    if not bud.tiers:
        pytest.skip("no tiers for this composition")
    # every chunk padded with the tier budgets must validate
    for c in chunks:
        pad_graphs([gs[i] for i in c], bud, n_graph=bud.n_graph)
    real, padded = stats["pairs"]
    assert real <= padded
