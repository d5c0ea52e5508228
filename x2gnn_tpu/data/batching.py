"""Static-shape graph batching: concatenate + pad to fixed budgets.

This replaces PyG's dynamic `Batch` (used throughout the reference trainer,
trainer.py:25-27). On TPU every jitted step must have static shapes, so a
batch of molecules is concatenated and padded to fixed (nodes, edges,
triplets) budgets. Padding convention:

  * pad atoms have atomic number 0 (the embedding padding index,
    atom_embedding.py:14) and position 0;
  * pad edges/triplets carry index 0 everywhere and are excluded via the
    boolean masks — every segment op in `x2gnn_tpu.ops.segment` masks its
    inputs, so index-0 slots never receive spurious contributions;
  * per-entity graph ids (`*_gid`) let graph-wise ops (LayerNorm over a
    molecule's edges, molecule pooling) run as masked segment ops.
"""

from __future__ import annotations

from typing import Iterator, List, NamedTuple, Optional, Sequence, Tuple, Union

import numpy as np
from flax import struct

from x2gnn_tpu.data.graphs import MolGraph


class Budgets(NamedTuple):
    """Static padding budgets shared by every batch of a run."""

    n_node: int
    n_edge: int
    n_trip: int
    n_deg: int   # max triplets per destination edge (neighbor-table width)
    # two-tier degree split for the blocked kernels (0 = disabled): atoms
    # are degree-sorted per batch; rows >= n_hi are guaranteed to have
    # degree <= n_deg_lo, so the kernel can process them in a (d_lo x
    # d_lo) window instead of (D x D) — reclaiming the pad compute of
    # the (much more numerous) low-degree atoms.
    n_deg_lo: int = 0
    n_hi: int = 0
    # graph-slot budget for pack-to-budget batches (0 = the trainer's
    # batch_size): packed batches hold MORE (small) molecules than the
    # nominal batch size, so the static graph dimension must cover the
    # largest packed count in the budget class
    n_graph: int = 0
    # rectangular multi-tier degree windows (round 5): tuple of
    # (end_row, di, dk) with increasing end rows, the last == n_node.
    # Atoms are degree-sorted per batch; rows [end_{t-1}, end_t) are
    # guaranteed degree <= di_t and run the fused kernel in an EXACT-di
    # x rounded-8-dk window (di collapses into the slab row dim — no
    # sublane alignment cost; only dk pays the 8-rounding). Supersedes
    # the two-tier (n_deg_lo, n_hi) split for the blocked Pallas path;
    # () = disabled.
    tiers: tuple = ()


@struct.dataclass
class GraphBatch:
    """A fixed-shape batch of molecular graphs (a pytree of jnp/np arrays).

    Shapes: N = node budget, E = edge budget, T = triplet budget,
    G = graph budget, F = integral feature dim.
    """

    numbers: np.ndarray        # (N,) int32, 0 = padding
    positions: np.ndarray      # (N, 3) float32
    edge_src: np.ndarray       # (E,) int32 source atom of each edge
    edge_dst: np.ndarray       # (E,) int32 destination atom
    edge_feat: np.ndarray      # (E, F) float32
    trip_src_edge: np.ndarray  # (T,) int32 source edge (j->k)
    trip_dst_edge: np.ndarray  # (T,) int32 destination edge (i->j)
    trip_j: np.ndarray         # (T,) int32 media atom
    trip_i: np.ndarray         # (T,) int32 start atom
    trip_k: np.ndarray         # (T,) int32 end atom
    atom_gid: np.ndarray       # (N,) int32 graph id per atom
    edge_gid: np.ndarray       # (E,) int32 graph id per edge
    node_mask: np.ndarray      # (N,) bool
    edge_mask: np.ndarray      # (E,) bool
    trip_mask: np.ndarray      # (T,) bool
    y: np.ndarray              # (G,) float32 training target
    graph_mask: np.ndarray     # (G,) bool
    # --- padded neighbor layout (TPU performance path) ---
    # Per destination edge, the triplets flowing into it, padded to a static
    # max degree D. Turns segment softmax + scatter into dense masked ops
    # over (E, D) — regular compute the MXU/VPU can tile.
    nbr_trip: np.ndarray       # (E, D) int32 triplet ids, 0 = padding
    nbr_src: np.ndarray        # (E, D) int32 source edge of each triplet
    nbr_mask: np.ndarray       # (E, D) bool
    # --- atom-blocked layout (fastest path) ---
    # All triplets of a destination edge (i->j) draw K/V from the out-edges
    # of the shared media atom j, and the per-triplet edge_attr is a pure
    # function of j (xgnn.py:57-58). Blocking by atom j turns the whole
    # conv into per-atom dense (deg x deg) attention with NO
    # triplet-indexed tensors: Q rows = in-edges of j, K/V rows = out-edges
    # of j, backtracking (atom_i == atom_k) masked in-model.
    in_edges: np.ndarray       # (N, D) int32 edge ids with dst atom = n
    in_mask: np.ndarray        # (N, D) bool
    out_edges: np.ndarray      # (N, D) int32 edge ids with src atom = n
    out_mask: np.ndarray       # (N, D) bool
    edge_inpos: np.ndarray     # (E,) int32 flat n*D+slot of each edge in
                               # the in-table (blocked -> E-layout gather)
    edge_outpos: np.ndarray    # (E,) int32 flat n*D+slot of each edge in
                               # the out-table (every edge occupies exactly
                               # one slot in each table, so blocked-layout
                               # gathers are injective and their backward
                               # is a gather too — no scatter anywhere)
    # per-edge dequantization scale when edge_feat rides the wire as
    # int8 (feat_dtype='int8', round 5): x = int8 * scale. None for
    # float wire dtypes (the model multiplies only when present).
    edge_feat_scale: Optional[np.ndarray] = None
    # static (non-pytree) two-tier degree split: atoms are sorted by
    # descending degree, rows >= n_hi all have degree <= d_lo (0 = off)
    n_hi: int = struct.field(pytree_node=False, default=0)
    d_lo: int = struct.field(pytree_node=False, default=0)
    # static rectangular degree tiers ((end_row, di, dk), ...) — see
    # Budgets.tiers; () = disabled. The same descending degree sort
    # backs both splits, so both guarantees hold simultaneously.
    tiers: tuple = struct.field(pytree_node=False, default=())

    @property
    def num_graphs(self) -> int:
        return int(self.y.shape[0])


def _max_degree(g: MolGraph) -> int:
    """Max atom degree — bounds both triplets-per-dst-edge (= deg(j) - 1)
    and the atom in/out table widths (= deg)."""
    if g.num_edges == 0:
        return 0
    return int(max(
        np.bincount(g.edge_index[0], minlength=g.num_atoms).max(),
        np.bincount(g.edge_index[1], minlength=g.num_atoms).max()))


def plan_degree_tiers(
    n_node: int,
    cap_deg: int,
    cnt_over,
    max_tiers: int = 8,
    multiple: int = 8,
) -> tuple:
    """Choose rectangular degree tiers minimizing pair-slab capacity.

    The fused kernel's heavy ops run on (rows, dk*128-lane) slabs where
    the query width di collapses into the row dimension (exact — no
    alignment), while the key width dk pays 8-sublane rounding. So the
    per-row window cost is di * round8(dk) and the OPTIMAL tier set for
    a degree distribution comes from a small DP over thresholds:
    f_k(d) = cost of covering rows [cnt_over(d), n_node) with <= k
    tiers whose topmost window is d.

    cnt_over[d] (d = 0..cap_deg) = worst-case number of atom rows whose
    degree EXCEEDS d in any batch this budget serves (the same
    composition-independent quantity the two-tier n_hi uses).

    Returns tiers = ((end_row, di, dk), ...), end rows increasing (each
    a multiple of `multiple` except the last = n_node); rows
    [end_{t-1}, end_t) are guaranteed degree <= di_t. () if a single
    full-width tier is optimal (no split helps).
    """
    def r8(v):
        return ((max(int(v), 1) + multiple - 1) // multiple) * multiple

    def ru_row(v):
        return min(((int(v) + multiple - 1) // multiple) * multiple,
                   n_node)

    cap_deg = max(int(cap_deg), 1)
    cnt = [ru_row(cnt_over[d]) if d < len(cnt_over) else 0
           for d in range(cap_deg + 1)]
    w = [d * r8(d) for d in range(cap_deg + 1)]
    # f[k][d] = min cost covering rows [cnt[d], n_node) with <= k tiers,
    # topmost window d; nxt[k][d] = the next (smaller) window, or None
    # when tier d runs to the end. O(max_tiers * cap_deg^2), cap <= ~64.
    f = [None, {d: (n_node - cnt[d]) * w[d]
                for d in range(1, cap_deg + 1)}]
    nxt = [None, {d: None for d in range(1, cap_deg + 1)}]
    for k in range(2, max_tiers + 1):
        fk, nk = {}, {}
        for d in range(1, cap_deg + 1):
            best, arg = f[1][d], None
            for d2 in range(1, d):
                c = (cnt[d2] - cnt[d]) * w[d] + f[k - 1][d2]
                if c < best:
                    best, arg = c, d2
            fk[d], nk[d] = best, arg
        f.append(fk)
        nxt.append(nk)
    # reconstruct the max_tiers-bounded optimum from the cap window
    seq, k, d = [cap_deg], max_tiers, cap_deg
    while True:
        d2 = nxt[k][d]
        if d2 is None:
            break
        seq.append(d2)
        d, k = d2, k - 1
    tiers = []
    prev_end = 0
    for i, dd in enumerate(seq):
        end = cnt[seq[i + 1]] if i + 1 < len(seq) else n_node
        if end > prev_end:
            tiers.append((int(end), int(dd), int(r8(dd))))
            prev_end = end
    if len(tiers) <= 1:
        return ()
    return tuple(tiers)


def pad_budget_for(
    graphs: Sequence[MolGraph],
    batch_size: int,
    multiple: int = 8,
) -> Budgets:
    """Compute budgets covering ANY `batch_size`-sized subset of `graphs`
    (= sum of the batch_size largest per-graph sizes; max over graphs for
    the per-edge degree), rounded up to `multiple`. Batches are drawn from
    permuted splits, so the budget must be composition-independent."""
    n = np.array([g.num_atoms for g in graphs])
    e = np.array([g.num_edges for g in graphs])
    t = np.array([g.num_triplets for g in graphs])

    def worst_case(x: np.ndarray) -> int:
        k = min(batch_size, len(x))
        return int(np.sort(x)[::-1][:k].sum())

    def round_up(v: int) -> int:
        return ((max(v, 1) + multiple - 1) // multiple) * multiple

    # per-graph max(in, out) atom degrees, computed ONCE (this also runs
    # per serving request via Predictor.predict -> pad_budget_for)
    per_graph_deg = [
        np.maximum(np.bincount(g.edge_index[0], minlength=g.num_atoms),
                   np.bincount(g.edge_index[1], minlength=g.num_atoms))
        if g.num_edges else np.zeros(g.num_atoms, np.int64)
        for g in graphs]
    deg = max((int(d.max()) for d in per_graph_deg if d.size), default=1)
    n_deg = round_up(max(deg, 1))

    # two-tier split: d_lo covers ~75% of atoms; n_hi = worst-case count
    # of over-d_lo atoms in ANY batch_size-subset (composition-independent)
    all_deg = (np.concatenate(per_graph_deg)
               if per_graph_deg else np.zeros(1))
    d_lo = int(-(-int(np.quantile(all_deg, 0.75)) // 8) * 8)
    n_node_budget = round_up(worst_case(n))
    n_hi = 0
    if 0 < d_lo < n_deg:
        hi_counts = np.array([int((d > d_lo).sum())
                              for d in per_graph_deg])
        n_hi = ((worst_case(hi_counts) + 7) // 8) * 8
        if n_hi >= n_node_budget:
            d_lo = n_hi = 0   # split would cover everything: disable
    else:
        d_lo = 0
    # rectangular multi-tier windows: worst-case exceed-counts per
    # threshold over ANY batch_size-subset (same composition-independent
    # quantity as n_hi, one per candidate degree), fed to the tier DP
    tiers: tuple = ()
    if deg > 1 and per_graph_deg:
        cnt_mat = np.zeros((len(per_graph_deg), deg + 1), np.int64)
        for m, dvec in enumerate(per_graph_deg):
            if dvec.size:
                h = np.bincount(np.minimum(dvec, deg),
                                minlength=deg + 1)
                cnt_mat[m] = dvec.size - np.cumsum(h)
        k = min(batch_size, cnt_mat.shape[0])
        col_sorted = -np.sort(-cnt_mat, axis=0)
        cnt_over = col_sorted[:k].sum(axis=0)
        tiers = plan_degree_tiers(n_node_budget, deg, cnt_over,
                                  multiple=multiple)
    return Budgets(n_node_budget, round_up(worst_case(e)),
                   round_up(worst_case(t)), n_deg, d_lo, n_hi,
                   tiers=tiers)


def pad_graphs(
    graphs: Sequence[MolGraph],
    budgets: Union[Budgets, Tuple[int, int, int], Tuple[int, int, int, int]],
    n_graph: Optional[int] = None,
    targets: Optional[np.ndarray] = None,
    with_triplets: bool = True,
) -> GraphBatch:
    """Concatenate molecules and pad to static budgets.

    `budgets` is a Budgets tuple (or a 3/4-tuple; with 3 elements the
    neighbor-table width is derived from these graphs). `targets` optionally
    overrides per-graph scalar targets (shape (G,)); otherwise `g.y[0]`.

    `with_triplets=False` skips the per-triplet arrays (trip_*) and the
    padded-layout neighbor tables (nbr_*), emitting them with zero-length
    leading axes. The blocked attention layout never reads them — it works
    entirely off the atom in/out tables — and at serving time their host
    assembly + device transfer dominates the request latency (the nbr
    tables alone are E*D int32 each). Only valid for blocked-layout
    consumers; all batches of a run must use the same setting (static
    shapes).
    """
    if len(budgets) == 3:
        deg = max((_max_degree(g) for g in graphs), default=1)
        budgets = Budgets(*budgets, ((deg + 7) // 8) * 8)
    n_node, n_edge, n_trip, n_deg = budgets[:4]
    d_lo = budgets[4] if len(budgets) > 4 else 0
    n_hi_budget = budgets[5] if len(budgets) > 5 else 0
    tiers = budgets.tiers if isinstance(budgets, Budgets) else ()
    n_graph = n_graph if n_graph is not None else len(graphs)
    if len(graphs) > n_graph:
        raise ValueError(f"{len(graphs)} graphs > budget {n_graph}")
    tot_n = sum(g.num_atoms for g in graphs)
    tot_e = sum(g.num_edges for g in graphs)
    tot_t = sum(g.num_triplets for g in graphs)
    if tot_n > n_node or tot_e > n_edge or tot_t > n_trip:
        raise ValueError(
            f"batch ({tot_n} nodes, {tot_e} edges, {tot_t} triplets) exceeds "
            f"budgets ({n_node}, {n_edge}, {n_trip})")

    feat_dim = graphs[0].edge_feat.shape[1] if graphs else 0
    numbers = np.zeros(n_node, dtype=np.int32)
    positions = np.zeros((n_node, 3), dtype=np.float32)
    edge_src = np.zeros(n_edge, dtype=np.int32)
    edge_dst = np.zeros(n_edge, dtype=np.int32)
    edge_feat = np.zeros((n_edge, feat_dim), dtype=np.float32)
    n_trip_alloc = n_trip if with_triplets else 0
    trip_src_edge = np.zeros(n_trip_alloc, dtype=np.int32)
    trip_dst_edge = np.zeros(n_trip_alloc, dtype=np.int32)
    trip_j = np.zeros(n_trip_alloc, dtype=np.int32)
    trip_i = np.zeros(n_trip_alloc, dtype=np.int32)
    trip_k = np.zeros(n_trip_alloc, dtype=np.int32)
    atom_gid = np.zeros(n_node, dtype=np.int32)
    edge_gid = np.zeros(n_edge, dtype=np.int32)
    y = np.zeros(n_graph, dtype=np.float32)

    a0 = e0 = t0 = 0
    for gid, g in enumerate(graphs):
        na, ne, nt = g.num_atoms, g.num_edges, g.num_triplets
        numbers[a0:a0 + na] = g.numbers
        positions[a0:a0 + na] = g.positions
        edge_src[e0:e0 + ne] = g.edge_index[0] + a0
        edge_dst[e0:e0 + ne] = g.edge_index[1] + a0
        edge_feat[e0:e0 + ne] = g.edge_feat
        if with_triplets:
            trip_src_edge[t0:t0 + nt] = g.triplet_index[0] + e0
            trip_dst_edge[t0:t0 + nt] = g.triplet_index[1] + e0
            trip_j[t0:t0 + nt] = g.atom_j + a0
            trip_i[t0:t0 + nt] = g.atom_i + a0
            trip_k[t0:t0 + nt] = g.atom_k + a0
        atom_gid[a0:a0 + na] = gid
        edge_gid[e0:e0 + ne] = gid
        y[gid] = targets[gid] if targets is not None else g.y[0]
        a0, e0, t0 = a0 + na, e0 + ne, t0 + nt

    # ---- degree sort (two-tier kernel split) ----
    # Relabel atoms by descending degree (a pure renaming — every index
    # array is rewritten consistently; pad atoms have degree 0 and land
    # last). Guarantees rows >= n_hi_budget have degree <= d_lo, so the
    # blocked kernel can run the (numerous) low-degree rows in a d_lo
    # window. Disabled when the budgets carry no split.
    # NOTE: keep the split fields EVEN for an all-empty batch — n_hi/d_lo
    # are static (non-pytree) fields, so zeroing them here would change
    # the GraphBatch treedef mid-run (stack/tree_map mismatch, silent
    # recompile). With e0 == 0 the sort is a no-op and the guard holds
    # vacuously (all degrees 0 <= d_lo).
    if (d_lo > 0 and n_hi_budget > 0) or tiers:
        deg_in = np.bincount(edge_dst[:e0], minlength=n_node)
        deg_out = np.bincount(edge_src[:e0], minlength=n_node)
        key = np.maximum(deg_in, deg_out)
        order = np.argsort(-key[:a0], kind="stable")
        perm = np.concatenate([order, np.arange(a0, n_node)])
        key_sorted = key[perm]
        if d_lo > 0 and n_hi_budget > 0:
            n_over = int((key_sorted > d_lo).sum())
            if n_over > n_hi_budget:
                raise ValueError(
                    f"{n_over} atoms exceed degree {d_lo} but the n_hi "
                    f"budget is {n_hi_budget} — budgets not from "
                    f"pad_budget_for?")
        else:
            d_lo = n_hi_budget = 0
        # rectangular tier guarantee: rows [end_{t-1}, end_t) must have
        # degree <= di_t, i.e. #(degree > di_t) <= end_{t-1}
        prev_end = 0
        for (end_t, di_t, dk_t) in tiers:
            n_over = int((key_sorted > di_t).sum())
            if n_over > prev_end:
                raise ValueError(
                    f"{n_over} atoms exceed tier degree {di_t} but the "
                    f"tier starts at row {prev_end} — budgets not from "
                    f"the tier planner?")
            prev_end = end_t
        if tiers and prev_end != n_node:
            raise ValueError(
                f"tiers end at {prev_end} != node budget {n_node}")
        inv = np.empty(n_node, np.int64)
        inv[perm] = np.arange(n_node)
        numbers = numbers[perm]
        positions = positions[perm]
        atom_gid = atom_gid[perm]
        edge_src[:e0] = inv[edge_src[:e0]]
        edge_dst[:e0] = inv[edge_dst[:e0]]
        if with_triplets:
            trip_i[:t0] = inv[trip_i[:t0]]
            trip_j[:t0] = inv[trip_j[:t0]]
            trip_k[:t0] = inv[trip_k[:t0]]
    else:
        d_lo = n_hi_budget = 0

    node_mask = np.arange(n_node) < a0
    edge_mask = np.arange(n_edge) < e0
    trip_mask = np.arange(n_trip_alloc) < t0
    graph_mask = np.arange(n_graph) < len(graphs)

    # --- neighbor tables: triplets grouped by destination edge ---
    # trip_dst_edge[:t0] is globally nondecreasing (dst-sorted per graph +
    # increasing graph offsets), so each segment occupies contiguous slots.
    n_edge_nbr = n_edge if with_triplets else 0
    nbr_trip = np.zeros((n_edge_nbr, n_deg), dtype=np.int32)
    nbr_mask = np.zeros((n_edge_nbr, n_deg), dtype=bool)
    if t0 > 0 and with_triplets:
        dsts = trip_dst_edge[:t0]
        counts = np.bincount(dsts, minlength=n_edge)
        max_deg = int(counts.max())
        if max_deg > n_deg:
            raise ValueError(
                f"max triplets/edge {max_deg} exceeds degree budget {n_deg}")
        seg_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = np.arange(t0) - seg_start[dsts]
        nbr_trip[dsts, pos] = np.arange(t0)
        nbr_mask[dsts, pos] = True
    nbr_src = trip_src_edge[nbr_trip]

    # --- atom-level in/out edge tables ---
    in_edges = np.zeros((n_node, n_deg), dtype=np.int32)
    in_mask_t = np.zeros((n_node, n_deg), dtype=bool)
    out_edges = np.zeros((n_node, n_deg), dtype=np.int32)
    out_mask_t = np.zeros((n_node, n_deg), dtype=bool)
    edge_inpos = np.zeros(n_edge, dtype=np.int32)
    edge_outpos = np.zeros(n_edge, dtype=np.int32)
    if e0 > 0:
        real_dst = edge_dst[:e0]
        real_src = edge_src[:e0]
        # in-table: group edges by dst atom (stable order)
        order = np.argsort(real_dst, kind="stable")
        counts = np.bincount(real_dst, minlength=n_node)
        if counts.max() > n_deg:
            raise ValueError(
                f"max atom degree {counts.max()} exceeds budget {n_deg}")
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        slot = np.arange(e0) - starts[real_dst[order]]
        in_edges[real_dst[order], slot] = order
        in_mask_t[real_dst[order], slot] = True
        edge_inpos[order] = (real_dst[order] * n_deg + slot).astype(np.int32)
        # out-table: group edges by src atom
        order_s = np.argsort(real_src, kind="stable")
        counts_s = np.bincount(real_src, minlength=n_node)
        if counts_s.max() > n_deg:
            raise ValueError(
                f"max atom out-degree {counts_s.max()} exceeds {n_deg}")
        starts_s = np.concatenate([[0], np.cumsum(counts_s)])[:-1]
        slot_s = np.arange(e0) - starts_s[real_src[order_s]]
        out_edges[real_src[order_s], slot_s] = order_s
        out_mask_t[real_src[order_s], slot_s] = True
        edge_outpos[order_s] = (real_src[order_s] * n_deg
                                + slot_s).astype(np.int32)

    return GraphBatch(
        numbers=numbers, positions=positions,
        edge_src=edge_src, edge_dst=edge_dst, edge_feat=edge_feat,
        trip_src_edge=trip_src_edge, trip_dst_edge=trip_dst_edge,
        trip_j=trip_j, trip_i=trip_i, trip_k=trip_k,
        atom_gid=atom_gid, edge_gid=edge_gid,
        node_mask=node_mask, edge_mask=edge_mask, trip_mask=trip_mask,
        y=y, graph_mask=graph_mask,
        nbr_trip=nbr_trip, nbr_src=nbr_src, nbr_mask=nbr_mask,
        in_edges=in_edges, in_mask=in_mask_t,
        out_edges=out_edges, out_mask=out_mask_t, edge_inpos=edge_inpos,
        edge_outpos=edge_outpos,
        n_hi=int(n_hi_budget), d_lo=int(d_lo),
        tiers=tuple(tuple(int(v) for v in t) for t in tiers),
    )


def mixed_packed_plan(
    graphs: Sequence[MolGraph],
    idx,
    batch_size: int,
    base: Budgets,
    multiple: int = 8,
    fill: float = 0.75,
    seed: int = 0,
):
    """ONE compiled shape, MIXED batch composition, high occupancy:
    first-fit-decreasing bin packing of molecules into bins whose
    capacity is ~(total need / target batch count). Each bin starts with
    a large molecule and fills up with small ones, so every batch spans
    the size distribution — the round-3 packed-vs-fixed A/B showed that
    size-HOMOGENEOUS batches (what per-class packing produces) cost
    real accuracy per optimizer step; composition diversity is the
    fix, and FFD provides it while keeping ~fill occupancy on the
    binding dimension and a single executable.

    Returns (chunks, budgets, stats) like size_bucketed_plan. The bin
    assignment is deterministic in idx order (stable argsort on triplet
    need); `seed` is reserved for a future scan-order permutation and is
    currently unused — per-epoch diversity comes from the trainer's
    batch-order shuffle, not from re-planning.
    """
    idx = np.asarray(idx)
    n_mols = len(idx)
    mol_needs = np.zeros((n_mols, 4), dtype=np.int64)
    deg_sq = np.zeros(n_mols, dtype=np.int64)
    want_split = base.n_deg_lo > 0 and base.n_hi > 0
    # per-molecule exceed-counts for EVERY threshold (tier planning):
    # mol_cnt[m, t] = #atoms of molecule m with degree > t
    capd = max(int(base.n_deg), 1)
    mol_cnt = np.zeros((n_mols, capd + 1), dtype=np.int64)
    deg_max_all = 1
    for m, i in enumerate(idx):
        g = graphs[i]
        hi = 0
        if g.num_edges:
            deg = np.maximum(
                np.bincount(g.edge_index[0], minlength=g.num_atoms),
                np.bincount(g.edge_index[1], minlength=g.num_atoms))
            deg_sq[m] = int((deg.astype(np.int64) ** 2).sum())
            deg_max_all = max(deg_max_all, int(deg.max()))
            h = np.bincount(np.minimum(deg, capd), minlength=capd + 1)
            mol_cnt[m] = deg.size - np.cumsum(h)
            if want_split:
                hi = int((deg > base.n_deg_lo).sum())
        mol_needs[m] = (g.num_atoms, g.num_edges, g.num_triplets, hi)

    def round_up(v):
        return ((max(int(v), 1) + multiple - 1) // multiple) * multiple

    # capacity per bin: total need spread over the same batch count a
    # fixed plan would use, inflated only by the fill slack; each
    # dimension must also fit the single largest molecule
    n_bins = max(1, -(-n_mols // batch_size))
    totals = mol_needs.sum(axis=0)
    cap = np.maximum(np.ceil(totals / (n_bins * fill)),
                     mol_needs.max(axis=0)).astype(np.int64)

    order = np.argsort(-mol_needs[:, 2], kind="stable")   # FFD: big first
    bins = []
    loads = np.zeros((0, 4), dtype=np.int64)
    for m in order:
        need = mol_needs[m]
        fits = np.all(loads + need <= cap, axis=1)        # vectorized FFD
        hit = np.argmax(fits) if fits.any() else -1
        if hit >= 0:
            bins[hit].append(m)
            loads[hit] += need
        else:
            bins.append([m])
            loads = np.vstack([loads, need])
    n_node = round_up(loads[:, 0].max())
    n_edge = round_up(loads[:, 1].max())
    n_trip = round_up(loads[:, 2].max())
    n_hi = round_up(loads[:, 3].max()) if want_split else 0
    d_lo = base.n_deg_lo if want_split else 0
    if want_split and n_hi >= n_node:
        n_hi = d_lo = 0
    n_graph = round_up(max(len(b) for b in bins))
    # rectangular tiers from the EXACT bin compositions: cnt_over[t] =
    # the worst bin's count of atoms with degree > t (composition is
    # fixed per run — the trainer shuffles batch ORDER, not membership)
    capd_eff = min(deg_max_all, capd)
    bin_cnt = np.array([mol_cnt[np.asarray(b)].sum(axis=0)
                        for b in bins], dtype=np.int64)
    tiers = plan_degree_tiers(n_node, capd_eff,
                              bin_cnt.max(axis=0)[:capd_eff + 1],
                              multiple=multiple)
    bud = Budgets(n_node, n_edge, n_trip, base.n_deg, d_lo, n_hi,
                  n_graph=n_graph, tiers=tiers)
    chunks = [idx[np.asarray(b)] for b in bins]
    budgets = [bud] * len(chunks)
    if tiers:
        per_bin_pairs = sum(
            (end - start) * di * dk
            for (end, di, dk), start in zip(tiers, (0,) + tuple(
                t[0] for t in tiers[:-1])))
    elif n_hi:
        per_bin_pairs = (n_hi * base.n_deg ** 2
                         + (n_node - n_hi) * d_lo * d_lo)
    else:
        per_bin_pairs = n_node * base.n_deg ** 2
    stats = {
        "real": tuple(int(x) for x in totals[:3]),
        "padded": tuple(int(bud[d] * len(chunks)) for d in range(3)),
        "pairs": (int(deg_sq.sum()), int(per_bin_pairs * len(chunks))),
        "shapes": 1,
    }
    return chunks, budgets, stats


def size_bucketed_plan(
    graphs: Sequence[MolGraph],
    idx,
    batch_size: int,
    num_shapes: int,
    base: Budgets,
    multiple: int = 8,
    pack: bool = False,
):
    """Plan size-grouped batches over `idx` with a CLOSED set of quantized
    budget shapes.

    `pack=True` additionally packs each batch to its class budget
    (variable molecules per step, fixed compute shape) instead of a
    fixed `batch_size` molecules — see the inline comment. The returned
    per-chunk Budgets then carry `n_graph` (the static graph-slot
    dimension for that class).

    The single worst-case budget (pad_budget_for: sum of the batch_size
    largest molecules) wastes a large constant factor on heterogeneous
    datasets — every batch pays for the biggest possible one. Here
    molecules are ordered by triplet count (largest first), chunked into
    batches, and the chunks are split into `num_shapes` contiguous classes;
    each class gets the elementwise-max budget of its chunks, rounded up.
    Every shape compiles once; composition is fixed across epochs (the
    trainer never reshuffles, trainer.py:22-27), so budgets are exact.

    Degree budgets are PER CLASS (round-3): each class gets its own
    in/out table width n_deg (class max degree) and a two-tier split
    point d_lo chosen to MINIMIZE the class's pair capacity
    n_hi*D^2 + (n_node-n_hi)*d_lo^2 — the D^2 pair dimension is the
    compute the blocked Pallas kernel actually pays, and a single global
    (D, d_lo) leaves it at ~0.2-0.3 occupancy on heterogeneous sets.
    A class where no split helps runs the plain kernel (n_hi=0).

    Returns (chunks, budgets, stats): chunks = list of index arrays in
    training order, budgets = matching Budgets per chunk, stats = dict
    with real/padded node/edge/triplet AND pair totals (occupancy
    accounting; 'pairs' is the kernel-work dimension).
    """
    idx = np.asarray(idx)
    t_sizes = np.array([graphs[i].num_triplets for i in idx])
    idx = idx[np.argsort(-t_sizes, kind="stable")]

    def round_up(v):
        return ((max(int(v), 1) + multiple - 1) // multiple) * multiple

    # per-molecule: sizes + degree distribution (for per-class degree
    # budgets). deg_gt[m, c] = #atoms with degree > 8*(c+1); deg_sq[m] =
    # sum deg^2 (real pair work); deg_max[m] = max degree.
    n_mols = len(idx)
    max_deg_all = max((_max_degree(graphs[i]) for i in idx), default=1)
    n_cand = max(max_deg_all // 8 + 1, 1)
    mol_needs = np.zeros((n_mols, 3), dtype=np.int64)
    deg_gt = np.zeros((n_mols, n_cand), dtype=np.int64)
    deg_sq = np.zeros(n_mols, dtype=np.int64)
    deg_max = np.zeros(n_mols, dtype=np.int64)
    for m, i in enumerate(idx):
        g = graphs[i]
        mol_needs[m] = (g.num_atoms, g.num_edges, g.num_triplets)
        if g.num_edges:
            deg = np.maximum(
                np.bincount(g.edge_index[0], minlength=g.num_atoms),
                np.bincount(g.edge_index[1], minlength=g.num_atoms))
            deg_sq[m] = int((deg.astype(np.int64) ** 2).sum())
            deg_max[m] = int(deg.max())
            for c in range(n_cand):
                deg_gt[m, c] = int((deg > 8 * (c + 1)).sum())

    pos_chunks = [np.arange(lo, min(lo + batch_size, n_mols))
                  for lo in range(0, n_mols, batch_size)]
    needs = np.array([mol_needs[c].sum(axis=0) for c in pos_chunks],
                     dtype=np.int64)

    n_chunks = len(pos_chunks)
    per_class = max(1, -(-n_chunks // max(num_shapes, 1)))
    chunks, budgets = [], []
    pair_capacity = 0
    for lo in range(0, n_chunks, per_class):
        cls = needs[lo:lo + per_class]
        cls_pos = pos_chunks[lo:lo + per_class]
        members = np.concatenate(cls_pos)
        n_node = round_up(cls[:, 0].max())
        n_edge = round_up(cls[:, 1].max())
        n_trip = round_up(cls[:, 2].max())
        # class degree budget + optimal split point: brute-force every
        # multiple-of-8 threshold, minimizing per-batch pair capacity
        n_deg = round_up(max(int(deg_max[members].max()), 1))
        best = (n_node * n_deg * n_deg, 0, 0)  # (capacity, d_lo, n_hi)
        for c in range(n_cand):
            d_lo_c = 8 * (c + 1)
            if d_lo_c >= n_deg:
                break
            hi_per_chunk = [int(deg_gt[p, c].sum()) for p in cls_pos]
            n_hi_c = round_up(max(hi_per_chunk))
            if n_hi_c >= n_node:
                continue
            cap = (n_hi_c * n_deg * n_deg
                   + (n_node - n_hi_c) * d_lo_c * d_lo_c)
            if cap < best[0]:
                best = (cap, d_lo_c, n_hi_c)
        _, d_lo, n_hi = best
        hi_col = d_lo // 8 - 1   # deg_gt column for the chosen threshold
        b = Budgets(n_node, n_edge, n_trip, n_deg, d_lo, n_hi)
        a = lo * batch_size
        z = min((lo + per_class) * batch_size, n_mols)
        if not pack:
            cls_chunks = [idx[p] for p in cls_pos]
        else:
            # pack-to-budget: greedily fill each batch with consecutive
            # (size-sorted) molecules while it fits the CLASS budget —
            # small-molecule classes hold far more than batch_size
            # molecules per step, reclaiming the padding that fixed
            # 32-molecule batches leave on the table. The graph-slot
            # dimension becomes the class's largest packed count
            # (n_graph); node/edge/triplet shapes are unchanged, so a
            # class still compiles exactly once.
            cls_chunks = []
            cur, acc = [], np.zeros(4, dtype=np.int64)
            for p in range(a, z):
                hi_need = int(deg_gt[p, hi_col]) if n_hi else 0
                need = (*mol_needs[p], hi_need)
                fits = (acc[0] + need[0] <= b.n_node
                        and acc[1] + need[1] <= b.n_edge
                        and acc[2] + need[2] <= b.n_trip
                        and (b.n_hi == 0 or acc[3] + need[3] <= b.n_hi))
                if cur and not fits:
                    cls_chunks.append(np.array(cur))
                    cur, acc = [], np.zeros(4, dtype=np.int64)
                cur.append(idx[p])
                acc += np.asarray(need, dtype=np.int64)
            if cur:
                cls_chunks.append(np.array(cur))
            b = b._replace(n_graph=round_up(
                max(len(c) for c in cls_chunks)))
        chunks.extend(cls_chunks)
        budgets.extend([b] * len(cls_chunks))
        per_batch_cap = (n_hi * n_deg * n_deg
                         + (n_node - n_hi) * d_lo * d_lo
                         if n_hi else n_node * n_deg * n_deg)
        pair_capacity += per_batch_cap * len(cls_chunks)

    stats = {
        "real": tuple(int(x) for x in mol_needs.sum(axis=0)),
        "padded": tuple(int(sum(b[d] for b in budgets))
                        for d in range(3)),
        "pairs": (int(deg_sq.sum()), int(pair_capacity)),
        "shapes": len({(b.n_node, b.n_edge, b.n_trip, b.n_deg,
                        b.n_deg_lo, b.n_hi, b.n_graph)
                       for b in budgets}),
    }
    return chunks, budgets, stats


def batch_iterator(
    graphs: Sequence[MolGraph],
    batch_size: int,
    budgets: Optional[Budgets] = None,
    targets: Optional[np.ndarray] = None,
    drop_last: bool = False,
    with_triplets: bool = True,
) -> Iterator[GraphBatch]:
    """Yield fixed-shape GraphBatches over `graphs` in order.

    Order is the caller's responsibility (the reference trainer uses a fixed
    seed-41 permutation and never reshuffles, trainer.py:22-27).
    """
    if budgets is None:
        budgets = pad_budget_for(graphs, batch_size)
    if len(budgets) == 3:
        budgets = Budgets(*budgets, 0)
        deg = max((_max_degree(g) for g in graphs), default=1)
        budgets = budgets._replace(n_deg=((deg + 7) // 8) * 8)
    for lo in range(0, len(graphs), batch_size):
        chunk = graphs[lo:lo + batch_size]
        if drop_last and len(chunk) < batch_size:
            return
        sub_targets = None
        if targets is not None:
            sub_targets = np.asarray(targets[lo:lo + len(chunk)])
        yield pad_graphs(chunk, budgets, n_graph=batch_size,
                         targets=sub_targets, with_triplets=with_triplets)
