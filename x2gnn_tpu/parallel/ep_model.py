"""Edge-partitioned FULL-MODEL forward + training step — the graph
analogue of sequence parallelism, composed end to end.

Where `data_parallel.py` shards molecules (each device holds whole
graphs), this module shards the *activations of a single batched graph*
across the mesh's 'data' axis, so graphs far larger than one chip's
memory can be trained. Per SURVEY §5, the attention softmax normalizes
per destination edge, so partitioning by destination makes it chip-local;
the only communication is gathering source-edge K/V features.

Layout (the key design decision): atoms are partitioned contiguously, and
every per-edge activation is stored in the *blocked in-table layout*
(N, D, C) — row j holds the features of atom j's incoming edges. Each
edge occupies exactly one in-slot, so this is a (padded) edge layout that
is automatically co-partitioned with the attention's destination rows:

  * attention (scores, softmax, aggregation) is fully local per atom row;
  * K/V/rbf rows live on their destination atom's device and are
    all-gathered once per layer, then re-indexed with the precomputed
    `out2in` table (out-slot -> global in-slot) — the baseline exchange;
    boundary-only / ppermute-overlapped exchange is `ep_ring.py`;
  * per-edge dense layers, residuals, and LayerNorm are local (LayerNorm
    graph statistics are psum'ed — a graph may span every device);
  * readouts scatter edges into their SOURCE atoms (readout.py:37), which
    may live on other shards: local partial sums over the global atom
    axis are `psum_scatter`ed so each device receives exactly its own
    atoms' totals (the "reduce-scattered readout");
  * molecule pooling and the loss are tiny and replicated via psum.

The parameter tree is IDENTICAL to X2GNN's (init with the flax model,
apply with either) — equivalence is tested in tests/test_ep_model.py.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.batching import GraphBatch
from x2gnn_tpu.ops.basis import (
    legendre_cos_harmonics, poly_envelope, sbf_radial_part)
from x2gnn_tpu.train.loss import smooth_l1_loss
from x2gnn_tpu.train.optim import apply_update_skip_nonfinite

AXIS = "data"


@struct.dataclass
class EPBatch:
    """A GraphBatch re-laid-out for edge partitioning. Leading axes are
    sharded over the mesh 'data' axis (atom axis N) except y/graph_mask
    (replicated). D = degree budget, F = integral feature dim."""

    numbers: np.ndarray        # (N,) int32
    positions: np.ndarray      # (N, 3)
    atom_ids: np.ndarray       # (N,) int32 global atom index (= arange)
    atom_gid: np.ndarray       # (N,) int32 graph id
    node_mask: np.ndarray      # (N,) bool
    edge_src_blk: np.ndarray   # (N, D) int32 source atom of in-edge slots
    edge_gid_blk: np.ndarray   # (N, D) int32 graph id per in-edge slot
    in_mask: np.ndarray        # (N, D) bool
    feat_blk: np.ndarray       # (N, D, F) integral features, in-layout
    out_dst_blk: np.ndarray    # (N, D) int32 dst atom of out-edge slots
    out_mask: np.ndarray       # (N, D) bool
    out2in: np.ndarray         # (N, D) int32 flat global in-slot of each
                               # out-slot's edge (K/V re-indexing table)
    y: np.ndarray              # (G,)
    graph_mask: np.ndarray     # (G,) bool


def make_ep_batch(batch: GraphBatch, n_dev: int) -> EPBatch:
    """Derive the EP layout from a standard GraphBatch (host-side).
    Pads the atom axis to a multiple of n_dev."""
    b = jax.tree_util.tree_map(np.asarray, batch)
    N, D = b.in_edges.shape
    pad = (-N) % n_dev

    def padN(x, fill=0):
        if pad == 0:
            return x
        width = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, width, constant_values=fill)

    in_edges = padN(b.in_edges)
    in_mask = padN(b.in_mask)
    out_edges = padN(b.out_edges)
    out_mask = padN(b.out_mask)
    edge_src_blk = np.where(in_mask, b.edge_src[in_edges], 0).astype(np.int32)
    edge_gid_blk = np.where(in_mask, b.edge_gid[in_edges], 0).astype(np.int32)
    feat_blk = np.where(in_mask[..., None], b.edge_feat[in_edges], 0.0)
    out_dst_blk = np.where(out_mask, b.edge_dst[out_edges], 0).astype(
        np.int32)
    out2in = np.where(out_mask, b.edge_inpos[out_edges], 0).astype(np.int32)
    return EPBatch(
        numbers=padN(b.numbers),
        positions=padN(b.positions.astype(np.float32)),
        atom_ids=np.arange(N + pad, dtype=np.int32),
        atom_gid=padN(b.atom_gid),
        node_mask=padN(b.node_mask, fill=False),
        edge_src_blk=edge_src_blk, edge_gid_blk=edge_gid_blk,
        in_mask=in_mask, feat_blk=feat_blk.astype(np.float32),
        out_dst_blk=out_dst_blk, out_mask=out_mask, out2in=out2in,
        y=np.asarray(b.y, np.float32), graph_mask=np.asarray(b.graph_mask),
    )


def shard_ep_batch(epb: EPBatch, mesh: Mesh) -> EPBatch:
    """Lay out an EPBatch on the mesh (atom-axis arrays on 'data')."""
    repl = {"y", "graph_mask"}

    def put(name, x):
        spec = P() if name in repl else P(AXIS)
        return jax.device_put(
            jnp.asarray(x), jax.sharding.NamedSharding(mesh, spec))

    return EPBatch(**{k: put(k, v) for k, v in
                      {f: getattr(epb, f) for f in epb.__annotations__}
                      .items()})


# ---------------------------------------------------------------------------
# parameter-tree helpers (same tree as the flax X2GNN)
# ---------------------------------------------------------------------------

def _lin(p, x, silu=False):
    """Apply a Dense/TorchDense param subtree ({'Dense_0': {...}} or a raw
    {'kernel'[, 'bias']} dict)."""
    if "Dense_0" in p:
        p = p["Dense_0"]
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return jax.nn.silu(y) if silu else y


def _residual(p, x):
    h = jax.nn.silu(_lin(p["lin0"], x))
    h = jax.nn.silu(_lin(p["lin1"], h))
    return h + x


def _mlp(p, x, depth: int):
    for i in range(depth - 1):
        x = jax.nn.silu(_lin(p[f"mlp_{i}"], x))
    return _lin(p["mlp_out"], x)


@jax.custom_vjp
def _freq_lookup_psum(tbl, idx):
    return tbl[idx]


def _freq_lookup_fwd(tbl, idx):
    return tbl[idx], (idx, tbl.shape)


def _freq_lookup_bwd(res, g):
    idx, tbl_shape = res
    counts = jnp.zeros(tbl_shape[0], g.dtype).at[idx].add(1.0)
    counts = jax.lax.psum(counts, AXIS)
    scale = 1.0 / jnp.maximum(counts[idx], 1.0)
    dtbl = jnp.zeros(tbl_shape, g.dtype).at[idx].add(g * scale[:, None])
    return dtbl, jnp.zeros(idx.shape, dtype=jax.dtypes.float0)


_freq_lookup_psum.defvjp(_freq_lookup_fwd, _freq_lookup_bwd)


def _embedding_block(p, numbers, max_norm: float = 3.0):
    """EmbeddingBlock with the grad-by-frequency counts psum'ed over the
    mesh so gradients match the unsharded model exactly."""
    table = p["embedding"]
    norms = jnp.sqrt(jnp.sum(table * table, -1, keepdims=True) + 1e-24)
    table = table * jnp.minimum(1.0, max_norm / norms)
    h = _freq_lookup_psum(table, numbers)
    return jax.nn.silu(_lin(p["lin"], h))


def _graph_layer_norm(x, gid, mask, num_graphs: int, eps: float = 1e-8):
    """PyG graph-mode LayerNorm with statistics psum'ed over the mesh
    (a molecule's edges may live on several devices). x: (R, C) local
    rows; gid/mask: (R,)."""
    feat = x.shape[-1]
    xm = jnp.where(mask[:, None], x, 0.0)
    count = jax.ops.segment_sum(
        mask.astype(x.dtype), gid, num_segments=num_graphs)
    count = jnp.maximum(jax.lax.psum(count, AXIS) * feat, 1.0)
    total = jax.ops.segment_sum(xm.sum(-1), gid, num_segments=num_graphs)
    mean = jax.lax.psum(total, AXIS) / count
    centered = x - mean[gid][:, None]
    cm = jnp.where(mask[:, None], centered, 0.0)
    sq = jax.ops.segment_sum((cm * cm).sum(-1), gid,
                             num_segments=num_graphs)
    var = jax.lax.psum(sq, AXIS) / count
    out = centered / jnp.sqrt(var + eps)[gid][:, None]
    return jnp.where(mask[:, None], out, 0.0)


def _scatter_to_atoms(x, atom_idx, mask, num_atoms_global: int):
    """Local edge rows -> their (possibly remote) atoms: local partial
    segment-sum over the GLOBAL atom axis, reduce-scattered so each device
    keeps its own contiguous atom range. x: (R, C) local rows."""
    xm = jnp.where(mask[:, None], x, 0.0)
    partial = jax.ops.segment_sum(xm, atom_idx,
                                  num_segments=num_atoms_global)
    return jax.lax.psum_scatter(partial, AXIS, scatter_dimension=0,
                                tiled=True)


# ---------------------------------------------------------------------------
# the per-device forward (runs inside shard_map)
# ---------------------------------------------------------------------------

def _ring_gather_rows(bufs, out2in, out_mask, axis_name=AXIS):
    """Assemble per-out-slot rows from atom-sharded in-layout tables by
    rotating shards around the ring (ppermute) instead of all-gathering —
    peak memory is ONE remote shard instead of the full table, and XLA
    overlaps each collective-permute with the previous step's gather (the
    ring-attention exchange pattern, SURVEY §5).

    bufs: tuple of (R_local, C_i) flat local shards (R_local = Nl*D rows
    of the global flat in-slot space); out2in: (Nl, D) GLOBAL flat slot
    ids; returns tuple of (Nl, D, C_i) assembled tables."""
    n_dev = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    rows = bufs[0].shape[0]
    outs = [jnp.zeros(out2in.shape + (b.shape[-1],), b.dtype)
            for b in bufs]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    for s in range(n_dev):
        owner = (me - s) % n_dev       # shard currently held in bufs
        lo = owner * rows
        in_range = ((out2in >= lo) & (out2in < lo + rows) & out_mask)
        idx = jnp.clip(out2in - lo, 0, rows - 1)
        for t, b in enumerate(bufs):
            got = b[idx]               # (Nl, D, C)
            outs[t] = outs[t] + jnp.where(in_range[..., None], got, 0.0)
        if s < n_dev - 1:
            bufs = tuple(jax.lax.ppermute(b, axis_name, perm)
                         for b in bufs)
    return tuple(outs)


def _ep_forward_local(params, epb: EPBatch, cfg: ModelConfig,
                      num_atoms_global: int, kv_exchange: str = "allgather",
                      dropout_key=None):
    p = params["params"]
    Nl, D = epb.in_mask.shape
    G = epb.y.shape[0]
    HC = cfg.in_channels
    H = cfg.heads
    C = HC // H
    L, K = cfg.sbf_dim, cfg.rbf_dim
    in_mask = epb.in_mask
    flat_mask = in_mask.reshape(-1)
    gid_flat = epb.edge_gid_blk.reshape(-1)
    src_flat = epb.edge_src_blk.reshape(-1)

    pos_g = jax.lax.all_gather(epb.positions, AXIS, axis=0, tiled=True)

    # ---- geometry (in-layout; each edge occupies exactly one in-slot) ----
    own = pos_g[epb.atom_ids][:, None, :]                # (Nl, 1, 3)
    ji = pos_g[epb.edge_src_blk] - own                   # (Nl, D, 3)
    d = jnp.sqrt(jnp.maximum((ji * ji).sum(-1), 1e-24))
    d_safe = jnp.where(in_mask, d, 1.0)
    env = poly_envelope(d_safe, cfg.cutoff, cfg.envelope_exponent)
    env = jnp.where(in_mask, env, 0.0)[..., None]        # (Nl, D, 1)

    # ---- featurization ----
    neo_x = jax.nn.silu(_lin(p["mat_trans"], epb.feat_blk * env))
    neo_x = jax.nn.silu(_lin(p["emb_trans"], neo_x))     # (Nl, D, HC)

    atom_emb = _embedding_block(p["emb_block"], epb.numbers)

    freqs = p["rbf_layer"]["frequencies"]
    node_rbf = jnp.sin(freqs * (d_safe * (1.0 / cfg.cutoff))[..., None])
    node_rbf = node_rbf * env                            # (Nl, D, K)

    def edgenn(h, tag=""):
        h = jax.nn.silu(_lin(p[f"edgenn{tag}_0"], h))
        return _lin(p[f"edgenn{tag}_1"], h)

    v2 = cfg.variant == "v2"
    edge_attr_atom = None if v2 else edgenn(atom_emb)    # (Nl, emb)

    rbf_env = sbf_radial_part(
        d_safe.reshape(-1), L, K, cfg.cutoff, cfg.envelope_exponent,
        flat_mask).reshape(Nl, D, L * K)

    jk = pos_g[epb.out_dst_blk] - own                    # (Nl, D, 3)
    cos_a = jnp.einsum("nid,nkd->nik", ji, jk)
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # fused-kernel operands (round-4: the Pallas kernel composes with
        # the EP/hybrid shard_map — each shard runs it on its local
        # (Nl, D, HC) tables, so multi-chip training keeps the
        # single-chip kernel speedup; exchange stays outside). The
        # kernel computes the Legendre harmonics in-register from
        # cos(theta) and derives pair validity from masked atom-id
        # tables — matching models/x2gnn.py's blocked path exactly.
        d_out = jnp.sqrt(jnp.maximum((jk * jk).sum(-1), 1e-24))
        norm = jnp.maximum(d[:, :, None] * d_out[:, None, :], 1e-12)
        z_cos = jnp.clip(cos_a / norm, -1.0, 1.0)
        a_ids = jnp.where(in_mask, epb.edge_src_blk, -1).astype(jnp.int32)
        b_ids = jnp.where(epb.out_mask, epb.out_dst_blk, -2).astype(
            jnp.int32)
        cbf = pair_mask = None
    else:
        cross = jnp.cross(ji[:, :, None, :], jk[:, None, :, :])
        sin_a = jnp.sqrt(jnp.maximum((cross ** 2).sum(-1), 1e-24))
        theta = jnp.arctan2(sin_a, cos_a)
        cbf = legendre_cos_harmonics(theta, L)           # (Nl, D, D, L)
        z_cos = a_ids = b_ids = None
        pair_mask = (in_mask[:, :, None] & epb.out_mask[:, None, :]
                     & (epb.edge_src_blk[:, :, None]
                        != epb.out_dst_blk[:, None, :]))

    def run_readout(i, x_blk):
        rp = p[f"readout_{i}"]
        gate = _lin(rp["lin_rbf"], node_rbf)
        out = (gate * x_blk).reshape(Nl * D, HC)
        atoms = _scatter_to_atoms(out, src_flat, flat_mask,
                                  num_atoms_global)      # (Nl, HC)
        if cfg.readout == "atomwise":
            return _mlp(rp["mlp"], atoms, cfg.mlp_depth)  # (Nl, 1)
        # molwise: pool atoms -> graphs (replicated via psum), MLP on (G,)
        nm = epb.node_mask
        pooled = jax.ops.segment_sum(
            jnp.where(nm[:, None], atoms, 0.0), epb.atom_gid,
            num_segments=G)
        pooled = jax.lax.psum(pooled, AXIS)
        if cfg.readout == "molwise_mean":
            cnt = jax.lax.psum(jax.ops.segment_sum(
                nm.astype(jnp.float32), epb.atom_gid, num_segments=G),
                AXIS)
            pooled = pooled / jnp.maximum(cnt, 1.0)[:, None]
        return _mlp(rp["mlp"], pooled, cfg.mlp_depth)     # (G, 1)

    # attention dropout under EP (round-3): each shard draws its own
    # per-(local atom, in-slot, out-slot, head) keep mask from a key
    # folded with its mesh position — independent Bernoulli noise over
    # the sharded pair space (statistically the reference's alpha
    # dropout, sbftransformer_conv.py:153; not bit-matched to the
    # single-device stream, which shards cannot reproduce without
    # materializing the global pair space)
    axis_key = None
    if dropout_key is not None and cfg.dropout > 0:
        axis_key = jax.random.fold_in(dropout_key,
                                      jax.lax.axis_index(AXIS))

    def conv(i, x_blk, e_atom):
        cp = p[f"conv_{i}"]
        x_src = x_blk * _lin(cp["lin_rbf"], node_rbf)
        q = _lin(cp["lin_query"], x_blk)                 # (Nl, D, HC)
        k_in = _lin(cp["lin_key"], x_src)
        v_in = _lin(cp["lin_value"], x_src)
        ea = _lin(cp["lin_edge"], e_atom)                # (Nl, HC)
        # gather K/V source rows: in-layout rows live on their dst atom's
        # device. 'allgather' = baseline exchange (full table per device);
        # 'ring' = rotate shards with ppermute, peak memory one shard
        if kv_exchange == "ring":
            k_out, v_out, rbf_out = _ring_gather_rows(
                (k_in.reshape(-1, HC), v_in.reshape(-1, HC),
                 rbf_env.reshape(-1, L * K)),
                epb.out2in, epb.out_mask)
        else:
            k_g = jax.lax.all_gather(k_in, AXIS, axis=0, tiled=True)
            v_g = jax.lax.all_gather(v_in, AXIS, axis=0, tiled=True)
            r_g = jax.lax.all_gather(rbf_env, AXIS, axis=0, tiled=True)
            k_out = k_g.reshape(-1, HC)[epb.out2in]      # (Nl, D, HC)
            v_out = v_g.reshape(-1, HC)[epb.out2in]
            rbf_out = r_g.reshape(-1, L * K)[epb.out2in]
        drop_mask = None
        if axis_key is not None:
            # same bernoulli draw both branches (pair_dropout_mask =
            # keep/(1-p) pre-scaled) — per-shard, per-layer key
            from x2gnn_tpu.ops.attention import pair_dropout_mask
            drop_mask = pair_dropout_mask(
                jax.random.fold_in(axis_key, i), cfg.dropout, Nl, D, H)
        if use_pallas:
            from x2gnn_tpu.ops.pallas import (
                expand_block_diagonal, pallas_blocked_attention)
            w_bd = expand_block_diagonal(cp["lin_sbf"]["kernel"], L, K, HC)
            bias = cp["lin_sbf"]["bias"].reshape(1, HC)
            out = pallas_blocked_attention(
                q, k_out, v_out, ea, rbf_out, w_bd, bias,
                z_cos, a_ids, b_ids, heads=H, num_radial=K,
                dropout_mask=drop_mask)                  # (Nl, D, HC)
        else:
            w_sbf = cp["lin_sbf"]["kernel"].reshape(L, K, HC)
            b_sbf = cp["lin_sbf"]["bias"].reshape(H, C)
            G_out = jnp.einsum("nelk,lkf->nelf",
                               rbf_out.reshape(Nl, D, L, K), w_sbf)
            q4 = q.reshape(Nl, D, H, C)
            k4 = (k_out + ea[:, None]).reshape(Nl, D, H, C)
            v4 = (v_out + ea[:, None]).reshape(Nl, D, H, C)
            scores = jnp.einsum("nihc,nkhc->nikh", q4, k4) / jnp.sqrt(
                float(C))
            neg = -1e30
            scores = jnp.where(pair_mask[..., None], scores, neg)
            smax = jnp.maximum(jnp.max(scores, axis=2, keepdims=True),
                               neg / 2)
            ex = jnp.exp(scores - smax)
            ex = jnp.where(pair_mask[..., None], ex, 0.0)
            denom = jnp.maximum(ex.sum(axis=2, keepdims=True), 1e-16)
            alpha = ex / denom                           # (Nl, Di, Dk, H)
            if drop_mask is not None:
                alpha = alpha * drop_mask
            out = jnp.einsum("nikh,nkhc->nihc", alpha, v4) * b_sbf
            G5 = G_out.reshape(Nl, D, L, H, C)
            for l in range(L):
                wl = alpha * cbf[..., l][..., None]
                out = out + jnp.einsum("nikh,nkhc->nihc", wl,
                                       v4 * G5[:, :, l])
            out = out.reshape(Nl, D, HC)
        skip = _lin(cp["lin_skip"], x_blk)
        if cfg.beta:
            # beta-gated skip — purely row-local, so no extra
            # communication in the EP layout
            from x2gnn_tpu.ops.attention import beta_gate
            return beta_gate(out, skip,
                             lambda h: _lin(cp["lin_beta"], h))
        return out + skip

    if cfg.remat:
        # rematerialize each conv: the ALL-GATHERED K/V tables (the
        # largest tensors in the EP layout — full-graph width) and the
        # DxD pair scores are recomputed in the backward pass instead of
        # stored. With kv_exchange='ring' this is the ring-attention
        # memory profile: no layer ever persists a gathered table.
        conv = jax.checkpoint(conv, static_argnums=(0,))

    out = neo_x
    results = run_readout(0, out)
    for i in range(cfg.conv_layers):
        res0 = out
        if v2:
            atoms_rep = _scatter_to_atoms(out.reshape(Nl * D, HC),
                                          src_flat, flat_mask,
                                          num_atoms_global)
            e_atom_i = edgenn(atoms_rep, tag=f"_{i}")
        else:
            e_atom_i = edge_attr_atom
        out = conv(i, out, e_atom_i)
        out = _graph_layer_norm(out.reshape(Nl * D, HC), gid_flat,
                                flat_mask, G).reshape(Nl, D, HC)
        out = _residual(p[f"bf_skip_{i}"], out)
        out = jax.nn.silu(_lin(p[f"dense_bf_skip_{i}"], out))
        out = out + res0
        out = _residual(p[f"af_skip_{i}_0"], out)
        out = _residual(p[f"af_skip_{i}_1"], out)
        results = results + run_readout(i + 1, out)

    if cfg.readout == "atomwise":
        nm = epb.node_mask
        per_graph = jax.ops.segment_sum(
            jnp.where(nm[:, None], results, 0.0), epb.atom_gid,
            num_segments=G)
        results = jax.lax.psum(per_graph, AXIS)          # (G, 1)
    if v2:
        results = results / cfg.conv_layers
    return results.reshape(-1)                           # (G,) replicated


def make_ep_forward(cfg: ModelConfig, mesh: Mesh,
                    num_atoms_global: int,
                    kv_exchange: str = "allgather",
                    with_dropout: bool = False) -> Callable:
    """fn(params, sharded EPBatch) -> (G,) predictions. Parameter tree ==
    X2GNN's (init with the flax model). kv_exchange: 'allgather' | 'ring'.
    with_dropout=True returns fn(params, epb, dropout_key) instead — the
    replicated key is folded with each shard's mesh position inside the
    shard_map region (cfg.dropout sets the rate)."""
    n_dev = mesh.devices.size
    assert num_atoms_global % n_dev == 0
    assert kv_exchange in ("allgather", "ring")

    fwd = functools.partial(_ep_forward_local, cfg=cfg,
                            num_atoms_global=num_atoms_global,
                            kv_exchange=kv_exchange)
    batch_spec = EPBatch(**{
        f: (P() if f in ("y", "graph_mask") else P(AXIS))
        for f in EPBatch.__annotations__})
    if with_dropout:
        def fwd_drop(params, epb, key):
            return fwd(params, epb, dropout_key=key)

        sharded = shard_map(
            fwd_drop, mesh=mesh, in_specs=(P(), batch_spec, P()),
            out_specs=P(), check_vma=False)
    else:
        sharded = shard_map(
            fwd, mesh=mesh, in_specs=(P(), batch_spec), out_specs=P(),
            check_vma=False)
    return jax.jit(sharded)


def make_ep_train_step(cfg: ModelConfig, optimizer, ema_decay: float,
                       mesh: Mesh, num_atoms_global: int,
                       kv_exchange: str = "allgather",
                       rng_seed: int = 0) -> Callable:
    """Jitted edge-partitioned training step: forward + backward through
    the sharded model (XLA transposes the collectives: the K/V all-gather
    becomes a reduce-scatter in the backward pass), optimizer + EMA update
    on replicated state. state: TrainState; batch: sharded EPBatch.

    cfg.dropout > 0 threads a per-step, per-shard attention-dropout rng
    (deterministic and resume-stable: derived from rng_seed, the step
    counter, and the shard's mesh position — the DP step's scheme)."""
    dropout = cfg.dropout > 0
    fwd = make_ep_forward(cfg, mesh, num_atoms_global, kv_exchange,
                          with_dropout=dropout)

    def step(state, epb: EPBatch):
        def loss_fn(params):
            if dropout:
                key = jax.random.fold_in(jax.random.PRNGKey(rng_seed),
                                         state.step)
                pred = fwd(params, epb, key)
            else:
                pred = fwd(params, epb)
            return smooth_l1_loss(pred, epb.y, mask=epb.graph_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_update_skip_nonfinite(state, loss, grads, optimizer,
                                           ema_decay)

    return jax.jit(step, donate_argnums=0)
