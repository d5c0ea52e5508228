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

  * attention (scores, softmax, aggregation) is fully local per atom row
    and runs the fused Pallas kernel per shard (cfg.use_pallas);
  * K/V/rbf rows live on their destination atom's device and move through
    ONE exchange per layer — a custom-VJP gather through the `out2in`
    table whose BACKWARD gathers through the inverse `in2out` table
    (real in-/out-slots are in bijection), so no XLA scatter exists in
    either pass; 'allgather' assembles the full table per device, 'ring'
    rotates shards with ppermute (ring-attention memory profile);
  * per-edge dense layers, residuals, and LayerNorm are local (LayerNorm
    graph statistics are one-hot matmuls psum'ed over the mesh — a graph
    may span every device);
  * readouts aggregate edges into their SOURCE atoms (readout.py:37) by
    the same exchange into the out-table (rows = source atoms) + a dense
    degree-axis sum — the single-chip blocked path's scatter-free
    aggregation, distributed;
  * molecule pooling and the loss are tiny one-hot matmuls replicated
    via psum.

Round-4 note: the first EP-on-TPU measurement caught the previous
design (segment_sum scatters + gather-transpose scatters in backward)
at ~100x the single-chip blocked step cost — XLA lowers irregular
scatters serially on TPU. Everything irregular is now a gather with a
gather backward, or a one-hot matmul.

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
    in2out: np.ndarray         # (N, D) int32 flat global OUT-slot of each
                               # in-slot's edge (the inverse table — the
                               # exchange's backward gathers through it,
                               # so no scatter appears in either pass)
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
    # preserve an fp16 feature wire (halves the dominant transfer/cache
    # bytes, trainer --feat-dtype float16); anything else rides as f32
    feat_dtype = (np.float16 if b.edge_feat.dtype == np.float16
                  else np.float32)
    feat_blk = np.where(in_mask[..., None], b.edge_feat[in_edges],
                        np.zeros((), b.edge_feat.dtype))
    out_dst_blk = np.where(out_mask, b.edge_dst[out_edges], 0).astype(
        np.int32)
    out2in = np.where(out_mask, b.edge_inpos[out_edges], 0).astype(np.int32)
    in2out = np.where(in_mask, b.edge_outpos[in_edges], 0).astype(np.int32)
    return EPBatch(
        numbers=padN(b.numbers),
        positions=padN(b.positions.astype(np.float32)),
        atom_ids=np.arange(N + pad, dtype=np.int32),
        atom_gid=padN(b.atom_gid),
        node_mask=padN(b.node_mask, fill=False),
        edge_src_blk=edge_src_blk, edge_gid_blk=edge_gid_blk,
        in_mask=in_mask, feat_blk=feat_blk.astype(feat_dtype),
        out_dst_blk=out_dst_blk, out_mask=out_mask, out2in=out2in,
        in2out=in2out,
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


def _onehot_segment_sum(x, gid, num_segments: int):
    """Scatter-free segment sum for SMALL segment counts (graphs, atom
    types): a one-hot matmul that XLA tiles onto the MXU instead of the
    serial scatter the default segment_sum lowers to on TPU (measured
    ~100x step cost in the round-4 EP-on-TPU bench). x: (R,) or (R, C)."""
    onehot = jax.nn.one_hot(gid, num_segments, dtype=jnp.float32)  # (R, G)
    if x.ndim == 1:
        return onehot.T @ x.astype(jnp.float32)
    return onehot.T @ x.astype(jnp.float32)


@jax.custom_vjp
def _freq_lookup_psum(tbl, idx):
    return tbl[idx]


def _freq_lookup_fwd(tbl, idx):
    return tbl[idx], (idx, tbl.shape)


def _freq_lookup_bwd(res, g):
    idx, tbl_shape = res
    onehot = jax.nn.one_hot(idx, tbl_shape[0], dtype=g.dtype)   # (Nl, Z)
    counts = jax.lax.psum(onehot.sum(0), AXIS)
    scale = 1.0 / jnp.maximum(counts[idx], 1.0)
    dtbl = onehot.T @ (g * scale[:, None])
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
    rows; gid/mask: (R,). Per-graph statistics are one-hot matmuls, not
    scatters (see _onehot_segment_sum)."""
    feat = x.shape[-1]
    xm = jnp.where(mask[:, None], x, 0.0)
    count = _onehot_segment_sum(mask.astype(x.dtype), gid, num_graphs)
    count = jnp.maximum(jax.lax.psum(count, AXIS) * feat, 1.0)
    total = _onehot_segment_sum(xm.sum(-1), gid, num_graphs)
    mean = jax.lax.psum(total, AXIS) / count
    centered = x - mean[gid][:, None]
    cm = jnp.where(mask[:, None], centered, 0.0)
    sq = _onehot_segment_sum((cm * cm).sum(-1), gid, num_graphs)
    var = jax.lax.psum(sq, AXIS) / count
    out = centered / jnp.sqrt(var + eps)[gid][:, None]
    return jnp.where(mask[:, None], out, 0.0)


# ---------------------------------------------------------------------------
# the sharded-table row exchange (the only irregular op in the layout)
# ---------------------------------------------------------------------------

def _gather_rows_ring(buf, ids, take_mask, axis_name=AXIS):
    """Assemble rows of a globally-flat, atom-sharded table by rotating
    shards around the ring (ppermute) — peak memory one remote shard,
    each collective-permute overlapped with the previous step's gather
    (the ring-attention exchange pattern, SURVEY §5). buf: (R_local, C);
    ids: (Nl, D) GLOBAL flat row ids; returns (Nl, D, C)."""
    n_dev = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    rows = buf.shape[0]
    out = jnp.zeros(ids.shape + (buf.shape[-1],), buf.dtype)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    for s in range(n_dev):
        owner = (me - s) % n_dev       # shard currently held in buf
        lo = owner * rows
        in_range = ((ids >= lo) & (ids < lo + rows) & take_mask)
        idx = jnp.clip(ids - lo, 0, rows - 1)
        out = out + jnp.where(in_range[..., None], buf[idx], 0.0)
        if s < n_dev - 1:
            buf = jax.lax.ppermute(buf, axis_name, perm)
    return out


def _gather_rows(x_flat, ids, take_mask, mode: str):
    if mode == "ring":
        return _gather_rows_ring(x_flat, ids, take_mask)
    xg = jax.lax.all_gather(x_flat, AXIS, axis=0, tiled=True)
    return jnp.where(take_mask[..., None], xg[ids], 0.0)


@functools.lru_cache(maxsize=None)
def _make_exchange(mode: str):
    """exchange(x_flat, ids, inv_ids, take_mask, src_mask) -> (Nl, D, C).

    Gathers rows `ids` (GLOBAL flat slot space) of the atom-sharded table
    `x_flat` (Nl*D local rows). Real in-slots and out-slots are in
    bijection (each edge occupies exactly one of each), so the BACKWARD
    is the same gather through the inverse table `inv_ids` on the
    cotangents — no scatter in either pass (the XLA scatter this avoids
    measured ~100x the step cost on TPU, round-4 bench). The custom VJP
    takes every traced operand explicitly (no closed-over tracers:
    jax.checkpoint/remat re-traces through this, CLAUDE.md rule)."""

    @jax.custom_vjp
    def exchange(x_flat, ids, inv_ids, take_mask, src_mask):
        return _gather_rows(x_flat, ids, take_mask, mode)

    def fwd(x_flat, ids, inv_ids, take_mask, src_mask):
        return (_gather_rows(x_flat, ids, take_mask, mode),
                (inv_ids, take_mask, src_mask))

    def bwd(res, g):
        inv_ids, take_mask, src_mask = res
        g = jnp.where(take_mask[..., None], g, 0.0)
        gf = g.reshape(-1, g.shape[-1])
        dx = _gather_rows(gf, inv_ids, src_mask, mode)
        dx = dx.reshape(-1, g.shape[-1])
        int0 = lambda a: jnp.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
        return dx, int0(inv_ids), int0(inv_ids), int0(take_mask), \
            int0(src_mask)

    exchange.defvjp(fwd, bwd)
    return exchange


# ---------------------------------------------------------------------------
# the per-device forward (runs inside shard_map)
# ---------------------------------------------------------------------------


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

    # the one irregular op in the layout: gather rows of a sharded flat
    # table into the local out-table (fwd) / in-table (bwd) — custom VJP,
    # scatter-free in both passes
    exchange = _make_exchange(kv_exchange)

    def to_out(x_blk):
        """(Nl, D, C) in-layout -> (Nl, D, C) out-layout (masked rows 0)."""
        return exchange(x_blk.reshape(Nl * D, x_blk.shape[-1]),
                        epb.out2in, epb.in2out, epb.out_mask, in_mask)

    pos_g = jax.lax.all_gather(epb.positions, AXIS, axis=0, tiled=True)

    # ---- geometry (in-layout; each edge occupies exactly one in-slot) ----
    own = epb.positions[:, None, :]                      # (Nl, 1, 3)
    ji = pos_g[epb.edge_src_blk] - own                   # (Nl, D, 3)
    d = jnp.sqrt(jnp.maximum((ji * ji).sum(-1), 1e-24))
    d_safe = jnp.where(in_mask, d, 1.0)
    env = poly_envelope(d_safe, cfg.cutoff, cfg.envelope_exponent)
    env = jnp.where(in_mask, env, 0.0)[..., None]        # (Nl, D, 1)

    # ---- featurization ----
    neo_x = jax.nn.silu(_lin(p["mat_trans"],
                         epb.feat_blk.astype(jnp.float32) * env))
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

    def edges_to_src_atoms(x_blk):
        """Edge rows -> their SOURCE atoms (readout.py:37 scatter over
        edge_index[0]), scatter-free: exchange into the out-table (rows
        = source atoms, possibly remote) and dense-sum the degree axis."""
        return to_out(x_blk).sum(axis=1)                 # (Nl, C)

    def run_readout(i, x_blk):
        rp = p[f"readout_{i}"]
        gate = _lin(rp["lin_rbf"], node_rbf)
        atoms = edges_to_src_atoms(gate * x_blk)         # (Nl, HC)
        if cfg.readout == "atomwise":
            return _mlp(rp["mlp"], atoms, cfg.mlp_depth)  # (Nl, 1)
        # molwise: pool atoms -> graphs (replicated via psum), MLP on (G,)
        nm = epb.node_mask
        pooled = _onehot_segment_sum(
            jnp.where(nm[:, None], atoms, 0.0), epb.atom_gid, G)
        pooled = jax.lax.psum(pooled, AXIS)
        if cfg.readout == "molwise_mean":
            cnt = jax.lax.psum(_onehot_segment_sum(
                nm.astype(jnp.float32), epb.atom_gid, G), AXIS)
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
        # gather K/V/rbf source rows: in-layout rows live on their dst
        # atom's device. One fused exchange (concat on the channel axis)
        # instead of three collectives; 'allgather' = full table per
        # device, 'ring' = ppermute rotation (peak memory one shard)
        kvr = jnp.concatenate(
            [k_in.reshape(-1, HC), v_in.reshape(-1, HC),
             rbf_env.reshape(-1, L * K)], axis=-1)
        got = exchange(kvr, epb.out2in, epb.in2out, epb.out_mask,
                       in_mask)                          # (Nl, D, 2HC+LK)
        k_out = got[..., :HC]
        v_out = got[..., HC:2 * HC]
        rbf_out = got[..., 2 * HC:]
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
            atoms_rep = edges_to_src_atoms(out)          # (Nl, HC)
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
        per_graph = _onehot_segment_sum(
            jnp.where(nm[:, None], results, 0.0), epb.atom_gid, G)
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
