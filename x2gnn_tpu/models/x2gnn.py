"""X2GNN — end-to-end attention-based molecular GNN, TPU-native.

One flax module covers both reference wrappers:
  * readout='atomwise'  == xgnn_poly + SBFTransformer (xgnn.py:15-75,
    model.py:11-54): per-atom scalars, deep supervision over N+1 readouts,
    summed atoms -> molecules. For extensive targets (U0, zpve, ...).
  * readout='molwise_mean' / 'molwise_add' == xgnn_poly_global +
    SBFTransformerGlobal (xgnn.py:77-137, model.py:56-98): molecule pooling
    before the MLP. For intensive targets (dipole, HOMO, ...).

TPU-first differences from the reference forward (xgnn.py:38-75):
  * the line graph arrives precomputed in the GraphBatch — no scipy CSR
    rebuild per forward (the reference's xgnn.py:52 device->CPU round trip);
  * all shapes are static; padding handled by masks end-to-end;
  * the spherical basis is evaluated as fused jnp recurrences, not 42
    sympy-lambdified closures (angular_basis_layer.py:68-78).

The dead `rbf_trans` parameters of the reference (xgnn.py:30-32, never used
in forward) are deliberately NOT reproduced.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.batching import GraphBatch
from x2gnn_tpu.nn.conv import BlockedEdgeAttentionConv, EdgeAttentionConv
from x2gnn_tpu.nn.layers import (
    Dense, EmbeddingBlock, RadialBasisLayer, ResidualLayer)
from x2gnn_tpu.nn.norm import GraphLayerNorm
from x2gnn_tpu.nn.readout import AtomWiseReadout, MolWiseReadout
from x2gnn_tpu.ops.attention import injective_gather
from x2gnn_tpu.ops.basis import (
    legendre_cos_harmonics, poly_envelope, sbf_2d, sbf_radial_part)
from x2gnn_tpu.ops.segment import segment_sum


class X2GNN(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True):
        cfg = self.config
        drop_active = cfg.dropout > 0 and not deterministic
        num_atoms = batch.numbers.shape[0]
        num_graphs = batch.y.shape[0]

        pos = batch.positions
        blocked = cfg.attention_layout == "blocked"

        # ---- geometry (xgnn.py:39,61-64) ----
        # blocked layout: per-edge quantities live in the in-table layout
        # (N, D, ...) end to end (each edge = exactly one in-slot); other
        # layouts use the flat (E, ...) edge layout.
        if blocked:
            N_, D = batch.in_edges.shape
            edge_mask = batch.in_mask                        # (N, D)
            in_src = batch.edge_src[batch.in_edges]          # (N, D)
            ji = pos[in_src] - pos[:, None, :]               # (N, D, 3)
            d = jnp.sqrt(jnp.maximum((ji * ji).sum(-1), 1e-24))
            edge_feat = injective_gather(batch.edge_feat, batch.in_edges,
                                         batch.edge_inpos, batch.edge_mask)
            # flat-slot views for segment ops (norm, readouts)
            src_flat = in_src.reshape(-1)
            gid_flat = batch.edge_gid[batch.in_edges].reshape(-1)
            mask_flat = edge_mask.reshape(-1)
        else:
            edge_mask = batch.edge_mask
            diff = pos[batch.edge_src] - pos[batch.edge_dst]
            d = jnp.sqrt(jnp.maximum((diff * diff).sum(-1), 1e-24))
            edge_feat = batch.edge_feat
            src_flat = batch.edge_src
            gid_flat = batch.edge_gid
            mask_flat = edge_mask
        # integral features may arrive float16 (transfer/HBM-cache
        # compression — they are bounded in [0, ~1], so fp16 costs only
        # ~5e-4 relative rounding) or int8 with a per-edge scale
        # (feat_dtype='int8', ~0.8% relative — halves the wire bytes
        # again for link-bound reference-scale runs); all math runs
        # f32. A no-op for f32 inputs (same jaxpr, executables
        # unaffected).
        edge_feat = edge_feat.astype(jnp.float32)
        if batch.edge_feat_scale is not None:
            scale = batch.edge_feat_scale.astype(jnp.float32)
            if blocked:
                scale = injective_gather(
                    scale.reshape(-1, 1), batch.in_edges,
                    batch.edge_inpos, batch.edge_mask)     # (N, D, 1)
                edge_feat = edge_feat * scale
            else:
                edge_feat = edge_feat * scale[:, None]
        trip_mask = batch.trip_mask
        # padded edges have d == 0; clamp away from the envelope's 1/x pole
        d_safe = jnp.where(edge_mask, d, 1.0)

        env = poly_envelope(d_safe, cfg.cutoff, cfg.envelope_exponent)
        env = jnp.where(edge_mask, env, 0.0)[..., None]

        # ---- featurization (xgnn.py:54-70) ----
        neo_x = edge_feat * env
        neo_x = jax.nn.silu(Dense(2 * cfg.embedding_size,
                                  name="mat_trans")(neo_x))
        neo_x = jax.nn.silu(Dense(cfg.in_channels, name="emb_trans")(neo_x))

        atom_emb = EmbeddingBlock(cfg.embedding_size,
                                  name="emb_block")(batch.numbers)

        node_rbf = RadialBasisLayer(cfg.rbf_dim, cfg.cutoff,
                                    name="rbf_layer")(d_safe)
        node_rbf = node_rbf * env                # (E, K) or (N, D, K)

        def edgenn(h, tag: str = "", width: Optional[int] = None):
            width = width or cfg.embedding_size
            h = jax.nn.silu(Dense(width, name=f"edgenn{tag}_0")(h))
            return Dense(width, name=f"edgenn{tag}_1")(h)

        v2 = cfg.variant == "v2"
        if blocked:
            # per-triplet edge_attr is a pure function of the media atom
            # (xgnn.py:57-58) -> run the edgenn MLP once per atom
            edge_attr = None if v2 else edgenn(atom_emb)     # (N, emb)
            LK = cfg.sbf_dim * cfg.rbf_dim
            rbf_env = sbf_radial_part(
                d_safe.reshape(-1), cfg.sbf_dim, cfg.rbf_dim, cfg.cutoff,
                cfg.envelope_exponent, mask_flat)            # (N*D, L, K)
            # in->out re-index tables: out2in[n, s] = flat in-slot of atom
            # n's s-th OUT-edge; in2out_flat is the inverse (per in-slot).
            # Real edges only (mode='drop' ignores pad scatter indices).
            out2in = batch.edge_inpos[batch.out_edges]       # (N, D)
            safe_inpos = jnp.where(batch.edge_mask, batch.edge_inpos,
                                   N_ * D)
            in2out_flat = jnp.zeros(N_ * D, jnp.int32).at[safe_inpos].set(
                batch.edge_outpos, mode="drop")
            # loop-invariant: the radial sbf factor of each out-slot's edge
            rbf_env_out = injective_gather(
                rbf_env.reshape(N_ * D, LK), out2in, in2out_flat,
                mask_flat)                                   # (N, D, L*K)
            # per-atom pair geometry: angles between in- and out-edges
            out_dst = batch.edge_dst[batch.out_edges]        # (N, D)
            jk = pos[out_dst] - pos[:, None, :]
            cos_a = jnp.einsum("nid,nkd->nik", ji, jk)
            use_pallas = cfg.use_pallas
            if use_pallas is None:
                use_pallas = jax.default_backend() == "tpu"
            # round-3: dropout streams a pair keep-mask into the fused
            # kernel, so dropout training keeps the Pallas path
            pair_mask = (batch.in_mask[:, :, None]
                         & batch.out_mask[:, None, :]
                         & (in_src[:, :, None] != out_dst[:, None, :]))
            if use_pallas:
                # fused kernel computes the Legendre harmonics in-register
                # from cos(theta); only z + masked id tables are needed.
                # d already holds |ji| (same 1e-24 floor for |jk|).
                d_out = jnp.sqrt(jnp.maximum((jk * jk).sum(-1), 1e-24))
                norm = jnp.maximum(
                    d[:, :, None] * d_out[:, None, :], 1e-12)
                z_cos = jnp.clip(cos_a / norm, -1.0, 1.0)
                a_ids = jnp.where(batch.in_mask, in_src, -1).astype(
                    jnp.int32)
                b_ids = jnp.where(batch.out_mask, out_dst, -2).astype(
                    jnp.int32)
                cbf = None
            else:
                cross = jnp.cross(ji[:, :, None, :], jk[:, None, :, :])
                sin_a = jnp.sqrt(
                    jnp.maximum((cross ** 2).sum(-1), 1e-24))
                theta = jnp.arctan2(sin_a, cos_a)             # (N, D, D)
                cbf = legendre_cos_harmonics(theta, cfg.sbf_dim)
                z_cos = a_ids = b_ids = None
            sbf = None
        else:
            ji = pos[batch.trip_i] - pos[batch.trip_j]
            jk = pos[batch.trip_k] - pos[batch.trip_j]
            cos_a = (ji * jk).sum(-1)
            sin_a = jnp.sqrt(
                jnp.maximum((jnp.cross(ji, jk) ** 2).sum(-1), 1e-24))
            # atan2 avoids acos NaN (xgnn.py:65)
            theta = jnp.arctan2(sin_a, cos_a)
            sbf = sbf_2d(d_safe, theta, batch.trip_src_edge,
                         cfg.sbf_dim, cfg.rbf_dim, cfg.cutoff,
                         cfg.envelope_exponent,
                         edge_mask=edge_mask)                # (T, L*K)
            edge_attr = (None if v2
                         else edgenn(atom_emb[batch.trip_j]))  # (T, emb)

        def readout(i: int):
            if cfg.readout == "atomwise":
                return AtomWiseReadout(cfg.in_channels,
                                       mlp_depth=cfg.mlp_depth,
                                       name=f"readout_{i}")
            pool = "mean" if cfg.readout == "molwise_mean" else "add"
            return MolWiseReadout(cfg.in_channels, mlp_depth=cfg.mlp_depth,
                                  pool=pool, name=f"readout_{i}")

        # flat per-edge rows for segment ops: (E,) arrays in flat layouts,
        # (N*D,) flat in-slots in the blocked layout
        node_rbf_flat = node_rbf.reshape(-1, cfg.rbf_dim)

        edges_to_src_atoms = None
        if blocked:
            # scatter-free readout aggregation: re-index gated edge rows
            # into the out-table (rows = SOURCE atoms, matching the
            # reference's scatter over edge_index[0], readout.py:37) and
            # dense-sum over the degree axis — a gather + reduction
            # instead of an XLA scatter, per readout, per layer
            out_mask3 = batch.out_mask[..., None]

            def edges_to_src_atoms(gated):
                g_out = injective_gather(gated, out2in, in2out_flat,
                                         mask_flat)
                return jnp.where(out_mask3, g_out, 0.0).sum(axis=1)

        def run_readout(i: int, x):
            if cfg.readout == "atomwise":
                return readout(i)(x, node_rbf_flat, src_flat, num_atoms,
                                  edge_mask=mask_flat,
                                  aggregate=edges_to_src_atoms)
            return readout(i)(x, node_rbf_flat, src_flat, batch.atom_gid,
                              num_atoms, num_graphs, edge_mask=mask_flat,
                              node_mask=batch.node_mask,
                              aggregate=edges_to_src_atoms)

        conv_dtype = (jnp.bfloat16
                      if cfg.compute_dtype == "bfloat16" else None)
        out = neo_x.reshape(-1, cfg.in_channels)
        results = run_readout(0, out)
        for i in range(cfg.conv_layers):
            res0 = out
            if v2:
                # V2 (model.py:136-140): per-layer edge_attr from the
                # aggregated atom representations of the media atom
                atoms_rep = (edges_to_src_atoms(out)
                             if edges_to_src_atoms is not None
                             else segment_sum(out, src_flat, num_atoms,
                                              mask=mask_flat))
                h = edgenn(atoms_rep, tag=f"_{i}", width=cfg.in_channels)
                edge_attr = h if blocked else h[batch.trip_j]
            if blocked:
                conv = BlockedEdgeAttentionConv(
                    cfg.in_channels, cfg.heads,
                    sbf_l=cfg.sbf_dim, sbf_k=cfg.rbf_dim,
                    dropout=cfg.dropout,
                    use_pallas=use_pallas, dtype=conv_dtype,
                    use_beta=cfg.beta,
                    name=f"conv_{i}")

                # With cfg.remat, the conv's internals (DxD pair scores,
                # per-triplet messages) are recomputed in the backward
                # pass instead of stored — O(layers) -> O(1) activation
                # memory for the dominant tensors. Every traced array
                # must be an EXPLICIT argument (closed-over tracers leak
                # across the lifted-remat boundary under jit); only the
                # static ints ride the closure.
                def call_blocked(mdl, x, e_atom, nrbf, renv, cbf_, o2i,
                                 i2o, imask, pmask, z_, aid, bid):
                    return mdl(x, nrbf, renv, cbf_, e_atom, o2i, i2o,
                               imask, pmask, z=z_, a_ids=aid, b_ids=bid,
                               n_hi=batch.n_hi, d_lo=batch.d_lo,
                               tiers=batch.tiers,
                               deterministic=deterministic)

                if cfg.remat:
                    call_blocked = nn.remat(call_blocked)
                out = call_blocked(conv,
                                   out.reshape(N_, D, cfg.in_channels),
                                   edge_attr, node_rbf, rbf_env_out, cbf,
                                   out2in, in2out_flat, batch.in_mask,
                                   pair_mask, z_cos, a_ids, b_ids)
                out = out.reshape(-1, cfg.in_channels).astype(jnp.float32)
            else:
                conv = EdgeAttentionConv(
                    cfg.in_channels, cfg.heads, cfg.dropout,
                    layout=cfg.attention_layout, dtype=conv_dtype,
                    use_beta=cfg.beta,
                    name=f"conv_{i}")

                drop_pair_pos = drop_space = None
                if drop_active:
                    # canonical pair-space dropout coordinates so the
                    # segment, padded AND blocked layouts drop the SAME
                    # weights under one rng (pair_dropout_mask; the
                    # padded conv gathers per neighbor slot via
                    # nbr_trip)
                    from x2gnn_tpu.ops.attention import (
                        triplet_pair_positions)
                    drop_space = batch.in_edges.shape
                    drop_pair_pos = triplet_pair_positions(
                        batch.trip_dst_edge, batch.trip_src_edge,
                        batch.edge_inpos, batch.edge_outpos,
                        drop_space[1])

                def call_conv(mdl, x, e_attr, nrbf, sbf_, tsrc, tdst,
                              tmask, ntrip, nsrc, nmask, dpp):
                    return mdl(x, nrbf, sbf_, e_attr, tsrc, tdst,
                               trip_mask=tmask, nbr_trip=ntrip,
                               nbr_src=nsrc, nbr_mask=nmask,
                               deterministic=deterministic,
                               drop_pair_pos=dpp, drop_space=drop_space)

                if cfg.remat:
                    call_conv = nn.remat(call_conv)
                out = call_conv(conv, out, edge_attr, node_rbf, sbf,
                                batch.trip_src_edge, batch.trip_dst_edge,
                                trip_mask, batch.nbr_trip, batch.nbr_src,
                                batch.nbr_mask, drop_pair_pos)
                out = out.astype(jnp.float32)
            out = GraphLayerNorm(name=f"norm_{i}")(
                out, gid_flat, num_graphs, mask=mask_flat)
            out = ResidualLayer(cfg.in_channels, name=f"bf_skip_{i}")(out)
            out = jax.nn.silu(
                Dense(cfg.in_channels, name=f"dense_bf_skip_{i}")(out))
            out = out + res0
            out = ResidualLayer(cfg.in_channels, name=f"af_skip_{i}_0")(out)
            out = ResidualLayer(cfg.in_channels, name=f"af_skip_{i}_1")(out)
            results = results + run_readout(i + 1, out)

        if cfg.readout == "atomwise":
            # per-atom scalars -> molecule sums (model.py:53)
            results = segment_sum(results, batch.atom_gid, num_graphs,
                                  mask=batch.node_mask)
        if v2:
            results = results / cfg.conv_layers              # model.py:150
        return results.reshape(-1)                           # (G,)


def make_model(config: Optional[ModelConfig] = None) -> X2GNN:
    return X2GNN(config or ModelConfig())
