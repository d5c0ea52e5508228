"""Line-graph multi-head attention convolution — the model's hot kernel.

Re-design of SBFTransformerConv (sbftransformer_conv.py:16-166): a
transformer-style attention over the line graph where, for each triplet
t = (edge jk -> edge ij):

    key/value source = edge jk, gated by a radial-basis filter;
    the media atom embedding (projected once by `lin_edge`) is added to BOTH
    the key and the value (sbftransformer_conv.py:142-158);
    scores are dot products scaled by 1/sqrt(head_dim), segment-softmaxed
    over the destination edge (PyG softmax, :150-151);
    messages are modulated elementwise by the projected 2D spherical basis
    `lin_sbf(sbf)` (:155-158) and sum-aggregated into the destination edge;
    a skip projection of the destination features is added (:120-127).

Layouts:
  * 'segment' — COO triplets + masked segment ops. Parity baseline; the
    default XLA lowering of the scatter is the 1x denominator for the
    kernel benchmarks.
  * 'padded' / Pallas paths live in x2gnn_tpu.ops (wired via `attention_fn`).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from x2gnn_tpu.nn.init import glorot_orthogonal
from x2gnn_tpu.nn.layers import TorchDense
from x2gnn_tpu.ops.attention import (
    beta_gate, blocked_attention_core, injective_gather, padded_attention,
    pair_dropout_mask)
from x2gnn_tpu.ops.segment import segment_softmax, segment_sum


class _LinearParams(nn.Module):
    """Holds a (kernel, bias) pair with the SAME param-tree layout as
    nn.Dense, for layouts that contract the weights inside a fused kernel
    instead of applying a plain dense layer."""

    features_in: int
    features_out: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", glorot_orthogonal(),
                            (self.features_in, self.features_out),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features_out,), jnp.float32)
        return kernel, bias


class EdgeAttentionConv(nn.Module):
    channels: int          # in == out (concat of heads)
    heads: int = 16
    dropout: float = 0.0
    # 'segment' = COO triplets + masked segment ops (parity baseline);
    # 'padded' = dense neighbor-table attention (TPU performance path,
    # requires nbr_* arrays from the batch)
    layout: str = "segment"
    # computation dtype for projections + attention (params stay f32)
    dtype: Optional[Any] = None
    # optional override: fn(q, k, v, e_proj, s_proj, trip_src, trip_dst,
    # mask, E) -> (E, H, C); used to swap in Pallas kernels.
    attention_fn: Optional[Callable] = None
    # beta-gated skip connection (reference defines it with beta=False in
    # every use, sbftransformer_conv.py:25,122-125)
    use_beta: bool = False

    @nn.compact
    def __call__(self, x, rbf, sbf, edge_attr, trip_src, trip_dst,
                 trip_mask=None, nbr_trip=None, nbr_src=None, nbr_mask=None,
                 deterministic: bool = True,
                 return_attention_weights: bool = False,
                 drop_pair_pos=None, drop_space=None):
        """x: (E, C) line-graph node (= atom-graph edge) features;
        rbf: (E, K) radial basis per edge; sbf: (T, L*K) per-triplet 2D
        basis; edge_attr: (T, emb) media-atom embedding per triplet;
        trip_src/trip_dst: (T,) edge ids (jk / ij)."""
        num_edges = x.shape[0]
        H = self.heads
        C = self.channels // H

        rbf_filter = nn.Dense(
            self.channels, use_bias=False, dtype=self.dtype,
            kernel_init=glorot_orthogonal(), name="lin_rbf")(rbf)
        x_src = x * rbf_filter                      # gate K/V source features
        x_dst = x

        query = TorchDense(self.channels, dtype=self.dtype,
                           name="lin_query")(x_dst)
        key = TorchDense(self.channels, dtype=self.dtype,
                         name="lin_key")(x_src)
        value = TorchDense(self.channels, dtype=self.dtype,
                           name="lin_value")(x_src)
        # one projection of the media-atom embedding, shared by key AND value
        # (sbftransformer_conv.py:142-158 adds the same tensor to both)
        eattr = TorchDense(self.channels, use_bias=False, dtype=self.dtype,
                           name="lin_edge")(edge_attr)
        sbf_proj = nn.Dense(
            self.channels, use_bias=True, dtype=self.dtype,
            kernel_init=glorot_orthogonal(),
            bias_init=nn.initializers.zeros, name="lin_sbf")(sbf)

        q = query.reshape(num_edges, H, C)
        k = key.reshape(num_edges, H, C)
        v = value.reshape(num_edges, H, C)
        e = eattr.reshape(-1, H, C)
        s = sbf_proj.reshape(-1, H, C)

        drop_active = self.dropout > 0.0 and not deterministic
        if drop_active and self.attention_fn is not None:
            raise NotImplementedError(
                "attention dropout with a custom attention_fn override "
                "is unsupported (the override signature carries no rng); "
                "use a built-in layout or dropout=0")
        weights = None
        if self.attention_fn is not None:
            out = self.attention_fn(q, k, v, e, s, trip_src, trip_dst,
                                    trip_mask, num_edges)
        elif self.layout == "padded":
            assert nbr_trip is not None, "padded layout needs nbr_* arrays"
            drop_slots = None
            if drop_active:
                if drop_pair_pos is not None:
                    # canonical pair-space mask gathered per neighbor
                    # slot (via each slot's triplet id) — identical
                    # weights dropped as segment/blocked under one rng
                    N_, D_ = drop_space
                    mask = pair_dropout_mask(
                        self.make_rng("dropout"), self.dropout, N_, D_, H)
                    drop_slots = mask.reshape(-1, H)[drop_pair_pos][
                        nbr_trip]                        # (E, D, H)
                else:
                    # standalone use without blocked tables: iid draw
                    keep = 1.0 - self.dropout
                    drop_slots = jax.random.bernoulli(
                        self.make_rng("dropout"), keep,
                        nbr_trip.shape + (H,)).astype(jnp.float32) / keep
            out = padded_attention(q, k, v, e, s, nbr_trip, nbr_src,
                                   nbr_mask, dropout_mask=drop_slots)
        else:
            q_i = q[trip_dst]                       # (T, H, C)
            k_j = k[trip_src] + e
            alpha = (q_i * k_j).sum(-1) / jnp.sqrt(float(C))   # (T, H) SDDMM
            alpha = segment_softmax(alpha, trip_dst, num_edges,
                                    mask=trip_mask)
            weights = alpha                         # (T, H) per-triplet
            if self.dropout > 0.0 and not deterministic:
                if drop_pair_pos is not None:
                    # canonical pair-space mask (identical across layouts
                    # under one rng; see ops.attention.pair_dropout_mask).
                    # drop_space = (N, D) of the blocked tables.
                    N_, D_ = drop_space
                    mask = pair_dropout_mask(
                        self.make_rng("dropout"), self.dropout, N_, D_, H)
                    alpha = alpha * mask.reshape(-1, H)[drop_pair_pos]
                else:
                    # standalone conv use without blocked tables: iid draw
                    alpha = nn.Dropout(rate=self.dropout)(
                        alpha, deterministic=False)
            v_j = v[trip_src] + e
            msg = v_j * s * alpha[..., None]        # (T, H, C)
            out = segment_sum(msg, trip_dst, num_edges,
                              mask=trip_mask)       # SpMM scatter
        out = out.reshape(num_edges, H * C)
        skip = TorchDense(self.channels, name="lin_skip")(x_dst)
        if self.use_beta:
            # beta-gated skip (sbftransformer_conv.py:122-125; defined by
            # the reference but beta=False in every model use)
            out = beta_gate(out, skip,
                            TorchDense(1, use_bias=False, name="lin_beta"))
        else:
            out = out + skip
        if return_attention_weights:
            # sbftransformer_conv.py:129-134 equivalent (segment layout)
            assert weights is not None, (
                "attention weights only available in the segment layout")
            return out, weights
        return out


class BlockedEdgeAttentionConv(nn.Module):
    """Atom-blocked layout of EdgeAttentionConv (see
    ops.attention.blocked_attention_core). Identical math and an identical
    parameter tree (init with one layout, apply with any other).

    IN-LAYOUT calling convention: every per-edge activation lives in the
    in-table blocked layout (N, D, C) — row j holds atom j's incoming
    edges — end to end. Each edge occupies exactly one in-slot, so this IS
    a (padded) per-edge layout; keeping it across the whole layer stack
    means the only irregular ops per layer are the two K/V in->out
    re-index gathers (scatter-free via `injective_gather`). Q, the
    attention output, the skip path, norms, residuals and readout inputs
    need no gather at all.

    use_pallas: None = auto (fused Pallas kernel on TPU, XLA elsewhere)."""

    channels: int
    heads: int = 16
    sbf_l: int = 7     # num_spherical
    sbf_k: int = 6     # num_radial
    # attention-weight dropout (sbftransformer_conv.py:153). Active
    # (dropout > 0 and deterministic=False) it draws a per-(atom, in-slot,
    # out-slot, head) keep mask from the 'dropout' rng stream — the same
    # pair space, stream and shape the segment layout uses, so the
    # layouts drop identical weights under one rng (equivalence-tested).
    # Round-3: the mask streams INTO the fused Pallas kernel, so
    # dropout > 0 (and return_attention_weights) keep the fused path.
    dropout: float = 0.0
    use_pallas: Optional[bool] = None
    # bfloat16 halves the K/V re-index gather traffic and the projection
    # FLOPs; params stay f32 and all attention math runs f32 (the Pallas
    # kernel widens at load; the XLA path casts before the core)
    dtype: Optional[Any] = None
    # beta-gated skip (see EdgeAttentionConv.use_beta)
    use_beta: bool = False

    @nn.compact
    def __call__(self, x_blk, rbf_blk, rbf_env_out, cbf, atom_edge_attr,
                 out2in, in2out_flat, in_mask, pair_mask,
                 z=None, a_ids=None, b_ids=None,
                 n_hi: int = 0, d_lo: int = 0, tiers: tuple = (),
                 deterministic: bool = True,
                 return_attention_weights: bool = False):
        """x_blk: (N, D, C) in-layout line-graph node features;
        rbf_blk: (N, D, K) radial basis (in-layout); rbf_env_out:
        (N, D, L*K) radial sbf factor of the OUT-table rows (hoisted out
        of the layer loop — loop-invariant); cbf: (N, D, D, L) angular
        factor (XLA path); atom_edge_attr: (N, emb); out2in: (N, D) flat
        in-slot of each out-slot's edge; in2out_flat: (N*D,) inverse;
        in_mask: (N, D); z/a_ids/b_ids: cos(angle) + masked atom-id
        tables (Pallas path computes the harmonics in-kernel)."""
        N, D = in_mask.shape
        H = self.heads
        C = self.channels // H
        L, K = self.sbf_l, self.sbf_k
        in_mask_flat = in_mask.reshape(-1)

        rbf_filter = nn.Dense(
            self.channels, use_bias=False, dtype=self.dtype,
            kernel_init=glorot_orthogonal(), name="lin_rbf")(rbf_blk)
        x_src = x_blk * rbf_filter
        x_dst = x_blk

        q = TorchDense(self.channels, dtype=self.dtype,
                       name="lin_query")(x_dst)
        e_atom = TorchDense(self.channels, use_bias=False, dtype=self.dtype,
                            name="lin_edge")(atom_edge_attr)
        w_sbf, b_sbf = _LinearParams(L * K, self.channels,
                                     name="lin_sbf")()

        # ONE in->out re-index of the gated source features, then the
        # K/V projections run directly in the out layout (row-wise
        # Dense commutes with the injective gather — identical values
        # on real rows; pad rows carry the bias but every consumer
        # masks pairs, and the kernel's dk/dv are zero there so the
        # bias gradient is unaffected). Halves the irregular-gather
        # bytes per layer vs projecting first and gathering K and V
        # separately (round 5; the gathers are ~25% of the saturated
        # kernel benchmark).
        x_src_out = injective_gather(x_src.reshape(N * D, self.channels),
                                     out2in, in2out_flat, in_mask_flat)
        k_out = TorchDense(self.channels, dtype=self.dtype,
                           name="lin_key")(x_src_out)
        v_out = TorchDense(self.channels, dtype=self.dtype,
                           name="lin_value")(x_src_out)

        drop_active = self.dropout > 0.0 and not deterministic
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            assert z is not None and a_ids is not None
            from x2gnn_tpu.ops.pallas import (
                expand_block_diagonal, pallas_blocked_attention)
            w_bd = expand_block_diagonal(w_sbf, L, K, self.channels)
            e_a = e_atom.reshape(N, self.channels)
            bias = b_sbf.reshape(1, self.channels)
            drop_mask = None
            if drop_active:
                # canonical pair-space keep mask streamed INTO the fused
                # kernel (round-3: dropout > 0 keeps the Pallas path);
                # same rng stream/shape as the XLA core and segment
                # layouts, so all three drop identical weights
                drop_mask = pair_dropout_mask(
                    self.make_rng("dropout"), self.dropout, N, D, H)
            want_a = bool(return_attention_weights)
            if tiers:
                # rectangular multi-tier windows (round 5): atoms are
                # degree-sorted; rows [end_{t-1}, end_t) have degree <=
                # di_t and run an EXACT-di x rounded-8-dk kernel window
                # (di rides the collapsed slab row dim — no alignment
                # cost; see data/batching.py::plan_degree_tiers). Every
                # tier slices the SAME canonical pair-space dropout
                # mask, so layout equivalence under one rng holds.
                # Assembly is pad+concat, NOT chained .at[].set: >= 3
                # Mosaic custom-calls feeding dynamic-update-slices of
                # one buffer SIGABRT the TPU AOT compiler (round 5,
                # reproduced minimally); concatenation lowers clean.
                pieces = []
                alpha_tiers = []
                b0 = 0
                for (b1, di, dk) in tiers:
                    if b1 == b0:
                        continue
                    o_t = pallas_blocked_attention(
                        q[b0:b1, :di], k_out[b0:b1, :dk],
                        v_out[b0:b1, :dk], e_a[b0:b1],
                        rbf_env_out[b0:b1, :dk], w_bd, bias,
                        z[b0:b1, :di, :dk],
                        a_ids[b0:b1, :di], b_ids[b0:b1, :dk],
                        heads=H, num_radial=K,
                        dropout_mask=(None if drop_mask is None
                                      else drop_mask[b0:b1, :di, :dk]),
                        return_alpha=want_a)
                    if want_a:
                        o_t, a_t = o_t
                        alpha_tiers.append(jnp.pad(
                            a_t, ((0, 0), (0, D - di), (0, D - dk),
                                  (0, 0))))
                    pieces.append(jnp.pad(o_t, ((0, 0), (0, D - di),
                                                (0, 0))))
                    b0 = b1
                out = jnp.concatenate(pieces, axis=0)
                if want_a:
                    alpha_pairs = jnp.concatenate(alpha_tiers, axis=0)
            elif 0 < n_hi < N and 0 < d_lo < D:
                # two-tier degree split: atoms are degree-sorted, so rows
                # >= n_hi all have degree <= d_lo — run them in a
                # (d_lo x d_lo) window (most of a batch's atoms; the D^2
                # pad compute of the full budget is reclaimed)
                out_hi = pallas_blocked_attention(
                    q[:n_hi], k_out[:n_hi], v_out[:n_hi], e_a[:n_hi],
                    rbf_env_out[:n_hi], w_bd, bias,
                    z[:n_hi], a_ids[:n_hi], b_ids[:n_hi],
                    heads=H, num_radial=K,
                    dropout_mask=(None if drop_mask is None
                                  else drop_mask[:n_hi]),
                    return_alpha=want_a)
                out_lo = pallas_blocked_attention(
                    q[n_hi:, :d_lo], k_out[n_hi:, :d_lo],
                    v_out[n_hi:, :d_lo], e_a[n_hi:],
                    rbf_env_out[n_hi:, :d_lo], w_bd, bias,
                    z[n_hi:, :d_lo, :d_lo],
                    a_ids[n_hi:, :d_lo], b_ids[n_hi:, :d_lo],
                    heads=H, num_radial=K,
                    dropout_mask=(None if drop_mask is None
                                  else drop_mask[n_hi:, :d_lo, :d_lo]),
                    return_alpha=want_a)
                if want_a:
                    out_hi, alpha_hi = out_hi
                    out_lo, alpha_lo = out_lo
                    alpha_pairs = jnp.zeros((N, D, D, H), alpha_hi.dtype)
                    alpha_pairs = alpha_pairs.at[:n_hi].set(alpha_hi)
                    alpha_pairs = alpha_pairs.at[
                        n_hi:, :d_lo, :d_lo].set(alpha_lo)
                out = jnp.zeros((N, D, self.channels), out_hi.dtype)
                out = out.at[:n_hi].set(out_hi)
                out = out.at[n_hi:, :d_lo].set(out_lo)
            else:
                out = pallas_blocked_attention(
                    q, k_out, v_out, e_a,
                    rbf_env_out, w_bd, bias,
                    z, a_ids, b_ids, heads=H, num_radial=K,
                    dropout_mask=drop_mask,
                    return_alpha=want_a)               # (N, D, HC)
                if want_a:
                    out, alpha_pairs = out
        else:
            drop_mask = None
            if drop_active:
                # pair-space keep mask, shared shape/stream with the
                # segment layout's draw (see pair_dropout_mask)
                drop_mask = pair_dropout_mask(
                    self.make_rng("dropout"), self.dropout, N, D, H)
            G = jnp.einsum("nelk,lkf->nelf",
                           rbf_env_out.reshape(N, D, L, K),
                           w_sbf.reshape(L, K, self.channels))
            f32 = jnp.float32
            out = blocked_attention_core(
                q.reshape(N, D, H, C).astype(f32),
                k_out.reshape(N, D, H, C).astype(f32),
                v_out.reshape(N, D, H, C).astype(f32),
                e_atom.reshape(N, H, C).astype(f32),
                G.reshape(N, D, L, H, C),
                b_sbf.reshape(H, C),
                cbf, pair_mask, dropout_mask=drop_mask,
                return_alpha=return_attention_weights)
            if return_attention_weights:
                out, alpha_pairs = out
            out = out.reshape(N, D, self.channels)
        skip = TorchDense(self.channels, name="lin_skip")(x_dst)
        if self.use_beta:
            out = beta_gate(out, skip,
                            TorchDense(1, use_bias=False, name="lin_beta"))
        else:
            out = out + skip
        if return_attention_weights:
            # per-pair pre-dropout alpha (N, Di, Do, H) — map to triplet
            # weights with ops.attention.pairs_to_triplet_weights for
            # cross-layout comparison (sbftransformer_conv.py:129-134)
            return out, alpha_pairs
        return out
