"""Benchmark: edge-attention kernel throughput (SDDMM + segment softmax +
SpMM) on the current accelerator.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = speedup of the best layout over the XLA-default scatter
(segment) implementation — the reference's torch-scatter/PyG role is played
by XLA scatter here, and BASELINE.md's north star asks for >= 3x over it.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _enable_compile_cache():
    """Persistent compilation cache — the TPU tunnel compiles remotely and
    slowly (~minutes per executable); cache hits make reruns instant."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as exc:  # cache is best-effort
        log(f"compile cache unavailable: {exc}")


def main():
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.ops.attention import (
        blocked_attention, segment_attention, padded_attention)

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # QM9-scale batch: 32 molecules, ~18 atoms, 5 A cutoff
    graphs = synthetic_dataset(32, mean_atoms=18, seed=7)
    batch = pad_graphs(graphs, pad_budget_for(graphs, 32))
    E = batch.edge_src.shape[0]
    T = batch.trip_src_edge.shape[0]
    real_T = int(batch.trip_mask.sum())
    H, C = 16, 8
    log(f"batch: E={E} T={T} (real {real_T}) D={batch.nbr_trip.shape[1]}")

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    q = jnp.asarray(rng.normal(size=(E, H, C)), f32)
    k = jnp.asarray(rng.normal(size=(E, H, C)), f32)
    v = jnp.asarray(rng.normal(size=(E, H, C)), f32)
    e = jnp.asarray(rng.normal(size=(T, H, C)), f32)
    s = jnp.asarray(rng.normal(size=(T, H, C)), f32)
    trip_src = jnp.asarray(batch.trip_src_edge)
    trip_dst = jnp.asarray(batch.trip_dst_edge)
    trip_mask = jnp.asarray(batch.trip_mask)
    nbr_trip = jnp.asarray(batch.nbr_trip)
    nbr_src = jnp.asarray(batch.nbr_src)
    nbr_mask = jnp.asarray(batch.nbr_mask)

    # forward + backward (training-shaped work): grads wrt q/k/v
    def seg_loss(q, k, v):
        return (segment_attention(q, k, v, e, s, trip_src, trip_dst,
                                  trip_mask, E) ** 2).sum()

    def pad_loss(q, k, v):
        return (padded_attention(q, k, v, e, s, nbr_trip, nbr_src,
                                 nbr_mask) ** 2).sum()

    # atom-blocked layout inputs
    N = batch.numbers.shape[0]
    D = batch.in_edges.shape[1]
    L = 7
    e_atom = jnp.asarray(rng.normal(size=(N, H, C)), f32)
    G = jnp.asarray(rng.normal(size=(E, L, H, C)), f32)
    s_bias = jnp.asarray(rng.normal(size=(H, C)), f32)
    cbf = jnp.asarray(rng.normal(size=(N, D, D, L)), f32)
    in_edges = jnp.asarray(batch.in_edges)
    out_edges = jnp.asarray(batch.out_edges)
    in_src = batch.edge_src[batch.in_edges]
    out_dst = batch.edge_dst[batch.out_edges]
    pair_mask = jnp.asarray(
        batch.in_mask[:, :, None] & batch.out_mask[:, None, :]
        & (in_src[:, :, None] != out_dst[:, None, :]))
    edge_inpos = jnp.asarray(batch.edge_inpos)

    def blk_loss(q, k, v):
        return (blocked_attention(q, k, v, e_atom, G, s_bias, cbf,
                                  in_edges, out_edges, pair_mask,
                                  edge_inpos) ** 2).sum()

    from x2gnn_tpu.ops.pallas import (
        expand_block_diagonal, pallas_blocked_attention)
    in_src_j = jnp.asarray(
        np.where(batch.in_mask, in_src, -1).astype(np.int32))
    out_dst_j = jnp.asarray(
        np.where(batch.out_mask, out_dst, -2).astype(np.int32))
    z = jnp.asarray(rng.uniform(-1, 1, size=(N, D, D)), f32)
    K_rad = 6
    rbf = jnp.asarray(rng.normal(size=(E, L * K_rad)), f32)
    W_sbf = jnp.asarray(rng.normal(size=(L * K_rad, H * C)), f32) * 0.3

    from x2gnn_tpu.ops.attention import injective_gather
    edge_outpos = jnp.asarray(batch.edge_outpos)
    in_mask_flat = jnp.asarray(batch.in_mask.reshape(-1))
    # in-layout pipeline (as the model executes it): activations live in
    # the in-table layout; only K/V need the in->out re-index per layer.
    out2in = jnp.asarray(batch.edge_inpos[batch.out_edges])
    safe_inpos = np.where(batch.edge_mask, batch.edge_inpos, N * D)
    in2out_np = np.zeros(N * D, np.int32)
    in2out_np[safe_inpos[batch.edge_mask]] = batch.edge_outpos[
        batch.edge_mask]
    in2out_flat = jnp.asarray(in2out_np)
    # per-edge inputs in the in-layout (the model keeps them there)
    q_in = jnp.asarray(rng.normal(size=(N, D, H * C)), f32)
    # x_in = the GATED source features; the model re-indexes them in->out
    # ONCE and projects K/V in the out layout (nn/conv.py round 5), so
    # the benchmarked op is 1 gather + 2 projections + kernel
    x_in = jnp.asarray(rng.normal(size=(N, D, H * C)), f32)
    Wk = jnp.asarray(rng.normal(size=(H * C, H * C)), f32) * 0.1
    Wv = jnp.asarray(rng.normal(size=(H * C, H * C)), f32) * 0.1
    rbf_in = jnp.asarray(rng.normal(size=(N * D, L * K_rad)), f32)
    rbf_out = injective_gather(rbf_in, out2in, in2out_flat, in_mask_flat)

    def pal_loss(q_in, x_in):
        w_bd = expand_block_diagonal(W_sbf, L, K_rad, H * C)
        x_out = injective_gather(x_in.reshape(N * D, H * C), out2in,
                                 in2out_flat, in_mask_flat)
        k_out = x_out @ Wk
        v_out = x_out @ Wv
        out = pallas_blocked_attention(
            q_in, k_out, v_out,
            e_atom.reshape(N, H * C),
            rbf_out, w_bd,
            s_bias.reshape(1, H * C), z, in_src_j, out_dst_j,
            heads=H, num_radial=K_rad)
        return (out ** 2).sum()

    # degree windows (the pipeline the model actually runs: atoms are
    # degree-sorted; round-5 rectangular tiers supersede the two-tier
    # split — exact-di x rounded-8-dk windows per tier)
    n_hi, d_lo = batch.n_hi, batch.d_lo
    tiers = batch.tiers or (((n_hi, D, D), (N, d_lo, d_lo))
                            if n_hi and d_lo else ())
    log(f"degree split: n_hi={n_hi} d_lo={d_lo} (N={N} D={D}); "
        f"tiers={tiers}")

    def pal_split_loss(q_in, x_in):
        w_bd = expand_block_diagonal(W_sbf, L, K_rad, H * C)
        x_out = injective_gather(x_in.reshape(N * D, H * C), out2in,
                                 in2out_flat, in_mask_flat)
        k_out = x_out @ Wk
        v_out = x_out @ Wv
        e_a = e_atom.reshape(N, H * C)
        bias = s_bias.reshape(1, H * C)
        # pad+concat assembly (NOT .at[].set: >= 3 kernels feeding DUS
        # of one buffer SIGABRT the TPU AOT compiler, round 5)
        pieces = []
        b0 = 0
        for (b1, di, dk) in tiers:
            if b1 == b0:
                continue
            o_t = pallas_blocked_attention(
                q_in[b0:b1, :di], k_out[b0:b1, :dk], v_out[b0:b1, :dk],
                e_a[b0:b1], rbf_out[b0:b1, :dk], w_bd, bias,
                z[b0:b1, :di, :dk],
                in_src_j[b0:b1, :di], out_dst_j[b0:b1, :dk],
                heads=H, num_radial=K_rad)
            pieces.append(jnp.pad(o_t, ((0, 0), (0, D - di), (0, 0))))
            b0 = b1
        out = jnp.concatenate(pieces, axis=0)
        return (out ** 2).sum()

    seg_step = jax.jit(jax.grad(seg_loss, argnums=(0, 1, 2)))
    pad_step = jax.jit(jax.grad(pad_loss, argnums=(0, 1, 2)))
    blk_step = jax.jit(jax.grad(blk_loss, argnums=(0, 1, 2)))

    t_seg = time_fn(seg_step, q, k, v)
    log(f"segment (XLA scatter) fwd+bwd: {t_seg * 1e3:.3f} ms "
        f"-> {real_T / t_seg / 1e6:.1f} M triplets/s")
    t_pad = time_fn(pad_step, q, k, v)
    log(f"padded (dense neighbor) fwd+bwd: {t_pad * 1e3:.3f} ms "
        f"-> {real_T / t_pad / 1e6:.1f} M triplets/s")
    t_blk = time_fn(blk_step, q, k, v)
    log(f"blocked (atom-dense) fwd+bwd: {t_blk * 1e3:.3f} ms "
        f"-> {real_T / t_blk / 1e6:.1f} M triplets/s")
    pal_step = jax.jit(jax.grad(pal_loss, argnums=(0, 1)))
    t_pal = time_fn(pal_step, q_in, x_in)
    log(f"blocked (pallas fused) fwd+bwd: {t_pal * 1e3:.3f} ms "
        f"-> {real_T / t_pal / 1e6:.1f} M triplets/s")
    # bf16 storage variant (diagnostic): same math, half the gather bytes
    bf16 = jnp.bfloat16
    t_pal16 = time_fn(pal_step, q_in.astype(bf16), x_in.astype(bf16))
    log(f"blocked (pallas, bf16 q/x) fwd+bwd: {t_pal16 * 1e3:.3f} ms "
        f"-> {real_T / t_pal16 / 1e6:.1f} M triplets/s")
    t_pal2 = t_pal
    if tiers:
        pal2_step = jax.jit(jax.grad(pal_split_loss, argnums=(0, 1)))
        t_pal2 = time_fn(pal2_step, q_in, x_in)
        log(f"blocked (pallas, degree-split) fwd+bwd: {t_pal2 * 1e3:.3f} "
            f"ms -> {real_T / t_pal2 / 1e6:.1f} M triplets/s")

    # ---- full-model training-shaped step (diagnostic): flagship config
    # (4 conv layers, 128 channels, 16 heads) fwd+bwd on the same batch
    try:
        from x2gnn_tpu.models import X2GNN
        cfg = ModelConfig(attention_layout="blocked")
        model = X2GNN(cfg)
        jbatch = jax.tree_util.tree_map(jnp.asarray, batch)
        params = model.init(jax.random.PRNGKey(0), jbatch)
        y = jnp.asarray(batch.y)
        gm = jnp.asarray(batch.graph_mask)

        def model_loss(p):
            out = model.apply(p, jbatch)
            return jnp.where(gm, (out - y) ** 2, 0.0).sum()

        mstep = jax.jit(jax.grad(model_loss))
        t_model = time_fn(mstep, params, iters=10)
        G_real = int(batch.graph_mask.sum())
        log(f"full model fwd+bwd ({cfg.conv_layers} layers): "
            f"{t_model * 1e3:.2f} ms -> {G_real / t_model:.1f} molecules/s"
            f", {cfg.conv_layers * real_T / t_model / 1e6:.1f} M "
            f"triplet-msgs/s")

        # bf16 conv stack (params f32, attention math f32 in-kernel)
        model16 = X2GNN(ModelConfig(attention_layout="blocked",
                                    compute_dtype="bfloat16"))

        def model_loss16(p):
            out = model16.apply(p, jbatch)
            return jnp.where(gm, (out - y) ** 2, 0.0).sum()

        t16 = time_fn(jax.jit(jax.grad(model_loss16)), params, iters=10)
        log(f"full model fwd+bwd (bf16 conv stack): {t16 * 1e3:.2f} ms "
            f"-> {G_real / t16:.1f} molecules/s")
    except Exception as exc:   # diagnostics must not break the headline
        log(f"full-model bench skipped: {exc}")

    # ---- MFU / roofline accounting (VERDICT #3) -------------------------
    # v5e (TPU v5 lite) public peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM
    # (jax-ml.github.io/scaling-book). The kernel's math runs f32, so the
    # bf16 peak is the OPTIMISTIC ceiling; machine balance = peak/BW ~ 240
    # flop/byte decides the bound.
    PEAK_BF16 = 197e12
    HBM_BW = 819e9
    mfu = bound = None
    if dev.platform == "tpu":
        H_, C_ = H, 8
        L_, K_ = L, K_rad
        HC = H * C_

        def kernel_flops(n_rows, d):
            # scores qk (2 d^2 HC) + alpha@v (2 d^2 HC) + L x modulated
            # accumulation (2 d^2 HC each); softmax/harmonics negligible
            return 2.0 * n_rows * d * d * HC * (2 + L_)

        if tiers:
            f_fwd = pad_pairs = 0
            b0 = 0
            for (b1, di, dk) in tiers:
                f_fwd += 2.0 * (b1 - b0) * di * dk * HC * (2 + L_)
                pad_pairs += (b1 - b0) * di * dk
                b0 = b1
        else:
            f_fwd = kernel_flops(N, D)
            pad_pairs = N * D * D
        # HBM bytes, fwd: q/k/v + rbf_env reads, z, e_atom, out write (f32)
        b_fwd = (3 * N * D * HC + N * D * L_ * K_ + N * D * D
                 + N * HC + N * D * HC) * 4.0
        fwd_fn = jax.jit(pal_split_loss if tiers else pal_loss)
        t_fwd = time_fn(fwd_fn, q_in, x_in)
        mfu = f_fwd / t_fwd / PEAK_BF16
        ai = f_fwd / b_fwd
        balance = PEAK_BF16 / HBM_BW
        bound = "HBM" if ai < balance else "MXU"
        # when the measured time sits far above BOTH roofline limbs,
        # neither bandwidth nor FLOPs is the binding constraint — the
        # kernel is overhead-bound (grid launches, small tiles, gathers)
        if t_fwd > 5.0 * max(f_fwd / PEAK_BF16, b_fwd / HBM_BW):
            bound = "overhead"
        eff = 2.0 * real_T * HC * (2 + L_) / t_fwd / PEAK_BF16
        log(f"kernel roofline (fwd): {f_fwd / 1e9:.2f} GFLOP in "
            f"{t_fwd * 1e3:.3f} ms -> {f_fwd / t_fwd / 1e12:.2f} TFLOP/s "
            f"= {100 * mfu:.1f}% of v5e bf16 peak (f32 math); "
            f"AI {ai:.0f} flop/B vs balance {balance:.0f} -> {bound}-side; "
            f"effective (real-triplet) MFU {100 * eff:.1f}% "
            f"(padded pairs {pad_pairs / 1e6:.2f} M vs real {real_T / 1e6:.2f} M)")
        # roofline floor: the faster of compute-limit and memory-limit
        t_floor = max(f_fwd / PEAK_BF16, b_fwd / HBM_BW)
        log(f"kernel fwd sits {t_fwd / t_floor:.1f}x above the "
            f"{bound}-roofline floor ({t_floor * 1e6:.0f} us)")

        # full-step MFU: XLA's flop count covers everything OUTSIDE the
        # pallas custom-calls (projections, basis, norms, readouts, bwd);
        # add the analytic kernel flops (fwd+bwd ~ 3.5x fwd: the bwd
        # recomputes the softmax and walks two grad chains) per conv layer
        try:
            cost = mstep.lower(params).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            xla_flops = float(cost.get("flops", 0.0))
            step_flops = xla_flops + cfg.conv_layers * 3.5 * f_fwd
            step_mfu = step_flops / t_model / PEAK_BF16
            if xla_flops > 0:
                log(f"full step: {xla_flops / 1e9:.2f} GFLOP (XLA count) "
                    f"+ ~{cfg.conv_layers * 3.5 * f_fwd / 1e9:.2f} GFLOP "
                    f"(kernel, analytic) -> "
                    f"{step_flops / t_model / 1e12:.2f} TFLOP/s = "
                    f"{100 * step_flops / t_model / PEAK_BF16:.2f}% of "
                    f"bf16 peak at {t_model * 1e3:.2f} ms/step")
        except Exception as exc:
            log(f"cost_analysis unavailable: {exc}")

    # ---- workload-scaling sweep (round-3, VERDICT #3): where does the
    # kernel leave the overhead regime and what fraction of HBM peak does
    # it reach? Batch 32 -> 512 (tripet budgets ~220k -> ~3.4M); per
    # point: fwd time, achieved GB/s, % of HBM peak, fwd+bwd triplet
    # throughput. Saturation batch = the point where throughput stops
    # improving by > 10%.
    sweep = []
    if dev.platform == "tpu":
        sweep = _workload_sweep(log, time_fn)

    best = min(t_seg, t_pad, t_blk, t_pal, t_pal2)
    result = {
        "metric": "edge_attention_throughput",
        "value": round(real_T / best / 1e6, 2),
        "unit": "M triplet-messages/s/chip (fwd+bwd)",
        "vs_baseline": round(t_seg / best, 3),
    }
    if mfu is not None:
        result["mfu"] = round(mfu, 4)
        result["bound"] = bound
        try:
            result["step_mfu"] = round(step_mfu, 4)
        except NameError:
            pass
    if sweep:
        peak = max(sweep, key=lambda p: p["mtrip_s"])
        sat = next((p for p in sweep
                    if p["mtrip_s"] >= 0.9 * peak["mtrip_s"]), peak)
        # round-4 (VERDICT r3 weak #6): the HEADLINE value is the
        # saturated sweep point (median-of-3 fwd+bwd timing) — the
        # number that reproduces within ~10% across reruns. The noisy
        # batch-32 measurement moves to a secondary field.
        result["batch32_mtrip_s"] = result["value"]
        result["value"] = sat["mtrip_s"]
        result["headline"] = (f"saturated sweep point (batch "
                              f"{sat['batch']}, median-of-3)")
        result["gbps"] = peak["gbps"]
        result["hbm_frac"] = peak["hbm_frac"]
        result["saturation_batch"] = sat["batch"]
        result["sweep"] = sweep
    print(json.dumps(result))


def _workload_sweep(log, time_fn):
    """Kernel throughput/bandwidth vs workload size (fused Pallas path,
    degree-split, training-shaped fwd+bwd plus a fwd-only roofline
    point). Returns a list of per-batch-size dicts."""
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.ops.attention import injective_gather
    from x2gnn_tpu.ops.pallas import (
        expand_block_diagonal, pallas_blocked_attention)

    HBM_BW = 819e9
    H, C = 16, 8
    HC = H * C
    L, K_rad = 7, 6
    out = []
    for bs in (32, 64, 128, 256, 512):
        graphs = synthetic_dataset(bs, mean_atoms=18, seed=7)
        batch = pad_graphs(graphs, pad_budget_for(graphs, bs))
        N, D = batch.in_edges.shape
        real_T = int(batch.trip_mask.sum())
        rng = np.random.default_rng(1)
        f32 = jnp.float32
        in_src = batch.edge_src[batch.in_edges]
        out_dst = batch.edge_dst[batch.out_edges]
        in_src_j = jnp.asarray(
            np.where(batch.in_mask, in_src, -1).astype(np.int32))
        out_dst_j = jnp.asarray(
            np.where(batch.out_mask, out_dst, -2).astype(np.int32))
        z = jnp.asarray(rng.uniform(-1, 1, size=(N, D, D)), f32)
        W_sbf = jnp.asarray(
            rng.normal(size=(L * K_rad, HC)), f32) * 0.3
        s_bias = jnp.asarray(rng.normal(size=(1, HC)), f32)
        e_atom = jnp.asarray(rng.normal(size=(N, HC)), f32)
        out2in = jnp.asarray(batch.edge_inpos[batch.out_edges])
        safe_inpos = np.where(batch.edge_mask, batch.edge_inpos, N * D)
        in2out_np = np.zeros(N * D, np.int32)
        in2out_np[safe_inpos[batch.edge_mask]] = batch.edge_outpos[
            batch.edge_mask]
        in2out_flat = jnp.asarray(in2out_np)
        in_mask_flat = jnp.asarray(batch.in_mask.reshape(-1))
        q_in = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
        x_in = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
        Wk = jnp.asarray(rng.normal(size=(HC, HC)), f32) * 0.1
        Wv = jnp.asarray(rng.normal(size=(HC, HC)), f32) * 0.1
        rbf_in = jnp.asarray(rng.normal(size=(N * D, L * K_rad)), f32)
        rbf_out = injective_gather(rbf_in, out2in, in2out_flat,
                                   in_mask_flat)
        n_hi, d_lo = batch.n_hi, batch.d_lo
        tiers = batch.tiers or (((n_hi, D, D), (N, d_lo, d_lo))
                                if n_hi and d_lo else ((N, D, D),))

        def pal_loss(q_in, x_in):
            # model structure (nn/conv.py round 5): ONE in->out gather
            # of the gated features + K/V projections in the out layout
            w_bd = expand_block_diagonal(W_sbf, L, K_rad, HC)
            x_out = injective_gather(x_in.reshape(N * D, HC), out2in,
                                     in2out_flat, in_mask_flat)
            k_out = x_out @ Wk
            v_out = x_out @ Wv
            pieces = []
            b0 = 0
            for (b1, di, dk) in tiers:
                if b1 == b0:
                    continue
                o_t = pallas_blocked_attention(
                    q_in[b0:b1, :di], k_out[b0:b1, :dk],
                    v_out[b0:b1, :dk], e_atom[b0:b1],
                    rbf_out[b0:b1, :dk], w_bd, s_bias,
                    z[b0:b1, :di, :dk],
                    in_src_j[b0:b1, :di], out_dst_j[b0:b1, :dk],
                    heads=H, num_radial=K_rad)
                pieces.append(jnp.pad(o_t, ((0, 0), (0, D - di), (0, 0))))
                b0 = b1
            # pad+concat, not .at[].set (TPU AOT SIGABRT with >= 3
            # kernels + DUS chains; see nn/conv.py)
            return (jnp.concatenate(pieces, axis=0) ** 2).sum()

        fwd_fn = jax.jit(pal_loss)
        grad_fn = jax.jit(jax.grad(pal_loss, argnums=(0, 1)))
        t_fwd = time_fn(fwd_fn, q_in, x_in,
                        iters=10 if bs >= 256 else 20)
        # median of 3 timing runs: tunnel timing noise put round-over-
        # round headline swings of ~1.5x on identical code (VERDICT r3
        # weak #6); the median of three independent averages is stable
        # to ~10%
        t_fb = float(np.median([
            time_fn(grad_fn, q_in, x_in,
                    iters=10 if bs >= 256 else 20)
            for _ in range(3)]))
        # HBM bytes, fwd: q/k/v + rbf_env reads, z, e_atom, out write
        pad_pairs = 0
        b0 = 0
        for (b1, di, dk) in tiers:
            pad_pairs += (b1 - b0) * di * dk
            b0 = b1
        b_fwd = (3 * N * D * HC + N * D * L * K_rad + pad_pairs
                 + N * HC + N * D * HC) * 4.0
        f_fwd = 2.0 * pad_pairs * HC * (2 + L)
        gbps = b_fwd / t_fwd / 1e9
        point = {
            "batch": bs, "N": N, "D": D, "real_T": real_T,
            "t_fwd_ms": round(t_fwd * 1e3, 3),
            "t_fwdbwd_ms": round(t_fb * 1e3, 3),
            "mtrip_s": round(real_T / t_fb / 1e6, 1),
            "gbps": round(gbps, 1),
            "hbm_frac": round(b_fwd / t_fwd / HBM_BW, 4),
            "tflops": round(f_fwd / t_fwd / 1e12, 2),
        }
        out.append(point)
        log(f"sweep bs={bs}: N={N} D={D} realT={real_T / 1e3:.0f}k "
            f"fwd {t_fwd * 1e3:.2f} ms ({gbps:.0f} GB/s = "
            f"{100 * point['hbm_frac']:.1f}% HBM, "
            f"{point['tflops']:.2f} TFLOP/s), fwd+bwd "
            f"{t_fb * 1e3:.2f} ms -> {point['mtrip_s']:.1f} M trip/s")
    return out


if __name__ == "__main__":
    main()
