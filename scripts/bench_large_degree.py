"""Large-degree (AID-scale, D > 40) edge-attention bench: XLA blocked path
vs the i-chunked fused Pallas kernel.

Run on TPU: python scripts/bench_large_degree.py
Shape check only (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/bench_large_degree.py --shapes-only
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    shapes_only = "--shapes-only" in sys.argv
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.ops.attention import (
        blocked_attention, blocked_to_edges, injective_gather)
    from x2gnn_tpu.ops.pallas import (
        expand_block_diagonal, pallas_blocked_attention)

    # AID-scale: batch 4, ~68 atoms/molecule, 5 A cutoff
    graphs = synthetic_dataset(4, mean_atoms=68, seed=3)
    batch = pad_graphs(graphs, pad_budget_for(graphs, 4))
    E = batch.edge_src.shape[0]
    N, D = batch.in_edges.shape
    real_T = int(batch.trip_mask.sum())
    log(f"batch: N={N} E={E} D={D} realT={real_T}")
    if shapes_only:
        return

    H, C, L, K_rad = 16, 8, 7, 6
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    q = jnp.asarray(rng.normal(size=(E, H, C)), f32)
    k = jnp.asarray(rng.normal(size=(E, H, C)), f32)
    v = jnp.asarray(rng.normal(size=(E, H, C)), f32)
    e_atom = jnp.asarray(rng.normal(size=(N, H, C)), f32)
    s_bias = jnp.asarray(rng.normal(size=(H, C)), f32)
    in_edges = jnp.asarray(batch.in_edges)
    out_edges = jnp.asarray(batch.out_edges)
    in_src = batch.edge_src[batch.in_edges]
    out_dst = batch.edge_dst[batch.out_edges]
    pair_mask = jnp.asarray(
        batch.in_mask[:, :, None] & batch.out_mask[:, None, :]
        & (in_src[:, :, None] != out_dst[:, None, :]))
    edge_inpos = jnp.asarray(batch.edge_inpos)
    edge_outpos = jnp.asarray(batch.edge_outpos)
    in_mask_j = jnp.asarray(batch.in_mask)
    edge_mask_j = jnp.asarray(batch.edge_mask)
    in_src_j = jnp.asarray(
        np.where(batch.in_mask, in_src, -1).astype(np.int32))
    out_dst_j = jnp.asarray(
        np.where(batch.out_mask, out_dst, -2).astype(np.int32))
    z = jnp.asarray(rng.uniform(-1, 1, size=(N, D, D)), f32)
    rbf = jnp.asarray(rng.normal(size=(E, L * K_rad)), f32)
    W_sbf = jnp.asarray(rng.normal(size=(L * K_rad, H * C)), f32) * 0.3
    # same basis both paths: the fused kernel computes legendre(z) and
    # contracts rbf x W in-kernel; give the XLA path the identical G/cbf
    from x2gnn_tpu.ops.basis import legendre_cos_harmonics
    cbf = legendre_cos_harmonics(jnp.arccos(jnp.clip(z, -1, 1)), L)
    G = jnp.einsum("elk,lkf->elf", rbf.reshape(E, L, K_rad),
                   W_sbf.reshape(L, K_rad, H * C)).reshape(E, L, H, C)

    em = jnp.asarray(batch.edge_mask)

    def blk_loss(q, k, v):
        out = blocked_attention(q, k, v, e_atom, G, s_bias, cbf,
                                in_edges, out_edges, pair_mask, edge_inpos)
        return jnp.where(em[:, None, None], out ** 2, 0.0).sum()

    # in-layout pipeline tables (as the restructured model uses them)
    out2in = jnp.asarray(batch.edge_inpos[batch.out_edges])
    in2out_np = np.zeros(N * D, np.int32)
    in2out_np[batch.edge_inpos[batch.edge_mask]] = batch.edge_outpos[
        batch.edge_mask]
    in2out_flat = jnp.asarray(in2out_np)
    in_mask_flat = jnp.asarray(batch.in_mask.reshape(-1))
    rbf_out = jnp.asarray(
        np.asarray(rbf)[np.asarray(batch.out_edges)])  # (N, D, L*K)

    def pal_loss(q, k, v):
        # convert E-layout inputs to in-layout once, then the in-layout
        # pipeline: q stays; K/V take the in->out re-index gather
        q_in = injective_gather(q.reshape(E, H * C), in_edges, edge_inpos,
                                edge_mask_j)
        k_i = injective_gather(k.reshape(E, H * C), in_edges, edge_inpos,
                               edge_mask_j)
        v_i = injective_gather(v.reshape(E, H * C), in_edges, edge_inpos,
                               edge_mask_j)
        k_out = injective_gather(k_i.reshape(N * D, H * C), out2in,
                                 in2out_flat, in_mask_flat)
        v_out = injective_gather(v_i.reshape(N * D, H * C), out2in,
                                 in2out_flat, in_mask_flat)
        w_bd = expand_block_diagonal(W_sbf, L, K_rad, H * C)
        out = pallas_blocked_attention(
            q_in, k_out, v_out,
            e_atom.reshape(N, H * C),
            rbf_out, w_bd,
            s_bias.reshape(1, H * C), z, in_src_j, out_dst_j,
            heads=H, num_radial=K_rad)
        return jnp.where(in_mask_flat[:, None],
                         out.reshape(N * D, H * C) ** 2, 0.0).sum()

    def time_fn(fn, *args, iters=20, warmup=3):
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    pal_step = jax.jit(jax.grad(pal_loss, argnums=(0, 1, 2)))
    t_pal = time_fn(pal_step, q, k, v)
    log(f"pallas i-chunked fwd+bwd: {t_pal * 1e3:.3f} ms "
        f"-> {real_T / t_pal / 1e6:.1f} M triplets/s")
    blk_step = jax.jit(jax.grad(blk_loss, argnums=(0, 1, 2)))
    t_blk = time_fn(blk_step, q, k, v)
    log(f"XLA blocked fwd+bwd:      {t_blk * 1e3:.3f} ms "
        f"-> {real_T / t_blk / 1e6:.1f} M triplets/s")
    log(f"speedup pallas/XLA-blocked: {t_blk / t_pal:.2f}x")

    # numeric agreement
    gp = pal_step(q, k, v)
    gb = blk_step(q, k, v)
    for name, a, b in zip("qkv", gp, gb):
        err = float(jnp.max(jnp.abs(a - b)))
        ref = float(jnp.max(jnp.abs(b)))
        log(f"grad d{name}: max|pallas-xla|={err:.3e} (max|xla|={ref:.3e})")


if __name__ == "__main__":
    main()
