"""Large-degree (AID-scale, D > 40) edge-attention bench: XLA blocked path
vs the i-chunked fused Pallas kernel.

Run on TPU: python scripts/bench_large_degree.py
Shape check only (CPU): PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/bench_large_degree.py --shapes-only
"""

from __future__ import annotations

import sys
import time

import numpy as np


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

    def blk_loss(q, k, v):
        return (blocked_attention(q, k, v, e_atom, G, s_bias, cbf,
                                  in_edges, out_edges, pair_mask,
                                  edge_inpos) ** 2).sum()

    def pal_loss(q, k, v):
        qf = q.reshape(E, H * C)
        kf = k.reshape(E, H * C)
        vf = v.reshape(E, H * C)
        w_bd = expand_block_diagonal(W_sbf, L, K_rad, H * C)
        out_blk = pallas_blocked_attention(
            injective_gather(qf, in_edges, edge_inpos, edge_mask_j),
            injective_gather(kf, out_edges, edge_outpos, edge_mask_j),
            injective_gather(vf, out_edges, edge_outpos, edge_mask_j),
            e_atom.reshape(N, H * C),
            rbf[out_edges], w_bd,
            s_bias.reshape(1, H * C), z, in_src_j, out_dst_j,
            heads=H, num_radial=K_rad)
        out = blocked_to_edges(out_blk, edge_inpos, in_edges, in_mask_j)
        return (out ** 2).sum()

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
