"""Kernel block_atoms (BA) sweep on the saturated workload (round-4).

The fused kernel's auto heuristic caps BA at 8; VMEM caps it lower for
big D. The two-tier low-degree window (d_lo ~ 8-16) leaves most VMEM
idle — this sweep measures whether bigger blocks (fewer grid steps,
fatter VPU slabs) move the saturated throughput (VERDICT r3 #2).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.data.synthetic import synthetic_dataset
from x2gnn_tpu.ops.attention import injective_gather
from x2gnn_tpu.ops.pallas import (
    expand_block_diagonal, pallas_blocked_attention)


def timeit(f, *a, iters=20):
    r = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    H, C = 16, 8
    HC = H * C
    L, K_rad = 7, 6
    bs = int(_sys.argv[1]) if len(_sys.argv) > 1 else 128
    graphs = synthetic_dataset(bs, mean_atoms=18, seed=7)
    batch = pad_graphs(graphs, pad_budget_for(graphs, bs))
    N, D = batch.in_edges.shape
    real_T = int(batch.trip_mask.sum())
    n_hi, d_lo = batch.n_hi, batch.d_lo
    print(f"bs={bs} N={N} D={D} n_hi={n_hi} d_lo={d_lo} "
          f"realT={real_T/1e3:.0f}k", flush=True)
    rng = np.random.default_rng(1)
    f32 = jnp.float32
    in_src = batch.edge_src[batch.in_edges]
    out_dst = batch.edge_dst[batch.out_edges]
    a_j = jnp.asarray(np.where(batch.in_mask, in_src, -1).astype(np.int32))
    b_j = jnp.asarray(np.where(batch.out_mask, out_dst, -2).astype(
        np.int32))
    z = jnp.asarray(rng.uniform(-1, 1, size=(N, D, D)), f32)
    W_sbf = jnp.asarray(rng.normal(size=(L * K_rad, HC)), f32) * 0.3
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
    k_in = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
    v_in = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
    rbf_in = jnp.asarray(rng.normal(size=(N * D, L * K_rad)), f32)
    rbf_out = injective_gather(rbf_in, out2in, in2out_flat, in_mask_flat)

    def pal_loss(q_in, k_in, v_in, ba_hi=None, ba_lo=None):
        w_bd = expand_block_diagonal(W_sbf, L, K_rad, HC)
        k_out = injective_gather(k_in.reshape(N * D, HC), out2in,
                                 in2out_flat, in_mask_flat)
        v_out = injective_gather(v_in.reshape(N * D, HC), out2in,
                                 in2out_flat, in_mask_flat)
        o_hi = pallas_blocked_attention(
            q_in[:n_hi], k_out[:n_hi], v_out[:n_hi],
            e_atom[:n_hi], rbf_out[:n_hi], w_bd, s_bias,
            z[:n_hi], a_j[:n_hi], b_j[:n_hi],
            heads=H, num_radial=K_rad, block_atoms=ba_hi)
        o_lo = pallas_blocked_attention(
            q_in[n_hi:, :d_lo], k_out[n_hi:, :d_lo],
            v_out[n_hi:, :d_lo], e_atom[n_hi:],
            rbf_out[n_hi:, :d_lo], w_bd, s_bias,
            z[n_hi:, :d_lo, :d_lo],
            a_j[n_hi:, :d_lo], b_j[n_hi:, :d_lo],
            heads=H, num_radial=K_rad, block_atoms=ba_lo)
        o = jnp.zeros((N, D, HC), o_hi.dtype)
        o = o.at[:n_hi].set(o_hi).at[n_hi:, :d_lo].set(o_lo)
        return (o ** 2).sum()

    n_lo = N - n_hi

    def pal_loss_pad(q_in, k_in, v_in, ba_hi=None, ba_lo=None):
        """Same two-tier loss but the lo tier is row-padded to a
        multiple of ba_lo (pad rows carry a_ids=-1 -> zero output)."""
        w_bd = expand_block_diagonal(W_sbf, L, K_rad, HC)
        k_out = injective_gather(k_in.reshape(N * D, HC), out2in,
                                 in2out_flat, in_mask_flat)
        v_out = injective_gather(v_in.reshape(N * D, HC), out2in,
                                 in2out_flat, in_mask_flat)
        o_hi = pallas_blocked_attention(
            q_in[:n_hi], k_out[:n_hi], v_out[:n_hi],
            e_atom[:n_hi], rbf_out[:n_hi], w_bd, s_bias,
            z[:n_hi], a_j[:n_hi], b_j[:n_hi],
            heads=H, num_radial=K_rad, block_atoms=ba_hi)
        pad = (-n_lo) % (ba_lo or 8)

        def padN(x, fill=0.0):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)
        o_lo = pallas_blocked_attention(
            padN(q_in[n_hi:, :d_lo]), padN(k_out[n_hi:, :d_lo]),
            padN(v_out[n_hi:, :d_lo]), padN(e_atom[n_hi:]),
            padN(rbf_out[n_hi:, :d_lo]), w_bd, s_bias,
            padN(z[n_hi:, :d_lo, :d_lo]),
            padN(a_j[n_hi:, :d_lo], -1), padN(b_j[n_hi:, :d_lo], -2),
            heads=H, num_radial=K_rad, block_atoms=ba_lo)[:n_lo]
        o = jnp.zeros((N, D, HC), o_hi.dtype)
        o = o.at[:n_hi].set(o_hi).at[n_hi:, :d_lo].set(o_lo)
        return (o ** 2).sum()

    import functools
    for ba_hi, ba_lo in [(None, None), (None, 16), (None, 32),
                         (None, 64), (8, 32), (4, 64)]:
        try:
            fn = pal_loss if ba_lo is None and ba_hi is None \
                else pal_loss_pad
            f = jax.jit(functools.partial(fn, ba_hi=ba_hi,
                                          ba_lo=ba_lo))
            g = jax.jit(jax.grad(functools.partial(
                fn, ba_hi=ba_hi, ba_lo=ba_lo), argnums=(0, 1, 2)))
            t_f = timeit(f, q_in, k_in, v_in)
            t_fb = timeit(g, q_in, k_in, v_in)
            print(f"ba_hi={ba_hi} ba_lo={ba_lo}: fwd {t_f:.3f} ms, "
                  f"fwd+bwd {t_fb:.3f} ms -> "
                  f"{real_T / (t_fb * 1e-3) / 1e6:.1f} M trip/s",
                  flush=True)
        except Exception as exc:
            print(f"ba_hi={ba_hi} ba_lo={ba_lo}: FAILED "
                  f"{type(exc).__name__}: {str(exc)[:200]}", flush=True)


if __name__ == "__main__":
    main()
