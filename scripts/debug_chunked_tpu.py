"""Isolate the chunked-kernel hardware mismatch at production shape
(HC=128): compare the grid-chunked Pallas kernel against plain XLA math,
forward and backward separately, directly on the device."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from x2gnn_tpu.ops.pallas.blocked_attn import (
        expand_block_diagonal, pallas_blocked_attention)

    rng = np.random.default_rng(0)
    N, D, H, C, L, K = 16, 48, 16, 8, 7, 6
    HC = H * C
    f32 = jnp.float32
    q = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
    k = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
    v = jnp.asarray(rng.normal(size=(N, D, HC)), f32)
    e = jnp.asarray(rng.normal(size=(N, HC)), f32)
    rbf = jnp.asarray(rng.normal(size=(N, D, L * K)), f32)
    W = jnp.asarray(rng.normal(size=(L * K, HC)), f32) * 0.3
    w_bd = expand_block_diagonal(W, L, K, HC)
    bias = jnp.asarray(rng.normal(size=(1, HC)), f32)
    zc = jnp.asarray(rng.uniform(-1, 1, size=(N, D, D)), f32)
    a_ids = jnp.asarray(rng.integers(0, 50, size=(N, D)), jnp.int32)
    b_ids = jnp.asarray(rng.integers(0, 50, size=(N, D)), jnp.int32)

    def xla_ref(q, k, v, e, W, bias):
        from x2gnn_tpu.ops.basis import legendre_cos_harmonics
        from x2gnn_tpu.ops.attention import blocked_attention_core
        valid = ((a_ids[:, :, None] != b_ids[:, None, :])
                 & (a_ids >= 0)[:, :, None] & (b_ids >= 0)[:, None, :])
        theta = jnp.arccos(jnp.clip(zc, -1, 1))
        cbf = legendre_cos_harmonics(theta, L)
        G = jnp.einsum("ndlk,lkf->ndlf", rbf.reshape(N, D, L, K),
                       W.reshape(L, K, HC))
        out = blocked_attention_core(
            q.reshape(N, D, H, C), k.reshape(N, D, H, C),
            v.reshape(N, D, H, C), e.reshape(N, H, C),
            G.reshape(N, D, L, H, C), bias.reshape(H, C), cbf, valid)
        return out.reshape(N, D, HC)

    def pal(q, k, v, e, W, bias, ic):
        w_bd = expand_block_diagonal(W, L, K, HC)
        return pallas_blocked_attention(
            q, k, v, e, rbf, w_bd, bias, zc, a_ids, b_ids,
            heads=H, num_radial=K, i_chunk=ic)

    args = (q, k, v, e, W, bias)
    out_ref = jax.jit(xla_ref)(*args)
    cot = jnp.asarray(rng.normal(size=(N, D, HC)), f32)

    def grads(fn):
        def loss(*a):
            return (fn(*a) * cot).sum()
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(*args)

    g_ref = grads(xla_ref)
    for ic in (8, 16):
        out_c = jax.jit(lambda *a: pal(*a, ic=ic))(*args)
        ferr = float(jnp.max(jnp.abs(out_c - out_ref)))
        print(f"ic={ic}: fwd max err {ferr:.3e} "
              f"(scale {float(jnp.max(jnp.abs(out_ref))):.3e})", flush=True)
        g_c = grads(lambda *a: pal(*a, ic=ic))
        for name, a, b in zip(["dq", "dk", "dv", "de", "dW", "db"],
                              g_ref, g_c):
            err = float(jnp.max(jnp.abs(a - b)))
            sc = float(jnp.max(jnp.abs(a)))
            print(f"  ic={ic} {name}: max err {err:.3e} (scale {sc:.3e})",
                  flush=True)


if __name__ == "__main__":
    main()
