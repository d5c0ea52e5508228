"""TPU check + micro-bench for fused-kernel dropout (round-3).

1. Numerics: pallas_blocked_attention with a pair keep-mask and
   return_alpha on REAL TPU vs the XLA blocked core at the same mask
   (the CPU suite covers interpret mode; Mosaic lowering needs its own
   check — CLAUDE.md: always also check numerics on TPU).
2. Speed: full-model train step with dropout=0.3, fused path vs XLA
   core (the round-2 fallback cost ~4x whenever dropout>0).

Usage (TPU): python scripts/bench_dropout.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(_os.path.abspath(__file__)))))

import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          _os.path.join(_os.path.dirname(_os.path.dirname(
                              _os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import dataclasses
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.ops.attention import pair_dropout_mask

    log(f"device: {jax.devices()[0]}")
    graphs = synthetic_dataset(32, mean_atoms=18, seed=7)
    batch = pad_graphs(graphs, pad_budget_for(graphs, 32))
    jbatch = jax.tree_util.tree_map(jnp.asarray, batch)

    cfg = ModelConfig(attention_layout="blocked", dropout=0.3)
    pal = X2GNN(dataclasses.replace(cfg, use_pallas=True))
    xla = X2GNN(dataclasses.replace(cfg, use_pallas=False))
    params = xla.init(jax.random.PRNGKey(0), jbatch)
    rngs = {"dropout": jax.random.PRNGKey(42)}

    # 1. numerics on real TPU hardware: matched rng -> matched masks
    f_pal = jax.jit(lambda p: pal.apply(p, jbatch, deterministic=False,
                                        rngs=rngs))
    f_xla = jax.jit(lambda p: xla.apply(p, jbatch, deterministic=False,
                                        rngs=rngs))
    o_pal = np.asarray(f_pal(params))
    o_xla = np.asarray(f_xla(params))
    rel = (np.abs(o_pal - o_xla).max()
           / max(np.abs(o_xla).max(), 1e-9))
    log(f"dropout fwd pallas-vs-XLA on TPU: max rel diff {rel:.3e}")
    assert rel < 5e-2, "fused-kernel dropout diverges from XLA core on TPU"

    y = jnp.asarray(batch.y)
    gm = jnp.asarray(batch.graph_mask)

    def loss(model):
        def f(p):
            out = model.apply(p, jbatch, deterministic=False, rngs=rngs)
            return jnp.where(gm, (out - y) ** 2, 0.0).sum()
        return jax.jit(jax.grad(f))

    t_pal = time_fn(loss(pal), params)
    t_xla = time_fn(loss(xla), params)
    log(f"dropout train-shaped fwd+bwd: pallas {t_pal * 1e3:.2f} ms, "
        f"XLA core {t_xla * 1e3:.2f} ms -> fused keeps dropout "
        f"{t_xla / t_pal:.2f}x faster")
    print(f"{{\"pallas_dropout_ms\": {t_pal * 1e3:.3f}, "
          f"\"xla_core_dropout_ms\": {t_xla * 1e3:.3f}, "
          f"\"speedup\": {t_xla / t_pal:.3f}, "
          f"\"max_rel_diff\": {rel:.3e}}}")


if __name__ == "__main__":
    main()
