"""Serving throughput: batched Predictor inference on the current device.

Measures steady-state molecules/s (and edge/triplet rates) of the flagship
model's forward pass through the serving path (x2gnn_tpu/infer.py),
including the host-side batch padding — the number a deployment planner
needs. Prints one JSON line on stdout; diagnostics on stderr.

Usage: PYTHONPATH=/root/repo python scripts/bench_infer.py [--molecules 256]
"""

from __future__ import annotations

# repo root on sys.path HERE rather than via PYTHONPATH: an exported
# PYTHONPATH=/root/repo shadows modules the TPU-plugin sitecustomize
# imports at interpreter start and silently breaks backend registration
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--molecules", type=int, default=256)
    ap.add_argument("--mean-atoms", type=int, default=18)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.infer import Predictor
    from x2gnn_tpu.models import X2GNN

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = ModelConfig(attention_layout="blocked")
    model = X2GNN(cfg)
    graphs = synthetic_dataset(args.molecules, mean_atoms=args.mean_atoms,
                               seed=11)
    from x2gnn_tpu.data.batching import pad_budget_for, pad_graphs
    probe = pad_graphs(graphs[:args.batch_size],
                       pad_budget_for(graphs, args.batch_size))
    params = model.init(jax.random.PRNGKey(0), probe)
    pred = Predictor(cfg, params, batch_size=args.batch_size)

    n_edges = sum(g.num_edges for g in graphs)
    n_trip = sum(g.num_triplets for g in graphs)
    out = pred.predict(graphs)          # warmup incl. compile
    assert out.shape == (args.molecules,)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = pred.predict(graphs)
    dt = (time.perf_counter() - t0) / args.iters
    mols_s = args.molecules / dt
    log(f"{args.molecules} molecules in {dt * 1e3:.1f} ms "
        f"-> {mols_s:.0f} molecules/s, {n_edges / dt / 1e6:.2f} M edges/s, "
        f"{n_trip / dt / 1e6:.2f} M triplets/s")
    print(json.dumps({
        "metric": "serving_throughput",
        "value": round(mols_s, 1),
        "unit": "molecules/s/chip (incl. host batching)",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
