"""Resumable synthetic-QM9-scale dataset builder.

Generates N deterministic synthetic molecules (heterogeneous sizes, QM9-like
degree statistics) with NATIVE one-electron-integral edge features and the
independent-particle-energy label (x2gnn_tpu.data.synthetic) — the honest
substitute for QM9 in this offline environment: a physically-derived,
geometry+composition-dependent energy that the model can learn from the
integral features at reference dataset scale (~3.5k steps/epoch at bs 32,
matching config.json:1-30 / trainer.py:22-27 scale).

Featurizes in chunks (processed/_<name>_chunk_<i>.npz, skipped when
present), then merges into processed/<name>.npz for train.py --data-npz.

Usage:
  OMP_NUM_THREADS=1 python scripts/make_synthetic_dataset.py \
      --n 100000 --name synthq100k
"""

from __future__ import annotations

# repo root on sys.path HERE rather than via PYTHONPATH: an exported
# PYTHONPATH=/root/repo shadows modules the TPU-plugin sitecustomize
# imports at interpreter start and silently breaks backend registration
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import os
import sys
import time


def _make_one(args):
    index, seed, mean_atoms, featurize, basis, gap_label = args
    from x2gnn_tpu.data.synthetic import synthetic_labeled_graph
    return synthetic_labeled_graph(index, seed=seed, mean_atoms=mean_atoms,
                                   featurize=featurize, basis=basis,
                                   gap_label=gap_label)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100000)
    ap.add_argument("--name", default="synthq100k")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--mean-atoms", type=int, default=13)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--cache-dir", default="./processed")
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--basis", default="x2sv", choices=["x2sv", "6311"],
                    help="integral basis: project stand-in or the "
                         "embedded published 6-311+G(3df,2p) (scf.py:31)")
    ap.add_argument("--gap-label", action="store_true",
                    help="store y=(2,)=[IP energy Hartree, HOMO-LUMO gap "
                         "eV] instead of energy alone (intensive-target "
                         "training, train_ema.py:41-44)")
    ap.add_argument("--geometry-only", action="store_true",
                    help="skip integral featurization: identical graph "
                         "STRUCTURE per index (same rng stream), zero "
                         "edge features / labels. Same batch budgets and "
                         "compiled shapes as the featurized dataset, so a "
                         "training run on it pre-warms the persistent "
                         "compile cache while the real featurization is "
                         "still building.")
    args = ap.parse_args()

    # the C++ integral engine is OpenMP-parallel; with a process pool the
    # parallelism lives across molecules — per-process threads must be 1
    # or the workers fight each other for the cores
    os.environ.setdefault("OMP_NUM_THREADS", "1")

    from x2gnn_tpu.data.dataset import load_graph_cache, save_graph_cache

    os.makedirs(args.cache_dir, exist_ok=True)
    final = os.path.join(args.cache_dir, f"{args.name}.npz")
    if os.path.exists(final):
        print(f"{final} already exists", file=sys.stderr)
        return

    if args.geometry_only:
        basis_tag = "geometry-only"
    elif args.basis == "6311":
        basis_tag = "6-311+g(3df,2p)-native"   # featurize.BACKEND_BASIS
    else:
        basis_tag = "x2sv"

    from multiprocessing import Pool
    chunk_paths = []
    t_start = time.time()
    with Pool(processes=args.workers) as pool:
        for lo in range(0, args.n, args.chunk):
            hi = min(lo + args.chunk, args.n)
            part = os.path.join(args.cache_dir,
                                f"_{args.name}_chunk{lo:07d}.npz")
            chunk_paths.append(part)
            if os.path.exists(part):
                print(f"chunk {lo}: cached", file=sys.stderr, flush=True)
                continue
            t0 = time.time()
            jobs = [(i, args.seed, args.mean_atoms,
                     not args.geometry_only, args.basis, args.gap_label)
                    for i in range(lo, hi)]
            gs = pool.map(_make_one, jobs, chunksize=16)
            save_graph_cache(part, gs, basis=basis_tag)
            done = hi
            rate = args.chunk / max(time.time() - t0, 1e-9)
            print(f"chunk {lo}: {hi - lo} molecules in "
                  f"{time.time() - t0:.0f}s ({rate:.1f} mol/s; "
                  f"{done}/{args.n})", file=sys.stderr, flush=True)

    all_graphs = []
    for part in chunk_paths:
        all_graphs.extend(load_graph_cache(part))
    save_graph_cache(final, all_graphs, basis=basis_tag)
    print(f"wrote {final} ({len(all_graphs)} graphs) in "
          f"{(time.time() - t_start) / 60:.0f} min total", file=sys.stderr)
    for part in chunk_paths:
        os.remove(part)


if __name__ == "__main__":
    main()
