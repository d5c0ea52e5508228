"""Merge the first N molecules' completed featurizer chunks into a
standalone npz (e.g. the 50k flagship slice of a running 134k build).

Chunk files are written atomically (tmp+rename), so reading completed
chunks while later ones are still being produced is safe.

Usage:
  python scripts/merge_chunks.py --prefix processed/_synthq134k_6311_chunk \
      --n 50000 --chunk 2000 --out processed/synthq50k_6311.npz \
      --basis "6-311+g(3df,2p)-native"
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--basis", default=None)
    args = ap.parse_args()

    from x2gnn_tpu.data.dataset import (
        load_graph_cache, read_cache_basis, save_graph_cache)
    graphs = []
    basis = args.basis
    for lo in range(0, args.n, args.chunk):
        part = f"{args.prefix}{lo:07d}.npz"
        if not os.path.exists(part):
            print(f"missing {part} — featurizer not there yet",
                  file=sys.stderr)
            sys.exit(1)
        graphs.extend(load_graph_cache(part))
        if basis is None:
            basis = read_cache_basis(part)
    graphs = graphs[:args.n]
    save_graph_cache(args.out, graphs, basis=basis)
    print(f"wrote {args.out}: {len(graphs)} graphs, basis={basis}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
