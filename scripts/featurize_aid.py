"""Resumable AID featurization: native-engine integral features in chunks.

The full 451-molecule AID set takes ~1 h on this 2-CPU host; a monolithic
run that dies loses everything. This script featurizes in chunks of
--chunk molecules, saving each as processed/_aid_chunk_<i>.npz (skipped if
present), then merges chunks into the canonical load_dataset cache name
(AID_kcal_native_c5.npz) so train.py / evaluate.py pick it up directly.

Usage: python scripts/featurize_aid.py [--chunk 24]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--xyz", default="/root/reference/raw/AID_kcal.xyz")
    ap.add_argument("--chunk", type=int, default=24)
    ap.add_argument("--cache-dir", default="./processed")
    ap.add_argument("--backend", default="native")
    args = ap.parse_args()

    from x2gnn_tpu.data.dataset import (
        featurize_molecules, load_graph_cache, save_graph_cache)
    from x2gnn_tpu.data.featurize import basis_provenance, resolve_backend
    from x2gnn_tpu.data.molecule import read_xyz

    # resolved name so train.py/evaluate.py's load_dataset finds the cache
    backend = resolve_backend(args.backend)
    os.makedirs(args.cache_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.xyz))[0]
    final = os.path.join(args.cache_dir, f"{name}_{backend}_c5.npz")
    if os.path.exists(final):
        print(f"{final} already exists", file=sys.stderr)
        return

    mols = read_xyz(args.xyz)
    print(f"{len(mols)} molecules", file=sys.stderr, flush=True)
    all_graphs = []
    for lo in range(0, len(mols), args.chunk):
        part = os.path.join(args.cache_dir,
                            f"_{name}_{backend}_chunk{lo:05d}.npz")
        expected = len(mols[lo:lo + args.chunk])
        if os.path.exists(part):
            cached = load_graph_cache(part)
            # a chunk file is keyed by start offset only: resuming with
            # a different --chunk must refeaturize, not silently drop or
            # duplicate molecules in the final cache
            if len(cached) == expected:
                all_graphs.extend(cached)
                print(f"chunk {lo}: cached", file=sys.stderr, flush=True)
                continue
            print(f"chunk {lo}: cached length {len(cached)} != "
                  f"{expected} (different --chunk?) — refeaturizing",
                  file=sys.stderr, flush=True)
        t0 = time.time()
        gs = featurize_molecules(mols[lo:lo + args.chunk],
                                 backend=backend)
        save_graph_cache(part, gs,
                         basis=basis_provenance(backend))
        all_graphs.extend(gs)
        print(f"chunk {lo}: {len(gs)} molecules in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
    save_graph_cache(final, all_graphs,
                     basis=basis_provenance(backend))
    print(f"wrote {final} ({len(all_graphs)} graphs)", file=sys.stderr)
    for lo in range(0, len(mols), args.chunk):
        part = os.path.join(args.cache_dir,
                            f"_{name}_{backend}_chunk{lo:05d}.npz")
        if os.path.exists(part):
            os.remove(part)


if __name__ == "__main__":
    main()
