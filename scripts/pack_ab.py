"""Packed-vs-fixed accuracy A/B at equal optimizer steps (VERDICT 1d).

Arm A = an existing packed/bucketed run's metrics.jsonl (the flagship).
Arm B = this script launches the fixed-32 arm (same data/recipe, no
bucketing/packing) for enough epochs to cover arm A's step count, then
reports val MAE at matched optimizer-step checkpoints.

Usage (TPU, after the flagship finishes):
  python scripts/pack_ab.py --packed runs/flagship_r3 \
      --workdir runs/pack_ab_fixed --steps 40000
Then compare:
  python scripts/pack_ab.py --packed runs/flagship_r3 \
      --workdir runs/pack_ab_fixed --report-only
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import os
import subprocess
import sys


def read_metrics(path):
    out = []
    with open(path) as f:
        for ln in f:
            try:
                out.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    return out


def val_at_steps(metrics, step):
    """best_val_mae of the last epoch with step <= `step` (what a
    step-budgeted run would have selected by then)."""
    best = None
    for m in metrics:
        if m["step"] <= step:
            best = m["best_val_mae"]
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packed", default="runs/flagship_r3")
    ap.add_argument("--workdir", default="runs/pack_ab_fixed")
    ap.add_argument("--data", default="processed/synthq50k.npz")
    ap.add_argument("--config", default="configs/flagship_synthq.json")
    ap.add_argument("--steps", type=int, default=None,
                    help="fixed-arm step budget (default: packed arm's "
                         "final step count, capped at 45k)")
    ap.add_argument("--report-only", action="store_true")
    ap.add_argument("--mixed", default="runs/pack_ab_mixed",
                    help="mixed-FFD arm workdir (reported when its "
                         "metrics.jsonl exists)")
    ap.add_argument("--run-mixed", action="store_true",
                    help="launch the --pack-mixed arm (same recipe as "
                         "the fixed arm, FFD mixed-composition packing) "
                         "instead of the fixed arm")
    args = ap.parse_args()

    packed = read_metrics(os.path.join(args.packed, "metrics.jsonl"))
    if not packed:
        sys.exit(f"no metrics in {args.packed}")
    target_steps = args.steps or min(packed[-1]["step"], 45000)

    fixed_path = os.path.join(args.workdir, "metrics.jsonl")
    if not args.report_only:
        if args.run_mixed:
            # mixed arm: the fixed-arm recipe + FFD mixed packing
            # (~1333 steps/epoch on synthq50k at fill=0.75)
            workdir, steps_pe, extra = args.mixed, 1333, ["--pack-mixed"]
        else:
            # fixed arm: identical flags minus bucketing/packing
            # (1375 steps/epoch at bs32/44k)
            workdir, steps_pe, extra = args.workdir, 1375, []
        epochs = -(-target_steps // steps_pe)
        cmd = [sys.executable, "train.py", "--data-npz", args.data,
               "--workdir", workdir, "--config", args.config,
               "--epochs", str(epochs), "--layout", "blocked",
               "--standardize", "--atomref-fit", "--scheduler", "plateau",
               "--cache-batches", "on", "--feat-dtype", "float16",
               "--ckpt-every", "5", "--auto-resume",
               "--ckpt-after-epoch", "0"] + extra
        print("launching arm:", " ".join(cmd), file=sys.stderr)
        rc = subprocess.call(cmd)
        if rc != 0:
            sys.exit(rc)

    fixed = read_metrics(fixed_path)
    mixed_path = os.path.join(args.mixed, "metrics.jsonl")
    mixed = read_metrics(mixed_path) if os.path.exists(mixed_path) else []
    rows = []
    for frac in (0.25, 0.5, 0.75, 1.0):
        s = int(target_steps * frac)
        row = {"steps": s,
               "packed_best_val": val_at_steps(packed, s),
               "fixed_best_val": val_at_steps(fixed, s)}
        if mixed:
            row["mixed_best_val"] = val_at_steps(mixed, s)
        rows.append(row)
    out = {"target_steps": target_steps, "rows": rows,
           "packed_steps_per_epoch": packed[0]["step"],
           "fixed_steps_per_epoch": fixed[0]["step"] if fixed else None,
           "mixed_steps_per_epoch": mixed[0]["step"] if mixed else None}
    with open(os.path.join(args.workdir, "ab_summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
