"""k-fold cross-validation on the real AID set (451 molecules) with a
linear-in-composition baseline — the accuracy evidence VERDICT asked for:
a single 45-molecule test split gives meaningless spreads, so evaluate
fold-out MAE mean +/- std over K folds, in total kcal/mol AND kcal/mol
per atom, against a trivial baseline (least-squares energy ~ element
counts) the GNN must beat.

Target scheme: each fold fits a per-element reference energy by least
squares on ITS train split and the GNN learns the residual — the same
composition-subtraction the reference applies to QM9 U0 via the fixed
atom_ref table (train_ema.py:28-38: y - sum(atom_ref[Z])); AID has no
published per-atom references, so they are fitted. The baseline
predictor is the atom-ref fit alone (residual = 0), making "GNN beats
composition" the direct comparison: total-energy MAE of (atomref + GNN
residual) vs atomref alone on held-out molecules.

The reference's AID usage is transfer evaluation (README.md:21-22,
raw/AID_kcal.xyz); here the folds train from scratch with the reference
recipe scaled to the dataset (same model config, warmup shortened).

Usage (TPU):
  python scripts/aid_cv.py --folds 5 --epochs 150 \
      --workdir runs/aid_cv
Writes runs/aid_cv/fold_k/metrics.jsonl + runs/aid_cv/summary.json.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

# repo root on sys.path HERE rather than via PYTHONPATH: an exported
# PYTHONPATH=/root/repo shadows modules the TPU-plugin sitecustomize
# imports at interpreter start and silently breaks backend registration
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from x2gnn_tpu.data.molecule import fit_linear_atomref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/raw/AID_kcal.xyz")
    ap.add_argument("--cache-dir", default="./processed")
    ap.add_argument("--backend", default="native",
                    help="featurizer backend: 'native' (x2sv stand-in, "
                         "round-2 folds) or 'native6311' (embedded "
                         "published 6-311+G(3df,2p) data) — run both to "
                         "measure the basis delta")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--workdir", default="runs/aid_cv")
    ap.add_argument("--layout", default="blocked")
    ap.add_argument("--seed", type=int, default=41)
    ap.add_argument("--max-lr", type=float, default=1e-3)
    ap.add_argument("--warmup-steps", type=int, default=300)
    ap.add_argument("--fold", type=int, default=None,
                    help="run only this fold (resumable CV: fold results "
                         "are cached in fold_k/result.json)")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
    except Exception:
        pass

    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.dataset import load_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    graphs = load_dataset(args.data, cache_dir=args.cache_dir,
                          backend=args.backend)
    y = np.array([g.y[0] for g in graphs], dtype=np.float64)  # kcal/mol
    n_atoms = np.array([g.num_atoms for g in graphs])
    n = len(graphs)
    print(f"{n} molecules, label range [{y.min():.1f}, {y.max():.1f}] "
          "kcal/mol", file=sys.stderr)

    rs = np.random.RandomState(args.seed)
    perm = rs.permutation(n)
    folds = np.array_split(perm, args.folds)

    mcfg = ModelConfig(attention_layout=args.layout, readout="atomwise")
    os.makedirs(args.workdir, exist_ok=True)
    results = []
    for k in range(args.folds):
        if args.fold is not None and k != args.fold:
            continue
        fold_dir = os.path.join(args.workdir, f"fold_{k}")
        cache = os.path.join(fold_dir, "result.json")
        if os.path.exists(cache):
            with open(cache) as f:
                results.append(json.load(f))
            print(f"fold {k}: cached {results[-1]}", file=sys.stderr)
            continue
        test_idx = folds[k]
        rest = np.concatenate([folds[j] for j in range(args.folds)
                               if j != k])
        val_idx = rest[:max(len(rest) // 8, args.batch_size)]
        train_idx = rest[len(val_idx):]

        # composition subtraction (fitted atom_ref, train split only) +
        # standardized residual targets
        atomref, _ = fit_linear_atomref(
            [g.numbers for g in graphs], y, train_idx)
        resid = y - atomref
        mu = float(resid[train_idx].mean())
        sigma = float(resid[train_idx].std() + 1e-12)
        targets = ((resid - mu) / sigma).astype(np.float32)

        tcfg = TrainConfig(batch_size=args.batch_size,
                           max_lr=args.max_lr,
                           warmup_steps=args.warmup_steps,
                           random_seed=args.seed,
                           ckpt_after_epoch=0)
        trainer = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, targets,
                          workdir=fold_dir, std=sigma)
        # explicit CV folds override the reference's fixed split
        trainer.train_idx = train_idx
        trainer.val_idx = val_idx
        trainer.test_idx = test_idx
        state, summary = trainer.fit(epochs=args.epochs)

        # fold-out predictions with the best checkpoint's EMA weights:
        # total energy = fitted atomref + GNN residual
        best = trainer.restore(os.path.join(fold_dir, "ckpt_best"))
        preds = []
        # _batches yields molecules in test_idx order ONLY without
        # shape bucketing/packing (those reorder by triplet count and
        # would silently misalign preds with y[test_idx])
        assert trainer.bucket_shapes == 0, \
            "fold-out prediction loop requires unbucketed batches"
        for batch in trainer._batches(test_idx):
            p = np.asarray(trainer.model.apply(best.ema.params, batch))
            preds.append(p[np.asarray(batch.graph_mask).astype(bool)])
        pred_resid = np.concatenate(preds)[:len(test_idx)] * sigma + mu
        pred = atomref[test_idx] + pred_resid

        base_pred = atomref[test_idx]   # composition baseline: residual=0
        res = {
            "fold": k,
            "test_mae_kcal": float(np.abs(pred - y[test_idx]).mean()),
            "test_mae_kcal_per_atom": float(
                (np.abs(pred - y[test_idx]) / n_atoms[test_idx]).mean()),
            "baseline_mae_kcal": float(
                np.abs(base_pred - y[test_idx]).mean()),
            "baseline_mae_kcal_per_atom": float(
                (np.abs(base_pred - y[test_idx])
                 / n_atoms[test_idx]).mean()),
            "best_val_mae_resid_kcal": float(summary["best_val_mae"]),
            "n_train": int(len(train_idx)), "n_test": int(len(test_idx)),
        }
        with open(cache, "w") as f:
            json.dump(res, f, indent=1)
        results.append(res)
        print(f"fold {k}: {res}", file=sys.stderr, flush=True)

    if len(results) == args.folds:
        def agg(key):
            v = np.array([r[key] for r in results])
            return {"mean": float(v.mean()), "std": float(v.std())}
        summary = {k: agg(k) for k in
                   ("test_mae_kcal", "test_mae_kcal_per_atom",
                    "baseline_mae_kcal", "baseline_mae_kcal_per_atom")}
        summary["folds"] = results
        with open(os.path.join(args.workdir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(json.dumps({k: summary[k] for k in summary
                          if k != "folds"}, indent=1))


if __name__ == "__main__":
    main()
