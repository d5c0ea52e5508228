#!/usr/bin/env python
"""Evaluation / transfer CLI — the `load.ipynb` intent (README.md:21-22):
restore a trained checkpoint and evaluate MAE on any dataset with
identical featurization (e.g. QM9-trained -> OCELOT/AID transfer).

Examples:
  python evaluate.py --ckpt runs/u0/ckpt_best --data raw/AID_kcal.xyz \
      --backend native --target 7
  python evaluate.py --ckpt runs/smoke/ckpt_best --synthetic 64
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--data", default=None)
    p.add_argument("--data-npz", default=None,
                   help="prebuilt graph cache (save_graph_cache npz)")
    p.add_argument("--stats", default=None,
                   help="standardization.json from the training run "
                        "(mu/sigma applied to targets; MAE reported in "
                        "physical units)")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--target", type=int, default=7)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--layout", choices=["segment", "padded", "blocked"],
                   default="blocked")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "pyscf", "native", "zero"])
    p.add_argument("--cache-dir", default="./processed")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--allow-basis-mismatch", action="store_true",
                   help="downgrade the featurization-basis provenance "
                        "check (ckpt provenance.json vs this data's "
                        "basis) from an error to a warning")
    p.add_argument("--use-live-params", action="store_true",
                   help="evaluate the live (non-EMA) weights; default is "
                        "the EMA weights like the reference (trainer.py:57)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import os
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.batching import batch_iterator, pad_budget_for
    from x2gnn_tpu.data.molecule import (
        EXTENSIVE_TARGETS, report_calibration)
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.loss import masked_mae
    from x2gnn_tpu.train.trainer import Trainer

    # auto-discover the run's archived configs + standardization next to
    # the checkpoint (the copies Trainer.fit wrote), like
    # Predictor.from_run does — evaluating a cutoff-6.0/variant-v2 run
    # with default configs would restore fine and report silent garbage
    run_dir = os.path.dirname(os.path.abspath(args.ckpt))
    if args.config is None:
        cand = os.path.join(run_dir, "args.json")
        if os.path.exists(cand):
            args.config = cand
            print(f"using {cand}", file=sys.stderr)
    if args.stats is None:
        cand = os.path.join(run_dir, "standardization.json")
        if os.path.exists(cand):
            args.stats = cand
            print(f"using {cand}", file=sys.stderr)
    if args.config:
        # handles BOTH the archived args.json (full resolved schema) and
        # the reference's flat config.json
        from x2gnn_tpu.infer import load_run_configs
        mcfg, tcfg = load_run_configs(args.config)
    else:
        mcfg, tcfg = ModelConfig(), TrainConfig()
    tcfg = dataclasses.replace(tcfg, target=args.target,
                               batch_size=args.batch_size)
    readout = ("atomwise" if args.target in EXTENSIVE_TARGETS
               else "molwise_mean")
    mcfg = dataclasses.replace(mcfg, readout=readout,
                               attention_layout=args.layout)

    if args.synthetic:
        from x2gnn_tpu.data.synthetic import synthetic_dataset
        graphs = synthetic_dataset(args.synthetic)
        targets = np.array([g.y[0] for g in graphs], dtype=np.float32)
        std, multi = 1.0, False
        data_basis = "synthetic-random"
    elif args.data_npz:
        from x2gnn_tpu.data.dataset import (
            load_graph_cache, prepare_targets, read_cache_basis)
        data_basis = read_cache_basis(args.data_npz)
        graphs = load_graph_cache(args.data_npz)
        if args.limit:
            graphs = graphs[:args.limit]
        targets = prepare_targets(graphs, args.target)
        multi = graphs and graphs[0].y.shape[0] == 12
        std = report_calibration(args.target) if multi else 1.0
    else:
        if not args.data:
            print("need --data or --synthetic", file=sys.stderr)
            return 2
        from x2gnn_tpu.data.dataset import load_dataset, prepare_targets
        graphs = load_dataset(args.data, cache_dir=args.cache_dir,
                              cutoff=mcfg.cutoff, backend=args.backend,
                              limit=args.limit)
        targets = prepare_targets(graphs, args.target)
        multi = graphs and graphs[0].y.shape[0] == 12
        std = report_calibration(args.target) if multi else 1.0
        from x2gnn_tpu.data.featurize import basis_provenance
        data_basis = basis_provenance(args.backend)

    # provenance guard: evaluating a checkpoint on features from the
    # other quantum basis is silently wrong (VERDICT: pyscf 6-311 vs
    # native x2sv features are not interchangeable)
    from x2gnn_tpu.data.featurize import check_basis_compatible
    run_basis = None
    prov = os.path.join(run_dir, "provenance.json")
    if os.path.exists(prov):
        with open(prov) as f:
            run_basis = json.load(f).get("basis")
    check_basis_compatible(run_basis, data_basis,
                           allow=args.allow_basis_mismatch,
                           context=f" (ckpt {args.ckpt})")

    # runs trained with --atomref-fit predict composition-subtracted
    # residuals: apply the archived per-element table to the targets
    # (same order as train.py — atomref first, then standardization)
    atomref_path = os.path.join(run_dir, "atomref.json")
    if os.path.exists(atomref_path):
        with open(atomref_path) as f:
            table = json.load(f)
        icept = float(table.pop("intercept", 0.0))
        refs = {int(z): float(c) for z, c in table.items()}
        # an element absent from the archived table would silently
        # contribute 0.0 reference energy — off by thousands of kcal
        # per atom; refuse, mirroring the basis-provenance guard above
        missing = sorted({int(z) for g in graphs for z in g.numbers}
                         - set(refs))
        if missing:
            raise SystemExit(
                f"elements Z={missing} appear in the eval set but are "
                f"missing from {atomref_path} (not seen at training "
                "time); atomref residuals would be wrong by ~1e3 "
                "kcal/atom")
        targets = np.asarray(targets, np.float64) - np.array(
            [sum(refs.get(int(z), 0.0) for z in g.numbers) + icept
             for g in graphs])
        print(f"using {atomref_path} (reported MAE is on atomref "
              "residuals)", file=sys.stderr)

    if args.stats:
        stats = json.load(open(args.stats))
        targets = ((targets - stats["mu"]) / stats["sigma"]).astype(
            np.float32)
        std *= stats["sigma"]

    model = X2GNN(mcfg)
    trainer = Trainer(model, mcfg, tcfg, graphs, targets, std=std)
    state = trainer.restore(args.ckpt)
    # _ema_tree unravels flat-EMA checkpoints (fused-update runs, r5)
    params = (state.params if args.use_live_params
              else trainer._ema_tree(state))

    eval_step = jax.jit(lambda p, b: (
        masked_mae(model.apply(p, b), b.y, mask=b.graph_mask, scale=std),
        b.graph_mask.sum()))
    total, count = 0.0, 0
    budgets = pad_budget_for(graphs, args.batch_size)
    for batch in batch_iterator(graphs, args.batch_size, budgets=budgets,
                                targets=targets):
        err, g = eval_step(params, batch)
        total += float(err)
        count += int(g)
    mae = total / max(count, 1)
    # the eV->kcal calibration only applies to multi-property (QM9-style)
    # energy targets; otherwise the MAE is in the dataset's label units
    # (e.g. kcal for AID_kcal) — std != 1.0 alone (a --stats sigma) does
    # not change the unit
    calibrated = multi and report_calibration(args.target) != 1.0
    print(json.dumps({"mae": mae, "count": count,
                      "unit": ("kcal/mol" if calibrated
                               else "dataset label units")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
