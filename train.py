#!/usr/bin/env python
"""Training CLI — the `python train_ema.py` equivalent (train_ema.py:1-59),
with actual flags, resume, and synthetic-data smoke mode.

Examples:
  python train.py --config config.json --data ./raw/qm9_origin.xyz
  python train.py --synthetic 512 --epochs 20 --workdir runs/smoke
  python train.py --config config.json --data ... --resume runs/u0/ckpt_best
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="reference-style config.json (schema-compatible)")
    p.add_argument("--data", default=None, help="concatenated xyz file")
    p.add_argument("--data-npz", default=None,
                   help="prebuilt graph cache (save_graph_cache npz)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic molecules instead of --data")
    p.add_argument("--target", type=int, default=None,
                   help="QM9 property index (overrides config)")
    p.add_argument("--workdir", default="./runs/run0")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--limit", type=int, default=None,
                   help="use only the first N molecules")
    p.add_argument("--layout",
                   choices=["segment", "padded", "blocked"],
                   default="blocked")
    p.add_argument("--backend", default="auto",
                   choices=["auto", "pyscf", "native", "zero"],
                   help="integral featurizer backend")
    p.add_argument("--cache-dir", default="./processed")
    p.add_argument("--resume", default=None, help="checkpoint to resume")
    p.add_argument("--ckpt-every", type=int, default=None,
                   help="write workdir/ckpt_last every N epochs for "
                        "elastic recovery (0 = off)")
    p.add_argument("--auto-resume", action="store_true",
                   help="resume from workdir/ckpt_last if present "
                        "(crash-restart loops can always pass this)")
    p.add_argument("--ckpt-after-epoch", type=int, default=None,
                   help="write best-val checkpoints only after this epoch "
                        "(reference gates at 100, trainer.py:95)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard molecules over all local devices")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-lr", type=float, default=None)
    p.add_argument("--scheduler", choices=["warmup_exp", "plateau"],
                   default=None,
                   help="LR schedule: warmup_exp (reference shipped "
                        "config) or plateau (the reference's broken "
                        "ReduceLROnPlateau branch, train_ema.py:53, made "
                        "to work: epoch-level val-MAE-driven reduction)")
    p.add_argument("--warmup-steps", type=int, default=None)
    p.add_argument("--ema-decay", type=float, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of epoch 2 here")
    p.add_argument("--edge-partition", choices=["allgather", "ring"],
                   default=None,
                   help="shard each batched graph's ACTIVATIONS over the "
                        "device mesh (graphs larger than one chip); "
                        "'ring' exchanges K/V shard-by-shard via ppermute")
    p.add_argument("--patience", type=int, default=None,
                   help="plateau-scheduler patience in epochs "
                        "(ReduceLROnPlateau semantics)")
    p.add_argument("--dropout", type=float, default=None,
                   help="attention-weight dropout (segment/blocked "
                        "layouts on any parallelism mode; reference "
                        "sbftransformer_conv.py:153)")
    p.add_argument("--bucket-shapes", type=int, default=None,
                   help="size-bucketed batch budgets: group molecules by "
                        "size and compile N quantized batch shapes "
                        "instead of one worst-case shape (raises occupancy "
                        "on heterogeneous datasets; on a mesh the "
                        "run auto-upgrades to --pack-mixed, whose "
                        "single shape stacks across devices)")
    p.add_argument("--pack-budget", action="store_true",
                   help="with --bucket-shapes: pack each batch to its "
                        "class budget (variable molecules per step, "
                        "fixed compute shape) instead of a fixed "
                        "batch-size count — planner occupancy ~0.95+ "
                        "vs ~0.8 at 4 buckets")
    p.add_argument("--pack-mixed", action="store_true",
                   help="mixed-composition FFD packing: ONE compiled "
                        "shape, every batch spans the size distribution "
                        "(~0.88 occupancy); fixes the per-step accuracy "
                        "cost of size-homogeneous packed batches "
                        "(round-3 A/B)")
    p.add_argument("--accum-steps", type=int, default=None,
                   help="gradient accumulation: apply the optimizer every "
                        "N micro-batches (effective batch = N*batch_size)")
    p.add_argument("--fused-update", action="store_true",
                   help="flatten the optimizer to one parameter vector "
                        "(fewer per-leaf kernel launches; ~2.5 ms/step "
                        "at bs32 — scripts/profile_step.py). Checkpoint "
                        "opt-state structure differs from unfused runs")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize attention convs in the backward "
                        "pass (O(1) activation memory across layers)")
    p.add_argument("--dp-groups", type=int, default=0,
                   help="with --edge-partition: hybrid DP x EP — shard "
                        "this many molecule groups over a 'dp' mesh axis, "
                        "edge-partitioning each group over the rest")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="conv-stack compute dtype (params stay f32; "
                        "bfloat16 halves attention gather traffic)")
    p.add_argument("--cache-batches",
                   choices=["auto", "on", "off", "host"],
                   default="auto",
                   help="device-resident batch cache: each padded batch "
                        "is host->TPU transferred once per run instead "
                        "of once per step (splits are order-fixed, so "
                        "batches repeat exactly every epoch). auto = on "
                        "for datasets under ~20k molecules; 'on' forces "
                        "it for large datasets when the batches fit HBM "
                        "(pair with --feat-dtype float16)")
    p.add_argument("--feat-dtype",
                   choices=["float32", "float16", "int8"],
                   default="float32",
                   help="integral edge-feature dtype on the wire and in "
                        "the device batch cache; features are bounded "
                        "in [0,~1] so float16 costs ~5e-4 input rounding "
                        "and halves the dominant transfer/HBM bytes; "
                        "int8 adds per-edge scales (~0.8% rounding) "
                        "and halves them again for link-bound runs "
                        "(model upcasts to f32 at entry)")
    p.add_argument("--check-determinism", action="store_true",
                   help="before training, run the jitted train step twice "
                        "on the first batch and compare states BITWISE — "
                        "catches donated-buffer aliasing, unseeded "
                        "randomness, and host-side data races")
    p.add_argument("--standardize", action="store_true",
                   help="z-score targets over the train split; reported "
                        "MAE is rescaled back to physical units")
    p.add_argument("--atomref-fit", action="store_true",
                   help="subtract a least-squares per-element reference "
                        "energy fitted on the train split before "
                        "(optional) standardization — the fitted analogue "
                        "of the reference's fixed QM9 atom_ref table for "
                        "datasets without published per-atom references; "
                        "coefficients archived in workdir/atomref.json")
    return p.parse_args(argv)


def _enable_compile_cache():
    """Persistent XLA compile cache (TPU executables take minutes to
    build on this host; cache hits make restarts instant)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(
                              os.path.abspath(__file__)), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main(argv=None):
    args = parse_args(argv)
    _enable_compile_cache()
    from x2gnn_tpu.config import (
        ModelConfig, TrainConfig, load_configs)
    from x2gnn_tpu.data.molecule import (
        EXTENSIVE_TARGETS, report_calibration)
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    if args.config:
        mcfg, tcfg = load_configs(args.config)
    else:
        mcfg, tcfg = ModelConfig(), TrainConfig()
    if args.target is not None:
        tcfg = dataclasses.replace(tcfg, target=args.target)
    if args.epochs is not None:
        tcfg = dataclasses.replace(tcfg, max_epoch=args.epochs)
    if args.ckpt_after_epoch is not None:
        tcfg = dataclasses.replace(tcfg,
                                   ckpt_after_epoch=args.ckpt_after_epoch)
    if args.batch_size is not None:
        tcfg = dataclasses.replace(tcfg, batch_size=args.batch_size)
    if args.ckpt_every is not None:
        tcfg = dataclasses.replace(tcfg, ckpt_every=args.ckpt_every)
    if args.pack_budget:
        tcfg = dataclasses.replace(tcfg, pack_budget=True)
    if args.pack_mixed:
        tcfg = dataclasses.replace(tcfg, pack_mixed=True)
    if args.fused_update:
        tcfg = dataclasses.replace(tcfg, fused_update=True)
    for field in ("max_lr", "warmup_steps", "ema_decay", "accum_steps",
                  "scheduler", "bucket_shapes", "patience"):
        v = getattr(args, field)
        if v is not None:
            tcfg = dataclasses.replace(tcfg, **{field: v})

    # model dispatch by target family (train_ema.py:41-44)
    readout = ("atomwise" if tcfg.target in EXTENSIVE_TARGETS
               else "molwise_mean")
    mcfg = dataclasses.replace(mcfg, readout=readout,
                               attention_layout=args.layout)
    if args.compute_dtype is not None:
        mcfg = dataclasses.replace(mcfg, compute_dtype=args.compute_dtype)
    if args.remat:
        mcfg = dataclasses.replace(mcfg, remat=True)
    if args.dropout is not None:
        mcfg = dataclasses.replace(mcfg, dropout=args.dropout)

    if args.synthetic:
        from x2gnn_tpu.data.synthetic import synthetic_dataset
        import numpy as np
        graphs = synthetic_dataset(args.synthetic)
        targets = np.array([g.y[0] for g in graphs], dtype=np.float32)
        std = 1.0
        data_basis = "synthetic-random"
    elif args.data_npz:
        from x2gnn_tpu.data.dataset import load_graph_cache, prepare_targets
        graphs = load_graph_cache(args.data_npz)
        if args.limit:
            graphs = graphs[:args.limit]
        targets = prepare_targets(graphs, tcfg.target)
        # unit calibration only applies to 12-property QM9 labels
        multi = graphs and graphs[0].y.shape[0] == 12
        std = report_calibration(tcfg.target) if multi else 1.0
        from x2gnn_tpu.data.dataset import read_cache_basis
        data_basis = read_cache_basis(args.data_npz)
    else:
        if not args.data:
            print("need --data or --synthetic", file=sys.stderr)
            return 2
        from x2gnn_tpu.data.dataset import load_dataset, prepare_targets
        graphs = load_dataset(args.data, cache_dir=args.cache_dir,
                              cutoff=mcfg.cutoff, backend=args.backend,
                              limit=args.limit)
        targets = prepare_targets(graphs, tcfg.target)
        multi = graphs and graphs[0].y.shape[0] == 12
        std = report_calibration(tcfg.target) if multi else 1.0
        from x2gnn_tpu.data.featurize import basis_provenance
        data_basis = basis_provenance(args.backend)

    # record featurization provenance next to the checkpoints: evaluating
    # this run on features from the OTHER quantum basis (pyscf
    # 6-311+G(3df,2p) vs native x2sv, scf.py:31) would be silently wrong —
    # evaluate.py / Predictor compare against this tag and refuse
    os.makedirs(args.workdir, exist_ok=True)
    with open(os.path.join(args.workdir, "provenance.json"), "w") as f:
        json.dump({"basis": data_basis}, f)

    if args.atomref_fit:
        import numpy as np
        from x2gnn_tpu.data.molecule import fit_linear_atomref
        from x2gnn_tpu.train.trainer import make_split, resolve_division
        # the SAME deterministic split the Trainer will build: the fit
        # must see train molecules only (no val/test leakage)
        n = len(graphs)
        fit_idx, _, _ = make_split(n, tcfg.random_seed,
                                   resolve_division(n, tcfg.division))
        atomref_pred, table = fit_linear_atomref(
            [g.numbers for g in graphs], targets, fit_idx)
        targets = np.asarray(targets, np.float64) - atomref_pred
        print("atomref-fit: residual std "
              f"{targets[fit_idx].std():.4f} (was "
              f"{np.asarray(atomref_pred)[fit_idx].std():.1f} comp.)",
              file=sys.stderr)
        with open(os.path.join(args.workdir, "atomref.json"), "w") as f:
            json.dump(table, f, indent=1)

    if args.standardize:
        import numpy as np
        mu, sigma = float(np.mean(targets)), float(np.std(targets) + 1e-12)
        targets = ((targets - mu) / sigma).astype(np.float32)
        std *= sigma   # report MAE in physical units
        print(f"standardized targets: mu={mu:.4f} sigma={sigma:.4f}",
              file=sys.stderr)
        os.makedirs(args.workdir, exist_ok=True)
        with open(os.path.join(args.workdir, "standardization.json"),
                  "w") as f:
            json.dump({"mu": mu, "sigma": sigma}, f)

    mesh = None
    if args.dp_groups and not args.edge_partition:
        print("--dp-groups requires --edge-partition", file=sys.stderr)
        sys.exit(2)
    if args.data_parallel or args.edge_partition:
        import jax
        from x2gnn_tpu.parallel import make_mesh
        if args.dp_groups:
            from x2gnn_tpu.parallel import make_hybrid_mesh
            n = jax.device_count()
            if n % args.dp_groups:
                print(f"--dp-groups {args.dp_groups} does not divide "
                      f"{n} devices", file=sys.stderr)
                sys.exit(2)
            mesh = make_hybrid_mesh(args.dp_groups, n // args.dp_groups)
            mode = (f"hybrid DP x EP ({args.dp_groups} groups x "
                    f"{n // args.dp_groups}-way {args.edge_partition})")
        else:
            mesh = make_mesh()
            mode = (f"edge partitioning ({args.edge_partition})"
                    if args.edge_partition else "data parallel")
        print(f"{mode} over {jax.device_count()} devices",
              file=sys.stderr)
    if args.edge_partition and args.layout != "blocked":
        print("edge partitioning implies the blocked layout",
              file=sys.stderr)
        mcfg = dataclasses.replace(mcfg, attention_layout="blocked")

    model = X2GNN(mcfg)
    cache_batches = {"auto": None, "on": True, "off": False,
                     "host": "host"}[args.cache_batches]
    trainer = Trainer(model, mcfg, tcfg, graphs, targets,
                      workdir=args.workdir, std=std, mesh=mesh,
                      edge_partition=args.edge_partition,
                      cache_batches=cache_batches,
                      feat_dtype=args.feat_dtype)
    os.makedirs(args.workdir, exist_ok=True)
    # args.json is archived by Trainer.fit (the copy Predictor.from_run
    # reads) — no duplicate write here

    state = None
    resume_from = args.resume
    if resume_from is None and args.auto_resume:
        # newest full TrainState in the workdir (ckpt_last OR a newer
        # ckpt_best — resuming from a stale ckpt_last would roll back)
        from x2gnn_tpu.train.checkpoint import latest_checkpoint
        resume_from = latest_checkpoint(args.workdir)
    epochs = tcfg.max_epoch
    if resume_from:
        state = trainer.restore(resume_from)
        done = int(state.step) // trainer._steps_per_epoch()
        epochs = max(tcfg.max_epoch - done, 0)
        print(f"resumed from {resume_from} at step {int(state.step)} "
              f"(~epoch {done}); {epochs} epochs remaining",
              file=sys.stderr)

    if args.check_determinism:
        from x2gnn_tpu.utils.determinism import (
            check_train_step_determinism)
        report = check_train_step_determinism(trainer, state=state)
        tag = "OK" if report["deterministic"] else "MISMATCH"
        print(f"determinism check: {tag}", file=sys.stderr)
        for m in report["mismatches"]:
            print(f"  {m}", file=sys.stderr)
        if not report["deterministic"]:
            return 3

    _, summary = trainer.fit(epochs=epochs, state=state,
                             profile_dir=args.profile_dir)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
