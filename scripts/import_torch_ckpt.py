"""Import a zfwangDP/X2-GNN PyTorch checkpoint into this framework.

Reads the reference's `ckpt_best.pth` (trainer.py:98-105 format — a dict
with a "model" state_dict; a bare state_dict also works), maps every
parameter onto the equivalent flax tree (utils/torch_ckpt.py), and
writes a standard run directory (ckpt_best + args.json) that
`evaluate.py` and `Predictor.from_run` consume directly.

    python scripts/import_torch_ckpt.py --pth ckpt/U0_ckpt.pth \
        --config config.json --out runs/imported
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="reference .pth file")
    ap.add_argument("--config", default=None,
                    help="reference config.json (model hyperparameters)")
    ap.add_argument("--out", required=True, help="output run directory")
    ap.add_argument("--target", type=int, default=7)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from x2gnn_tpu.config import (ModelConfig, TrainConfig, dump_configs,
                                  load_configs)
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.checkpoint import save_checkpoint
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState
    from x2gnn_tpu.utils.torch_ckpt import import_torch_state_dict

    if args.config:
        mcfg, tcfg = load_configs(args.config)
    else:
        mcfg, tcfg = ModelConfig(), TrainConfig()
    # extensive vs intensive dispatch (train_ema.py:41-44)
    readout = "atomwise" if args.target in range(6, 12) else "molwise_mean"
    import dataclasses
    mcfg = dataclasses.replace(mcfg, readout=readout)

    ckpt = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items() if hasattr(v, "shape") or k == "n_averaged"}

    # the integral feature width is hard-coded in the reference
    # (Linear(338, ...) at xgnn.py:26), not in config.json — infer it
    # from the checkpoint so non-338 variants import too
    mt = sd.get("mat_trans.weight")
    if mt is not None and mt.shape[1] != mcfg.edge_feat_dim:
        mcfg = dataclasses.replace(mcfg, edge_feat_dim=int(mt.shape[1]))

    model = X2GNN(mcfg)
    probe = pad_graphs(
        (g := synthetic_dataset(2, mean_atoms=6, seed=0,
                                edge_feat_dim=mcfg.edge_feat_dim)),
        pad_budget_for(g, 2))
    template = model.init(jax.random.PRNGKey(0), probe)
    params, report = import_torch_state_dict(sd, template,
                                             mlp_depth=mcfg.mlp_depth)
    for k in ("missing", "unused", "dead"):
        if report[k]:
            print(f"{k} ({len(report[k])}): {report[k][:6]}"
                  f"{' ...' if len(report[k]) > 6 else ''}",
                  file=sys.stderr)
    if report["missing"] or report["unused"]:
        print("WARNING: imperfect mapping — check config matches the "
              "checkpoint", file=sys.stderr)

    opt = make_optimizer(tcfg)
    # EMA seeded with the imported weights and count=1 (reference
    # checkpoints store the raw model; eval-on-EMA == eval-on-model)
    ema = ema_init(params)._replace(count=jnp.ones((), jnp.int32))
    state = TrainState(params, opt.init(params), ema,
                       jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    os.makedirs(args.out, exist_ok=True)
    dump_configs(mcfg, tcfg, os.path.join(args.out, "args.json"))
    save_checkpoint(os.path.join(args.out, "ckpt_best"), state)
    n = len(jax.tree_util.tree_leaves(params))
    print(f"imported {n} tensors -> {args.out}/ckpt_best")


if __name__ == "__main__":
    main()
