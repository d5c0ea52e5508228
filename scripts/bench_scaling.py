"""Weak-scaling efficiency benchmark for the parallel training modes.

BASELINE.md north star: >= 85% scaling efficiency (edges/s) on >= 2 hosts.
This harness measures it for every mode this framework provides:

  * dp      — molecule-sharded data parallelism (per-device batch groups)
  * ep      — edge partitioning (one batched graph's atoms sharded)
  * hybrid  — 2D mesh: dp groups x ep shards

Weak scaling: each device gets the same per-device workload, so ideal
time at N devices equals the 1-device time; efficiency = t(1) / t(N).

On real multi-chip TPU hardware this measures true ICI scaling. On a
CPU host it can still run against a virtual mesh (--force-cpu-devices N)
to validate the harness and the sharded programs end to end, but the
"efficiency" numbers then reflect core oversubscription, not fabric
overhead — they are printed with "virtual": true.

Usage:
  python scripts/bench_scaling.py                # all modes, real devices
  python scripts/bench_scaling.py --force-cpu-devices 8 --modes dp,hybrid

One JSON line per (mode, n_devices) on stdout; diagnostics on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_step(step, state, batch, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        state, loss = step(state, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step(state, batch)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="dp,ep,hybrid")
    ap.add_argument("--force-cpu-devices", type=int, default=0,
                    help="run on a virtual CPU mesh of this many devices")
    ap.add_argument("--mols-per-device", type=int, default=8)
    ap.add_argument("--mean-atoms", type=int, default=18)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if args.force_cpu_devices:
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.force_cpu_devices)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import (
        make_mesh, make_hybrid_mesh, make_ep_batch, shard_ep_batch,
        shard_batches, stack_ep_batches, shard_hybrid_batch,
        make_dp_train_step, make_ep_train_step, make_hybrid_train_step)
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState

    n_dev = jax.device_count()
    virtual = bool(args.force_cpu_devices) or jax.devices()[0].platform == "cpu"
    log(f"{n_dev} {jax.devices()[0].platform} devices (virtual={virtual})")

    mcfg = ModelConfig(attention_layout="blocked")
    tcfg = TrainConfig(batch_size=args.mols_per_device, warmup_steps=10)
    model = X2GNN(mcfg)
    opt = make_optimizer(tcfg)
    per = args.mols_per_device

    def fresh_state(probe):
        params = model.init(jax.random.PRNGKey(0), probe)
        return TrainState(params, opt.init(params), ema_init(params),
                          jnp.zeros((), jnp.int32))

    def count_edges(batch):
        return int(np.asarray(batch.in_mask).sum())

    results = []
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    # 1-device baseline: the plain jitted step on one device's workload.
    # Budgets are computed over the union of all per-device datasets so
    # the baseline and every dp shard run the exact same padded shapes
    # (weak scaling compares equal per-device work).
    gsets = [synthetic_dataset(per, mean_atoms=args.mean_atoms, seed=i)
             for i in range(max(n_dev, 1))]
    per_dev_budget = pad_budget_for([g for gs in gsets for g in gs], per)
    graphs1 = gsets[0]
    b1 = pad_graphs(graphs1, per_dev_budget)
    state = fresh_state(b1)

    from x2gnn_tpu.train.loss import smooth_l1_loss
    from x2gnn_tpu.train.optim import apply_update_skip_nonfinite

    # identical step body to the dp/ep/hybrid steps minus collectives,
    # so t1/tN compares equal per-step work
    def single_step(state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch)
            return smooth_l1_loss(pred, batch.y, mask=batch.graph_mask)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_update_skip_nonfinite(state, loss, grads, opt,
                                           tcfg.ema_decay)

    jstep = jax.jit(single_step, donate_argnums=0)
    b1d = jax.tree_util.tree_map(jnp.asarray, b1)
    t1, state = time_step(jstep, state, b1d, iters=args.iters)
    e1 = count_edges(b1)
    log(f"1-device baseline: {t1 * 1e3:.2f} ms/step, {e1} edges")
    results.append({"mode": "single", "n_devices": 1,
                    "ms_per_step": round(t1 * 1e3, 3),
                    "edges_per_s": round(e1 / t1), "efficiency": 1.0,
                    "virtual": virtual})

    if "dp" in modes and n_dev > 1:
        mesh = make_mesh(n_dev)
        batches = [pad_graphs(gs, per_dev_budget) for gs in gsets]
        stacked = shard_batches(batches, mesh)
        st = fresh_state(batches[0])
        step = make_dp_train_step(model, opt, tcfg.ema_decay, mesh)
        tN, _ = time_step(step, st, stacked, iters=args.iters)
        eff = t1 / tN
        eN = sum(count_edges(b) for b in batches)
        log(f"dp x{n_dev}: {tN * 1e3:.2f} ms/step, efficiency {eff:.1%}")
        results.append({"mode": "dp", "n_devices": n_dev,
                        "ms_per_step": round(tN * 1e3, 3),
                        "edges_per_s": round(eN / tN),
                        "efficiency": round(eff, 4), "virtual": virtual})

    def scale_budgets(b, k):
        # replicating the 1-device dataset k times scales the count
        # budgets exactly k-fold (degree budgets unchanged), so every
        # shard's padded work equals the baseline's
        return b._replace(n_node=b.n_node * k, n_edge=b.n_edge * k,
                          n_trip=b.n_trip * k, n_hi=b.n_hi * k)

    if "ep" in modes and n_dev > 1:
        # weak scaling for EP: ONE batched graph holding n_dev replicas
        # of the baseline's molecules, atoms sharded across the mesh —
        # per-device padded work identical to the 1-device baseline
        mesh = make_mesh(n_dev)
        gs = [g for _ in range(n_dev) for g in graphs1]
        big = pad_graphs(gs, scale_budgets(per_dev_budget, n_dev))
        epb = make_ep_batch(big, n_dev)
        epbs = shard_ep_batch(epb, mesh)
        st = fresh_state(big)
        step = make_ep_train_step(mcfg, opt, tcfg.ema_decay, mesh,
                                  epb.numbers.shape[0])
        tN, _ = time_step(step, st, epbs, iters=args.iters)
        eff = t1 / tN
        eN = int(np.asarray(epb.in_mask).sum())
        log(f"ep x{n_dev}: {tN * 1e3:.2f} ms/step, efficiency {eff:.1%}")
        results.append({"mode": "ep", "n_devices": n_dev,
                        "ms_per_step": round(tN * 1e3, 3),
                        "edges_per_s": round(eN / tN),
                        "efficiency": round(eff, 4), "virtual": virtual})

    if "hybrid" in modes and n_dev >= 4 and n_dev % 2 == 0:
        dp, ep_w = 2, n_dev // 2
        mesh = make_hybrid_mesh(dp, ep_w)
        # each dp group = ep_w replicas of the baseline molecules, so
        # every one of the dp*ep_w devices holds baseline-equal work
        groups = [[g for _ in range(ep_w) for g in gsets[i]]
                  for i in range(dp)]
        budg = scale_budgets(per_dev_budget, ep_w)
        epbs = [make_ep_batch(pad_graphs(g, budg), ep_w) for g in groups]
        sh = shard_hybrid_batch(stack_ep_batches(epbs), mesh)
        st = fresh_state(pad_graphs(groups[0], budg))
        step = make_hybrid_train_step(mcfg, opt, tcfg.ema_decay, mesh,
                                      epbs[0].numbers.shape[0])
        tN, _ = time_step(step, st, sh, iters=args.iters)
        eff = t1 / tN
        eN = int(sum(np.asarray(e.in_mask).sum() for e in epbs))
        log(f"hybrid {dp}x{ep_w}: {tN * 1e3:.2f} ms/step, "
            f"efficiency {eff:.1%}")
        results.append({"mode": "hybrid", "n_devices": n_dev,
                        "dp": dp, "ep": ep_w,
                        "ms_per_step": round(tN * 1e3, 3),
                        "edges_per_s": round(eN / tN),
                        "efficiency": round(eff, 4), "virtual": virtual})

    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
