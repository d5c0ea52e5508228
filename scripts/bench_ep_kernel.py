"""On-TPU bench: the fused Pallas kernel composed into the EP forward.

Round-4 evidence for "the kernel survives multichip composition": on a
1-device mesh the EP train step (shard_map + collectives + the fused
kernel per shard) should cost within ~1.2x of the plain blocked-layout
train step on the same batch — i.e. multi-chip training does NOT forfeit
the single-chip kernel speedup (VERDICT r3 missing #1). Also times the
EP step with the XLA einsum core (the round-3 state) for contrast.

Usage: python scripts/bench_ep_kernel.py [--batch 32] [--iters 30]
Writes runs/bench_ep_kernel.json and prints a summary.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32",
                    help="comma list of batch sizes (VERDICT r4 #4: "
                         "32,128,512)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--mean-atoms", type=int, default=13)
    ap.add_argument("--fused-update", action="store_true",
                    help="flatten the optimizer (identical config on "
                         "both paths; VERDICT r4 #2)")
    ap.add_argument("--out", default="runs/bench_ep_kernel.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import (
        make_mesh, make_ep_batch, shard_ep_batch, make_ep_train_step)
    from x2gnn_tpu.parallel.ep_model import make_ep_forward
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.loss import smooth_l1_loss
    from x2gnn_tpu.train.optim import (
        apply_update_skip_nonfinite, make_optimizer)
    from x2gnn_tpu.train.trainer import TrainState

    def time_step(step, state, batch, iters):
        # TWO warmup calls: a donated step compiles a SECOND executable
        # on its first call with donated-aliased input buffers — timing
        # from the first warm call catches that compile (~25 s) inside
        # the loop and inflates ms/step ~100x (observed round-4).
        # Sync by pulling the FINAL loss scalar to the host. Round-5
        # correction: block_until_ready on DONATED output leaves can
        # also return early on the remote backend (the aliased buffer
        # "exists" before the update executes) — at small batches the
        # whole chain fits in the dispatch pipeline and the loop times
        # host dispatch (~1 ms/step), not device time; at large batches
        # queue backpressure happens to give the right answer. The
        # final step's loss depends on every previous step's full param
        # update (the chain threads state), so float(loss) is a true
        # dependency sync for all but the last update.
        state, loss = step(state, batch)
        state, loss = step(state, batch)
        _ = float(loss)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, batch)
        _ = float(loss)
        return (time.perf_counter() - t0) / iters * 1e3, state

    def time_fn(fn, *fargs, iters=30):
        # chained-free timing for pure functions (no state): queue
        # `iters` dispatches, block once on the last result
        r = fn(*fargs); r = fn(*fargs)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*fargs)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters * 1e3

    all_results = []
    for B in (int(b) for b in args.batches.split(",")):
      try:
        graphs = synthetic_dataset(B, mean_atoms=args.mean_atoms, seed=5)
        batch = pad_graphs(graphs, pad_budget_for(graphs, B))
        tcfg = TrainConfig(batch_size=B, warmup_steps=5,
                           fused_update=args.fused_update)
        opt = make_optimizer(tcfg)
        results = {"batch": B,
                   "fused_update": bool(args.fused_update),
                   "tiers": list(map(list, batch.tiers))}
        results["n_trip_real"] = int(np.asarray(batch.trip_mask).sum())

        # --- baseline: plain blocked-layout train step (single chip) ---
        # device_put the batch ONCE: shard_ep_batch device-puts the EP
        # batch, so timing the blocked step on the host-resident numpy
        # pytree would re-upload it over the tunnel EVERY call — that
        # asymmetry, not the model, was the bulk of round-4's
        # "unexplained 2.7x EP-vs-blocked gap" (VERDICT r4 #2/weak #2;
        # the production trainer device-caches batches the same way)
        cfg_blk = ModelConfig(attention_layout="blocked")
        batch = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, batch))
        model = X2GNN(cfg_blk)
        params = model.init(jax.random.PRNGKey(0), batch)
        state = TrainState(params, opt.init(params), ema_init(params),
                           jnp.zeros((), jnp.int32))

        def blk_loss(p, b):
            pred = model.apply(p, b)
            return smooth_l1_loss(pred, b.y, mask=b.graph_mask)

        @jax.jit
        def step(st, b):
            loss, grads = jax.value_and_grad(blk_loss)(st.params, b)
            return apply_update_skip_nonfinite(st, loss, grads, opt,
                                               tcfg.ema_decay)

        # decomposition (VERDICT r4 #2): fwd-only, fwd+bwd, full step
        results["blocked_fwd_ms"] = time_fn(
            jax.jit(blk_loss), params, batch, iters=args.iters)
        results["blocked_grad_ms"] = time_fn(
            jax.jit(jax.value_and_grad(blk_loss)), params, batch,
            iters=args.iters)
        ms, _ = time_step(step, state, batch, args.iters)
        results["blocked_pallas_ms"] = ms

        # --- EP on a 1-device mesh: fused kernel per shard (round 4) ---
        mesh = make_mesh(1)
        epb = make_ep_batch(batch, 1)
        epbs = shard_ep_batch(epb, mesh)
        n_pad = epb.numbers.shape[0]
        for name, cfg in (
                ("ep_pallas",
                 dataclasses.replace(cfg_blk, use_pallas=True)),
                ("ep_xla",
                 dataclasses.replace(cfg_blk, use_pallas=False))):
            params2 = jax.tree.map(jnp.array, params)   # fresh (donation)
            st = TrainState(params2, opt.init(params2), ema_init(params2),
                            jnp.zeros((), jnp.int32))
            ep_step = make_ep_train_step(cfg, opt, tcfg.ema_decay, mesh,
                                         n_pad)
            ms, _ = time_step(ep_step, st, epbs, args.iters)
            results[name + "_ms"] = ms

            # decomposition: the EP sharded forward (VERDICT r4 #2).
            # Fresh param copy — the step above DONATED params2.
            params3 = jax.tree.map(jnp.array, params)
            ep_fwd = make_ep_forward(cfg, mesh, n_pad, "allgather")

            def ep_loss(p, eb):
                return smooth_l1_loss(ep_fwd(p, eb), eb.y,
                                      mask=eb.graph_mask)
            try:
                results[name + "_fwd_ms"] = time_fn(
                    jax.jit(ep_loss), params3, epbs, iters=args.iters)
                results[name + "_grad_ms"] = time_fn(
                    jax.jit(jax.value_and_grad(ep_loss)), params3, epbs,
                    iters=args.iters)
            except Exception as exc:   # decomposition is best-effort
                results[name + "_fwd_err"] = str(exc)[:200]

        results["ep_over_blocked"] = (results["ep_pallas_ms"]
                                      / results["blocked_pallas_ms"])
        results["ep_pallas_speedup_vs_ep_xla"] = (
            results["ep_xla_ms"] / results["ep_pallas_ms"])
        print(json.dumps(results), flush=True)
        all_results.append(results)
      except Exception as exc:   # e.g. bs512 no-remat step OOMs HBM
        msg = str(exc)
        short = next((l for l in msg.splitlines()
                      if "memory" in l.lower() or "Error" in l), msg[:200])
        print(json.dumps({"batch": B, "error": short[:300]}), flush=True)
        all_results.append({"batch": B, "error": short[:300]})

    os = __import__("os")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(all_results if len(all_results) > 1 else all_results[0],
                  f, indent=1)


if __name__ == "__main__":
    main()
