"""Trace-based step profile (VERDICT r4 #6): a REAL jax.profiler device
trace of the blocked train step, aggregated into an op-group table —
replacing the round-4 ablation inference whose variants could time 4-5x
anti-causally (runs/profile_step: two ablations compiled to SLOWER
executables than the full step; XLA fusion makes subtractive ablation
untrustworthy).

Captures N steps under jax.profiler.start_trace, parses the xplane
protobuf (tensorflow is in the image), aggregates device-plane event
durations by op-group (fusion/kernel name prefixes), and writes
runs/profile_trace/result.json with the table.

Usage: python scripts/profile_trace.py [--batch 32] [--steps 10]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import collections
import functools
import glob
import json
import os
import re


def _parse_xplane(path):
    """Aggregate device-plane event durations (ps) by event name."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    per_plane = {}
    for plane in xs.planes:
        metas = {m.id: m.name for m in plane.event_metadata.values()} \
            if isinstance(plane.event_metadata, dict) else {
                mid: m.name for mid, m in plane.event_metadata.items()}
        agg = collections.Counter()
        total_lines = 0
        for line in plane.lines:
            total_lines += 1
            for ev in line.events:
                agg[metas.get(ev.metadata_id, "?")] += ev.duration_ps
        per_plane[plane.name] = agg
    return per_plane


_GROUPS = (
    ("async copies (overlap compute)", r"copy-start|copy-done"),
    ("pallas attention kernel", r"custom-call|blocked_attn|__wrapped"),
    ("matmuls/projections", r"dot\(|convolution|gemm"),
    ("gathers/re-index", r"gather"),
    ("scatters/updates", r"scatter|dynamic-update"),
    ("fusions (elementwise/basis/norms)", r"fusion"),
    ("copies/transposes", r"copy|transpose|reshape|bitcast|concatenate"),
    ("all-reduce/collectives", r"all-reduce|all-gather|collective"),
    ("convert/select", r"convert|select|compare"),
)


def _group(name: str) -> str:
    low = name.lower()
    for label, pat in _GROUPS:
        if re.search(pat, low):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--mean-atoms", type=int, default=13)
    ap.add_argument("--fused-update", action="store_true", default=True)
    ap.add_argument("--out", default="runs/profile_trace")
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
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.loss import smooth_l1_loss
    from x2gnn_tpu.train.optim import (
        apply_update_skip_nonfinite, make_optimizer)
    from x2gnn_tpu.train.trainer import TrainState
    from x2gnn_tpu.utils.profiling import trace

    B = args.batch
    graphs = synthetic_dataset(B, mean_atoms=args.mean_atoms, seed=5)
    batch = jax.device_put(jax.tree_util.tree_map(
        jnp.asarray, pad_graphs(graphs, pad_budget_for(graphs, B))))
    tcfg = TrainConfig(batch_size=B, warmup_steps=5,
                       fused_update=args.fused_update)
    opt = make_optimizer(tcfg)
    cfg = ModelConfig(attention_layout="blocked")
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    flat_ema = bool(args.fused_update)
    state = TrainState(params, opt.init(params),
                       ema_init(params, flat=flat_ema),
                       jnp.zeros((), jnp.int32))

    # donate the state like the production trainer step does — without
    # donation every step pays full param/opt-state copies, which show
    # up as copy-start events and ~4x the envelope time
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(st, b):
        def loss_fn(p):
            pred = model.apply(p, b)
            return smooth_l1_loss(pred, b.y, mask=b.graph_mask)
        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return apply_update_skip_nonfinite(st, loss, grads, opt,
                                           tcfg.ema_decay)

    # warm (two calls: donated-alias executable compiles on call 2)
    state, _ = step(state, batch)
    state, _ = step(state, batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(state.params))

    # wall-clock cross-check OUTSIDE the trace: chained steps; sync by
    # pulling the FINAL loss to the host. On the remote backend,
    # block_until_ready on donated output leaves can return before the
    # update executes, but step N+1's loss depends on step N's full
    # param update, so float(last_loss) waits for the whole chain
    # minus the last update.
    import time
    t0 = time.perf_counter()
    loss = None
    for _ in range(args.steps):
        state, loss = step(state, batch)
    _ = float(loss)
    wall_ms = (time.perf_counter() - t0) / args.steps * 1e3

    logdir = os.path.join(args.out, f"trace_bs{B}")
    os.makedirs(logdir, exist_ok=True)
    with trace(logdir):
        for _ in range(args.steps):
            state, loss = step(state, batch)
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params))

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))[-1:]   # newest capture only
    print(f"xplane files: {paths}", flush=True)
    result = {"batch": B, "steps": args.steps,
              "fused_update": bool(args.fused_update),
              "wall_ms_per_step_untraced": round(wall_ms, 4)}
    tables = {}
    for p in paths:
        for plane, agg in _parse_xplane(p).items():
            if not agg:
                continue
            # the jit_step envelope event IS the per-step device time;
            # everything else (fusions, kernels, copy-starts) nests
            # inside it — summing both double-counts, and async
            # copy-start spans overlap compute. Report the envelope as
            # step_ms and the leaf ops as a breakdown of it.
            env_ps = sum(ps for name, ps in agg.items()
                         if name.startswith("jit_"))
            groups = collections.Counter()
            for name, ps in agg.items():
                # skip the envelope and the bare-numeric per-step
                # line markers (each spans the whole step)
                if name.startswith("jit_") or name.isdigit():
                    continue
                groups[_group(name)] += ps
            leaf_total = sum(groups.values())
            tables[plane] = {
                "step_ms_envelope": round(env_ps / 1e9 / args.steps, 4),
                "leaf_ops_ms_per_step": round(
                    leaf_total / 1e9 / args.steps, 4),
                "groups_ms_per_step": {
                    k: round(v / 1e9 / args.steps, 4)
                    for k, v in groups.most_common()},
                "top_events_ms_per_step": {
                    k: round(v / 1e9 / args.steps, 4)
                    for k, v in agg.most_common(15)},
            }
    result["planes"] = tables
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"result_bs{B}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v.get("groups_ms_per_step")
                      for k, v in tables.items()}, indent=1))


if __name__ == "__main__":
    main()
