"""Where does the train-step time go? (round-4, VERDICT r3 #8)

Component-ablation profile of the blocked+Pallas train step: times the
full step, then variants with one subsystem stubbed out (same param
tree — stubs only skip compute), chained-on-state timing per
CLAUDE.md round-4 methodology. The deltas attribute the step budget.

Usage: python scripts/profile_step.py [--batch 32] > runs/profile_step/result.json
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))
import argparse
import json
import time
from unittest import mock

import numpy as np
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


def chain_time(step, state, batch, iters=40):
    """Median of 3 chained-timing runs (tunnel noise ~ +-10%)."""
    state, loss = step(state, batch)
    state, loss = step(state, batch)
    jax.block_until_ready(jax.tree_util.tree_leaves(state.params))
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, loss = step(state, batch)
        jax.block_until_ready(jax.tree_util.tree_leaves(state.params))
        reps.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(reps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    graphs = synthetic_dataset(args.batch, mean_atoms=13, seed=5)
    batch = pad_graphs(graphs, pad_budget_for(graphs, args.batch))
    cfg = ModelConfig(attention_layout="blocked")
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    tcfg = TrainConfig(batch_size=args.batch, warmup_steps=5)
    opt = make_optimizer(tcfg)

    def make_step():
        @jax.jit
        def step(st, b):
            def loss_fn(p):
                pred = model.apply(p, b)
                return smooth_l1_loss(pred, b.y, mask=b.graph_mask)
            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return apply_update_skip_nonfinite(st, loss, grads, opt,
                                               tcfg.ema_decay)
        return step

    def fresh_state():
        p = jax.tree.map(jnp.array, params)
        return TrainState(p, opt.init(p), ema_init(p),
                          jnp.zeros((), jnp.int32))

    results = {}

    def run(name, ctx=None):
        if ctx is None:
            results[name] = chain_time(make_step(), fresh_state(), batch,
                                       args.iters)
        else:
            with ctx:
                results[name] = chain_time(make_step(), fresh_state(),
                                           batch, args.iters)
        print(f"{name}: {results[name]:.3f} ms", file=_sys.stderr,
              flush=True)

    run("full")

    # attention kernel -> zeros (keeps projections/gathers; removes the
    # fused kernel fwd+bwd)
    import x2gnn_tpu.nn.conv as convmod

    def zero_kernel(q_blk, k_blk, v_blk, e_atom, rbf_blk, w_bd, s_bias,
                    z, a_ids, b_ids, heads, num_radial, **kw):
        out = jnp.zeros_like(q_blk) + 0.0 * (
            q_blk + k_blk + v_blk + e_atom[:, None] * 0
            + (w_bd.sum() + s_bias.sum()) * 0)
        if kw.get("return_alpha"):
            N, D, _ = q_blk.shape
            return out, jnp.zeros((N, D, D, heads), q_blk.dtype)
        return out

    import x2gnn_tpu.ops.pallas as palmod
    run("no_kernel", mock.patch.object(
        palmod, "pallas_blocked_attention", zero_kernel))

    # graph LayerNorm -> identity
    import x2gnn_tpu.nn.norm as normmod
    orig_norm = normmod.GraphLayerNorm.__call__
    run("no_norm", mock.patch.object(
        normmod.GraphLayerNorm, "__call__",
        lambda self, x, gid, G, mask=None: x))

    # readout aggregation kept, MLP head reduced to a single linear
    # (isolates the 5 x mlp_depth dense stacks of deep supervision)
    import dataclasses as _dc
    cfg_mlp1 = _dc.replace(cfg, mlp_depth=1)
    model_mlp1 = X2GNN(cfg_mlp1)
    params_mlp1 = model_mlp1.init(jax.random.PRNGKey(0), batch)

    @jax.jit
    def step_mlp1(st, b):
        def loss_fn(p):
            pred = model_mlp1.apply(p, b)
            return smooth_l1_loss(pred, b.y, mask=b.graph_mask)
        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return apply_update_skip_nonfinite(st, loss, grads, opt,
                                           tcfg.ema_decay)

    p1 = jax.tree.map(jnp.array, params_mlp1)
    st1 = TrainState(p1, opt.init(p1), ema_init(p1),
                     jnp.zeros((), jnp.int32))
    results["readout_mlp_depth1"] = chain_time(step_mlp1, st1, batch,
                                               args.iters)
    print(f"readout_mlp_depth1: {results['readout_mlp_depth1']:.3f} ms",
          file=_sys.stderr, flush=True)

    # basis eval (radial sbf factors) -> constants. NOTE: the model
    # imports the symbol into its own namespace, so patch THERE.
    import x2gnn_tpu.models.x2gnn as modmod

    def ones_radial(d, L, K, cutoff, p, mask=None):
        return jnp.ones(d.shape + (L, K), jnp.float32) * (
            0.0 * d[..., None, None] + 1.0)
    run("no_radial_sbf", mock.patch.object(
        modmod, "sbf_radial_part", ones_radial))

    # optimizer + EMA alone: constant loss -> zero grads, model DCE'd
    @jax.jit
    def opt_only(st, b):
        def loss_fn(p):
            return 0.0 * jax.tree_util.tree_leaves(p)[0].sum()
        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        return apply_update_skip_nonfinite(st, loss, grads, opt,
                                           tcfg.ema_decay)

    results["opt_ema_only"] = chain_time(opt_only, fresh_state(), batch,
                                         args.iters)
    print(f"opt_ema_only: {results['opt_ema_only']:.3f} ms",
          file=_sys.stderr, flush=True)

    full = results["full"]
    table = {k: {"ms": round(v, 3),
                 "delta_vs_full_ms": round(full - v, 3)}
             for k, v in results.items()}
    print(json.dumps({"batch": args.batch, "components": table}))


if __name__ == "__main__":
    main()
