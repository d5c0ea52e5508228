"""Full-model edge partitioning vs the unsharded blocked model.

The EP forward re-implements X2GNN's math over atom-sharded activations
with explicit collectives; these tests assert exact equivalence (values
AND parameter gradients) against the flax model on an 8-device CPU mesh.
"""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.config import ModelConfig
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.data.synthetic import synthetic_dataset
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.parallel import (
    make_ep_batch, shard_ep_batch, make_ep_forward, make_ep_train_step,
    make_mesh)

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                  heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                  attention_layout="blocked", use_pallas=False)


def _setup(readout="atomwise", variant="v1", n_mol=6, seed=11, **extra):
    cfg = dataclasses.replace(CFG, readout=readout, variant=variant,
                              **extra)
    graphs = synthetic_dataset(n_mol, mean_atoms=8, seed=seed,
                               edge_feat_dim=8)
    batch = pad_graphs(graphs, pad_budget_for(graphs, n_mol))
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)
    mesh = make_mesh(8)
    epb = make_ep_batch(batch, 8)
    epb_sharded = shard_ep_batch(epb, mesh)
    return cfg, model, params, batch, epb, epb_sharded, mesh


@pytest.mark.parametrize("readout", ["atomwise", "molwise_mean",
                                     "molwise_add"])
def test_ep_forward_matches_model(readout):
    cfg, model, params, batch, epb, epbs, mesh = _setup(readout=readout)
    ref = np.asarray(model.apply(params, batch))
    fwd = make_ep_forward(cfg, mesh, epb.numbers.shape[0])
    got = np.asarray(fwd(params, epbs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ep_forward_matches_model_v2():
    cfg, model, params, batch, epb, epbs, mesh = _setup(variant="v2")
    ref = np.asarray(model.apply(params, batch))
    fwd = make_ep_forward(cfg, mesh, epb.numbers.shape[0])
    got = np.asarray(fwd(params, epbs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ep_forward_matches_model_beta():
    """Beta-gated skip (ModelConfig.beta) under edge partitioning."""
    cfg, model, params, batch, epb, epbs, mesh = _setup(beta=True)
    ref = np.asarray(model.apply(params, batch))
    fwd = make_ep_forward(cfg, mesh, epb.numbers.shape[0])
    got = np.asarray(fwd(params, epbs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ep_ring_exchange_matches_allgather():
    """The ppermute ring K/V exchange is numerically identical to the
    all-gather baseline (forward and parameter gradients)."""
    cfg, model, params, batch, epb, epbs, mesh = _setup()
    N = epb.numbers.shape[0]
    fwd_ag = make_ep_forward(cfg, mesh, N, kv_exchange="allgather")
    fwd_ring = make_ep_forward(cfg, mesh, N, kv_exchange="ring")
    ref = np.asarray(fwd_ag(params, epbs))
    got = np.asarray(fwd_ring(params, epbs))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    gm = jnp.asarray(batch.graph_mask)
    y = jnp.asarray(batch.y)

    def loss(fwd):
        def f(p):
            out = fwd(p, epbs)
            return jnp.where(gm, (out - y) ** 2, 0.0).sum()
        return f

    g_ag = jax.tree_util.tree_leaves(jax.grad(loss(fwd_ag))(params))
    g_ring = jax.tree_util.tree_leaves(jax.grad(loss(fwd_ring))(params))
    for a, b in zip(g_ag, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-3, atol=1e-5)


def test_ep_param_gradients_match_model():
    """Backward through the sharded forward (collectives transpose to
    reduce-scatters) gives the same parameter gradients as the flax
    model — including the psum'ed grad-by-frequency embedding counts."""
    cfg, model, params, batch, epb, epbs, mesh = _setup()
    fwd = make_ep_forward(cfg, mesh, epb.numbers.shape[0])
    gm = jnp.asarray(batch.graph_mask)
    y = jnp.asarray(batch.y)

    def loss_ref(p):
        out = model.apply(p, batch)
        return jnp.where(gm, (out - y) ** 2, 0.0).sum()

    def loss_ep(p):
        out = fwd(p, epbs)
        return jnp.where(gm, (out - y) ** 2, 0.0).sum()

    g_ref = jax.grad(loss_ref)(params)
    g_ep = jax.grad(loss_ep)(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_ep = jax.tree_util.tree_leaves(g_ep)
    assert len(flat_ref) == len(flat_ep)
    for (path, a), b in zip(flat_ref, flat_ep):
        # f32 reduction order differs across shards -> ~1e-3 relative
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_ep_train_step_runs_and_descends():
    from x2gnn_tpu.config import TrainConfig
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState

    cfg, model, params, batch, epb, epbs, mesh = _setup()
    tcfg = TrainConfig(batch_size=6, warmup_steps=2)
    opt = make_optimizer(tcfg)
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))
    step = make_ep_train_step(cfg, opt, tcfg.ema_decay, mesh,
                              epb.numbers.shape[0])
    losses = []
    for _ in range(4):
        state, loss = step(state, epbs)
        losses.append(float(loss))
    assert int(state.step) == 4
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_trainer_edge_partition_mode(tmp_path):
    """Trainer(edge_partition='ring') trains end to end on an 8-device
    mesh: loss decreases, eval runs, checkpoints round-trip."""
    from x2gnn_tpu.config import TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(CFG, readout="atomwise")
    graphs = synthetic_dataset(16, mean_atoms=8, seed=3, edge_feat_dim=8)
    targets = np.array([g.y[0] for g in graphs], dtype=np.float32)
    tcfg = TrainConfig(batch_size=4, warmup_steps=4, max_epoch=3,
                       ckpt_after_epoch=0)
    mesh = make_mesh(8)
    model = X2GNN(cfg)
    trainer = Trainer(model, cfg, tcfg, graphs, targets,
                      workdir=str(tmp_path / "ep_run"), mesh=mesh,
                      edge_partition="ring")
    state, summary = trainer.fit(epochs=3)
    assert np.isfinite(summary["best_val_mae"])
    losses = [json.loads(l)["loss"] for l in
              open(tmp_path / "ep_run" / "metrics.jsonl")]
    assert losses[-1] < losses[0]


def test_ep_remat_gradients_match():
    """cfg.remat under edge partitioning (recompute the gathered K/V +
    conv in the backward) must not change parameter gradients."""
    cfg, model, params, batch, epb, epbs, mesh = _setup()
    cfg_r = dataclasses.replace(cfg, remat=True)
    N = epb.numbers.shape[0]
    gm, y = jnp.asarray(batch.graph_mask), jnp.asarray(batch.y)

    def loss(fwd):
        return lambda p: jnp.where(gm, (fwd(p, epbs) - y) ** 2, 0.0).sum()

    for kv in ("allgather", "ring"):
        g0 = jax.grad(loss(make_ep_forward(cfg, mesh, N, kv)))(params)
        g1 = jax.grad(loss(make_ep_forward(cfg_r, mesh, N, kv)))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-5)


def test_ep_dropout_train_step(tmp_path):
    """Round-3: dropout under edge partitioning. The step threads a
    per-step, per-shard pair-mask rng; dropout forwards are deterministic
    in the key, differ across keys, and deterministic eval (no key)
    matches the unsharded model exactly."""
    from x2gnn_tpu.config import TrainConfig
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState

    cfg, model, params, batch, epb, epbs, mesh = _setup(dropout=0.4)
    n_pad = epb.numbers.shape[0]
    fwd_d = make_ep_forward(cfg, mesh, n_pad, with_dropout=True)
    k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    p1 = np.asarray(fwd_d(params, epbs, k1))
    p1b = np.asarray(fwd_d(params, epbs, k1))
    p2 = np.asarray(fwd_d(params, epbs, k2))
    np.testing.assert_array_equal(p1, p1b)   # key-deterministic
    assert np.abs(p1 - p2).max() > 1e-7      # key actually used
    # deterministic forward (no dropout) still matches the flax model
    fwd = make_ep_forward(cfg, mesh, n_pad)
    ref = np.asarray(model.apply(params, batch))
    np.testing.assert_allclose(np.asarray(fwd(params, epbs)), ref,
                               rtol=2e-5, atol=2e-6)
    # the train step runs with dropout active and stays finite
    tcfg = TrainConfig(batch_size=6, warmup_steps=2)
    opt = make_optimizer(tcfg)
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))
    step = make_ep_train_step(cfg, opt, tcfg.ema_decay, mesh, n_pad,
                              rng_seed=3)
    for _ in range(3):
        state, loss = step(state, epbs)
        assert np.isfinite(float(loss))
    assert int(state.step) == 3


def test_trainer_accepts_dropout_with_edge_partition(tmp_path):
    """The round-2 trainer hard-block on dropout + EP is gone."""
    from x2gnn_tpu.config import TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.train.trainer import Trainer
    from x2gnn_tpu.parallel import make_mesh

    cfg = dataclasses.replace(CFG, dropout=0.3)
    graphs = synthetic_dataset(8, mean_atoms=8, seed=4, edge_feat_dim=8)
    y = np.array([g.y[0] for g in graphs], np.float32)
    tcfg = TrainConfig(batch_size=4, warmup_steps=2, ckpt_after_epoch=0)
    tr = Trainer(X2GNN(cfg), cfg, tcfg, graphs, y,
                 workdir=str(tmp_path), mesh=make_mesh(8),
                 edge_partition="allgather")
    state, summary = tr.fit(epochs=1)
    assert np.isfinite(summary["best_val_mae"])


# ---------------------------------------------------------------------------
# round-4: the fused Pallas kernel composed into the EP forward
# (interpret mode on CPU; each shard runs the kernel on its local tables)
# ---------------------------------------------------------------------------

def test_ep_pallas_forward_matches_model():
    """EP forward with cfg.use_pallas=True (fused kernel per shard,
    interpret mode on CPU) == the unsharded flax model."""
    cfg, model, params, batch, epb, epbs, mesh = _setup(use_pallas=True)
    ref = np.asarray(model.apply(params, batch))
    fwd = make_ep_forward(cfg, mesh, epb.numbers.shape[0])
    got = np.asarray(fwd(params, epbs))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_ep_pallas_gradients_match():
    """Parameter gradients through the kernel's custom VJP inside the
    shard_map match the flax model's."""
    cfg, model, params, batch, epb, epbs, mesh = _setup(use_pallas=True)
    fwd = make_ep_forward(cfg, mesh, epb.numbers.shape[0])
    gm, y = jnp.asarray(batch.graph_mask), jnp.asarray(batch.y)

    def loss_ref(p):
        return jnp.where(gm, (model.apply(p, batch) - y) ** 2, 0.0).sum()

    def loss_ep(p):
        return jnp.where(gm, (fwd(p, epbs) - y) ** 2, 0.0).sum()

    g_ref = jax.grad(loss_ref)(params)
    g_ep = jax.grad(loss_ep)(params)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_ep = jax.tree_util.tree_leaves(g_ep)
    for (path, a), b in zip(flat_ref, flat_ep):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_ep_pallas_remat_ring_gradients_match():
    """remat + ring K/V exchange + the Pallas kernel compose: gradients
    match the non-remat XLA-core EP forward (the kernel's custom VJP
    takes every traced operand explicitly, so jax.checkpoint re-traces
    cleanly)."""
    cfg, model, params, batch, epb, epbs, mesh = _setup(use_pallas=True)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    cfg_r = dataclasses.replace(cfg, remat=True)
    N = epb.numbers.shape[0]
    gm, y = jnp.asarray(batch.graph_mask), jnp.asarray(batch.y)

    def loss(fwd):
        return lambda p: jnp.where(gm, (fwd(p, epbs) - y) ** 2, 0.0).sum()

    g0 = jax.grad(loss(make_ep_forward(cfg_x, mesh, N, "allgather")))(
        params)
    g1 = jax.grad(loss(make_ep_forward(cfg_r, mesh, N, "ring")))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=1e-4)


def test_ep_pallas_dropout_matches_xla_branch():
    """With one key, the Pallas and XLA EP branches draw the SAME
    per-shard pair keep-mask (pair_dropout_mask stream), so their dropout
    forwards agree — dropout training keeps the fused path on >1 chip."""
    cfg, model, params, batch, epb, epbs, mesh = _setup(
        use_pallas=True, dropout=0.35)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    n_pad = epb.numbers.shape[0]
    key = jax.random.PRNGKey(9)
    fwd_p = make_ep_forward(cfg, mesh, n_pad, with_dropout=True)
    fwd_x = make_ep_forward(cfg_x, mesh, n_pad, with_dropout=True)
    a = np.asarray(fwd_p(params, epbs, key))
    b = np.asarray(fwd_x(params, epbs, key))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
