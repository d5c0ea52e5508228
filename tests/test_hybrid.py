"""Hybrid DP x EP (2D mesh) vs the unsharded blocked model.

dp rows hold independent molecule groups; the 'data' axis edge-partitions
each group's batched graph. Equivalence targets: per-group predictions ==
the flax model on that group's batch; parameter gradients of the global
masked-mean loss == the unsharded combined loss.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.config import ModelConfig, TrainConfig
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.data.synthetic import synthetic_dataset
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.parallel import (
    make_ep_batch, make_hybrid_mesh, stack_ep_batches, shard_hybrid_batch,
    make_hybrid_forward, make_hybrid_train_step, make_hybrid_eval_step)
from x2gnn_tpu.train.ema import ema_init
from x2gnn_tpu.train.loss import smooth_l1_loss
from x2gnn_tpu.train.optim import make_optimizer
from x2gnn_tpu.train.trainer import TrainState

CFG = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                  heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                  attention_layout="blocked", use_pallas=False)

DP, EP = 2, 4


def _setup(n_per_group=3, seed=7, **extra):
    cfg = dataclasses.replace(CFG, **extra)
    groups = [synthetic_dataset(n_per_group, mean_atoms=8, seed=seed + i,
                                edge_feat_dim=8) for i in range(DP)]
    # composition-independent budgets across ALL groups so stacked shapes
    # match (the trainer's pad_budget_for over the dataset does the same)
    budgets = pad_budget_for([g for gs in groups for g in gs], n_per_group)
    batches = [pad_graphs(gs, budgets) for gs in groups]
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batches[0])
    mesh = make_hybrid_mesh(DP, EP)
    epbs = [make_ep_batch(b, EP) for b in batches]
    stacked = stack_ep_batches(epbs)
    sharded = shard_hybrid_batch(stacked, mesh)
    N = epbs[0].numbers.shape[0]
    return cfg, model, params, batches, stacked, sharded, mesh, N


@pytest.mark.parametrize("kv_exchange", ["allgather", "ring"])
def test_hybrid_forward_matches_model_per_group(kv_exchange):
    cfg, model, params, batches, stacked, sharded, mesh, N = _setup()
    fwd = make_hybrid_forward(cfg, mesh, N, kv_exchange=kv_exchange)
    got = np.asarray(fwd(params, sharded))          # (DP, G)
    assert got.shape[0] == DP
    for i, b in enumerate(batches):
        ref = np.asarray(model.apply(params, b))
        np.testing.assert_allclose(got[i], ref, rtol=2e-5, atol=2e-6)


def test_hybrid_param_gradients_match_combined_loss():
    cfg, model, params, batches, stacked, sharded, mesh, N = _setup()
    fwd = make_hybrid_forward(cfg, mesh, N)

    def loss_hybrid(p):
        pred = fwd(p, sharded)
        return smooth_l1_loss(pred.reshape(-1), sharded.y.reshape(-1),
                              mask=sharded.graph_mask.reshape(-1))

    def loss_ref(p):
        preds = jnp.concatenate([model.apply(p, b) for b in batches])
        y = jnp.concatenate([jnp.asarray(b.y) for b in batches])
        m = jnp.concatenate([jnp.asarray(b.graph_mask) for b in batches])
        return smooth_l1_loss(preds, y, mask=m)

    lh, gh = jax.value_and_grad(loss_hybrid)(params)
    lr, gr = jax.value_and_grad(loss_ref)(params)
    np.testing.assert_allclose(float(lh), float(lr), rtol=1e-5)
    flat_ref = jax.tree_util.tree_flatten_with_path(gr)[0]
    flat_h = jax.tree_util.tree_leaves(gh)
    assert len(flat_ref) == len(flat_h)
    for (path, a), b in zip(flat_ref, flat_h):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_hybrid_train_step_runs_and_descends():
    cfg, model, params, batches, stacked, sharded, mesh, N = _setup()
    tcfg = TrainConfig(batch_size=3, warmup_steps=2)
    opt = make_optimizer(tcfg)
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))
    step = make_hybrid_train_step(cfg, opt, tcfg.ema_decay, mesh, N)
    losses = []
    for _ in range(4):
        state, loss = step(state, sharded)
        losses.append(float(loss))
    assert int(state.step) == 4
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    mae_sum, count = make_hybrid_eval_step(cfg, mesh, N, std=2.0)(
        state.ema.params, sharded)
    assert np.isfinite(float(mae_sum))
    assert int(count) == sum(int(b.graph_mask.sum()) for b in batches)


def test_hybrid_mesh_validates_shape():
    with pytest.raises(ValueError):
        make_hybrid_mesh(3, 3)


def test_trainer_hybrid_mode(tmp_path):
    """Trainer on a (2,4) hybrid mesh trains end to end: loss decreases,
    EMA eval runs, the last (ragged) dp group is mask-padded."""
    import json
    from x2gnn_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(CFG)
    graphs = synthetic_dataset(18, mean_atoms=8, seed=3, edge_feat_dim=8)
    targets = np.array([g.y[0] for g in graphs], dtype=np.float32)
    # batch 4 -> 3-4 batches/epoch over 2 dp groups: exercises the filler
    tcfg = TrainConfig(batch_size=4, warmup_steps=4, max_epoch=3,
                       ckpt_after_epoch=0)
    mesh = make_hybrid_mesh(DP, EP)
    model = X2GNN(cfg)
    trainer = Trainer(model, cfg, tcfg, graphs, targets,
                      workdir=str(tmp_path / "hybrid_run"), mesh=mesh,
                      edge_partition="allgather")
    state, summary = trainer.fit(epochs=3)
    assert np.isfinite(summary["best_val_mae"])
    losses = [json.loads(l)["loss"] for l in
              open(tmp_path / "hybrid_run" / "metrics.jsonl")]
    assert losses[-1] < losses[0]


def test_hybrid_sharded_batch_cache_hits(tmp_path):
    """Mesh-mode trainers cache the SHARDED device batches: the second
    epoch must reuse the exact same device objects (no per-epoch EP
    relayout / host->device transfer)."""
    from x2gnn_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(CFG)
    graphs = synthetic_dataset(16, mean_atoms=8, seed=5, edge_feat_dim=8)
    targets = np.array([g.y[0] for g in graphs], dtype=np.float32)
    tcfg = TrainConfig(batch_size=4, warmup_steps=2)
    mesh = make_hybrid_mesh(DP, EP)
    trainer = Trainer(X2GNN(cfg), cfg, tcfg, graphs, targets,
                      workdir=str(tmp_path / "cache"), mesh=mesh,
                      edge_partition="allgather")
    first = list(trainer._device_batches(trainer.train_idx))
    second = list(trainer._device_batches(trainer.train_idx))
    assert len(first) == len(second) > 0
    for a, b in zip(first, second):
        assert a.feat_blk is b.feat_blk       # same device buffer


def test_hybrid_dropout_train_step():
    """Round-3: dropout on the hybrid DP x EP path — per-chip pair masks
    (key folded with both mesh positions), key-deterministic."""
    import dataclasses
    from x2gnn_tpu.config import TrainConfig
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState
    from x2gnn_tpu.parallel.hybrid import make_hybrid_forward

    cfg, model, params, batches, stacked, sharded, mesh, N = _setup(
        dropout=0.35)
    n_pad = N
    fwd_d = make_hybrid_forward(cfg, mesh, n_pad, with_dropout=True)
    k1, k2 = jax.random.PRNGKey(5), jax.random.PRNGKey(6)
    p1 = np.asarray(fwd_d(params, sharded, k1))
    p1b = np.asarray(fwd_d(params, sharded, k1))
    p2 = np.asarray(fwd_d(params, sharded, k2))
    np.testing.assert_array_equal(p1, p1b)
    assert np.abs(p1 - p2).max() > 1e-7
    tcfg = TrainConfig(batch_size=4, warmup_steps=2)
    opt = make_optimizer(tcfg)
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))
    step = make_hybrid_train_step(cfg, opt, tcfg.ema_decay, mesh, n_pad,
                                  rng_seed=3)
    for _ in range(3):
        state, loss = step(state, sharded)
        assert np.isfinite(float(loss))
    assert int(state.step) == 3


def test_hybrid_pallas_forward_and_grads_match():
    """Round-4: the fused Pallas kernel runs inside each (dp, ep) chip's
    shard (interpret on CPU) — per-group predictions and parameter
    gradients match the unsharded flax model."""
    cfg, model, params, batches, stacked, sharded, mesh, N = _setup(
        use_pallas=True)
    fwd = make_hybrid_forward(cfg, mesh, N, kv_exchange="ring")
    got = np.asarray(fwd(params, sharded))
    for i, b in enumerate(batches):
        ref = np.asarray(model.apply(params, b))
        np.testing.assert_allclose(got[i], ref, rtol=2e-5, atol=2e-6)

    gm = jnp.asarray(stacked.graph_mask.reshape(-1))
    y = jnp.asarray(stacked.y.reshape(-1))

    def loss_h(p):
        return smooth_l1_loss(fwd(p, sharded).reshape(-1), y, mask=gm)

    def loss_ref(p):
        preds = jnp.concatenate([model.apply(p, b) for b in batches])
        return smooth_l1_loss(preds, y, mask=gm)

    g_h = jax.tree_util.tree_leaves(jax.grad(loss_h)(params))
    g_r = jax.tree_util.tree_flatten_with_path(jax.grad(loss_ref)(params))
    for (path, a), b in zip(g_r[0], g_h):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
