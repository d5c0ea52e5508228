"""Data-parallel tests on the 8-device CPU mesh: DP step must agree with
the single-device step on the same global batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.config import ModelConfig, TrainConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.parallel import (
    make_mesh, stack_batches, shard_batches,
    make_dp_train_step, make_dp_eval_step)
from x2gnn_tpu.train.optim import make_optimizer
from x2gnn_tpu.train.ema import ema_init
from x2gnn_tpu.train.trainer import TrainState
from x2gnn_tpu.train.loss import smooth_l1_loss

CFG = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16, heads=2,
                  sbf_dim=2, rbf_dim=2, edge_feat_dim=12)
TCFG = TrainConfig(batch_size=2, max_lr=1e-3, warmup_steps=5, grad_clip=True,
                   max_grad=100.0, ema_decay=0.9)


def _device_batches(make_molecule, rng, n_dev, per_dev):
    all_graphs = []
    for _ in range(n_dev * per_dev):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(4, 7)))
        g = build_mol_graph(numbers, pos, y=np.array([1.0]), edge_feat_dim=12)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(np.float32)
        all_graphs.append(g)
    budgets = pad_budget_for(all_graphs, per_dev)
    batches = [
        pad_graphs(all_graphs[i * per_dev:(i + 1) * per_dev], budgets)
        for i in range(n_dev)
    ]
    return all_graphs, batches


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_stack_batches_shapes(make_molecule, rng):
    _, batches = _device_batches(make_molecule, rng, 4, 2)
    stacked = stack_batches(batches)
    assert stacked.numbers.shape[0] == 4
    assert stacked.y.shape == (4, 2)


def test_dp_grads_match_mean_of_per_device_grads(make_molecule, rng):
    """DP step loss/params must equal serially averaging per-device grads."""
    # pin the shared session rng: this comparison is f32-tolerance-
    # marginal (Adam rsqrt amplifies pmean-vs-serial-mean rounding), so
    # it must not depend on how many rng draws earlier tests consumed
    rng.bit_generator.state = np.random.default_rng(4242).bit_generator.state
    n_dev = 4
    _, batches = _device_batches(make_molecule, rng, n_dev, 2)
    mesh = make_mesh(n_dev)
    model = X2GNN(CFG)
    opt = make_optimizer(TCFG)

    params = model.init(jax.random.PRNGKey(0), batches[0])
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))

    # oracle FIRST (dp_step donates `state`, invalidating `params` buffers):
    # mean of per-device losses/grads, single optimizer step
    def loss_fn(p, b):
        pred = model.apply(p, b)
        return smooth_l1_loss(pred, b.y, mask=b.graph_mask)

    losses, grads = [], []
    for b in batches:
        l, g = jax.value_and_grad(loss_fn)(params, b)
        losses.append(float(l))
        grads.append(g)
    mean_grads = jax.tree_util.tree_map(
        lambda *gs: sum(gs) / n_dev, *grads)
    updates, _ = opt.update(mean_grads, opt.init(params), params)
    expect_params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                           updates)
    expect_params = jax.device_get(expect_params)

    dp_step = make_dp_train_step(model, opt, TCFG.ema_decay, mesh)
    stacked = shard_batches(batches, mesh)
    new_state, dp_loss = dp_step(state, stacked)
    assert float(dp_loss) == pytest.approx(np.mean(losses), rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(expect_params)):
        # Adam's rsqrt amplifies pmean-vs-serial-mean rounding; 1e-3 is the
        # right scale for f32 optimizer-step equivalence
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_trainer_with_mesh(make_molecule, rng, tmp_path):
    """Trainer in DP mode: runs epochs over a CPU mesh, loss finite, and
    the final partial device-group is padded with masked batches."""
    from x2gnn_tpu.train.trainer import Trainer
    import numpy as np
    graphs = []
    for i in range(10):   # 10 graphs, batch 2, 4 devices -> partial group
        numbers, pos = make_molecule(n_atoms=int(rng.integers(4, 7)))
        from x2gnn_tpu.data.graphs import build_mol_graph
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=12)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(
            np.float32)
        graphs.append(g)
    targets = np.array([g.num_atoms for g in graphs], dtype=np.float32)
    mesh = make_mesh(4)
    trainer = Trainer(X2GNN(CFG), CFG, TCFG, graphs, targets,
                      workdir=str(tmp_path / "dp"), mesh=mesh)
    state = trainer.init_state()
    state, loss = trainer.run_epoch(state)
    assert np.isfinite(loss)
    val = trainer.evaluate(state, trainer.val_idx)
    assert np.isfinite(val)


def test_dp_eval_psum(make_molecule, rng):
    n_dev = 8
    _, batches = _device_batches(make_molecule, rng, n_dev, 2)
    mesh = make_mesh(n_dev)
    model = X2GNN(CFG)
    params = model.init(jax.random.PRNGKey(0), batches[0])
    eval_step = make_dp_eval_step(model, mesh, std=2.0)
    stacked = shard_batches(batches, mesh)
    err, cnt = eval_step(params, stacked)
    assert float(cnt) == n_dev * 2
    # oracle
    total = 0.0
    for b in batches:
        pred = model.apply(params, b)
        total += float(
            2.0 * jnp.where(b.graph_mask,
                            jnp.abs(pred - b.y), 0.0).sum())
    assert float(err) == pytest.approx(total, rel=1e-5)


def test_dp_nonfinite_loss_skips_update_and_counts(make_molecule, rng):
    """A NaN target in DP mode must leave params AND opt_state untouched
    and increment bad_steps (shared apply_update_skip_nonfinite path)."""
    n_dev = 4
    _, batches = _device_batches(make_molecule, rng, n_dev, 2)
    bad = batches[0].replace(y=jnp.full_like(jnp.asarray(batches[0].y),
                                             jnp.nan))
    mesh = make_mesh(n_dev)
    stacked = shard_batches([bad] + batches[1:], mesh)
    model = X2GNN(CFG)
    opt = make_optimizer(TCFG)
    params = model.init(jax.random.PRNGKey(0), batches[0])
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    before = jax.tree_util.tree_map(np.asarray, params)  # pre-donation
    step = make_dp_train_step(model, opt, TCFG.ema_decay, mesh)
    new_state, loss = step(state, stacked)
    assert not np.isfinite(float(loss))
    assert int(new_state.bad_steps) == 1
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
