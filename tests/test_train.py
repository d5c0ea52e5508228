"""Trainer tests: schedule formula, EMA semantics, loss oracle vs torch,
split reproducibility, checkpoint roundtrip, and a tiny overfit run."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from x2gnn_tpu.config import ModelConfig, TrainConfig
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.models import X2GNN
from x2gnn_tpu.train.optim import warmup_exponential_decay
from x2gnn_tpu.train.ema import ema_init, ema_update
from x2gnn_tpu.train.loss import smooth_l1_loss
from x2gnn_tpu.train.trainer import Trainer, make_split

TINY_MODEL = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16,
                         heads=2, sbf_dim=2, rbf_dim=2, edge_feat_dim=12)
TINY_TRAIN = TrainConfig(batch_size=4, max_lr=5e-3, warmup_steps=5,
                         decay_steps=10000, ema_decay=0.9,
                         ckpt_after_epoch=0, division=(2, 4))


def test_schedule_matches_reference_formula():
    sched = warmup_exponential_decay(1e-3, 3000, 3_000_000, 0.01)
    for step in [0, 1, 100, 2999, 3000, 50000, 3_000_000]:
        warmup = min(1 / 3000 + step / 3000, 1)
        decay = 0.01 ** (step / 3_000_000)
        assert float(sched(step)) == pytest.approx(1e-3 * warmup * decay,
                                                   rel=1e-6)


def test_ema_first_update_copies():
    params = {"w": jnp.asarray([1.0, 2.0])}
    ema = ema_init({"w": jnp.asarray([0.0, 0.0])})
    ema = ema_update(ema, params, decay=0.95)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), [1.0, 2.0])
    ema = ema_update(ema, {"w": jnp.asarray([2.0, 3.0])}, decay=0.95)
    np.testing.assert_allclose(np.asarray(ema.params["w"]),
                               [0.95 * 1 + 0.05 * 2, 0.95 * 2 + 0.05 * 3],
                               rtol=1e-6)


def test_smooth_l1_vs_torch(rng):
    import torch
    import torch.nn.functional as F
    pred = rng.normal(size=32).astype(np.float32) * 3
    target = rng.normal(size=32).astype(np.float32)
    got = float(smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target)))
    expect = float(F.smooth_l1_loss(torch.tensor(pred),
                                    torch.tensor(target)))
    assert got == pytest.approx(expect, rel=1e-6)


def test_smooth_l1_masking():
    pred = jnp.asarray([1.0, 100.0])
    target = jnp.asarray([1.0, 0.0])
    mask = jnp.asarray([True, False])
    assert float(smooth_l1_loss(pred, target, mask)) == pytest.approx(0.0)


def test_make_split_matches_reference_permutation():
    # reference: np.random.seed(41); np.random.permutation(n)
    np.random.seed(41)
    perm = np.random.permutation(100)
    train, val, test = make_split(100, 41, (10, 20))
    np.testing.assert_array_equal(test, perm[:10])
    np.testing.assert_array_equal(val, perm[10:20])
    np.testing.assert_array_equal(train, perm[20:])


def _tiny_dataset(make_molecule, rng, k=12):
    graphs = []
    for i in range(k):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(4, 7)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]), edge_feat_dim=12)
        g.edge_feat[:] = rng.normal(size=g.edge_feat.shape).astype(np.float32)
        graphs.append(g)
    # target = a simple learnable function: atom count
    targets = np.array([g.num_atoms for g in graphs], dtype=np.float32)
    return graphs, targets


def test_trainer_overfits_tiny_dataset(make_molecule, rng, tmp_path):
    graphs, targets = _tiny_dataset(make_molecule, rng)
    model = X2GNN(TINY_MODEL)
    trainer = Trainer(model, TINY_MODEL, TINY_TRAIN, graphs, targets,
                      workdir=str(tmp_path / "run"))
    # NOTE: the train step donates its input state — never reuse a state
    # object after passing it in; always rebind from the return value.
    state = trainer.init_state()
    state, loss0 = trainer.run_epoch(state)
    for _ in range(30):
        state, loss = trainer.run_epoch(state)
    assert loss < loss0 * 0.5, f"loss {loss0} -> {loss}: no learning"


def test_trainer_fit_logs_and_checkpoints(make_molecule, rng, tmp_path):
    graphs, targets = _tiny_dataset(make_molecule, rng)
    model = X2GNN(TINY_MODEL)
    wd = str(tmp_path / "run2")
    trainer = Trainer(model, TINY_MODEL, TINY_TRAIN, graphs, targets,
                      workdir=wd)
    state, summary = trainer.fit(epochs=3)
    assert os.path.exists(os.path.join(wd, "metrics.jsonl"))
    assert os.path.exists(os.path.join(wd, "train.log"))
    assert summary["best_val_mae"] is not None
    # checkpoint written (ckpt_after_epoch=0 -> from epoch 1 on improvement)
    assert os.path.isdir(os.path.join(wd, "ckpt_best"))
    # restore roundtrip
    restored = trainer.restore(os.path.join(wd, "ckpt_best"))
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_nonfinite_loss_skips_update(make_molecule, rng, tmp_path):
    """Failure detection: a NaN batch must not corrupt params (update
    skipped, bad_steps incremented)."""
    graphs, targets = _tiny_dataset(make_molecule, rng)
    model = X2GNN(TINY_MODEL)
    trainer = Trainer(model, TINY_MODEL, TINY_TRAIN, graphs, targets,
                      workdir=str(tmp_path / "nan"))
    state = trainer.init_state()
    batch = next(trainer._batches(trainer.train_idx))
    bad_batch = batch.replace(y=jnp.full_like(jnp.asarray(batch.y),
                                              jnp.nan))
    before = jax.device_get(state.params)
    state2, loss = trainer._train_step(state, bad_batch)
    assert not np.isfinite(float(loss))
    assert int(state2.bad_steps) == 1
    after = jax.device_get(state2.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_eval_uses_ema(make_molecule, rng, tmp_path):
    graphs, targets = _tiny_dataset(make_molecule, rng)
    model = X2GNN(TINY_MODEL)
    trainer = Trainer(model, TINY_MODEL, TINY_TRAIN, graphs, targets,
                      workdir=str(tmp_path / "run3"))
    state = trainer.init_state()
    state, _ = trainer.run_epoch(state)
    # after the first epoch, EMA differs from live params (count > 1)
    diffs = [float(np.abs(np.asarray(e) - np.asarray(p)).max())
             for e, p in zip(jax.tree_util.tree_leaves(state.ema.params),
                             jax.tree_util.tree_leaves(state.params))]
    assert max(diffs) > 0


def test_trainer_profile_trace(make_molecule, rng, tmp_path):
    """fit(profile_dir=...) captures a jax.profiler trace of epoch 2."""
    import os
    graphs, targets = _tiny_dataset(make_molecule, rng)
    model = X2GNN(TINY_MODEL)
    trainer = Trainer(model, TINY_MODEL, TINY_TRAIN, graphs, targets,
                      workdir=str(tmp_path / "runp"))
    prof = str(tmp_path / "trace")
    trainer.fit(epochs=2, profile_dir=prof)
    found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
    assert found, "no trace files written"


def test_resume_does_not_clobber_best_checkpoint(make_molecule, rng,
                                                 tmp_path):
    """On resume, the best-val gate is seeded from the restored weights:
    a worse first epoch of the resumed run must NOT overwrite ckpt_best."""
    import dataclasses
    import jax.numpy as jnp
    graphs, targets = _tiny_dataset(make_molecule, rng)
    model = X2GNN(TINY_MODEL)
    tcfg = dataclasses.replace(TINY_TRAIN, ckpt_after_epoch=0)
    wd = tmp_path / "resume_run"
    trainer = Trainer(model, TINY_MODEL, tcfg, graphs, targets,
                      workdir=str(wd))
    trainer.fit(epochs=3)
    state = trainer.restore(str(wd / "ckpt_best"))
    val0 = trainer.evaluate(state, trainer.val_idx)
    # corrupt the params: the resumed run's first epochs will be worse
    bad = state._replace(params=jax.tree_util.tree_map(
        lambda p: p * 10.0, state.params))
    bad = bad._replace(ema=bad.ema._replace(params=jax.tree_util.tree_map(
        lambda p: p * 10.0, bad.ema.params)))
    trainer.fit(epochs=1, state=bad)
    state2 = trainer.restore(str(wd / "ckpt_best"))
    val1 = trainer.evaluate(state2, trainer.val_idx)
    np.testing.assert_allclose(val1, val0, rtol=1e-6)


def test_periodic_ckpt_and_auto_resume(make_molecule, rng, tmp_path):
    """Elastic recovery: ckpt_last written every N epochs; a 'crashed'
    run resumes from it and continues stepping (the reference has no
    resume path at all, SURVEY §5)."""
    import dataclasses
    graphs, targets = _tiny_dataset(make_molecule, rng)
    tcfg = dataclasses.replace(TINY_TRAIN, ckpt_after_epoch=0,
                               ckpt_every=2)
    wd = tmp_path / "elastic"
    trainer = Trainer(X2GNN(TINY_MODEL), TINY_MODEL, tcfg, graphs,
                      targets, workdir=str(wd))
    trainer.fit(epochs=3)   # "crash" after epoch 3; ckpt_last @ epoch 2
    assert (wd / "ckpt_last").is_dir()
    state = trainer.restore(str(wd / "ckpt_last"))
    steps_per_epoch = -(-len(trainer.train_idx) // tcfg.batch_size)
    assert int(state.step) == 2 * steps_per_epoch
    state2, _ = trainer.fit(epochs=2, state=state)
    assert int(state2.step) == 4 * steps_per_epoch


def test_gradient_accumulation_multisteps():
    """accum_steps=k: params move only every k-th micro-batch, by the
    k-microbatch AVERAGE gradient (optax.MultiSteps semantics)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.config import TrainConfig
    from x2gnn_tpu.train.optim import make_optimizer

    base = TrainConfig(warmup_steps=1, max_lr=1e-2, grad_clip=False)
    cfg = dataclasses.replace(base, accum_steps=2)
    opt = make_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    st = opt.init(params)
    g1 = {"w": jnp.array([1.0, 2.0, 3.0])}
    g2 = {"w": jnp.array([3.0, 2.0, 1.0])}

    up1, st = opt.update(g1, st, params)
    assert float(jnp.abs(up1["w"]).max()) == 0.0    # accumulating
    up2, st = opt.update(g2, st, params)
    assert float(jnp.abs(up2["w"]).max()) > 0.0     # applied

    # equals one step of the un-accumulated optimizer on the mean grad
    opt0 = make_optimizer(base)
    st0 = opt0.init(params)
    up_ref, _ = opt0.update(
        jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2),
        st0, params)
    np.testing.assert_allclose(np.asarray(up2["w"]),
                               np.asarray(up_ref["w"]), rtol=1e-6)


def test_latest_checkpoint_handles_named_and_numeric(tmp_path):
    import os
    from x2gnn_tpu.train.checkpoint import latest_checkpoint

    def mk(name, t):
        d = tmp_path / name
        d.mkdir()
        os.utime(d, (t, t))

    assert latest_checkpoint(str(tmp_path / "missing")) is None
    mk("ckpt_best", 100)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_best")
    # numeric suffixes break mtime ties
    mk("ckpt_5", 200)
    mk("ckpt_40", 200)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_40")
    mk("ckpt_last", 300)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_last")
    # a ckpt_best saved AFTER the periodic ckpt_last wins (it is the
    # newer full TrainState — resuming from ckpt_last would roll back)
    os.utime(tmp_path / "ckpt_best", (400, 400))
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt_best")


def test_dropout_trains_on_segment_layout(make_molecule, rng, tmp_path):
    """cfg.dropout > 0 is now live in training (deterministic=False +
    per-step rng on the segment layout) and rejected loudly elsewhere."""
    import dataclasses
    import pytest
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    cfg = ModelConfig(conv_layers=1, in_channels=16, embedding_size=16,
                      heads=2, sbf_dim=2, rbf_dim=2, edge_feat_dim=8,
                      dropout=0.25, attention_layout="segment")
    graphs = synthetic_dataset(8, mean_atoms=6, seed=2, edge_feat_dim=8)
    targets = np.array([g.y[0] for g in graphs], dtype=np.float32)
    tcfg = TrainConfig(batch_size=4, warmup_steps=2, max_epoch=2)
    trainer = Trainer(X2GNN(cfg), cfg, tcfg, graphs, targets,
                      workdir=str(tmp_path / "drop"))
    state, summary = trainer.fit(epochs=2)
    assert np.isfinite(summary["best_val_mae"])

    # blocked layout trains with dropout too (XLA core path); the padded
    # layout still refuses silent no-op dropout
    cfg_b = dataclasses.replace(cfg, attention_layout="blocked",
                                use_pallas=False)
    model_b = X2GNN(cfg_b)
    batch = next(iter(trainer._batches(trainer.train_idx[:4])))
    params = model_b.init(jax.random.PRNGKey(0), batch)
    out_b = model_b.apply(params, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out_b)).all()
    # round-4: the padded layout trains with dropout too (canonical
    # pair-space mask gathered per neighbor slot)
    cfg_p = dataclasses.replace(cfg, attention_layout="padded")
    model_p = X2GNN(cfg_p)
    out_p = model_p.apply(params, batch, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out_p)).all()


def test_plateau_controller_torch_semantics():
    from x2gnn_tpu.train.optim import PlateauController
    c = PlateauController(factor=0.5, patience=2, min_scale=0.1)
    # improving: no decay
    for m in (10.0, 9.0, 8.0):
        assert c.step(m) == 1.0
    # stall: patience epochs tolerated, decay on the (patience+1)-th
    assert c.step(8.0) == 1.0
    assert c.step(8.0) == 1.0
    assert c.step(8.0) == 0.5
    # counter resets after a reduction (torch semantics)
    assert c.step(8.0) == 0.5
    assert c.step(8.0) == 0.5
    assert c.step(8.0) == 0.25
    # floor at min_scale
    for _ in range(20):
        s = c.step(8.0)
    assert s == pytest.approx(0.1)
    # relative-threshold improvement resets the bad-epoch count
    c2 = PlateauController(factor=0.5, patience=1)
    c2.step(10.0)
    c2.step(10.0)          # bad 1
    assert c2.step(5.0) == 1.0   # real improvement
    c2.step(5.0)           # bad 1
    assert c2.step(5.0) == 0.5   # bad 2 > patience


def test_plateau_scale_roundtrip_through_optimizer_state():
    from x2gnn_tpu.train.optim import (
        make_optimizer, set_plateau_scale, get_plateau_scale)
    cfg = dataclasses.replace(TINY_TRAIN, scheduler="plateau",
                              accum_steps=2)   # MultiSteps wrapping too
    opt = make_optimizer(cfg)
    params = {"w": jnp.zeros(3)}
    s0 = opt.init(params)
    assert get_plateau_scale(s0) == 1.0
    s1 = set_plateau_scale(s0, 0.49)
    assert get_plateau_scale(s1) == pytest.approx(0.49)
    # same treedef (no recompile of the jitted step)
    assert (jax.tree_util.tree_structure(s0)
            == jax.tree_util.tree_structure(s1))
    # the injected scale actually changes the applied update
    g = {"w": jnp.ones(3)}
    up_full, _ = opt.update(g, set_plateau_scale(s0, 1.0), params)
    up_full2, _ = opt.update(g, set_plateau_scale(s0, 1.0), params)
    up_half, _ = opt.update(g, set_plateau_scale(s0, 0.5), params)
    np.testing.assert_allclose(np.asarray(up_full["w"]),
                               np.asarray(up_full2["w"]))
    # first MultiSteps micro-step emits zeros; step twice to see the lr
    def two_steps(scale):
        s = set_plateau_scale(opt.init(params), scale)
        u1, s = opt.update(g, s, params)
        u2, s = opt.update(g, s, params)
        return np.asarray(u2["w"])
    np.testing.assert_allclose(two_steps(0.5), two_steps(1.0) * 0.5,
                               rtol=1e-5)


def test_trainer_plateau_schedule_reduces_lr(make_molecule, rng, tmp_path):
    import json as json_
    graphs, targets = _tiny_dataset(make_molecule, rng)
    # lr=0 freezes the params: val MAE is bitwise identical every epoch,
    # so with patience=0 the plateau must fire deterministically from
    # epoch 2 on (random targets were flaky — early epochs can keep
    # improving by more than the 1e-4 relative threshold)
    cfg = dataclasses.replace(TINY_TRAIN, scheduler="plateau",
                              max_lr=0.0, reduce_factor=0.5, patience=0,
                              decay_rate=0.01)
    model = X2GNN(TINY_MODEL)
    wd = str(tmp_path / "plateau")
    trainer = Trainer(model, TINY_MODEL, cfg, graphs, targets, workdir=wd)
    trainer.fit(epochs=5)
    records = [json_.loads(l) for l in
               open(os.path.join(wd, "metrics.jsonl"))]
    scales = [r["lr_scale"] for r in records]
    assert scales[0] == 1.0 or scales[-1] < scales[0]
    assert scales[-1] < 1.0, f"plateau never reduced the LR: {scales}"
    assert min(scales) >= 0.01 - 1e-9


def test_blocked_trainer_skips_triplet_arrays(make_molecule, rng,
                                              tmp_path):
    """Blocked-layout training never reads the per-triplet / neighbor
    tables; the trainer must not build them (host assembly + transfer
    dead weight — the serving path already skips them, infer.py)."""
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    cfg = dataclasses.replace(TINY_MODEL, attention_layout="blocked",
                              use_pallas=False)
    graphs = synthetic_dataset(12, mean_atoms=8, seed=3, edge_feat_dim=12)
    targets = np.array([g.num_atoms for g in graphs], dtype=np.float32)
    trainer = Trainer(X2GNN(cfg), cfg, TINY_TRAIN, graphs, targets,
                      workdir=str(tmp_path / "blk"))
    b = next(trainer._batches(trainer.train_idx))
    assert b.trip_src_edge.shape[0] == 0
    assert b.nbr_trip.shape[0] == 0
    state, summary = trainer.fit(epochs=2)
    assert np.isfinite(summary["best_val_mae"])
    # segment layout still gets triplets
    tr_seg = Trainer(X2GNN(TINY_MODEL), TINY_MODEL, TINY_TRAIN, graphs,
                     targets, workdir=str(tmp_path / "seg"))
    b2 = next(tr_seg._batches(tr_seg.train_idx))
    assert b2.trip_src_edge.shape[0] > 0


def test_feat_dtype_float16_close_to_f32(make_molecule, rng, tmp_path):
    """fp16 edge-feature transfer (trainer feat_dtype) is a wire/HBM
    compression, not a numerics mode: one epoch's loss matches the f32
    run to ~fp16 input rounding, and evaluate() stays finite/close."""
    graphs, targets = _tiny_dataset(make_molecule, rng)
    # features in [0, 1] like the real sa_compress output
    for g in graphs:
        g.edge_feat[:] = np.abs(g.edge_feat) / (
            np.abs(g.edge_feat).max() + 1e-9)
    losses = {}
    for dt in ("float32", "float16"):
        model = X2GNN(TINY_MODEL)
        trainer = Trainer(model, TINY_MODEL, TINY_TRAIN, graphs, targets,
                          workdir=str(tmp_path / f"run_{dt}"),
                          feat_dtype=dt)
        state = trainer.init_state()
        state, loss = trainer.run_epoch(state)
        losses[dt] = (loss, trainer.evaluate(state, trainer.val_idx))
    l32, v32 = losses["float32"]
    l16, v16 = losses["float16"]
    assert np.isfinite(l16) and np.isfinite(v16)
    assert l16 == pytest.approx(l32, rel=2e-2)
    assert v16 == pytest.approx(v32, rel=5e-2)


def test_feat_dtype_accepted_on_ep(make_molecule, rng, tmp_path):
    """Round-4: the fp16 feature wire reaches the EP path (the round-2
    rejection is gone) — construction succeeds and a fit stays finite."""
    jax.config.update("jax_num_cpu_devices", 8)
    from x2gnn_tpu.parallel.mesh import make_mesh
    graphs, targets = _tiny_dataset(make_molecule, rng)
    mesh = make_mesh()
    tr = Trainer(X2GNN(TINY_MODEL), TINY_MODEL, TINY_TRAIN, graphs,
                 targets, workdir=str(tmp_path / "r"), mesh=mesh,
                 edge_partition="allgather", feat_dtype="float16")
    state, summary = tr.fit(epochs=1)
    assert np.isfinite(summary["best_val_mae"])


def test_fused_update_matches_unfused_first_step(make_molecule, rng):
    """--fused-update (optax.flatten) must be numerically the same
    update to float reassociation (round-4 step-profile mitigation)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.graphs import build_mol_graph
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.loss import smooth_l1_loss
    from x2gnn_tpu.train.optim import (
        apply_update_skip_nonfinite, make_optimizer)
    from x2gnn_tpu.train.trainer import TrainState

    graphs = []
    for i in range(4):
        numbers, pos = make_molecule(n_atoms=6 + i)
        g = build_mol_graph(numbers, pos, y=np.array([float(i)]),
                            edge_feat_dim=8)
        graphs.append(g)
    batch = pad_graphs(graphs, pad_budget_for(graphs, 4))
    cfg = ModelConfig(attention_layout="blocked", conv_layers=2,
                      in_channels=32, embedding_size=32, heads=4,
                      sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                      use_pallas=False)
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), batch)

    def one_step(fused):
        tcfg = TrainConfig(batch_size=4, warmup_steps=5,
                           fused_update=fused)
        opt = make_optimizer(tcfg)
        p = jax.tree_util.tree_map(jnp.array, params)
        st = TrainState(p, opt.init(p), ema_init(p),
                        jnp.zeros((), jnp.int32))

        def loss_fn(pp):
            return smooth_l1_loss(model.apply(pp, batch), batch.y,
                                  mask=batch.graph_mask)
        loss, grads = jax.value_and_grad(loss_fn)(st.params)
        st, _ = apply_update_skip_nonfinite(st, loss, grads, opt,
                                            tcfg.ema_decay)
        return st

    s0, s1 = one_step(False), one_step(True)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


def test_host_cache_batches_matches_device_cache(tmp_path, rng):
    """cache_batches='host' (RAM-cached batches + device_put prefetch
    stream) trains identically to the device cache (round-4, for
    datasets whose padded batches overflow HBM)."""
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    graphs = synthetic_dataset(32, mean_atoms=8, seed=6, edge_feat_dim=8)
    y = np.array([g.y[0] for g in graphs], np.float32)
    y = (y - y.mean()) / (y.std() + 1e-9)
    mcfg = ModelConfig(attention_layout="blocked", conv_layers=2,
                       in_channels=32, embedding_size=32, heads=4,
                       sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                       use_pallas=False)
    tcfg = TrainConfig(batch_size=8, warmup_steps=3, ckpt_after_epoch=0,
                       pack_mixed=True)

    def fit(mode, wd):
        tr = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, y,
                     workdir=str(tmp_path / wd), cache_batches=mode)
        state, summary = tr.fit(epochs=2)
        import json
        return [json.loads(l)["loss"]
                for l in open(tmp_path / wd / "metrics.jsonl")]

    l_dev = fit(True, "dev")
    l_host = fit("host", "host")
    np.testing.assert_allclose(l_host, l_dev, rtol=1e-6)


def test_flat_ema_matches_tree_ema(make_molecule, rng):
    """Flat EMA (round 5: the EMA rides ONE vector when fused_update is
    on) must equal the tree EMA after unraveling, across several steps
    including the count==0 copy-through."""
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.train.ema import ema_init, ema_update, ema_unravel_fn
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.config import ModelConfig
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.graphs import build_mol_graph

    numbers, pos = make_molecule(n_atoms=6)
    g = build_mol_graph(numbers, pos, y=np.array([0.0]), edge_feat_dim=8)
    batch = pad_graphs([g], pad_budget_for([g], 1))
    cfg = ModelConfig(attention_layout="segment", conv_layers=1,
                      in_channels=16, embedding_size=16, heads=2,
                      sbf_dim=2, rbf_dim=3, edge_feat_dim=8)
    params = X2GNN(cfg).init(jax.random.PRNGKey(0), batch)
    tree_ema = ema_init(params)
    flat_ema = ema_init(params, flat=True)
    unravel = ema_unravel_fn(params)
    p = params
    for step in range(3):
        p = jax.tree_util.tree_map(lambda x: x + 0.1 * (step + 1), p)
        tree_ema = ema_update(tree_ema, p, 0.9)
        flat_ema = ema_update(flat_ema, p, 0.9)
        rebuilt = unravel(flat_ema.params)
        for a, b in zip(jax.tree_util.tree_leaves(rebuilt),
                        jax.tree_util.tree_leaves(tree_ema.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        assert int(flat_ema.count) == int(tree_ema.count) == step + 1


def test_restore_adapts_ema_representation(make_molecule, rng, tmp_path):
    """A tree-EMA checkpoint restored by a fused-update (flat-EMA)
    trainer — and vice versa — adapts instead of crashing; the EMA
    values survive the representation change (round 5)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    graphs = synthetic_dataset(8, mean_atoms=8, seed=3, edge_feat_dim=8)
    y = np.array([g.y[0] for g in graphs], np.float32)
    y = (y - y.mean()) / (y.std() + 1e-9)
    mcfg = ModelConfig(attention_layout="blocked", conv_layers=1,
                       in_channels=16, embedding_size=16, heads=2,
                       sbf_dim=2, rbf_dim=3, edge_feat_dim=8,
                       use_pallas=False)
    tcfg = TrainConfig(batch_size=4, division=[2, 4], max_epoch=1,
                       warmup_steps=2, ckpt_after_epoch=0,
                       fused_update=False)
    model = X2GNN(mcfg)
    tr = Trainer(model, mcfg, tcfg, graphs, y, workdir=str(tmp_path))
    state = tr.init_state()
    state, _ = tr.run_epoch(state)
    from x2gnn_tpu.train.checkpoint import save_checkpoint
    ckpt = str(tmp_path / "ckpt_x")
    save_checkpoint(ckpt, state)

    # restore the TREE checkpoint with a FLAT (fused-update) trainer
    tr2 = Trainer(model, mcfg, dataclasses.replace(tcfg,
                                                   fused_update=True),
                  graphs, y, workdir=str(tmp_path / "w2"))
    st2 = tr2.restore(ckpt)
    assert isinstance(st2.ema.params, jnp.ndarray)
    rebuilt = tr2._ema_tree(st2)
    for a, b in zip(jax.tree_util.tree_leaves(rebuilt),
                    jax.tree_util.tree_leaves(state.ema.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    # the flat state steps (structure matches the fused step)
    st2, loss = tr2.run_epoch(st2)
    assert np.isfinite(loss)

    # and the reverse direction: flat checkpoint -> tree trainer
    ckpt2 = str(tmp_path / "ckpt_flat")
    save_checkpoint(ckpt2, st2)
    st3 = tr.restore(ckpt2)
    assert not isinstance(st3.ema.params, jnp.ndarray)


def test_feat_dtype_int8_close_to_f32(make_molecule, rng, tmp_path):
    """int8 wire features (per-edge scales, round 5): one epoch's loss
    tracks the f32 run closely — quantization is ~0.8% input rounding
    on bounded integral features, not a training-dynamics change."""
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    graphs = synthetic_dataset(16, mean_atoms=8, seed=5, edge_feat_dim=8)
    y = np.array([g.y[0] for g in graphs], np.float32)
    y = (y - y.mean()) / (y.std() + 1e-9)
    mcfg = ModelConfig(attention_layout="blocked", conv_layers=2,
                       in_channels=32, embedding_size=32, heads=4,
                       sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                       use_pallas=False)
    tcfg = TrainConfig(batch_size=8, division=[4, 8], max_epoch=2,
                       warmup_steps=2)
    losses = {}
    for dt in ("float32", "int8"):
        tr = Trainer(X2GNN(mcfg), mcfg, tcfg, graphs, y,
                     workdir=str(tmp_path / dt), feat_dtype=dt)
        state = tr.init_state()
        state, loss = tr.run_epoch(state)
        losses[dt] = loss
        # wire dtype really is int8 (and carries scales)
        b = next(iter(tr._device_batches(tr.train_idx[:8])))
        if dt == "int8":
            assert b.edge_feat.dtype == jnp.int8
            assert b.edge_feat_scale is not None
    assert np.isfinite(losses["int8"])
    assert abs(losses["int8"] - losses["float32"]) < 0.05 * max(
        abs(losses["float32"]), 1e-6) + 1e-3
