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


# ---------------------------------------------------------------------------
# op-level tests (moved from tests/test_edge_partition.py, round 5):
# the sharded attention op and the scatter-free exchange against dense
# single-device references
# ---------------------------------------------------------------------------
from x2gnn_tpu.data.graphs import build_mol_graph
from x2gnn_tpu.data.batching import Budgets
from x2gnn_tpu.ops.attention import blocked_attention
from x2gnn_tpu.ops.basis import legendre_cos_harmonics
from x2gnn_tpu.parallel.edge_partition import make_ep_blocked_attention

_H, _C, _L = 4, 8, 3



def test_ep_matches_single_device(make_molecule, rng):
    n_dev = 4
    gs = []
    for i in range(8):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        g = build_mol_graph(numbers, pos, y=np.array([0.0]),
                            edge_feat_dim=8)
        gs.append(g)
    n, e, t, d = pad_budget_for(gs, 8)[:4]
    # pad atom and edge budgets to multiples of n_dev for clean shards
    n = ((n + n_dev - 1) // n_dev) * n_dev
    e = ((e + n_dev - 1) // n_dev) * n_dev
    b = pad_graphs(gs, Budgets(n, e, t, d))
    E = b.edge_src.shape[0]
    N, D = b.in_edges.shape

    q = jnp.asarray(rng.normal(size=(E, _H, _C)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(E, _H, _C)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(E, _H, _C)), jnp.float32)
    e_atom = jnp.asarray(rng.normal(size=(N, _H, _C)), jnp.float32)
    G = jnp.asarray(rng.normal(size=(E, _L, _H, _C)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(_H, _C)), jnp.float32)

    pos = b.positions
    in_src = b.edge_src[b.in_edges]
    out_dst = b.edge_dst[b.out_edges]
    ji = pos[in_src] - pos[:, None, :]
    jk = pos[out_dst] - pos[:, None, :]
    theta = np.arctan2(
        np.sqrt(np.maximum(
            (np.cross(ji[:, :, None, :], jk[:, None, :, :]) ** 2).sum(-1),
            1e-24)),
        np.einsum("nid,nkd->nik", ji, jk))
    cbf = jnp.asarray(legendre_cos_harmonics(jnp.asarray(theta), _L),
                      jnp.float32)
    pair_mask = jnp.asarray(
        b.in_mask[:, :, None] & b.out_mask[:, None, :]
        & (in_src[:, :, None] != out_dst[:, None, :]))

    # single-device reference (E-layout)
    ref = blocked_attention(q, k, v, e_atom, G, bias, cbf,
                            jnp.asarray(b.in_edges),
                            jnp.asarray(b.out_edges),
                            pair_mask, jnp.asarray(b.edge_inpos))

    mesh = make_mesh(n_dev)
    ep = make_ep_blocked_attention(mesh, heads=_H)
    out_blk = ep(q, k, v, e_atom, G, bias, cbf,
                 jnp.asarray(b.in_edges), jnp.asarray(b.out_edges),
                 pair_mask)
    got = np.asarray(out_blk).reshape(N * D, _H, _C)[b.edge_inpos]
    em = b.edge_mask
    np.testing.assert_allclose(got[em], np.asarray(ref)[em],
                               rtol=3e-4, atol=3e-5)


def test_exchange_custom_vjp_matches_dense(make_molecule, rng):
    """Round-4 scatter-free exchange (ep_model._make_exchange): forward
    gathers rows through out2in, backward gathers cotangents through
    the inverse in2out — values AND input gradients must match a dense
    jnp reference, in both allgather and ring modes, on an 8-shard
    mesh."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from x2gnn_tpu.parallel.ep_model import (
        EPBatch, make_ep_batch, _make_exchange)
    from x2gnn_tpu.data.batching import pad_graphs

    n_dev = 8
    gs = []
    for i in range(6):
        numbers, pos = make_molecule(n_atoms=int(rng.integers(5, 10)))
        gs.append(build_mol_graph(numbers, pos, y=np.array([0.0]),
                                  edge_feat_dim=8))
    b = pad_graphs(gs, pad_budget_for(gs, 6))
    epb = make_ep_batch(b, n_dev)
    N, D = epb.in_mask.shape
    Cf = 16
    x = jnp.asarray(rng.normal(size=(N * D, Cf)), jnp.float32)

    # dense reference: rows out2in of x, zeroed at masked out-slots
    def ref_fn(x):
        out = x[jnp.asarray(epb.out2in)]
        return jnp.where(jnp.asarray(epb.out_mask)[..., None], out, 0.0)

    cot = jnp.asarray(rng.normal(size=(N, D, Cf)), jnp.float32)
    ref, ref_vjp = jax.vjp(ref_fn, x)
    ref_dx = ref_vjp(cot)[0]
    # zero the pad in-slots: the dense reference scatters cot for slot-0
    # references from pad rows; the exchange masks them by design
    ref_dx = jnp.where(jnp.asarray(epb.in_mask).reshape(-1)[:, None],
                       ref_dx, 0.0)

    mesh = make_mesh(n_dev)
    for mode in ("allgather", "ring"):
        ex = _make_exchange(mode)

        def local(xl, o2i, i2o, om, im):
            return ex(xl, o2i, i2o, om, im)

        sharded = jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P("data"),) * 5, out_specs=P("data"),
            check_vma=False))
        args = (x, jnp.asarray(epb.out2in), jnp.asarray(epb.in2out),
                jnp.asarray(epb.out_mask), jnp.asarray(epb.in_mask))
        got = sharded(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"fwd mode={mode}")

        def loss(x):
            return (sharded(x, *args[1:]) * cot).sum()

        dx = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_dx),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"bwd mode={mode}")
