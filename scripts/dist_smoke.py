"""Two-process jax.distributed smoke test (multi-HOST evidence on CPU).

Exercises parallel/mesh.py::initialize_distributed for real: two OS
processes, each owning 4 virtual CPU devices, join one coordination
service and run the SAME jitted DP train step (shard_map + psum'd grads)
over the global 8-device mesh — the mechanism a TPU pod uses across
hosts, minus the ICI. The launcher then replays the identical batches
single-process on 8 local devices and compares the per-step losses.

Round 5 (VERDICT r4 #5) adds the HYBRID smoke: the same two processes
form a 2x4 (dp, data) mesh whose EP 'data' axis is deliberately laid
out to SPAN the process boundary (device column interleaving), so the
EP K/V exchange — all-gather AND the ppermute ring — and the
transpose-derived gradient reductions cross real process boundaries.
Both kv_exchange modes are compared against a single-process 8-device
replay of the identical stacked EPBatch.

Usage: python scripts/dist_smoke.py            # DP smoke (round 4)
       python scripts/dist_smoke.py --hybrid   # hybrid smoke (round 5)
Writes runs/dist_smoke/result.json / result_hybrid.json.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json
import os
import subprocess
import sys

PORT = 12877
STEPS = 4
N_DEV = 8          # global devices: 4 per process x 2 processes
PER_DEV = 2        # molecules per device


def _build_data():
    """Deterministic per-device batches — identical in every process."""
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    graphs = synthetic_dataset(N_DEV * PER_DEV, mean_atoms=8, seed=3,
                               edge_feat_dim=8)
    budgets = pad_budget_for(graphs, PER_DEV)
    return [pad_graphs(graphs[i * PER_DEV:(i + 1) * PER_DEV], budgets)
            for i in range(N_DEV)]


def _run_steps(mesh, stacked_sharded):
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import make_dp_train_step
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState

    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                      attention_layout="blocked", use_pallas=False)
    tcfg = TrainConfig(batch_size=PER_DEV, warmup_steps=2)
    model = X2GNN(cfg)
    batches = _build_data()
    params = model.init(jax.random.PRNGKey(0), batches[0])
    opt = make_optimizer(tcfg)
    state = TrainState(params, opt.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))
    step = make_dp_train_step(model, opt, tcfg.ema_decay, mesh)
    losses = []
    for _ in range(STEPS):
        state, loss = step(state, stacked_sharded)
        losses.append(float(loss))
    return losses


def worker(process_id: int):
    import jax
    from x2gnn_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator=f"localhost:{PORT}",
                           num_processes=2, process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == N_DEV, jax.device_count()

    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()).reshape(N_DEV), ("data",))

    batches = _build_data()
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *batches)
    sharding = NamedSharding(mesh, P("data"))
    local = jax.process_index() * (N_DEV // 2)
    # each process contributes only ITS addressable rows of the global
    # stacked batch (the multi-host array-construction path)
    global_batch = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, x[local:local + N_DEV // 2], x.shape), stacked)

    losses = _run_steps(mesh, global_batch)
    print(f"proc {process_id} losses: {losses}", flush=True)
    if process_id == 0:
        os.makedirs("runs/dist_smoke", exist_ok=True)
        with open("runs/dist_smoke/worker0.json", "w") as f:
            json.dump({"losses": losses}, f)


DP, EP = 2, 4      # hybrid mesh shape (dp groups x ep shards)
HYB_PER_GROUP = 4  # molecules per dp group


def _build_hybrid_data():
    """Two EP groups (one per dp shard) with identical shapes."""
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    from x2gnn_tpu.parallel import make_ep_batch, stack_ep_batches
    graphs = synthetic_dataset(DP * HYB_PER_GROUP, mean_atoms=8, seed=4,
                               edge_feat_dim=8)
    budgets = pad_budget_for(graphs, HYB_PER_GROUP)
    epbs = [make_ep_batch(pad_graphs(
        graphs[i * HYB_PER_GROUP:(i + 1) * HYB_PER_GROUP], budgets), EP)
        for i in range(DP)]
    return stack_ep_batches(epbs)


def _run_hybrid_steps(mesh, stacked, put):
    """Run STEPS hybrid train steps for both kv_exchange modes.
    `put(name, x)` lays a stacked-EPBatch field onto the mesh."""
    import jax
    import jax.numpy as jnp
    from x2gnn_tpu.config import ModelConfig, TrainConfig
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.parallel import make_hybrid_train_step
    from x2gnn_tpu.parallel.ep_model import EPBatch
    from x2gnn_tpu.train.ema import ema_init
    from x2gnn_tpu.train.optim import make_optimizer
    from x2gnn_tpu.train.trainer import TrainState

    cfg = ModelConfig(conv_layers=2, in_channels=32, embedding_size=32,
                      heads=4, sbf_dim=3, rbf_dim=4, edge_feat_dim=8,
                      attention_layout="blocked", use_pallas=False)
    tcfg = TrainConfig(batch_size=HYB_PER_GROUP, warmup_steps=2)
    n_pad = int(stacked.numbers.shape[1])
    sharded = EPBatch(**{f: put(f, getattr(stacked, f))
                         for f in EPBatch.__annotations__})
    # params init needs a GraphBatch-shaped probe: rebuild one locally
    from x2gnn_tpu.data.batching import pad_graphs, pad_budget_for
    from x2gnn_tpu.data.synthetic import synthetic_dataset
    graphs = synthetic_dataset(HYB_PER_GROUP, mean_atoms=8, seed=4,
                               edge_feat_dim=8)
    probe = pad_graphs(graphs, pad_budget_for(graphs, HYB_PER_GROUP))
    model = X2GNN(cfg)
    params = model.init(jax.random.PRNGKey(0), probe)
    opt = make_optimizer(tcfg)
    out = {}
    for mode in ("allgather", "ring"):
        p = jax.tree_util.tree_map(jnp.array, params)
        state = TrainState(p, opt.init(p), ema_init(p),
                           jnp.zeros((), jnp.int32))
        step = make_hybrid_train_step(cfg, opt, tcfg.ema_decay, mesh,
                                      n_pad, kv_exchange=mode)
        losses = []
        for _ in range(STEPS):
            state, loss = step(state, sharded)
            losses.append(float(loss))
        out[mode] = losses
    return out


def hybrid_worker(process_id: int):
    import jax
    from x2gnn_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator=f"localhost:{PORT + 1}",
                           num_processes=2, process_id=process_id)
    assert jax.device_count() == N_DEV, jax.device_count()

    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from x2gnn_tpu.parallel.hybrid import DP_AXIS, AXIS, _hybrid_spec
    # column-interleaved layout: each dp row holds 2 devices from EACH
    # process, so the EP exchange crosses the process boundary
    devs = np.asarray(jax.devices()).reshape(EP, DP).T
    mesh = Mesh(devs, (DP_AXIS, AXIS))
    stacked = _build_hybrid_data()

    def put(name, x):
        sharding = NamedSharding(mesh, _hybrid_spec(name))
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx, x=x: x[idx])

    out = _run_hybrid_steps(mesh, stacked, put)
    print(f"proc {process_id} hybrid losses: {out}", flush=True)
    if process_id == 0:
        os.makedirs("runs/dist_smoke", exist_ok=True)
        with open("runs/dist_smoke/worker0_hybrid.json", "w") as f:
            json.dump(out, f)


def hybrid_launcher():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--hybrid",
         "--process-id", str(i)],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for i in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], f"hybrid worker exit codes {rcs}"
    with open("runs/dist_smoke/worker0_hybrid.json") as f:
        dist = json.load(f)

    # single-process reference: same stacked batch on 8 local devices
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_DEV)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from x2gnn_tpu.parallel.hybrid import DP_AXIS, AXIS, _hybrid_spec
    mesh = Mesh(np.asarray(jax.devices()).reshape(DP, EP),
                (DP_AXIS, AXIS))
    stacked = _build_hybrid_data()

    def put(name, x):
        return jax.device_put(jnp.asarray(np.asarray(x)),
                              NamedSharding(mesh, _hybrid_spec(name)))

    ref = _run_hybrid_steps(mesh, stacked, put)
    result = {"processes": 2, "devices_per_process": 4,
              "mesh": [DP, EP], "steps": STEPS,
              "ep_axis_spans_processes": True}
    worst = 0.0
    for mode in ("allgather", "ring"):
        diff = float(np.max(np.abs(np.asarray(dist[mode])
                                   - np.asarray(ref[mode]))))
        rel = diff / max(abs(ref[mode][0]), 1e-12)
        result[mode] = {"dist_losses": dist[mode],
                        "ref_losses": ref[mode], "rel_diff": rel}
        worst = max(worst, rel)
    with open("runs/dist_smoke/result_hybrid.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert worst < 1e-5, f"hybrid 2-process losses diverge: {worst}"
    print("HYBRID DIST SMOKE OK")


def launcher():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--process-id", str(i)],
        env=env, cwd=os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for i in range(2)]
    rcs = [p.wait(timeout=600) for p in procs]
    assert rcs == [0, 0], f"worker exit codes {rcs}"
    with open("runs/dist_smoke/worker0.json") as f:
        dist_losses = json.load(f)["losses"]

    # single-process reference on 8 local devices, identical batches
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_DEV)
    from x2gnn_tpu.parallel import make_mesh, shard_batches
    mesh = make_mesh(N_DEV)
    ref_losses = _run_steps(mesh, shard_batches(_build_data(), mesh))

    import numpy as np
    diff = float(np.max(np.abs(np.asarray(dist_losses)
                               - np.asarray(ref_losses))))
    rel = diff / max(abs(ref_losses[0]), 1e-12)
    result = {"dist_losses": dist_losses, "ref_losses": ref_losses,
              "max_abs_diff": diff, "rel_diff": rel,
              "processes": 2, "devices_per_process": 4, "steps": STEPS}
    with open("runs/dist_smoke/result.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert rel < 1e-5, f"2-process losses diverge from single-process: {rel}"
    print("DIST SMOKE OK")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--hybrid", action="store_true")
    a = ap.parse_args()
    if a.hybrid:
        if a.process_id is None:
            hybrid_launcher()
        else:
            hybrid_worker(a.process_id)
    elif a.process_id is None:
        launcher()
    else:
        worker(a.process_id)
