"""Training loop: EMA training with per-step schedule, masked losses,
best-val checkpointing, structured logging.

Re-designs Train_EMA (trainer.py:11-116) TPU-first: one jitted, donated
train step over static-shape batches; EMA as a pytree fold; orbax
checkpoints with restore/resume (the reference has no resume); jsonl
metrics alongside the reference-style text log.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from x2gnn_tpu.config import ModelConfig, TrainConfig
from x2gnn_tpu.data.batching import (
    GraphBatch, batch_iterator, pad_budget_for)
from x2gnn_tpu.train.checkpoint import save_checkpoint, restore_checkpoint
from x2gnn_tpu.train.ema import EmaState, ema_init
from x2gnn_tpu.train.loss import smooth_l1_loss, masked_mae
from x2gnn_tpu.train.optim import (
    apply_update_skip_nonfinite, make_optimizer)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState
    step: jnp.ndarray
    bad_steps: jnp.ndarray = None  # count of skipped non-finite updates


def resolve_division(n: int, division) -> tuple:
    """Scale the reference 10k/10k division down for small datasets.
    Single source of truth shared with train.py's --atomref-fit split
    resolution — the atomref fit must see exactly the Trainer's train
    molecules, so the fallback lives in one place."""
    d0, d1 = division
    if n <= d1:
        d0 = max(1, n // 10)
        d1 = min(n - 1, 2 * d0)
    return d0, d1


def make_split(n: int, seed: int, division) -> tuple:
    """Fixed-permutation split: test=[:d0], val=[d0:d1], train=[d1:]
    (trainer.py:22-27; legacy numpy RandomState reproduces the reference's
    np.random.seed + permutation exactly)."""
    rs = np.random.RandomState(seed)
    perm = rs.permutation(n)
    d0, d1 = division
    return perm[d1:], perm[d0:d1], perm[:d0]  # train, val, test


class Trainer:
    def __init__(
        self,
        model,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        graphs: Sequence,
        targets: np.ndarray,
        workdir: str = "./runs/run0",
        std: float = 1.0,
        budgets: Optional[tuple] = None,
        train_step_fn: Optional[Callable] = None,
        mesh=None,
        cache_batches: Optional[bool] = None,
        edge_partition: Optional[str] = None,
        feat_dtype: str = "float32",
    ):
        """`mesh`: a jax.sharding.Mesh with a 'data' axis enables
        molecule-sharded data parallelism (per-device batch groups,
        pmean'd gradients over ICI).

        `edge_partition`: with a mesh, 'allgather' or 'ring' shards the
        ACTIVATIONS of each batched graph across the mesh instead of
        sharding molecules (parallel/ep_model.py) — for graphs larger
        than one chip's memory. Mutually exclusive with plain DP.
        If the mesh also has a 'dp' axis (parallel/hybrid.py's
        make_hybrid_mesh), both compose: molecule groups over 'dp',
        each group edge-partitioned over 'data'.

        `cache_batches`: keep padded batches across epochs (the split
        order is fixed, trainer.py:22-27, so batches are identical every
        epoch). None = auto (on for datasets under ~20k molecules).
        'host' = cache assembled batches in HOST RAM and stream them to
        the device through a background device_put prefetcher — for
        datasets whose padded batches overflow HBM (134k molecules ~
        tens of GB) but fit host memory: assembly is paid once, and
        the per-step cost drops from host-assembly-bound (~103 ms
        measured round 3) to max(compute, transfer).

        `feat_dtype`: dtype for the integral edge features on the wire
        and in the device cache. 'float16' halves the dominant
        host->TPU transfer and HBM-cache bytes; the features are
        bounded in [0, ~1] (sa_compress output), so fp16 costs only
        ~5e-4 relative input rounding — the model upcasts to f32 at
        entry and all math is unchanged. Single-device and plain-DP
        paths only (the EP/hybrid batch preprocessing is f32)."""
        self.model = model
        self.mcfg = model_cfg
        self.tcfg = train_cfg
        self.graphs = list(graphs)
        self.targets = np.asarray(targets, dtype=np.float32)
        self.workdir = workdir
        self.std = std   # MAE report calibration (trainer.py:57)
        self.optimizer = make_optimizer(train_cfg)

        n = len(self.graphs)
        d0, d1 = resolve_division(n, train_cfg.division)
        self.train_idx, self.val_idx, self.test_idx = make_split(
            n, train_cfg.random_seed, (d0, d1))
        self.budgets = budgets or pad_budget_for(
            self.graphs, train_cfg.batch_size)
        # the blocked layout (and the EP/hybrid paths built on it) never
        # reads the per-triplet or neighbor-table arrays — skip building
        # them entirely: they dominate host batch-assembly time and
        # per-step transfer bytes (the serving path already does this,
        # infer.py)
        self._with_triplets = model_cfg.attention_layout != "blocked" \
            and edge_partition is None
        if feat_dtype not in ("float32", "float16", "int8"):
            raise ValueError(f"feat_dtype must be float32/float16/int8, "
                             f"got {feat_dtype!r}")
        if feat_dtype == "int8" and edge_partition:
            raise ValueError(
                "feat_dtype='int8' is a blocked/DP wire format; the EP "
                "batch layout pre-gathers features (make_ep_batch) — "
                "use float16 there")
        # round-4: fp16 feature wire/cache reaches the EP/hybrid paths
        # too — make_ep_batch preserves fp16 edge features and the
        # sharded forward widens them to f32 at the envelope product
        self._feat_dtype = feat_dtype
        self.bucket_shapes = int(getattr(train_cfg, "bucket_shapes", 0))
        self.pack_budget = bool(getattr(train_cfg, "pack_budget", False))
        self.pack_mixed = bool(getattr(train_cfg, "pack_mixed", False))
        if self.pack_mixed:
            # mixed FFD packing supersedes the per-class planner
            self.bucket_shapes = 0
            self.pack_budget = False
        if self.pack_budget and not self.bucket_shapes:
            raise ValueError("pack_budget requires bucket_shapes >= 1 "
                             "(packing fills the per-class budgets)")
        if self.bucket_shapes and not self.pack_mixed and mesh is not None:
            # per-class plans emit SEVERAL compiled shapes; stacking
            # consecutive batches into device groups would mix shapes.
            # Mixed-FFD (ONE shape for every bin) composes with any mesh
            # AND dominates per-class packing on accuracy (round-4 A/B:
            # 3.36 vs 4.93 kcal at 60 epochs) — auto-upgrade instead of
            # refusing (round 5, VERDICT r4 #10).
            import warnings
            warnings.warn(
                "bucket_shapes emits multiple compiled shapes, which "
                "cannot be stacked across mesh devices; upgrading this "
                "run to --pack-mixed (one shape, mixed-FFD bins)")
            self.pack_mixed = True
            self.bucket_shapes = 0
            self.pack_budget = False
        # real/padded node-edge-triplet totals per split (occupancy
        # accounting for metrics.jsonl; filled lazily at batch assembly)
        self._totals = {}
        self._plan_sizes = {}   # split key -> actual batch count (packing)
        if cache_batches is None:
            cache_batches = n <= 20000
        self._host_cache = cache_batches == "host"
        self._batch_cache = {} if cache_batches else None
        # mesh modes cache the SHARDED device layout (EP/hybrid relayout
        # + device_put happen once per run, not once per epoch); the host
        # batch cache then skips its own device transfer
        self._sharded_cache = {} if (cache_batches and mesh is not None) \
            else None

        self.mesh = mesh
        self.edge_partition = edge_partition
        self._hybrid = (mesh is not None and edge_partition is not None
                        and "dp" in getattr(mesh, "axis_names", ()))
        if self._hybrid:
            # hybrid DP x EP: molecule groups over the 'dp' axis, each
            # group's graph edge-partitioned over 'data' (parallel/hybrid.py)
            from x2gnn_tpu.parallel.hybrid import (
                make_hybrid_train_step, make_hybrid_eval_step)
            self._dp = int(mesh.shape["dp"])
            self._ep = int(mesh.shape["data"])
            self.n_dev = self._dp * self._ep
            n_pad = -(-self.budgets[0] // self._ep) * self._ep
            self._ep_atoms = n_pad
            self._train_step = make_hybrid_train_step(
                model_cfg, self.optimizer, train_cfg.ema_decay, mesh,
                n_pad, kv_exchange=edge_partition,
                rng_seed=train_cfg.random_seed)
            # std=1.0: the MAE calibration is applied host-side in
            # evaluate() so the compiled eval executable is independent
            # of the run's target sigma (precompile/CV cache reuse)
            self._eval_step = make_hybrid_eval_step(
                model_cfg, mesh, n_pad, std=1.0,
                kv_exchange=edge_partition)
        elif mesh is not None and edge_partition is not None:
            from x2gnn_tpu.parallel.ep_model import (
                make_ep_forward, make_ep_train_step)
            self.n_dev = int(mesh.devices.size)
            n_pad = -(-self.budgets[0] // self.n_dev) * self.n_dev
            self._ep_atoms = n_pad
            self._train_step = make_ep_train_step(
                model_cfg, self.optimizer, train_cfg.ema_decay, mesh,
                n_pad, kv_exchange=edge_partition,
                rng_seed=train_cfg.random_seed)
            ep_fwd = make_ep_forward(model_cfg, mesh, n_pad,
                                     kv_exchange=edge_partition)

            def _ep_eval(ema_params, epb):
                pred = ep_fwd(ema_params, epb)
                err = masked_mae(pred, epb.y, mask=epb.graph_mask)
                return err, epb.graph_mask.sum()

            self._eval_step = _ep_eval
        elif mesh is not None:
            from x2gnn_tpu.parallel.data_parallel import (
                make_dp_train_step, make_dp_eval_step)
            self._train_step = make_dp_train_step(
                model, self.optimizer, train_cfg.ema_decay, mesh,
                dropout=model_cfg.dropout,
                rng_seed=train_cfg.random_seed)
            self._eval_step = make_dp_eval_step(model, mesh, std=1.0)
            self.n_dev = int(mesh.devices.size)
        else:
            self._train_step = jax.jit(
                train_step_fn or self._default_train_step, donate_argnums=0)
            self._eval_step = jax.jit(self._default_eval_step)
            self.n_dev = 1

    # ---- steps -----------------------------------------------------------
    def _default_train_step(self, state: TrainState, batch: GraphBatch):
        """One optimization step with non-finite-loss failure detection:
        a NaN/inf loss skips the whole update (params/opt/EMA unchanged)
        and increments `bad_steps` — the elastic-recovery piece the
        reference lacks entirely (SURVEY §5)."""
        dropout = self.mcfg.dropout > 0

        def loss_fn(params):
            if dropout:
                # per-step dropout rng derived from the step counter —
                # deterministic, resume-stable (sbftransformer_conv.py:153
                # applies dropout to the attention weights in training)
                rngs = {"dropout": jax.random.fold_in(
                    jax.random.PRNGKey(self.tcfg.random_seed), state.step)}
                pred = self.model.apply(params, batch, deterministic=False,
                                        rngs=rngs)
            else:
                pred = self.model.apply(params, batch)
            return smooth_l1_loss(pred, batch.y, mask=batch.graph_mask)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if state.bad_steps is None:
            state = state._replace(bad_steps=jnp.zeros((), jnp.int32))
        return apply_update_skip_nonfinite(state, loss, grads,
                                           self.optimizer,
                                           self.tcfg.ema_decay)

    def _default_eval_step(self, ema_params, batch: GraphBatch):
        # unscaled inside jit: `self.std` is a run-dependent Python float,
        # and baking it in as a constant would key the compiled executable
        # on it (a precompile pass or a CV fold with a different target
        # sigma would recompile the whole eval graph). The calibration is
        # linear, so evaluate() applies it host-side instead.
        pred = self.model.apply(ema_params, batch)
        err = masked_mae(pred, batch.y, mask=batch.graph_mask)
        return err, batch.graph_mask.sum()

    # ---- state -----------------------------------------------------------
    def init_state(self, rng_seed: int = 0) -> TrainState:
        probe = next(self._batches(self.train_idx[: self.tcfg.batch_size]))
        params = self.model.init(jax.random.PRNGKey(rng_seed), probe)
        opt_state = self.optimizer.init(params)
        # flat EMA rides the fused-update flag (round 5): the leaf-wise
        # EMA tree was the remaining half of the leafy per-step cost;
        # the tree is reconstructed only at eval time (_ema_tree)
        flat_ema = bool(getattr(self.tcfg, "fused_update", False))
        if flat_ema:
            from x2gnn_tpu.train.ema import ema_unravel_fn
            self._ema_unravel = ema_unravel_fn(params)
        return TrainState(params, opt_state,
                          ema_init(params, flat=flat_ema),
                          jnp.zeros((), jnp.int32),
                          jnp.zeros((), jnp.int32))

    def _record_totals(self, key, idx, stats=None):
        if key in self._totals:
            return
        if stats is None:
            steps = -(-len(idx) // self.tcfg.batch_size)
            stats = {
                "real": (sum(self.graphs[i].num_atoms for i in idx),
                         sum(self.graphs[i].num_edges for i in idx),
                         sum(self.graphs[i].num_triplets for i in idx)),
                "padded": (self.budgets[0] * steps,
                           self.budgets[1] * steps,
                           self.budgets[2] * steps),
                "shapes": 1,
            }
        self._totals[key] = stats

    def _cast_feat(self, batch):
        """Edge-feature wire/cache dtype (see __init__ `feat_dtype`).

        'int8' (round 5, VERDICT r4 #8): symmetric per-edge
        quantization — q = round(x * 127 / max|row|), dequantized
        on-device as q * scale. Halves the dominant wire/cache bytes
        again vs fp16 (the 134k steady state was link-bound at ~5
        MB/step); the 338-dim integral rows are bounded and tolerate
        ~0.8% relative rounding (fp16 tolerance was measured at
        ~5e-4; int8 accuracy is A/B'd in tests/test_train.py)."""
        if self._feat_dtype == "float32":
            return batch
        if self._feat_dtype == "int8":
            x = np.asarray(batch.edge_feat, np.float32)
            amax = np.abs(x).max(axis=1)
            scale = np.where(amax > 0, amax / 127.0, 1.0)
            q = np.clip(np.rint(x / scale[:, None]), -127, 127)
            return batch.replace(
                edge_feat=q.astype(np.int8),
                edge_feat_scale=scale.astype(np.float32))
        return batch.replace(
            edge_feat=np.asarray(batch.edge_feat, np.float16))

    def _train_shuffle(self, batches, epoch):
        """Deterministic per-epoch permutation of the BATCH ORDER for
        bucketed/packed training. The plan's batches are size-sorted
        (largest molecules first) — iterating them in that order is a
        size curriculum every epoch, a non-iid gradient sequence the
        reference never has (its fixed batches slice a permuted split,
        trainer.py:22-27, so composition and order are random).
        Composition and compiled shapes are untouched; only the order
        in which cached batches are visited changes (resume-stable:
        seeded by (random_seed, epoch))."""
        batches = list(batches)
        rs = np.random.RandomState(
            (self.tcfg.random_seed * 1000003 + epoch) % (2 ** 31))
        return iter([batches[j] for j in rs.permutation(len(batches))])

    def _to_device_stream(self, batches):
        """Stream host-cached numpy batches through a background
        device_put prefetcher: the next batch's transfer overlaps the
        current step's compute (cache_batches='host' path)."""
        import jax as _jax
        from x2gnn_tpu.data.prefetch import prefetch
        return prefetch((_jax.device_put(b) for b in batches), depth=2)

    def _batches(self, idx):
        key = self._cache_key(idx)
        if self._batch_cache is not None and key in self._batch_cache:
            return iter(self._batch_cache[key])
        if self.bucket_shapes or self.pack_mixed:
            from x2gnn_tpu.data.batching import (
                pad_graphs, mixed_packed_plan, size_bucketed_plan)
            if self.pack_mixed:
                chunks, chunk_budgets, stats = mixed_packed_plan(
                    self.graphs, idx, self.tcfg.batch_size, self.budgets)
            else:
                chunks, chunk_budgets, stats = size_bucketed_plan(
                    self.graphs, idx, self.tcfg.batch_size,
                    self.bucket_shapes, self.budgets,
                    pack=self.pack_budget)
            self._record_totals(key, idx, stats)
            self._plan_sizes[key] = len(chunks)

            def gen():
                for chunk, bud in zip(chunks, chunk_budgets):
                    yield self._cast_feat(pad_graphs(
                        [self.graphs[i] for i in chunk], bud,
                        n_graph=bud.n_graph or self.tcfg.batch_size,
                        targets=self.targets[np.asarray(chunk)],
                        with_triplets=self._with_triplets))

            it = gen()
        else:
            self._record_totals(key, idx)
            graphs = [self.graphs[i] for i in idx]
            targets = self.targets[np.asarray(idx)]
            it = (self._cast_feat(b) for b in batch_iterator(
                graphs, self.tcfg.batch_size,
                budgets=self.budgets, targets=targets,
                with_triplets=self._with_triplets))
        if self._batch_cache is None:
            # large datasets: overlap host batch assembly with device
            # compute (the cache path below makes this moot)
            from x2gnn_tpu.data.prefetch import prefetch
            return prefetch(it, depth=2)
        # cache DEVICE-resident batches: each batch is host->device
        # transferred exactly once per run. Re-transferring numpy batches
        # every step leaks host memory on the remote-TPU backend (a
        # multi-hour run was OOM-killed at 127 GB host RSS) and wastes
        # PCIe/tunnel bandwidth every epoch.
        batches = list(it)
        if self.mesh is None and not self._host_cache:
            import jax.numpy as jnp_
            batches = [jax.tree_util.tree_map(jnp_.asarray, b)
                       for b in batches]
        # else: keep HOST batches — _device_batches caches the sharded
        # device layout (mesh) / _to_device_stream transfers per epoch
        # with overlap (host cache)
        self._batch_cache[key] = batches
        return iter(batches)

    def _device_batches(self, idx):
        """Batches grouped/stacked per device when a mesh is active.
        The sharded device layout is cached across epochs (the split
        order is fixed, so it is identical every epoch)."""
        if self.mesh is None:
            if self._host_cache:
                return self._to_device_stream(self._batches(idx))
            return self._batches(idx)
        key = self._cache_key(idx)
        if self._sharded_cache is not None and key in self._sharded_cache:
            return iter(self._sharded_cache[key])
        out = self._make_device_batches(self._batches(idx))
        if self._sharded_cache is not None:
            out = list(out)
            self._sharded_cache[key] = out
            return iter(out)
        return out

    def _make_device_batches(self, batches):
        if self._hybrid:
            from x2gnn_tpu.parallel.data_parallel import empty_like_batch
            from x2gnn_tpu.parallel.ep_model import make_ep_batch
            from x2gnn_tpu.parallel.hybrid import (
                stack_ep_batches, shard_hybrid_batch)

            def groups():
                chunk = []
                for b in batches:
                    chunk.append(b)
                    if len(chunk) == self._dp:
                        yield chunk
                        chunk = []
                if chunk:
                    # pad the last step with all-masked batches so every
                    # dp shard gets a group (loss/MAE masks ignore them)
                    filler = empty_like_batch(chunk[0])
                    chunk += [filler] * (self._dp - len(chunk))
                    yield chunk

            return (shard_hybrid_batch(stack_ep_batches(
                        [make_ep_batch(b, self._ep) for b in g]), self.mesh)
                    for g in groups())
        if self.edge_partition is not None:
            from x2gnn_tpu.parallel.ep_model import (
                make_ep_batch, shard_ep_batch)
            return (shard_ep_batch(make_ep_batch(b, self.n_dev), self.mesh)
                    for b in batches)
        from x2gnn_tpu.parallel.data_parallel import dp_batch_iterator
        return dp_batch_iterator(batches, self.n_dev, self.mesh)

    def _steps_per_epoch(self) -> int:
        if self.pack_budget or self.pack_mixed:
            # packed batches hold a variable molecule count: the true
            # steps/epoch is the plan's batch count (resume accounting)
            key = self._cache_key(self.train_idx)
            if key not in self._plan_sizes:
                from x2gnn_tpu.data.batching import size_bucketed_plan
                from x2gnn_tpu.data.batching import mixed_packed_plan
                if self.pack_mixed:
                    chunks, _, _ = mixed_packed_plan(
                        self.graphs, self.train_idx,
                        self.tcfg.batch_size, self.budgets)
                else:
                    chunks, _, _ = size_bucketed_plan(
                        self.graphs, self.train_idx,
                        self.tcfg.batch_size, self.bucket_shapes,
                        self.budgets, pack=True)
                self._plan_sizes[key] = len(chunks)
            n_batches = self._plan_sizes[key]
        else:
            n_batches = -(-len(self.train_idx) // self.tcfg.batch_size)
        if self.mesh is None or (self.edge_partition is not None
                                 and not self._hybrid):
            return max(n_batches, 1)   # one step per batch (plain / EP)
        group = self._dp if self._hybrid else self.n_dev
        return max(-(-n_batches // group), 1)

    @staticmethod
    def _cache_key(idx):
        # hash the CONTENTS: (first, len) collides for reorderings or
        # different index sets sharing the head element
        return (len(idx), hash(np.ascontiguousarray(idx).tobytes()))

    # ---- loops -----------------------------------------------------------
    def run_epoch(self, state: TrainState, epoch: int = 0):
        # keep losses/counts as device values until the epoch ends: a
        # float() per step would force one host<->device round trip per
        # step (expensive on the remote-attached TPU) and stop the host
        # from enqueueing the next step while the current one runs
        losses, counts = [], []
        packed = self.bucket_shapes or self.pack_mixed
        if self._host_cache and self.mesh is None:
            # host-cached: permute the HOST list, then stream through the
            # device_put prefetcher (listing the stream itself would
            # materialize every batch on device — tens of GB at 134k)
            host = list(self._batches(self.train_idx))
            if packed:
                host = list(self._train_shuffle(host, epoch))
            batches = self._to_device_stream(host)
        else:
            batches = self._device_batches(self.train_idx)
            if packed:
                # size-sorted plan order is a per-epoch curriculum
                # (round-3: training in plan order plateaued the flagship
                # at 46.8 kcal where the shuffle reached 4.1) — visit the
                # (cached) batches in a deterministic per-epoch shuffle.
                # With a mesh this permutes the sharded device GROUPS;
                # per-group composition stays fixed, which is still
                # mixed under --pack-mixed.
                batches = self._train_shuffle(batches, epoch)
        for i, batch in enumerate(batches):
            state, loss = self._train_step(state, batch)
            losses.append(loss)
            counts.append(batch.graph_mask.sum())
            if i % 64 == 63:
                # bound the async dispatch queue: without an occasional
                # drain the host can enqueue thousands of steps ahead,
                # pinning every in-flight batch's host buffers (observed
                # as unbounded RSS growth on the remote-attached backend).
                # One sync per 64 steps costs ~an RTT and caps the
                # in-flight set.
                loss.block_until_ready()
        # ONE bulk fetch at epoch end (a float() per item would serialize
        # a host<->device round trip per step on the remote-attached TPU)
        losses, counts = jax.device_get((losses, counts))
        total = sum(float(l) * int(g) for l, g in zip(losses, counts))
        count = sum(int(g) for g in counts)
        return state, total / max(count, 1)

    def _ema_tree(self, state: TrainState):
        """EMA parameters as a tree (unravels the flat-EMA vector)."""
        ep = state.ema.params
        if isinstance(ep, jnp.ndarray) and ep.ndim == 1:
            return self._ema_unravel(ep)
        return ep

    def evaluate(self, state: TrainState, idx) -> float:
        accum = [self._eval_step(self._ema_tree(state), batch)
                 for batch in self._device_batches(idx)]
        accum = jax.device_get(accum)   # bulk fetch, not a sync per batch
        total = sum(float(err) for err, _ in accum)
        count = sum(int(g) for _, g in accum)
        # calibration applied here, NOT inside the jitted eval step: keeps
        # the compiled executable independent of the run's target sigma
        return self.std * total / max(count, 1)

    def fit(self, epochs: Optional[int] = None,
            state: Optional[TrainState] = None,
            log_every_epoch: bool = True,
            profile_dir: Optional[str] = None):
        """`profile_dir`: capture a jax.profiler device trace of the
        SECOND epoch (first epoch pays compilation) into that directory
        (TensorBoard-viewable) — the reference has no profiler at all."""
        epochs = self.tcfg.max_epoch if epochs is None else epochs
        os.makedirs(self.workdir, exist_ok=True)
        # archive the resolved configs (reference: trainer.py:85-86); also
        # what Predictor.from_run reads to rebuild the model
        from x2gnn_tpu.config import dump_configs
        dump_configs(self.mcfg, self.tcfg,
                     os.path.join(self.workdir, "args.json"))
        log_path = os.path.join(self.workdir, "train.log")
        jsonl_path = os.path.join(self.workdir, "metrics.jsonl")
        resumed = state is not None
        state = state if state is not None else self.init_state()
        # the ckpt_after_epoch gate counts GLOBAL epochs: a resumed run
        # restarts the local loop at 0, but its restored step counter
        # knows how far training actually got — without this, the best
        # epochs of a resumed run inside the gate window are never saved
        epoch0 = int(np.asarray(state.step)) // self._steps_per_epoch()

        plateau = None
        if self.tcfg.scheduler == "plateau":
            from x2gnn_tpu.train.optim import (
                PlateauController, get_plateau_scale)
            # a resumed run re-seeds the scale from the restored optimizer
            # state (best/patience counters restart — documented loss)
            plateau = PlateauController(
                factor=self.tcfg.reduce_factor,
                patience=self.tcfg.patience,
                min_scale=self.tcfg.decay_rate,
                scale=(get_plateau_scale(state.opt_state)
                       if resumed else 1.0))
        plateau_logged = plateau.scale if plateau is not None else None

        best_val, test_err = None, None
        best_meta = os.path.join(self.workdir, "ckpt_best_val.json")
        if resumed:
            # seed the best-val gate so an early (worse) epoch of the
            # resumed run cannot overwrite ckpt_best: use the recorded
            # value of the existing ckpt_best if present (the gate guards
            # THAT artifact), else the restored weights' own val MAE
            best_val = self.evaluate(state, self.val_idx)
            try:
                with open(best_meta) as f:
                    best_val = min(best_val,
                                   float(json.load(f)["best_val_mae"]))
            except (FileNotFoundError, ValueError, KeyError,
                    json.JSONDecodeError):
                pass   # absent or torn file: fall back to the eval seed
        for epoch in range(epochs):
            t0 = time.time()
            if profile_dir is not None and epoch == 1:
                from x2gnn_tpu.utils.profiling import trace
                with trace(profile_dir):
                    state, loss = self.run_epoch(state, epoch0 + epoch)
            else:
                state, loss = self.run_epoch(state, epoch0 + epoch)
            val_err = self.evaluate(state, self.val_idx)
            if self._host_cache:
                # the remote-attached backend leaks host-side transfer
                # buffers (round-2: a re-transferring run OOM-killed at
                # 127 GB; round-4: the host-cache path re-transfers every
                # epoch and leaked ~14 GB/epoch at 134k). A per-epoch
                # collection frees the dead jax.Array wrappers promptly;
                # the RSS-guarded restart loop (run_flagship.sh pattern)
                # remains the backstop.
                import gc
                gc.collect()
            if plateau is not None:
                from x2gnn_tpu.train.optim import set_plateau_scale
                new_scale = plateau.step(val_err)
                if new_scale != plateau_logged:
                    state = state._replace(opt_state=set_plateau_scale(
                        state.opt_state, new_scale))
                plateau_logged = new_scale
            improved = best_val is None or val_err <= best_val
            if improved:
                best_val = val_err
                # >= so ckpt_after_epoch=0 checkpoints from the first
                # epoch (reference gates with `epoch > 100`, trainer.py:95
                # — the default of 100 keeps that behavior ±1 epoch)
                if epoch0 + epoch >= self.tcfg.ckpt_after_epoch:
                    test_err = self.evaluate(state, self.test_idx)
                    save_checkpoint(
                        os.path.join(self.workdir, "ckpt_best"), state)
                    # atomic write: a crash mid-dump must not leave a torn
                    # file that wedges the --auto-resume restart loop
                    tmp = best_meta + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump({"best_val_mae": float(best_val)}, f)
                    os.replace(tmp, best_meta)
            if (self.tcfg.ckpt_every
                    and (epoch + 1) % self.tcfg.ckpt_every == 0):
                # periodic last-state checkpoint for elastic recovery
                # (crash -> resume from here, best-val gate re-seeded
                # from ckpt_best_val.json)
                save_checkpoint(
                    os.path.join(self.workdir, "ckpt_last"), state)
            seconds = time.time() - t0
            n_train = len(self.train_idx)
            tot = self._totals.get(self._cache_key(self.train_idx))
            record = {
                # global numbering: a resumed run continues where the
                # restored step counter left off instead of restarting at 1
                "epoch": epoch0 + epoch + 1,
                "loss": float(loss),
                "val_mae": float(val_err),
                "best_val_mae": float(best_val),
                "test_mae": None if test_err is None else float(test_err),
                "step": int(np.asarray(state.step)),
                "bad_steps": (int(np.asarray(state.bad_steps))
                              if state.bad_steps is not None else 0),
                "seconds": seconds,
                "molecules_per_sec": n_train / max(seconds, 1e-9),
            }
            if tot is not None:
                # north-star counters (BASELINE.md) from REAL entity
                # counts — budget-based rates overstate throughput by the
                # padding factor — plus padded-vs-real occupancy
                real_n, real_e, real_t = tot["real"]
                pad_n, pad_e, pad_t = tot["padded"]
                record.update({
                    "edges_per_sec": real_e / max(seconds, 1e-9),
                    "triplets_per_sec": real_t / max(seconds, 1e-9),
                    "occupancy_nodes": real_n / max(pad_n, 1),
                    "occupancy_edges": real_e / max(pad_e, 1),
                    "occupancy_triplets": real_t / max(pad_t, 1),
                    "budget_shapes": tot["shapes"],
                })
                if "pairs" in tot:
                    # D^2 pair slots: the dimension the blocked Pallas
                    # kernel's compute actually scales with
                    real_p, cap_p = tot["pairs"]
                    record["occupancy_pairs"] = real_p / max(cap_p, 1)
            if plateau_logged is not None:
                record["lr_scale"] = plateau_logged
            if log_every_epoch:
                with open(jsonl_path, "a") as f:
                    f.write(json.dumps(record) + "\n")
                with open(log_path, "a") as f:
                    f.write(
                        f"{time.strftime('%m_%d_%H_%M_%S')}"
                        f"\t[epoch]:{epoch0 + epoch + 1:03d}"
                        f"\t[Loss]:{loss:.7f}"
                        f"\t[ValMAE]:{val_err:.7f}"
                        f"\t[TestMAE]:"
                        f"{test_err if test_err is not None else -1.0:.7f}"
                        "\n")
        return state, {"best_val_mae": best_val, "test_mae": test_err}

    # ---- resume ----------------------------------------------------------
    def restore(self, path: str) -> TrainState:
        template = self.init_state()
        try:
            restored = restore_checkpoint(path, template)
            return jax.tree_util.tree_map(jnp.asarray, restored)
        except Exception:
            # EMA-representation mismatch (a tree-EMA checkpoint resumed
            # under the flat-EMA fused-update path, or vice versa):
            # restore raw and adapt the EMA side to the template's.
            from x2gnn_tpu.infer import _leaf
            from x2gnn_tpu.train.ema import EmaState
            raw = restore_checkpoint(path)
            params = jax.tree_util.tree_map(
                jnp.asarray, _leaf(raw, "params"))
            ema_p = _leaf(_leaf(raw, "ema"), "params")
            want_flat = (isinstance(template.ema.params, jnp.ndarray)
                         and template.ema.params.ndim == 1)
            import numpy as np_
            have_flat = np_.ndim(ema_p) == 1 and not isinstance(
                ema_p, dict)
            if want_flat and not have_flat:
                from jax.flatten_util import ravel_pytree
                ema_p = ravel_pytree(jax.tree_util.tree_map(
                    jnp.asarray, ema_p))[0]
            elif have_flat and not want_flat:
                from x2gnn_tpu.train.ema import ema_unravel_fn
                ema_p = ema_unravel_fn(params)(jnp.asarray(ema_p))
            else:
                ema_p = jax.tree_util.tree_map(jnp.asarray, ema_p)
            ema = EmaState(ema_p, jnp.asarray(
                _leaf(_leaf(raw, "ema"), "count")))
            # the optimizer state structure also differs across the
            # fused flag; re-initialize it (Adam moments restart — the
            # plateau controller and EMA carry the training signal)
            opt_state = self.optimizer.init(params)
            return TrainState(
                params, opt_state, ema,
                jnp.asarray(_leaf(raw, "step")),
                jnp.asarray(_leaf(raw, "bad_steps")))
