"""Serving / inference API: restore a trained run and predict properties
for arbitrary molecules with a bounded set of compiled executables.

The reference's only inference surface is the stripped `load.ipynb`
(README.md:21-22: restore ckpt, evaluate transfer datasets). This module
is the production counterpart: a `Predictor` that

  * restores checkpoint + configs + target standardization from a
    training workdir (`Predictor.from_run`) or an explicit checkpoint;
  * pads incoming molecules to a small geometric grid of static budget
    shapes, so arbitrary request sizes reuse a handful of jitted
    executables instead of recompiling per request (XLA compiles per
    shape; serving traffic must hit a closed shape set);
  * evaluates the EMA weights by default (trainer.py:57 semantics) and
    de-standardizes predictions back to physical units.

Typical use:
    pred = Predictor.from_run("runs/u0")          # ckpt_best + args.json
    energies = pred.predict_xyz("raw/AID_kcal.xyz", backend="native")
    # or, from featurized graphs:
    energies = pred.predict(graphs)
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import numpy as np

from x2gnn_tpu.config import ModelConfig, TrainConfig
from x2gnn_tpu.data.batching import (
    Budgets, batch_iterator, pad_budget_for)


def _round_up_pow2(v: int, floor: int = 8) -> int:
    v = max(int(v), floor)
    return 1 << (v - 1).bit_length()


def quantize_budgets(b: Budgets) -> Budgets:
    """Round budgets up to a geometric grid (powers of two; degree to a
    multiple of 8) so different request compositions map to a small,
    closed set of compiled shapes. The two-tier degree split is disabled
    for serving — it is a training-throughput optimization whose split
    point is dataset-dependent."""
    return Budgets(_round_up_pow2(b.n_node), _round_up_pow2(b.n_edge),
                   _round_up_pow2(b.n_trip), -(-b.n_deg // 8) * 8, 0, 0)


def load_run_configs(path: str):
    """Read the {model: ..., train: ...} json archived by train.py
    (dump_configs); also accepts the reference's flat config.json."""
    with open(path) as f:
        raw = json.load(f)
    if "model" in raw and "train" in raw:
        return (ModelConfig(**raw["model"]), TrainConfig(**raw["train"]))
    from x2gnn_tpu.config import load_configs
    return load_configs(raw)


def _leaf(tree: Any, key: str):
    """Field access on restored checkpoints, which may come back as
    NamedTuples (with template) or plain dicts (raw orbax restore)."""
    if hasattr(tree, key):
        return getattr(tree, key)
    return tree[key]


class Predictor:
    """Batched inference over a trained X2GNN checkpoint."""

    def __init__(self, model_cfg: ModelConfig, params: Any,
                 stats: Optional[dict] = None, batch_size: int = 32,
                 packed_transfer: bool = False,
                 basis: Optional[str] = None,
                 allow_basis_mismatch: bool = False):
        import jax
        from x2gnn_tpu.models import X2GNN
        self.mcfg = model_cfg
        self.model = X2GNN(model_cfg)
        self.params = params
        self.stats = stats              # {"mu": ..., "sigma": ...} or None
        self.batch_size = batch_size
        # featurization provenance of the training run (provenance.json):
        # predict_xyz/predict_molecules refuse a different quantum basis
        # unless allow_basis_mismatch (predict(graphs) cannot check —
        # pre-featurized MolGraphs carry no tag)
        self.basis = basis
        self.allow_basis_mismatch = allow_basis_mismatch
        # packed_transfer: ship each request as TWO flat buffers instead
        # of ~28 arrays. Wins when per-put round trips dominate (many
        # small arrays, high-latency link); loses when one large array
        # (edge_feat) dominates bytes — measured slower on this tunnel at
        # QM9 scale (62 vs 101 molecules/s), so off by default.
        self.packed_transfer = packed_transfer
        self._apply = jax.jit(self.model.apply)
        self._apply_packed_cache: dict = {}

    # ---- packed transfer ------------------------------------------------
    # A GraphBatch is ~28 small arrays; on remote-attached accelerators
    # each host->device put is a round trip, which dominates request
    # latency. Pack all leaves into TWO flat buffers (f32 + i32) on the
    # host and unpack with static slices INSIDE the jitted function: two
    # transfers per request regardless of batch structure.
    def _apply_packed(self, spec):
        import jax
        import jax.numpy as jnp
        treedef, metas = spec

        def run(params, fbuf, ibuf):
            leaves = []
            for kind, off, size, shape, dtype in metas:
                buf = fbuf if kind == "f" else ibuf
                leaf = jax.lax.dynamic_slice_in_dim(buf, off, size)
                leaves.append(leaf.reshape(shape).astype(dtype))
            batch = jax.tree_util.tree_unflatten(treedef, leaves)
            return self.model.apply(params, batch)

        return jax.jit(run)

    def _predict_batch(self, batch) -> np.ndarray:
        import jax
        import numpy as np_
        if not self.packed_transfer:
            return np_.asarray(self._apply(self.params, batch))
        leaves, treedef = jax.tree_util.tree_flatten(batch)
        metas, fparts, iparts = [], [], []
        foff = ioff = 0
        for leaf in leaves:
            a = np_.asarray(leaf)
            if np_.issubdtype(a.dtype, np_.floating):
                flat = a.astype(np_.float32).ravel()
                metas.append(("f", foff, flat.size, a.shape, np_.float32))
                fparts.append(flat)
                foff += flat.size
            else:
                flat = a.astype(np_.int32).ravel()
                metas.append(("i", ioff, flat.size, a.shape,
                              np_.bool_ if a.dtype == np_.bool_
                              else np_.int32))
                iparts.append(flat)
                ioff += flat.size
        key = (treedef, tuple(metas))
        fn = self._apply_packed_cache.get(key)
        if fn is None:
            fn = self._apply_packed((treedef, tuple(metas)))
            self._apply_packed_cache[key] = fn
        fbuf = (np_.concatenate(fparts) if fparts
                else np_.zeros(1, np_.float32))
        ibuf = (np_.concatenate(iparts) if iparts
                else np_.zeros(1, np_.int32))
        return np_.asarray(fn(self.params, fbuf, ibuf))

    # ---- constructors ------------------------------------------------
    @classmethod
    def from_checkpoint(cls, ckpt_path: str,
                        model_cfg: Optional[ModelConfig] = None,
                        use_ema: bool = True, **kw) -> "Predictor":
        from x2gnn_tpu.train.checkpoint import restore_checkpoint
        if model_cfg is None:
            args_json = os.path.join(os.path.dirname(
                os.path.abspath(ckpt_path)), "args.json")
            model_cfg, _ = load_run_configs(args_json)
        restored = restore_checkpoint(ckpt_path)
        params = (_leaf(_leaf(restored, "ema"), "params")
                  if use_ema else _leaf(restored, "params"))
        import numpy as _np
        if use_ema and _np.ndim(params) == 1:
            # flat-EMA checkpoint (fused-update runs, round 5): the live
            # params share the EMA's tree structure — borrow its unravel
            import jax.numpy as _jnp
            from jax.flatten_util import ravel_pytree
            unravel = ravel_pytree(_leaf(restored, "params"))[1]
            params = unravel(_jnp.asarray(params))
        return cls(model_cfg, params, **kw)

    @classmethod
    def from_run(cls, workdir: str, use_ema: bool = True,
                 **kw) -> "Predictor":
        """Restore ckpt_best + configs + standardization from a train.py
        workdir."""
        mcfg, _ = load_run_configs(os.path.join(workdir, "args.json"))
        stats = None
        stats_path = os.path.join(workdir, "standardization.json")
        if os.path.exists(stats_path):
            with open(stats_path) as f:
                stats = json.load(f)
        prov_path = os.path.join(workdir, "provenance.json")
        if "basis" not in kw and os.path.exists(prov_path):
            with open(prov_path) as f:
                kw["basis"] = json.load(f).get("basis")
        # ckpt_best only exists after TrainConfig.ckpt_after_epoch
        # (default 100); fall back to the periodic ckpt_last
        ckpt = os.path.join(workdir, "ckpt_best")
        if not os.path.isdir(ckpt):
            last = os.path.join(workdir, "ckpt_last")
            if not os.path.isdir(last):
                raise FileNotFoundError(
                    f"no checkpoint in {workdir}: neither ckpt_best "
                    "(written after ckpt_after_epoch on val improvement) "
                    "nor ckpt_last (TrainConfig.ckpt_every) exists")
            ckpt = last
        return cls.from_checkpoint(ckpt, model_cfg=mcfg, use_ema=use_ema,
                                   stats=stats, **kw)

    # ---- prediction ---------------------------------------------------
    def _check_basis(self, backend: str) -> None:
        from x2gnn_tpu.data.featurize import (
            basis_provenance, check_basis_compatible)
        check_basis_compatible(self.basis, basis_provenance(backend),
                               allow=self.allow_basis_mismatch)

    def predict(self, graphs: Sequence,
                batch_size: Optional[int] = None) -> np.ndarray:
        """Per-molecule predictions (physical units) for featurized
        MolGraphs, in input order."""
        bs = batch_size or self.batch_size
        budgets = quantize_budgets(pad_budget_for(graphs, bs))
        # blocked layout never reads the triplet/neighbor arrays; skipping
        # them cuts request latency (host assembly + device transfer)
        with_trip = self.mcfg.attention_layout != "blocked"
        out = []
        for batch in batch_iterator(graphs, bs, budgets=budgets,
                                    with_triplets=with_trip):
            pred = self._predict_batch(batch)
            keep = np.asarray(batch.graph_mask).astype(bool)
            out.append(pred[keep])
        pred = np.concatenate(out) if out else np.zeros(0, np.float32)
        if self.stats is not None:
            pred = pred * self.stats["sigma"] + self.stats["mu"]
        return pred

    def predict_xyz(self, xyz_path: str, backend: str = "auto",
                    cache_dir: Optional[str] = "./processed",
                    limit: Optional[int] = None,
                    batch_size: Optional[int] = None) -> np.ndarray:
        """Featurize a concatenated-xyz file (identically to training —
        the transfer-eval contract, README.md:21-22) and predict."""
        self._check_basis(backend)
        from x2gnn_tpu.data.dataset import load_dataset
        graphs = load_dataset(xyz_path, cache_dir=cache_dir,
                              cutoff=self.mcfg.cutoff, backend=backend,
                              limit=limit)
        return self.predict(graphs, batch_size=batch_size)

    def predict_molecules(self, molecules: Sequence,
                          backend: str = "auto",
                          batch_size: Optional[int] = None) -> np.ndarray:
        """Featurize in-memory Molecule objects and predict."""
        self._check_basis(backend)
        from x2gnn_tpu.data.dataset import featurize_molecules
        graphs = featurize_molecules(molecules, cutoff=self.mcfg.cutoff,
                                     backend=backend)
        return self.predict(graphs, batch_size=batch_size)
