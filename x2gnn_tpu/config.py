"""Typed configuration for models and training.

The reference uses a flat, unvalidated `config.json` threaded positionally
into constructors (train_ema.py:22-24), with defaults duplicated and
inconsistent across constructors (e.g. xgnn.py:16 defaults in_channels=256
while config.json sets 128). Here defaults live in exactly one place and a
json file can override them.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters (reference: config.json:1-10)."""

    conv_layers: int = 4
    sbf_dim: int = 7            # number of spherical harmonics l=0..6
    rbf_dim: int = 6            # radial basis size
    in_channels: int = 128      # edge (line-graph node) feature width
    embedding_size: int = 128   # atom embedding width
    heads: int = 16
    cutoff: float = 5.0         # Angstrom radius-graph cutoff
    envelope_exponent: int = 5
    edge_feat_dim: int = 338    # symmetrized one-electron-integral features
    # 'atomwise' sums per-atom contributions (extensive targets, U0 etc.,
    # reference xgnn_poly); 'molwise_mean'/'molwise_add' pool atoms to the
    # molecule before the MLP (intensive targets, reference xgnn_poly_global).
    readout: str = "atomwise"
    mlp_depth: int = 3
    # attention-weight dropout (sbftransformer_conv.py:153). Live on the
    # segment AND blocked layouts (matched pair-space masks, equivalence-
    # tested) on every execution path: single-device, plain DP, EP and
    # hybrid (per-shard masks), with the blocked layout streaming the
    # mask into the fused Pallas kernel. The padded layout raises rather
    # than silently ignore it.
    dropout: float = 0.0
    # beta-gated skip connection in the attention conv (the reference
    # defines the branch but uses beta=False everywhere,
    # sbftransformer_conv.py:25,122-125)
    beta: bool = False
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "float32"   # bfloat16 optional for conv stack
    # attention layout: 'segment' (COO triplets, parity baseline),
    # 'padded' (dense per-dst-edge neighbor tables), or 'blocked'
    # (atom-blocked dense attention — fastest; see ops/attention.py)
    attention_layout: str = "segment"
    # fused Pallas kernel for the blocked layout: True/False, or None =
    # auto (on TPU backends only; interpret mode elsewhere is slow)
    use_pallas: Optional[bool] = None
    # 'v1' = SBFTransformer (model.py:11): static per-triplet edge_attr
    # from the media-atom embedding. 'v2' = SBFTransformerV2
    # (model.py:100-150, experimental in the reference): per-layer
    # edge_attr recomputed from aggregated atom representations, final
    # output divided by conv_layers.
    variant: str = "v1"
    # rematerialize each attention conv in the backward pass
    # (jax.checkpoint): activation memory for the dominant DxD pair /
    # per-triplet tensors drops from O(conv_layers) to O(1) at the cost
    # of one extra conv forward — for large molecules / degree budgets.
    remat: bool = False

    @property
    def head_dim(self) -> int:
        assert self.in_channels % self.heads == 0
        return self.in_channels // self.heads


@dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference: config.json:11-30,
    train_ema.py:40-53, trainer.py:22-48)."""

    target: int = 7                       # QM9 property index (7 = U0)
    batch_size: int = 32
    random_seed: int = 41
    division: Tuple[int, int] = (10000, 20000)  # test / val split boundaries

    max_epoch: int = 800
    max_lr: float = 1e-3
    # 'warmup_exp' = LinearWarmupExponentialDecay (the reference's shipped
    # config); 'plateau' = the ReduceLROnPlateau branch (train_ema.py:53)
    # made to actually work: epoch-level val-MAE-driven LR reduction with
    # factor=reduce_factor, patience, min lr = max_lr * decay_rate.
    scheduler: str = "warmup_exp"
    warmup_steps: int = 3000
    decay_steps: int = 3_000_000
    decay_rate: float = 0.01
    reduce_factor: float = 0.7           # config.json 'reduce_factor'
    patience: int = 3                    # config.json 'patience'
    grad_clip: bool = True
    max_grad: float = 100.0
    ema_decay: float = 0.95
    # gradient accumulation: apply the optimizer every N micro-batches
    # (optax.MultiSteps) — effective batch = N * batch_size without the
    # memory. 1 = off (reference behavior).
    accum_steps: int = 1
    loss: str = "smooth_l1"               # trainer.py:41
    eval_on_ema: bool = True              # trainer.py:57
    ckpt_after_epoch: int = 100           # trainer.py:95
    # periodic last-state checkpoint (ckpt_last) every N epochs for
    # elastic recovery; 0 disables. No reference equivalent (the
    # reference can only save best-val and cannot resume at all).
    ckpt_every: int = 0

    # size-bucketed batch budgets (TPU-specific): group molecules by size
    # and compile this many quantized batch shapes instead of one
    # worst-case shape. 0 = off (single composition-independent budget).
    # Each shape costs one XLA compile; occupancy on heterogeneous
    # datasets rises from ~50-60% to >90% (metrics.jsonl 'occupancy_*').
    bucket_shapes: int = 0
    # with bucket_shapes: pack each batch to its class budget (variable
    # molecules per step at fixed compute shape) instead of a fixed
    # batch_size molecules — reclaims the padding fixed-count batches
    # leave (planner occupancy ~0.95+ vs ~0.8 at 4 buckets on the
    # synthetic QM9-scale set). Divergence from the reference recipe:
    # steps/epoch drops and per-step molecule count varies (documented
    # in DECISIONS.md).
    pack_budget: bool = False
    # mixed-composition first-fit-decreasing packing (ONE compiled
    # shape, every batch spans the molecule-size distribution —
    # data/batching.py::mixed_packed_plan). The round-3 A/B showed
    # size-HOMOGENEOUS batches (bucketed or class-packed plans) cost
    # accuracy per optimizer step; this keeps packing's throughput
    # with fixed-batch-like composition diversity. Overrides
    # bucket_shapes/pack_budget when set.
    pack_mixed: bool = False

    # fused (flattened) optimizer + EMA update: run clip/adam/EMA on ONE
    # concatenated parameter vector instead of ~150 leaf tensors. The
    # round-4 step profile measured the leaf-wise update machinery at
    # 2.3-3.0 ms of a 5.8 ms step (per-fusion launch overhead on many
    # tiny tensors, scripts/profile_step.py). Changes the opt/EMA state
    # STRUCTURE -> checkpoints are not interchangeable across this flag.
    fused_update: bool = False

    # static batch padding budgets (TPU-specific; no reference equivalent).
    # Defaults fit QM9 at batch_size 32 with the 5 A cutoff.
    pad_nodes: int = 0        # 0 -> auto: batch_size * 30
    pad_edges: int = 0        # 0 -> auto: batch_size * 420
    pad_triplets: int = 0     # 0 -> auto: batch_size * 6200

    def resolved_pads(self) -> Tuple[int, int, int]:
        n = self.pad_nodes or self.batch_size * 30
        e = self.pad_edges or self.batch_size * 420
        t = self.pad_triplets or self.batch_size * 6200
        return n, e, t


_REFERENCE_KEY_MAP = {
    # reference config.json key -> (dataclass, field)
    "conv_layers": ("model", "conv_layers"),
    "sbf_dim": ("model", "sbf_dim"),
    "rbf_dim": ("model", "rbf_dim"),
    "in_channels": ("model", "in_channels"),
    "embedding_size": ("model", "embedding_size"),
    "heads": ("model", "heads"),
    "cutoff": ("model", "cutoff"),
    "target": ("train", "target"),
    "batch_size": ("train", "batch_size"),
    "random_seed": ("train", "random_seed"),
    "division": ("train", "division"),
    "scheduler": ("train", "scheduler"),
    "warmup_steps": ("train", "warmup_steps"),
    "decay_steps": ("train", "decay_steps"),
    "reduce_factor": ("train", "reduce_factor"),
    "patience": ("train", "patience"),
    "max_epoch": ("train", "max_epoch"),
    "grad_clip": ("train", "grad_clip"),
    "max_grad": ("train", "max_grad"),
    "max_lr": ("train", "max_lr"),
    "decay_rate": ("train", "decay_rate"),
    "ema_decay": ("train", "ema_decay"),
}


def load_configs(path_or_dict) -> Tuple[ModelConfig, TrainConfig]:
    """Load (ModelConfig, TrainConfig) from a reference-style flat json.

    Accepts the reference's config.json schema directly so a reference user
    can bring their config file unchanged. Unknown keys are ignored.
    """
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict, "rt") as f:
            raw = json.load(f)
    model_kw: Dict[str, Any] = {}
    train_kw: Dict[str, Any] = {}
    for key, value in raw.items():
        if key not in _REFERENCE_KEY_MAP:
            continue
        which, name = _REFERENCE_KEY_MAP[key]
        if name == "division":
            value = tuple(value)
        if name == "scheduler":
            # reference names (train_ema.py:49) -> ours; unknown values
            # fail fast like the reference's assert
            value = {"LinearWarmupExponentialDecay": "warmup_exp",
                     "ReduceLROnPlateau": "plateau",
                     "warmup_exp": "warmup_exp",
                     "plateau": "plateau"}[value]
        (model_kw if which == "model" else train_kw)[name] = value
    return ModelConfig(**model_kw), TrainConfig(**train_kw)


def dump_configs(model: ModelConfig, train: TrainConfig, path: str) -> None:
    """Archive the full resolved config (reference: trainer.py:85-86)."""
    payload = {
        "model": dataclasses.asdict(model),
        "train": dataclasses.asdict(train),
    }
    with open(path, "wt") as f:
        json.dump(payload, f, indent=1)
