"""x2gnn_tpu — a TPU-native framework for attention-based molecular GNNs.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the X2-GNN
reference (zfwangDP/X2-GNN): quantum-integral edge features, line-graph
(triplet) directional message passing with spherical Bessel x spherical
harmonic modulation, multi-head segment attention, hierarchical readouts,
EMA training, and multi-chip scaling over a `jax.sharding.Mesh`.

Design principles (what makes it TPU-native, not a port):
  * All graph construction (radius graph, line graph) happens in the data
    pipeline, NOT in the forward pass (the reference rebuilds the line graph
    on CPU every forward, xgnn.py:52).
  * Batches are padded to static bucket shapes so every jitted train step
    compiles once (replaces PyG dynamic `Batch`).
  * Irregular ops (segment softmax, scatter) have a correct XLA baseline and
    Pallas performance kernels over destination-sorted layouts.
  * Scaling is mesh + shard_map with XLA collectives, not NCCL.
"""

__version__ = "0.1.0"

from x2gnn_tpu.config import ModelConfig, TrainConfig  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax/flax at package
    # import time — the data pipeline is usable without an accelerator)
    if name == "X2GNN":
        from x2gnn_tpu.models import X2GNN
        return X2GNN
    if name == "Predictor":
        from x2gnn_tpu.infer import Predictor
        return Predictor
    if name == "Trainer":
        from x2gnn_tpu.train.trainer import Trainer
        return Trainer
    raise AttributeError(f"module 'x2gnn_tpu' has no attribute {name!r}")
