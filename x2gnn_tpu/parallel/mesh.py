"""Device mesh construction and (multi-host) initialization.

The reference is strictly single-process/single-GPU (trainer.py:14,
train_ema.py:40, no distributed backend at all — SURVEY §2.3). Here scaling
is mesh-first: a 1-axis 'data' mesh for molecule-level data parallelism,
extendable to ('data', 'edge') for edge-partitioned graphs (the sequence-
parallel analogue).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return jax.device_count()


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """A mesh over the first `n_devices` devices (default: all).

    For one axis, shape (n,); for two, (n, 1) — edge partitioning widens
    the second axis when enabled.
    """
    devs = jax.devices()[: (n_devices or jax.device_count())]
    shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (jax.distributed). No-op when single-process args
    are absent; on TPU pods the env usually self-configures."""
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
