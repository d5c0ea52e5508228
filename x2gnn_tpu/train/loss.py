"""Losses and metrics with graph masking.

The reference trains with F.smooth_l1_loss (default beta=1.0, mean
reduction; trainer.py:41) and reports MAE scaled by the unit calibration
(trainer.py:52-58). smooth-L1 with beta=1 == Huber with delta=1.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def smooth_l1_loss(pred, target, mask=None):
    """Masked mean smooth-L1 (Huber delta=1)."""
    per = optax.losses.huber_loss(pred, target, delta=1.0)
    if mask is None:
        return per.mean()
    per = jnp.where(mask, per, 0.0)
    return per.sum() / jnp.maximum(mask.sum(), 1)


def masked_mae(pred, target, mask=None, scale: float = 1.0):
    """Sum of |pred - target| over real graphs (caller divides by count to
    get the dataset MAE, as trainer.py:52-58 does)."""
    err = jnp.abs(pred - target)
    if mask is not None:
        err = jnp.where(mask, err, 0.0)
    return scale * err.sum()
