"""Optimizer and LR schedule (optax).

Reference recipe: Adam(lr=1e-3, amsgrad=False) (train_ema.py:48) +
LinearWarmupExponentialDecay stepped PER BATCH (scheduler.py:3-28,
trainer.py:47) + grad-norm clipping before the step (trainer.py:43-44).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from x2gnn_tpu.config import TrainConfig


def warmup_exponential_decay(
    max_lr: float,
    warmup_steps: int,
    decay_steps: int,
    decay_rate: float,
    staircase: bool = False,
):
    """lr(step) = max_lr * min((step+1)/warmup, 1) * decay_rate^(step/decay).

    Matches scheduler.py:19-26: warmup factor is 1/W + step/W (i.e. reaches
    1 at step W-1), decay is continuous unless staircase.
    """
    warmup_steps = max(warmup_steps, 1)

    def schedule(step):
        w = jnp.minimum((step + 1.0) / warmup_steps, 1.0)
        exponent = step / decay_steps
        if staircase:
            exponent = jnp.floor(exponent)
        return max_lr * w * decay_rate ** exponent

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam(schedule), mirroring the reference's
    clip_grad_norm_ + Adam + per-batch scheduler composition."""
    schedule = warmup_exponential_decay(
        cfg.max_lr, cfg.warmup_steps, cfg.decay_steps, cfg.decay_rate)
    steps = []
    if cfg.grad_clip:
        steps.append(optax.clip_by_global_norm(cfg.max_grad))
    steps.append(optax.adam(learning_rate=schedule))
    return optax.chain(*steps)
