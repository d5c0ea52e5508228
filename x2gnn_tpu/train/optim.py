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


def reduce_on_plateau(
    max_lr: float,
    factor: float = 0.7,
    patience: int = 3,
    min_lr_ratio: float = 0.01,
):
    """Epoch-level plateau LR reduction (optax.contrib.reduce_on_plateau).

    The reference HAS a ReduceLROnPlateau branch (train_ema.py:49-53) but
    steps the scheduler per batch (trainer.py:47), which torch's plateau
    scheduler cannot consume — this is the working equivalent, driven by
    the validation metric once per epoch.
    """
    return optax.contrib.reduce_on_plateau(
        factor=factor, patience=patience,
        min_scale=min_lr_ratio)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam(schedule), mirroring the reference's
    clip_grad_norm_ + Adam + per-batch scheduler composition."""
    schedule = warmup_exponential_decay(
        cfg.max_lr, cfg.warmup_steps, cfg.decay_steps, cfg.decay_rate)
    steps = []
    if cfg.grad_clip:
        steps.append(optax.clip_by_global_norm(cfg.max_grad))
    steps.append(optax.adam(learning_rate=schedule))
    opt = optax.chain(*steps)
    if cfg.accum_steps > 1:
        # gradient accumulation: updates are zero except every
        # accum_steps-th micro-batch, where the AVERAGED gradient is
        # applied — effective batch = accum_steps * batch_size
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.accum_steps)
    return opt


def apply_update_skip_nonfinite(state, loss, grads, optimizer,
                                ema_decay: float):
    """Optimizer + EMA update with non-finite-loss containment matching
    Trainer._default_train_step: a NaN/inf loss leaves params AND
    opt_state untouched (so e.g. optax.MultiSteps' micro-step counter
    does not advance — the bad micro-batch truly doesn't count) and
    increments bad_steps when the state tracks it. Shared by the DP, EP
    and hybrid train steps."""
    import jax
    from x2gnn_tpu.train.ema import ema_update

    finite = jnp.isfinite(loss)
    safe_grads = jax.tree_util.tree_map(
        lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    updates, opt_state = optimizer.update(
        safe_grads, state.opt_state, state.params)
    params = jax.tree_util.tree_map(
        lambda pp, u: pp + jnp.where(finite, u, jnp.zeros_like(u)),
        state.params, updates)
    opt_state = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old)
        if isinstance(new, jnp.ndarray) and new.shape == getattr(
            old, "shape", None) else new,
        opt_state, state.opt_state)
    # EMA is gated too: a skipped step must not fold the (retained)
    # params in again nor advance the EMA count
    ema_new = ema_update(state.ema, params, ema_decay)
    ema = jax.tree_util.tree_map(
        lambda new, old: jnp.where(finite, new, old), ema_new, state.ema)
    bad = getattr(state, "bad_steps", None)
    if bad is not None:
        bad = bad + (1 - finite.astype(jnp.int32))
    return state._replace(params=params, opt_state=opt_state, ema=ema,
                          step=state.step + 1, bad_steps=bad), loss
