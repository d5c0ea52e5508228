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


class PlateauController:
    """Host-side ReduceLROnPlateau with torch semantics (train_ema.py:53:
    mode='min', factor=reduce_factor, patience, min_lr=max_lr*decay_rate;
    torch defaults threshold=1e-4 rel, cooldown=0).

    The reference's plateau branch is BROKEN — it steps the scheduler per
    batch (trainer.py:47) with no metric, which torch's plateau scheduler
    cannot consume. Here the controller runs once per epoch on the val
    MAE and writes the resulting LR scale into the optimizer state
    (`set_plateau_scale`), so the jitted train step never changes shape.
    """

    def __init__(self, factor: float = 0.7, patience: int = 3,
                 min_scale: float = 0.01, threshold: float = 1e-4,
                 scale: float = 1.0):
        self.factor = factor
        self.patience = patience
        self.min_scale = min_scale
        self.threshold = threshold
        self.scale = scale
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        """Consume one epoch's validation metric; return the LR scale."""
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


def set_plateau_scale(opt_state, scale: float):
    """Return opt_state with the injected `plateau_scale` hyperparameter
    replaced (searched through wrapper states such as MultiSteps).
    Same treedef/dtypes, so no recompilation of the jitted step."""
    def rec(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "plateau_scale" in hp:
            hp = dict(hp)
            hp["plateau_scale"] = jnp.asarray(scale, jnp.float32)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple):
            children = [rec(c) for c in s]
            return (type(s)(*children) if hasattr(s, "_fields")
                    else tuple(children))
        return s

    return rec(opt_state)


def get_plateau_scale(opt_state) -> float:
    """Read the current plateau LR scale (1.0 if the optimizer has none).
    Lets a resumed run re-seed its PlateauController from the restored
    optimizer state instead of restarting at full LR."""
    found = [1.0]

    def rec(s):
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "plateau_scale" in hp:
            found[0] = float(hp["plateau_scale"])
            return
        if isinstance(s, tuple):
            for c in s:
                rec(c)

    rec(opt_state)
    return found[0]


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """clip-by-global-norm -> Adam(schedule), mirroring the reference's
    clip_grad_norm_ + Adam + per-batch scheduler composition.

    cfg.scheduler='plateau' selects the ReduceLROnPlateau path
    (train_ema.py:49-53): constant max_lr scaled by an injected
    `plateau_scale` hyperparameter that PlateauController lowers on val
    stalls (min scale = decay_rate, matching torch min_lr)."""
    if cfg.scheduler == "plateau":
        min_scale = cfg.decay_rate

        def build(plateau_scale):
            lr = cfg.max_lr * jnp.maximum(plateau_scale, min_scale)
            steps = []
            if cfg.grad_clip:
                steps.append(optax.clip_by_global_norm(cfg.max_grad))
            steps.append(optax.adam(learning_rate=lr))
            return optax.chain(*steps)

        opt = optax.inject_hyperparams(build)(plateau_scale=1.0)
    else:
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
    if getattr(cfg, "fused_update", False):
        # run clip/adam on ONE flat parameter vector instead of ~150
        # leaf tensors: the round-4 step profile measured the leaf-wise
        # update at 2.3-3.0 ms of a 5.8 ms step — per-fusion launch
        # overhead, not math (scripts/profile_step.py). Flag-gated:
        # the optimizer state STRUCTURE changes, so checkpoints are not
        # interchangeable across the flag.
        opt = optax.flatten(opt)
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
