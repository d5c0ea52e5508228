"""Exponential moving average of parameters.

Matches torch.optim.swa_utils.AveragedModel with
avg = decay * avg + (1 - decay) * param (train_ema.py:45-47): the first
update copies the parameters verbatim (n_averaged == 0), subsequent updates
apply the decay; evaluation runs on the EMA tree (trainer.py:57).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any          # EMA parameter tree
    count: jnp.ndarray   # number of updates applied


def ema_init(params, flat: bool = False) -> EmaState:
    """flat=True stores the EMA as ONE flat vector (round 5, VERDICT r4
    #7): the leaf-wise EMA tree was the named remaining half of the
    small-batch step's launch-overhead cost after optax.flatten. The
    train step then updates 1 array instead of ~150; the tree is
    reconstructed only at eval/checkpoint time (ema_unravel_fn).
    Flag-coupled to TrainConfig.fused_update — checkpoints are not
    interchangeable across the flag (same caveat as the optimizer
    state)."""
    if flat:
        from jax.flatten_util import ravel_pytree
        flat_p, _ = ravel_pytree(params)
        return EmaState(params=jnp.array(flat_p, copy=True),
                        count=jnp.zeros((), jnp.int32))
    # real copies, not aliases: TrainState is donated by the train step, and
    # aliasing params would donate the same buffer twice
    return EmaState(
        params=jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params),
        count=jnp.zeros((), jnp.int32))


def ema_unravel_fn(params):
    """Unravel function matching ema_init(flat=True)'s vector layout for
    a parameter tree of this structure (for eval/checkpoint export)."""
    from jax.flatten_util import ravel_pytree
    return ravel_pytree(params)[1]


def ema_update(state: EmaState, params, decay: float) -> EmaState:
    flat = (isinstance(state.params, jnp.ndarray)
            and state.params.ndim == 1)
    if flat:
        from jax.flatten_util import ravel_pytree
        params = ravel_pytree(params)[0]

    def upd(avg, p):
        ema = decay * avg + (1.0 - decay) * p
        return jnp.where(state.count == 0, p, ema)

    new = (upd(state.params, params) if flat
           else jax.tree_util.tree_map(upd, state.params, params))
    return EmaState(params=new, count=state.count + 1)
