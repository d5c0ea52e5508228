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


def ema_init(params) -> EmaState:
    # real copies, not aliases: TrainState is donated by the train step, and
    # aliasing params would donate the same buffer twice
    return EmaState(
        params=jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params),
        count=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params, decay: float) -> EmaState:
    def upd(avg, p):
        ema = decay * avg + (1.0 - decay) * p
        return jnp.where(state.count == 0, p, ema)

    return EmaState(
        params=jax.tree_util.tree_map(upd, state.params, params),
        count=state.count + 1,
    )
