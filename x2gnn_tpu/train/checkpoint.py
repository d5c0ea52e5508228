"""Orbax checkpointing: save AND restore/resume (the reference only saves —
trainer.py:94-106 — with no resume path; restore exists only as the stripped
load.ipynb intent)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Write a pytree checkpoint (params/opt/ema/step) to `path`."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    state = jax.device_get(state)
    ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint; `template` (a matching pytree of arrays)
    restores with correct dtypes/shapes when provided."""
    path = os.path.abspath(path)
    ckptr = _checkpointer()
    if template is not None:
        return ckptr.restore(path, item=jax.device_get(template))
    return ckptr.restore(path)


def latest_checkpoint(workdir: str) -> Optional[str]:
    """Most recent checkpoint dir under workdir/ckpt_* or None: newest by
    mtime (every trainer checkpoint — ckpt_last, ckpt_best, ckpt_<step> —
    is a full TrainState, so recency is the only thing that matters for
    resume; preferring ckpt_last unconditionally could silently roll back
    past a ckpt_best saved on a later epoch). Numeric step suffixes break
    mtime ties."""
    if not os.path.isdir(workdir):
        return None
    cands = [d for d in os.listdir(workdir)
             if d.startswith("ckpt_")
             and os.path.isdir(os.path.join(workdir, d))]
    if not cands:
        return None

    def key(d):
        tail = d.split("_")[-1]
        return (os.path.getmtime(os.path.join(workdir, d)),
                int(tail) if tail.isdigit() else -1)

    cands.sort(key=key)
    return os.path.join(workdir, cands[-1])
