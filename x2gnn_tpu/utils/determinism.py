"""Run-to-run determinism checks — the TPU analogue of race detection.

The reference has no race detection of any kind (SURVEY §5); worse, its
compute substrate is inherently racy: torch-scatter's CUDA `scatter_add`
uses atomics, so reference forward passes are not bitwise reproducible.
On TPU, XLA reductions are deterministic by construction — but
nondeterminism can still creep in through host-side data races (reading a
cache file while another process writes it), donated-buffer aliasing
bugs, unseeded dropout, or accidental use of wall-clock/OS entropy inside
a step. These helpers re-run a function on identical inputs and compare
every output pytree leaf BITWISE, localizing any mismatch to the exact
leaf — a cheap invariant to assert at the start of a long run.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def copy_tree(tree: Any) -> Any:
    """Deep-copy the array leaves of a pytree (guards against donated /
    aliased buffers between repeated calls)."""
    def cp(x):
        if isinstance(x, jax.Array):
            # preserve sharding via host staging: jnp.array(x) would
            # gather a mesh-sharded array onto ONE device first (OOM for
            # trees that only fit sharded)
            return jax.device_put(jax.device_get(x), x.sharding)
        if isinstance(x, np.ndarray):
            return np.array(x)
        return x
    return jax.tree_util.tree_map(cp, tree)


def tree_bitwise_diff(a: Any, b: Any) -> List[str]:
    """Compare two pytrees leaf-by-leaf, bitwise. Returns a list of
    human-readable mismatch descriptions (empty == identical)."""
    la, ta = jax.tree_util.tree_flatten_with_path(a)
    lb, tb = jax.tree_util.tree_flatten_with_path(b)
    if ta != tb:
        return [f"tree structure differs: {ta} vs {tb}"]
    diffs = []
    for (path, xa), (_, xb) in zip(la, lb):
        name = jax.tree_util.keystr(path)
        na, nb = np.asarray(xa), np.asarray(xb)
        if na.shape != nb.shape or na.dtype != nb.dtype:
            diffs.append(f"{name}: shape/dtype {na.shape}/{na.dtype} vs "
                         f"{nb.shape}/{nb.dtype}")
            continue
        ba, bb = na.tobytes(), nb.tobytes()
        if ba != bb:
            itemsize = max(na.dtype.itemsize, 1)
            bad = (np.frombuffer(ba, np.uint8) != np.frombuffer(bb, np.uint8))
            n_bad = int(bad.reshape(-1, itemsize).any(axis=1).sum())
            detail = ""
            if np.issubdtype(na.dtype, np.number):
                delta = np.abs(na.astype(np.float64)
                               - nb.astype(np.float64))
                finite = delta[np.isfinite(delta)]
                if finite.size:
                    detail = f", max |delta| = {float(finite.max()):.3e}"
                else:
                    # differing NaN/inf payloads: no finite delta exists
                    detail = ", non-finite-only mismatch (NaN/inf bits)"
            diffs.append(f"{name}: {n_bad} element(s) differ{detail}")
    return diffs


def check_determinism(fn: Callable, *args, repeats: int = 2,
                      **kwargs) -> Dict[str, Any]:
    """Run `fn(*args, **kwargs)` `repeats` times on deep-copied inputs and
    compare outputs bitwise against the first run.

    Returns {"deterministic": bool, "repeats": int, "mismatches": [...]}.
    Inputs are copied before EVERY call, so functions with donated
    arguments (jit(donate_argnums=...)) are safe to check.
    """
    ref = fn(*copy_tree(args), **copy_tree(kwargs))
    ref = jax.block_until_ready(ref)
    mismatches: List[str] = []
    for r in range(1, repeats):
        out = fn(*copy_tree(args), **copy_tree(kwargs))
        out = jax.block_until_ready(out)
        for d in tree_bitwise_diff(ref, out):
            mismatches.append(f"run {r}: {d}")
    return {"deterministic": not mismatches, "repeats": repeats,
            "mismatches": mismatches}


def check_train_step_determinism(trainer, state=None,
                                 repeats: int = 2) -> Dict[str, Any]:
    """Re-run the trainer's jitted train step on its first training batch
    and bitwise-compare the resulting TrainState and loss.

    Catches: donated-buffer aliasing, unseeded randomness inside the
    step, and (on non-TPU backends) nondeterministic scatter lowering.
    """
    state = state if state is not None else trainer.init_state()
    batch = next(trainer._device_batches(
        trainer.train_idx[: trainer.tcfg.batch_size]))
    return check_determinism(trainer._train_step, state, batch,
                             repeats=repeats)
