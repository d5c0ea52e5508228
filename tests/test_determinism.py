"""Run-to-run determinism checks (utils/determinism.py) — the race-
detection analogue the reference lacks (SURVEY §5: ABSENT; its CUDA
scatter_add is atomics-based and not bitwise reproducible)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x2gnn_tpu.utils.determinism import (
    check_determinism, check_train_step_determinism, copy_tree,
    tree_bitwise_diff)


def test_bitwise_diff_localizes_leaf():
    a = {"w": jnp.ones((4, 4)), "b": jnp.zeros(3)}
    b = {"w": jnp.ones((4, 4)), "b": jnp.zeros(3).at[1].set(1e-12)}
    assert tree_bitwise_diff(a, a) == []
    diffs = tree_bitwise_diff(a, b)
    assert len(diffs) == 1 and "'b'" in diffs[0] and "1 element" in diffs[0]


def test_bitwise_diff_structure_and_shape():
    assert tree_bitwise_diff({"a": 1}, {"b": 1})
    d = tree_bitwise_diff({"a": jnp.zeros(2)}, {"a": jnp.zeros(3)})
    assert d and "shape" in d[0]


def test_deterministic_fn_passes():
    f = jax.jit(lambda x: jnp.sin(x) @ jnp.cos(x).T)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8)),
                    jnp.float32)
    report = check_determinism(f, x, repeats=3)
    assert report["deterministic"], report


def test_nondeterministic_fn_flagged():
    counter = {"n": 0}

    def flaky(x):
        counter["n"] += 1
        return x + counter["n"]

    report = check_determinism(flaky, jnp.zeros(4), repeats=2)
    assert not report["deterministic"]
    assert report["mismatches"]


def test_donated_step_is_safe_to_check():
    """check_determinism must survive jit(donate_argnums=...) — inputs are
    re-copied per call, so donation cannot invalidate the originals."""
    donating = jax.jit(lambda x: x * 2.0, donate_argnums=0)
    x = jnp.arange(8.0)
    report = check_determinism(donating, x, repeats=3)
    assert report["deterministic"], report
    # original buffer still usable
    np.testing.assert_allclose(np.asarray(x), np.arange(8.0))


def test_train_step_determinism(make_molecule, rng):
    from tests.test_train import TINY_MODEL, TINY_TRAIN, _tiny_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    graphs, targets = _tiny_dataset(make_molecule, rng)
    trainer = Trainer(X2GNN(TINY_MODEL), TINY_MODEL, TINY_TRAIN, graphs,
                      targets, workdir="/tmp/det_check_run")
    report = check_train_step_determinism(trainer, repeats=2)
    assert report["deterministic"], report["mismatches"]
