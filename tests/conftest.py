"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a fake 8-device CPU mesh (the TPU
answer to "multi-node tests without a cluster"); real-TPU numbers come from
bench.py, not the test suite.

The host environment may pre-register a TPU backend at interpreter start
(axon sitecustomize); `jax.config.update` below routes everything to CPU
before any backend is initialised.
"""

import os

import jax

jax.config.update("jax_platforms",
                  os.environ.get("X2GNN_TEST_PLATFORM", "cpu"))
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(41)


def random_molecule(rng, n_atoms=None, box=4.0, min_dist=0.8):
    """A random H/C/N/O/F molecule with pairwise distances >= min_dist."""
    n = int(n_atoms if n_atoms is not None else rng.integers(3, 18))
    pos = np.zeros((n, 3))
    placed = 0
    while placed < n:
        cand = rng.uniform(-box, box, size=3)
        if placed == 0 or np.linalg.norm(
                pos[:placed] - cand, axis=1).min() >= min_dist:
            pos[placed] = cand
            placed += 1
    numbers = rng.choice([1, 6, 7, 8, 9], size=n).astype(np.int32)
    return numbers, pos


@pytest.fixture
def make_molecule(rng):
    return lambda **kw: random_molecule(rng, **kw)
