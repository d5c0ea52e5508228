"""Background batch prefetch (data/prefetch.py)."""

import time

import numpy as np
import pytest

from x2gnn_tpu.data.prefetch import prefetch


def test_prefetch_preserves_order_and_items():
    assert list(prefetch(iter(range(17)), depth=3)) == list(range(17))


def test_prefetch_empty():
    assert list(prefetch(iter([]))) == []


def test_prefetch_reraises_producer_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_prefetch_overlaps_production():
    """With depth 2, the producer works ahead while the consumer is busy:
    total wall time ~ max(produce, consume), not their sum."""
    def slow_gen(n=6, dt=0.05):
        for i in range(n):
            time.sleep(dt)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), depth=2):
        time.sleep(0.05)            # consumer work
    overlapped = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in slow_gen():
        time.sleep(0.05)
    serial = time.perf_counter() - t0
    assert overlapped < serial * 0.85, (overlapped, serial)


def test_trainer_uncached_path_uses_prefetch(make_molecule, rng, tmp_path):
    """cache_batches=False routes through the prefetching iterator and
    still trains correctly."""
    from tests.test_train import TINY_MODEL, TINY_TRAIN, _tiny_dataset
    from x2gnn_tpu.models import X2GNN
    from x2gnn_tpu.train.trainer import Trainer

    graphs, targets = _tiny_dataset(make_molecule, rng)
    trainer = Trainer(X2GNN(TINY_MODEL), TINY_MODEL, TINY_TRAIN, graphs,
                      targets, workdir=str(tmp_path / "pf"),
                      cache_batches=False)
    _, summary = trainer.fit(epochs=1)
    assert np.isfinite(summary["best_val_mae"])
