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


def test_prefetch_works_ahead():
    """With depth 2, the producer runs ahead of consumption: after the
    consumer takes the first item, more items get produced in the
    background without further q.get calls (event-based, no wall-clock
    comparison — this host is easily starved)."""
    produced = []

    def gen(n=6):
        for i in range(n):
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    deadline = time.time() + 10.0
    # item 0 consumed; depth-2 queue lets the producer reach item >= 2
    while len(produced) < 3 and time.time() < deadline:
        time.sleep(0.01)
    assert len(produced) >= 3, produced
    assert list(it) == [1, 2, 3, 4, 5]


def test_prefetch_abandonment_cancels_producer():
    """Dropping the iterator early must release the producer thread
    (no permanently parked q.put)."""
    import threading
    started = threading.active_count()
    finished = threading.Event()

    def gen():
        try:
            for i in range(1000):
                yield i
        finally:
            finished.set()

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()                      # abandon mid-stream (GeneratorExit)
    assert finished.wait(timeout=10.0), "producer thread never released"
    deadline = time.time() + 10.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= started


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
