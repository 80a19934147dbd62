"""Background prefetcher: order/exception/early-exit semantics + trainer use."""

import threading
import time

import numpy as np
import pytest

from scenario_wise_rec_tpu.data import BatchIterable, ColumnarDataset
from scenario_wise_rec_tpu.data.prefetch import Prefetcher, prefetch


def test_prefetch_preserves_order_and_items():
    items = list(range(100))
    assert list(Prefetcher(items, depth=4)) == items


def test_prefetch_depth_zero_is_identity():
    items = [1, 2, 3]
    assert prefetch(items, depth=0) is items


def test_prefetch_reiterable_across_epochs():
    ds = ColumnarDataset({"a": np.arange(10)}, np.zeros(10))
    loader = BatchIterable(ds, batch_size=4, shuffle=True, seed=0)
    pf = Prefetcher(loader, depth=2)
    epochs = [[np.asarray(x["a"]).copy() for x, _, _ in pf] for _ in range(2)]
    # both epochs complete with the same batch count and cover all rows
    assert len(epochs[0]) == len(epochs[1]) == len(loader)
    for ep in epochs:
        # padded final batch repeats row 0; union of real rows is everything
        seen = set(np.concatenate(ep).tolist())
        assert seen == set(range(10))


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = iter(Prefetcher(gen(), depth=2))
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_early_exit_releases_thread():
    n_before = threading.active_count()

    def gen():
        for i in range(10_000):
            yield i

    it = iter(Prefetcher(gen(), depth=1))
    assert next(it) == 0
    it.close()  # consumer abandons; generator finally sets the stop event
    deadline = time.time() + 5.0
    while threading.active_count() > n_before and time.time() < deadline:
        time.sleep(0.01)
    assert threading.active_count() <= n_before


def test_prefetch_runs_producer_concurrently():
    started = threading.Event()

    def gen():
        started.set()
        yield "a"
        yield "b"

    it = iter(Prefetcher(gen(), depth=2))
    assert started.wait(timeout=5.0)  # producer ran before first next()
    assert list(it) == ["a", "b"]
