"""BatchPrefetcher tests: ordering-free delivery, error propagation,
clean shutdown."""

import time

import numpy as np
import pytest

from space_time_pde_tpu.data.prefetch import BatchPrefetcher


def test_delivers_batches():
    counter = {"n": 0}

    def make():
        counter["n"] += 1
        return {"x": np.full((2, 2), counter["n"], np.float32)}

    with BatchPrefetcher(make, depth=2) as pf:
        got = [pf.get()["x"][0, 0] for _ in range(5)]
    assert len(got) == 5
    assert all(g >= 1 for g in got)


def test_propagates_worker_exception():
    def make():
        raise ValueError("boom")

    pf = BatchPrefetcher(make, depth=1)
    with pytest.raises(ValueError, match="boom"):
        # Worker may need a beat to hit the failure.
        for _ in range(50):
            pf.get()
            time.sleep(0.01)
    pf.close()


def test_close_stops_thread():
    pf = BatchPrefetcher(lambda: {"x": np.zeros(1)}, depth=1)
    pf.get()
    pf.close()
    assert not pf._thread.is_alive()
