"""fetch_chunked_async / RowWatermark / LazyRowsView semantics.

The async drain lets MultiTaskSegmentor's host instance post-processing
start on the top of the canvas while the bottom rows are still crossing
the device→host link (engine wiring:
``multi_task_segmentor._infer_wsi_device_canvas_multihead``).
"""

from __future__ import annotations

import threading
import time

import numpy as np
import pytest

from tiatoolbox_tpu.parallel.pipeline import (
    LazyRowsView,
    RowWatermark,
    fetch_chunked,
    fetch_chunked_async,
)


@pytest.fixture(scope="module")
def cpu_array():
    import jax

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(3)
    host = rng.normal(size=(97, 13, 5)).astype(np.float32)
    return host, jax.device_put(host)


def test_async_matches_sync(cpu_array):
    host, dev = cpu_array
    sync = fetch_chunked(dev)
    buf, wm = fetch_chunked_async(dev)
    wm.wait_all()
    assert wm.drain_seconds is not None
    np.testing.assert_array_equal(buf, sync)
    np.testing.assert_array_equal(buf, host)


def test_async_dtype_cast(cpu_array):
    host, dev = cpu_array
    buf, wm = fetch_chunked_async(dev, dtype=np.float64)
    wm.wait_all()
    assert buf.dtype == np.float64
    np.testing.assert_array_equal(buf.astype(np.float32), host)


def test_lazy_rows_view_slicing(cpu_array):
    host, dev = cpu_array
    buf, wm = fetch_chunked_async(dev)
    view = LazyRowsView(buf, wm, slice(1, 4))
    assert view.shape == (97, 13, 3)
    assert view.ndim == 3
    assert len(view) == 97
    np.testing.assert_array_equal(view[10:20, 2:5], host[10:20, 2:5, 1:4])
    np.testing.assert_array_equal(np.asarray(view), host[..., 1:4])
    # integer row index and negative-stop slices resolve correctly
    np.testing.assert_array_equal(view[96], host[96, :, 1:4])
    np.testing.assert_array_equal(view[5:-1], host[5:-1, :, 1:4])


def test_watermark_gates_rows():
    """A consumer asking for rows beyond the watermark blocks until the
    producer marks them; rows already landed return immediately."""
    slices = [slice(0, 10), slice(10, 20), slice(20, 30)]
    wm = RowWatermark(slices, 30)
    wm._mark(0)
    assert wm.rows_ready == 10
    wm.wait_rows(10)  # no block

    landed = []

    def consumer():
        wm.wait_rows(30)
        landed.append(wm.rows_ready)

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    assert not landed  # still gated
    # out-of-order completion: chunk 2 lands before chunk 1 — the
    # contiguous prefix only advances when chunk 1 fills the gap
    wm._mark(2)
    assert wm.rows_ready == 10
    wm._mark(1)
    t.join(timeout=5)
    assert landed == [30]


def test_watermark_propagates_errors():
    wm = RowWatermark([slice(0, 5)], 5)
    wm._fail(RuntimeError("link died"))
    with pytest.raises(RuntimeError, match="link died"):
        wm.wait_rows(5)
