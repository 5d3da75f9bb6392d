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


def test_block_drain_overlaps_and_completes():
    """BlockDrain fetches the blocks a producer marks final, in row
    order, and finish() returns the complete buffer; flush() dispatches
    without waiting so consumers can gate on the watermark instead."""
    from tiatoolbox_tpu.parallel.pipeline import BlockDrain

    src = np.arange(100 * 8 * 2, dtype=np.float32).reshape(100, 8, 2)
    calls = []

    def block_fn(y0, bh):
        calls.append((y0, bh))
        return src[y0 : y0 + bh]

    drain = BlockDrain(
        block_fn, n_rows=100, out_shape=(100, 8, 2), out_dtype=np.float32,
        block_h=32,
    )
    drain.advance(40)  # only the first 32-row block is fully final
    drain.watermark.wait_rows(32)
    assert calls == [(0, 32)]
    np.testing.assert_array_equal(drain.buf[:32], src[:32])
    drain.advance(100)  # blocks 1..2 (+ the 4-row tail)
    out = drain.finish()
    assert calls == [(0, 32), (32, 32), (64, 32), (96, 4)]
    np.testing.assert_array_equal(out, src)
    # at most two distinct block heights (body + tail): jit-per-height
    assert len({bh for _, bh in calls}) <= 2


def test_block_drain_flush_then_view_gates():
    """flush() dispatches every remaining block without waiting for the
    copies; a LazyRowsView over the buffer gates on the watermark."""
    from tiatoolbox_tpu.parallel.pipeline import BlockDrain, LazyRowsView

    src = np.random.rand(64, 4, 3).astype(np.float32)
    drain = BlockDrain(
        lambda y0, bh: src[y0 : y0 + bh],
        64, (64, 4, 3), np.float32, block_h=16, n_threads=2,
    )
    drain.flush()
    view = LazyRowsView(drain.buf, drain.watermark, slice(0, 1))
    np.testing.assert_array_equal(view[0:16], src[:16, :, 0:1])
    np.testing.assert_array_equal(np.asarray(view), src[..., 0:1])


def test_probe_link_reports_bw_and_latency():
    """Two-point probe returns positive bandwidth/latency and caches."""
    from tiatoolbox_tpu.parallel import pipeline

    pipeline._link_probe_cache["rate"] = None
    pipeline._link_probe_cache.pop("full", None)
    out = pipeline.probe_link(nbytes=1 << 18)
    assert out["rate_mb_per_sec"] > 0
    assert out["bw_mb_per_sec"] > 0
    assert out["latency_s"] >= 0
    # cached within TTL: same dict object, no re-probe
    assert pipeline.probe_link(nbytes=1 << 18) is out
    assert pipeline.probe_link_mb_per_sec() == out["rate_mb_per_sec"]


def test_wire_format_auto_pins_until_reassigned():
    """'auto' resolves once per assignment (mid-run flips would compile
    a second wire program inside a serving loop)."""
    import jax

    from tiatoolbox_tpu.models.architecture.vanilla import CNNModel

    model = CNNModel("resnet18", num_classes=2)
    model.init(input_shape=(1, 32, 32, 3))
    model.wire_format = "auto"
    batch = np.zeros((2, 32, 32, 3), np.uint8)
    first = model.stage_batch(batch)
    resolved = model._resolved_wire_format
    assert resolved in ("rgb", "yuv420")
    assert isinstance(first, jax.Array)
    # pinned on the instance; reassignment clears the pin
    assert model._resolved_wire_format == resolved
    model.wire_format = "rgb"
    assert model._resolved_wire_format is None
