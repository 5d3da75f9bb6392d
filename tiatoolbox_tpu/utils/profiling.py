"""Tracing / profiling utilities (SURVEY §5.1 auxiliary subsystem).

The reference's observability is tqdm loops + psutil snapshots; this
build adds:

- ``StageTimer``: per-stage wall-time + item counters (patches/sec),
  used by engines when ``verbose``.
- ``trace``: context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible device trace.
- ``log_memory``: host RSS + device memory stats snapshot.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict

from tiatoolbox_tpu import logger


class StageTimer:
    """Accumulate wall time and item counts per pipeline stage.

    Thread-safe: the band-feed paths accumulate the same stage from
    concurrent reader threads, so the read-modify-write on the
    accumulators is lock-guarded.

    Example:
        >>> timer = StageTimer()
        >>> with timer.stage("read", items=32):
        ...     ...
        >>> timer.report()
    """

    def __init__(self) -> None:
        self.times: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str, items: int = 0):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.add(name, time.perf_counter() - start, items)

    def add(self, name: str, seconds: float, items: int = 0) -> None:
        with self._lock:
            self.times[name] += seconds
            self.counts[name] += items

    def summary(self) -> dict[str, dict]:
        out = {}
        for name, seconds in self.times.items():
            entry = {"seconds": round(seconds, 4)}
            if self.counts[name]:
                entry["items"] = self.counts[name]
                entry["items_per_sec"] = round(self.counts[name] / max(seconds, 1e-9), 2)
            out[name] = entry
        return out

    def report(self) -> None:
        for name, entry in self.summary().items():
            rate = (
                f" ({entry['items_per_sec']}/s)" if "items_per_sec" in entry else ""
            )
            logger.info("stage %-12s %6.2fs%s", name, entry["seconds"], rate)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tiatpu_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("Device trace written to %s", log_dir)


def log_memory(tag: str = "") -> dict:
    """Snapshot host RSS and per-device memory stats."""
    stats: dict = {}
    try:
        import psutil

        stats["host_rss_mb"] = psutil.Process().memory_info().rss / (1 << 20)
    except ImportError:  # pragma: no cover
        pass
    try:
        import jax

        for device in jax.local_devices():
            mem = getattr(device, "memory_stats", lambda: None)()
            if mem:
                stats[f"{device.platform}:{device.id}"] = {
                    "bytes_in_use_mb": mem.get("bytes_in_use", 0) / (1 << 20),
                    "peak_bytes_mb": mem.get("peak_bytes_in_use", 0) / (1 << 20),
                }
    except Exception:  # pragma: no cover - platform-specific
        pass
    if tag:
        logger.info("memory[%s]: %s", tag, stats)
    return stats
