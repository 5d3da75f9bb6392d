"""Runtime plumbing suite: rcParam, logging/DuplicateFilter, magic
byte-sniffers, env detection, profiling, exceptions (reference
``tiatoolbox/__init__.py`` + ``utils/magic.py`` + ``env_detection``).
"""

from __future__ import annotations

import logging
import struct
import zlib

import numpy as np
import pytest

import tiatoolbox_tpu
from tiatoolbox_tpu import DuplicateFilter, logger, rcParam
from tiatoolbox_tpu.utils import magic
from tiatoolbox_tpu.utils.env_detection import (
    device_count,
    has_gpu,
    has_network,
    has_tpu,
    running_on_ci,
)
from tiatoolbox_tpu.utils.exceptions import (
    DimensionMismatchError,
    FileNotSupportedError,
    MethodNotSupportedError,
)
from tiatoolbox_tpu.utils.profiling import StageTimer, log_memory


class TestRcParam:
    def test_required_keys(self) -> None:
        for key in (
            "TIATOOLBOX_HOME",
            "jit_backend",
            "enable_pallas",
            "compute_dtype",
            "torch_compile_mode",
            "jax_cache_dir",
        ):
            assert key in rcParam

    def test_pretrained_registry_lazily_loaded(self) -> None:
        info = tiatoolbox_tpu._get_pretrained_info()
        assert "resnet18-kather100k" in info
        # cached: same object on second access
        assert tiatoolbox_tpu._get_pretrained_info() is info

    def test_version_string(self) -> None:
        major = int(tiatoolbox_tpu.__version__.split(".")[0])
        assert major >= 0


class _Collect(logging.Handler):
    def __init__(self) -> None:
        super().__init__()
        self.records: list[logging.LogRecord] = []

    def emit(self, record: logging.LogRecord) -> None:
        self.records.append(record)


class TestLogging:
    def test_duplicate_filter_suppresses(self) -> None:
        handler = _Collect()
        dup = DuplicateFilter()
        logger.addHandler(handler)
        logger.addFilter(dup)
        try:
            for _ in range(5):
                logger.warning("repeated-message-xyz")
        finally:
            logger.removeFilter(dup)
            logger.removeHandler(handler)
        hits = [r for r in handler.records if "repeated-message-xyz" in r.msg]
        assert len(hits) == 1

    def test_without_filter_not_suppressed(self) -> None:
        handler = _Collect()
        logger.addHandler(handler)
        try:
            logger.warning("twice-ok")
            logger.warning("twice-ok")
        finally:
            logger.removeHandler(handler)
        hits = [r for r in handler.records if "twice-ok" in r.msg]
        assert len(hits) == 2


class TestMagic:
    def test_sqlite(self, tmp_path) -> None:
        import sqlite3

        p = tmp_path / "a.db"
        sqlite3.connect(p).execute("CREATE TABLE t (x)")
        assert magic.is_sqlite3(p)
        assert not magic.is_tiff(p)

    def test_zip(self, tmp_path) -> None:
        import zipfile

        p = tmp_path / "a.zip"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("x", b"1")
        assert magic.is_zip(p)

    def test_dcm(self, tmp_path) -> None:
        p = tmp_path / "a.dcm"
        p.write_bytes(b"\x00" * 128 + b"DICM" + b"\x00" * 16)
        assert magic.is_dcm(p)
        assert not magic.is_dcm(tmp_path / "missing.dcm")

    def test_tiff_both_endians(self, tmp_path) -> None:
        le = tmp_path / "le.tiff"
        le.write_bytes(b"II*\x00" + b"\x00" * 16)
        be = tmp_path / "be.tiff"
        be.write_bytes(b"MM\x00*" + b"\x00" * 16)
        assert magic.is_tiff(le)
        assert magic.is_tiff(be)

    def test_jp2_and_codestream(self, tmp_path) -> None:
        box = tmp_path / "a.jp2"
        box.write_bytes(b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 8)
        raw = tmp_path / "b.j2k"
        raw.write_bytes(b"\xff\x4f\xff\x51" + b"\x00" * 64)
        assert magic.is_jp2(box)
        assert magic.is_jp2(raw)

    def test_png_jpeg(self, tmp_path) -> None:
        import cv2

        img = np.zeros((4, 4, 3), np.uint8)
        png = tmp_path / "a.png"
        jpg = tmp_path / "a.jpg"
        cv2.imwrite(str(png), img)
        cv2.imwrite(str(jpg), img)
        assert magic.is_png(png)
        assert magic.is_jpeg(jpg)
        assert not magic.is_png(jpg)

    def test_zarr_and_ngff(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.zarrlite import ZarrGroup

        root = tmp_path / "g.zarr"
        grp = ZarrGroup.create(root)
        grp.from_array("0", np.zeros((4, 4, 3), np.uint8))
        assert magic.is_zarr(root)
        assert not magic.is_ngff(root)
        grp.attrs = {"multiscales": [{"version": "0.4", "datasets": []}]}
        assert magic.is_ngff(root)

    def test_directory_vs_file(self, tmp_path) -> None:
        assert magic.is_dir(tmp_path)
        f = tmp_path / "f.txt"
        f.write_text("x")
        assert not magic.is_dir(f)


class TestEnvDetection:
    def test_booleans(self) -> None:
        assert isinstance(has_tpu(), bool)
        assert isinstance(has_gpu(), bool)
        assert isinstance(running_on_ci(), bool)

    def test_device_count_positive(self) -> None:
        assert device_count() >= 1

    def test_has_network_unreachable_host_fast(self) -> None:
        # zero-egress env: must return False quickly, never raise
        assert has_network(hostname="nonexistent.invalid", timeout=0.5) in (
            True,
            False,
        )


class TestProfiling:
    def test_stage_timer_accumulates(self) -> None:
        timer = StageTimer()
        with timer.stage("read", items=8):
            pass
        with timer.stage("read", items=8):
            pass
        with timer.stage("infer"):
            pass
        summary = timer.summary()
        assert "read" in summary and "infer" in summary
        assert summary["read"]["items"] == 16
        assert "items_per_sec" in summary["read"]
        timer.add("save", 1.5, items=3)
        assert timer.summary()["save"]["seconds"] == pytest.approx(1.5)
        timer.report()  # logs, returns None

    def test_log_memory_returns_dict(self) -> None:
        out = log_memory("tag")
        assert isinstance(out, dict)


class TestExceptions:
    def test_hierarchy(self) -> None:
        assert issubclass(FileNotSupportedError, Exception)
        assert issubclass(MethodNotSupportedError, Exception)
        assert issubclass(DimensionMismatchError, Exception)

    def test_raisable_with_message(self) -> None:
        with pytest.raises(FileNotSupportedError, match="nope"):
            raise FileNotSupportedError("nope")
