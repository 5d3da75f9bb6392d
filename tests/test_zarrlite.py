"""Tests for the zarrlite chunked store."""

from __future__ import annotations

import json

import numpy as np
import pytest

from tiatoolbox_tpu.utils.zarrlite import (
    ZarrArray,
    ZarrGroup,
    create_smart_array,
    open_zarr,
)


def test_roundtrip_basic(tmp_path) -> None:
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, (100, 130, 3), dtype=np.uint8)
    arr = ZarrArray.from_array(tmp_path / "a.zarr", data, chunks=(32, 32, 3))
    assert arr.shape == (100, 130, 3)
    assert np.array_equal(arr[:, :, :], data)
    assert np.array_equal(arr[10:50, 20:100], data[10:50, 20:100])
    assert np.array_equal(arr[7], data[7])


def test_partial_write_and_fill(tmp_path) -> None:
    arr = ZarrArray.create(tmp_path / "b.zarr", (64, 64), dtype=np.float32, fill_value=0)
    arr[10:20, 10:20] = 5.0
    assert arr[15, 15] == 5.0
    assert arr[0, 0] == 0.0
    out = arr[5:25, 5:25]
    assert out.sum() == 5.0 * 100


def test_uncompressed(tmp_path) -> None:
    data = np.arange(64, dtype=np.int32).reshape(8, 8)
    arr = ZarrArray.from_array(tmp_path / "c.zarr", data, compress=False)
    assert np.array_equal(np.asarray(arr), data)


def test_zarr_v2_metadata_format(tmp_path) -> None:
    ZarrArray.create(tmp_path / "d.zarr", (10, 10), chunks=(5, 5), dtype=np.uint16)
    meta = json.loads((tmp_path / "d.zarr" / ".zarray").read_text())
    assert meta["zarr_format"] == 2
    assert meta["dtype"] == "<u2"
    assert meta["chunks"] == [5, 5]


def test_group(tmp_path) -> None:
    grp = ZarrGroup.create(tmp_path / "g.zarr")
    grp.attrs = {"hello": 1}
    a = grp.from_array("probs", np.ones((4, 4), np.float32))
    assert "probs" in grp
    assert grp.attrs["hello"] == 1
    assert np.array_equal(np.asarray(grp["probs"]), np.asarray(a))
    reopened = open_zarr(tmp_path / "g.zarr")
    assert isinstance(reopened, ZarrGroup)


def test_negative_and_bad_index(tmp_path) -> None:
    arr = ZarrArray.from_array(tmp_path / "e.zarr", np.arange(10))
    assert arr[-1] == 9
    with pytest.raises(IndexError):
        arr[0, 0, 0]


def test_smart_array_small_is_numpy(tmp_path) -> None:
    out = create_smart_array((16, 16), np.uint8, save_dir=tmp_path)
    assert isinstance(out, np.ndarray)


def test_smart_array_spills(tmp_path, monkeypatch) -> None:
    import tiatoolbox_tpu.utils.zarrlite as zl

    monkeypatch.setattr(zl, "free_ram_bytes", lambda: 100)
    out = create_smart_array((64, 64), np.float32, save_dir=tmp_path)
    assert isinstance(out, ZarrArray)
