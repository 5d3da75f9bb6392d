"""Extended zarrlite coverage: chunk-boundary I/O, dtypes, groups,
attrs, fancy slicing, and smart-array semantics.
"""

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


class TestChunkBoundaries:
    def test_write_spanning_many_chunks(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "a.zarr", shape=(100, 100), dtype=np.uint16,
            chunks=(16, 16),
        )
        data = np.arange(100 * 100, dtype=np.uint16).reshape(100, 100)
        arr[:] = data
        assert np.array_equal(arr[:], data)
        # window crossing 4 chunk corners
        assert np.array_equal(arr[10:40, 10:40], data[10:40, 10:40])

    def test_single_element_rw(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "b.zarr", shape=(8, 8), dtype=np.float32, chunks=(4, 4)
        )
        arr[3, 5] = 7.5
        assert arr[3, 5] == 7.5
        assert arr[0, 0] == 0.0

    def test_row_slice(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "c.zarr", shape=(10, 6), dtype=np.int32, chunks=(3, 6)
        )
        arr[4] = np.arange(6)
        assert np.array_equal(np.asarray(arr[4]).ravel(), np.arange(6))

    def test_3d_channel_array(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "d.zarr", shape=(32, 32, 3), dtype=np.uint8,
            chunks=(16, 16, 3),
        )
        rgb = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        arr[:] = rgb
        assert np.array_equal(arr[8:24, 8:24], rgb[8:24, 8:24])

    def test_accumulate_read_modify_write(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "e.zarr", shape=(20, 20), dtype=np.float32, chunks=(8, 8)
        )
        for _ in range(3):
            arr[5:15, 5:15] = arr[5:15, 5:15] + 1.0
        assert arr[10, 10] == 3.0
        assert arr[0, 0] == 0.0


class TestDtypes:
    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.uint16, np.int32, np.float16, np.float32,
                  np.float64, np.bool_]
    )
    def test_dtype_roundtrip(self, tmp_path, dtype) -> None:
        rng = np.random.default_rng(1)
        if dtype == np.bool_:
            data = rng.random((10, 10)) > 0.5
        elif np.issubdtype(dtype, np.integer):
            data = rng.integers(0, 100, (10, 10)).astype(dtype)
        else:
            data = rng.random((10, 10)).astype(dtype)
        arr = ZarrArray.create(
            tmp_path / "t.zarr", shape=(10, 10), dtype=dtype, chunks=(4, 4)
        )
        arr[:] = data
        out = np.asarray(arr)
        assert out.dtype == dtype
        assert np.array_equal(out, data)


class TestGroups:
    def test_nested_groups(self, tmp_path) -> None:
        root = ZarrGroup.create(tmp_path / "g.zarr")
        sub = root.create_group("level0")
        sub.from_array("img", np.ones((4, 4), np.uint8))
        reopened = open_zarr(tmp_path / "g.zarr")
        assert "level0" in reopened
        assert np.array_equal(
            np.asarray(reopened["level0"]["img"]), np.ones((4, 4), np.uint8)
        )

    def test_group_attrs_persist(self, tmp_path) -> None:
        root = ZarrGroup.create(tmp_path / "h.zarr")
        root.attrs = {"multiscales": [{"version": "0.4"}], "n": 3}
        reopened = open_zarr(tmp_path / "h.zarr")
        assert reopened.attrs["n"] == 3
        assert reopened.attrs["multiscales"][0]["version"] == "0.4"

    def test_array_attrs_persist(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "i.zarr", shape=(4, 4), dtype=np.uint8, chunks=(4, 4)
        )
        arr.attrs = {"mpp": [0.5, 0.5]}
        again = ZarrArray(tmp_path / "i.zarr")
        assert again.attrs["mpp"] == [0.5, 0.5]

    def test_missing_member_raises(self, tmp_path) -> None:
        root = ZarrGroup.create(tmp_path / "j.zarr")
        with pytest.raises(KeyError):
            root["nope"]

    def test_open_zarr_dispatches_array(self, tmp_path) -> None:
        ZarrArray.create(
            tmp_path / "k.zarr", shape=(4,), dtype=np.uint8, chunks=(4,)
        )
        opened = open_zarr(tmp_path / "k.zarr")
        assert isinstance(opened, ZarrArray)

    def test_v2_on_disk_layout(self, tmp_path) -> None:
        arr = ZarrArray.create(
            tmp_path / "l.zarr", shape=(8, 8), dtype=np.uint8, chunks=(4, 4)
        )
        arr[:] = 1
        meta = json.loads((tmp_path / "l.zarr" / ".zarray").read_text())
        assert meta["zarr_format"] == 2
        assert meta["chunks"] == [4, 4]
        # chunk files use the v2 "r.c" naming
        assert (tmp_path / "l.zarr" / "0.0").exists()


class TestSmartArray:
    def test_spilled_matches_ram(self, tmp_path, monkeypatch) -> None:
        import tiatoolbox_tpu.utils.zarrlite as zl

        data = np.random.default_rng(2).random((64, 64)).astype(np.float32)
        ram = create_smart_array((64, 64), np.float32, save_dir=tmp_path)
        monkeypatch.setattr(zl, "free_ram_bytes", lambda: 0)
        spill = create_smart_array(
            (64, 64), np.float32, save_dir=tmp_path, name="sp"
        )
        assert isinstance(ram, np.ndarray)
        assert not isinstance(spill, np.ndarray)
        ram[:] = data
        spill[:] = data
        assert np.array_equal(np.asarray(spill), ram)

    def test_memory_fraction_forces_spill(self, tmp_path) -> None:
        arr = create_smart_array(
            (32, 32), np.float32, save_dir=tmp_path,
            memory_fraction=0.0, name="frac",
        )
        assert not isinstance(arr, np.ndarray)
        arr[2:8, 2:8] = 5.0
        assert np.asarray(arr)[4, 4] == 5.0
