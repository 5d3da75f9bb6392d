"""Extended HoVerNet post-processing coverage (reference
``tests/models/test_hovernet.py`` behaviours): watershed separation,
instance info fields, type assignment, offsets."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet


def two_blob_maps(sep: int = 12):
    """NP/HV maps with two circular nuclei ``sep`` px apart (centres)."""
    h = w = 80
    np_map = np.zeros((h, w, 1), np.float32)
    hv_map = np.zeros((h, w, 2), np.float32)
    centres = [(30, 30), (30, 30 + sep)]
    yy, xx = np.mgrid[0:h, 0:w]
    for cy, cx in centres:
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inside = d2 <= 8**2
        np_map[inside, 0] = 0.95
        # horizontal/vertical gradient fields inside each nucleus
        hv_map[inside, 0] = np.clip((xx[inside] - cx) / 8.0, -1, 1)
        hv_map[inside, 1] = np.clip((yy[inside] - cy) / 8.0, -1, 1)
    return np_map, hv_map, centres


class TestProcNpHv:
    def test_separates_touching_instances(self) -> None:
        np_map, hv_map, _ = two_blob_maps(sep=14)
        inst = HoVerNet._proc_np_hv(np_map, hv_map)
        labels = set(np.unique(inst)) - {0}
        assert len(labels) == 2

    def test_empty_map_no_instances(self) -> None:
        inst = HoVerNet._proc_np_hv(
            np.zeros((64, 64, 1), np.float32), np.zeros((64, 64, 2), np.float32)
        )
        assert inst.max() == 0

    def test_small_objects_removed(self) -> None:
        np_map = np.zeros((64, 64, 1), np.float32)
        np_map[10:12, 10:12, 0] = 0.9  # 4 px << min_size 10
        inst = HoVerNet._proc_np_hv(np_map, np.zeros((64, 64, 2), np.float32))
        assert inst.max() == 0

    def test_label_map_dtype_int(self) -> None:
        np_map, hv_map, _ = two_blob_maps()
        inst = HoVerNet._proc_np_hv(np_map, hv_map)
        assert np.issubdtype(inst.dtype, np.integer)

    def test_scratch_pool_retains_tiles_releases_canvases(self) -> None:
        """Tile-sized working sets stay pooled (reuse across calls);
        a full-canvas working set over the retention cap is released
        after the call instead of staying pinned per-thread."""
        from tiatoolbox_tpu.models.architecture import hovernet as hn

        np_map, hv_map, _ = two_blob_maps()
        HoVerNet._proc_np_hv(np_map, hv_map)
        assert hn._SCRATCH.shape == np_map.shape[:2]  # tile pooled
        assert sum(b.nbytes for b in hn._SCRATCH.bufs.values()) > 0

        # lower the cap instead of allocating a real ~700 MB canvas
        old_cap = hn._SCRATCH_MAX_RETAIN_BYTES
        hn._SCRATCH_MAX_RETAIN_BYTES = 1024 * 1024
        try:
            HoVerNet._proc_np_hv(
                np.zeros((256, 256, 1), np.float32),
                np.zeros((256, 256, 2), np.float32),
            )
            assert hn._SCRATCH.shape is None  # released over the cap
            assert hn._SCRATCH.bufs == {}
        finally:
            hn._SCRATCH_MAX_RETAIN_BYTES = old_cap


class TestInstanceInfo:
    def test_fields_and_geometry(self) -> None:
        np_map, hv_map, centres = two_blob_maps(sep=20)
        inst = HoVerNet._proc_np_hv(np_map, hv_map)
        info = HoVerNet.get_instance_info(inst)
        assert len(info) == 2
        for rec in info.values():
            assert {"box", "centroid", "contours", "prob", "type"} <= set(rec)
            cx, cy = rec["centroid"]
            assert any(
                abs(cx - c[1]) < 4 and abs(cy - c[0]) < 4 for c in centres
            )
            x0, y0, x1, y1 = np.asarray(rec["box"]).ravel()
            assert x1 > x0 and y1 > y0

    def test_type_assignment_majority(self) -> None:
        np_map, hv_map, _ = two_blob_maps(sep=24)
        inst = HoVerNet._proc_np_hv(np_map, hv_map)
        tp = np.zeros(inst.shape[:2], np.uint8)
        tp[inst > 0] = 3
        info = HoVerNet.get_instance_info(inst, tp[..., None])
        for rec in info.values():
            assert rec["type"] == 3
            assert rec["prob"] == pytest.approx(1.0)

    def test_offset_shifts_coordinates(self) -> None:
        np_map, hv_map, _ = two_blob_maps()
        inst = HoVerNet._proc_np_hv(np_map, hv_map)
        base = HoVerNet.get_instance_info(inst)
        moved = HoVerNet.get_instance_info(inst, offset=(100, 200))
        for k in base:
            b = np.asarray(base[k]["centroid"])
            m = np.asarray(moved[k]["centroid"])
            assert np.allclose(m - b, [100, 200])


class TestPostproc:
    def test_two_head_output(self) -> None:
        np_map, hv_map, _ = two_blob_maps()
        (task,) = HoVerNet(num_types=None, mode="fast").postproc(
            [np_map, hv_map]
        )
        assert task["seg_type"] == "instance"
        assert task["predictions"].shape == np_map.shape[:2]
        columns = task["info_dict"]
        assert len(columns["centroid"]) == 2
        assert all(t is None for t in columns["type"])

    def test_three_head_output_types(self) -> None:
        np_map, hv_map, _ = two_blob_maps()
        tp_map = np.full((*np_map.shape[:2], 1), 2.0, np.float32)
        (task,) = HoVerNet(num_types=5, mode="fast").postproc(
            [np_map, hv_map, tp_map]
        )
        assert all(t == 2 for t in task["info_dict"]["type"])
