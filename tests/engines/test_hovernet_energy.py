"""Device-side HoVerNet watershed energy front-end parity.

The Sobel/normalize/max energy landscape (reference
``models/architecture/hovernet.py:530-560``) now runs as a jitted
device program on the stitched canvas (``ops/hv_energy.py``); the host
keeps only label/fill/flood. These tests assert the device front-end
reproduces the host front-end's watershed partitions exactly, and that
the engine path that engages it matches the raw-hv path instance for
instance.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet


def _calibrated_maps(shape=(256, 320), seed=0, n_blobs=24):
    """Synthetic np/hv maps with HoVerNet-like statistics: elliptical
    foreground blobs whose hv channels ramp -1→1 across each blob."""
    rng = np.random.default_rng(seed)
    h, w = shape
    np_map = np.zeros((h, w, 1), np.float32)
    hv_map = np.zeros((h, w, 2), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cy, cx = rng.integers(12, h - 12), rng.integers(12, w - 12)
        ry, rx = rng.integers(5, 12), rng.integers(5, 12)
        d2 = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        blob = d2 <= 1.0
        prob = np.clip(1.2 - d2, 0, 1).astype(np.float32)
        np_map[..., 0] = np.maximum(np_map[..., 0], prob)
        hv_map[..., 0] = np.where(blob, ((xx - cx) / rx).astype(np.float32),
                                  hv_map[..., 0])
        hv_map[..., 1] = np.where(blob, ((yy - cy) / ry).astype(np.float32),
                                  hv_map[..., 1])
    # measurement-like noise, small enough to keep blobs coherent
    np_map += rng.normal(0, 0.01, np_map.shape).astype(np.float32)
    hv_map += rng.normal(0, 0.01, hv_map.shape).astype(np.float32)
    return np_map, hv_map


class TestEnergyParity:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_device_energy_matches_host_front_end(self, seed) -> None:
        from tiatoolbox_tpu.ops.hv_energy import hv_energy

        np_map, hv_map = _calibrated_maps(seed=seed)
        host_inst = HoVerNet._proc_np_hv(np_map, hv_map)
        energy = np.asarray(hv_energy(hv_map))
        dev_inst = HoVerNet._proc_np_energy(np_map, energy)
        assert host_inst.max() > 3  # the fixture must produce instances
        np.testing.assert_array_equal(dev_inst, host_inst)

    def test_energy_map_close_to_cv2(self) -> None:
        """The device energy values match the cv2 f64 pipeline ~1e-6."""
        import cv2

        from tiatoolbox_tpu.ops.hv_energy import hv_energy

        _, hv_map = _calibrated_maps(seed=3)
        h_dir = cv2.normalize(
            hv_map[..., 0], None, alpha=0, beta=1,
            norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        v_dir = cv2.normalize(
            hv_map[..., 1], None, alpha=0, beta=1,
            norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        sobel_h = cv2.normalize(
            cv2.Sobel(h_dir, cv2.CV_64F, 1, 0, ksize=21), None,
            alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        sobel_v = cv2.normalize(
            cv2.Sobel(v_dir, cv2.CV_64F, 0, 1, ksize=21), None,
            alpha=0, beta=1, norm_type=cv2.NORM_MINMAX, dtype=cv2.CV_32F,
        )
        expected = np.maximum(1 - sobel_h, 1 - sobel_v)
        got = np.asarray(hv_energy(hv_map))
        assert np.abs(got - expected).max() < 1e-5

    def test_postproc_dispatches_on_channel_count(self) -> None:
        from tiatoolbox_tpu.ops.hv_energy import hv_energy

        np_map, hv_map = _calibrated_maps(seed=4, shape=(164, 164))
        model = HoVerNet(num_types=None, mode="fast")
        via_hv = model.postproc([np_map, hv_map])
        energy = np.asarray(hv_energy(hv_map))[..., None]
        via_energy = model.postproc([np_map, energy])
        np.testing.assert_array_equal(
            via_energy[0]["predictions"], via_hv[0]["predictions"]
        )

    def test_transform_canvas_channel_layout(self) -> None:
        import jax.numpy as jnp

        model = HoVerNet(num_types=5, mode="fast")
        canvas = jnp.asarray(
            np.random.default_rng(0).normal(size=(96, 80, 4)).astype(np.float32)
        )
        out, channels = model.transform_canvas_for_postproc(canvas, [1, 2, 1])
        assert out.shape == (96, 80, 3)
        assert channels == [1, 1, 1]
        # np + tp channels pass through untouched
        np.testing.assert_array_equal(
            np.asarray(out[..., 0]), np.asarray(canvas[..., 0])
        )
        np.testing.assert_array_equal(
            np.asarray(out[..., 2]), np.asarray(canvas[..., 3])
        )
        # unexpected layout declines
        assert model.transform_canvas_for_postproc(canvas, [2, 2]) is None
