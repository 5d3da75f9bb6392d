"""Device-side HoVerNet watershed energy front-end.

The reference computes the watershed energy landscape on the host with
cv2 (reference ``models/architecture/hovernet.py:503-617``): minmax-
normalize the h/v direction maps, Sobel(ksize=21) each, minmax-
normalize the gradients, and take ``max(1-Sh, 1-Sv)``. On the stitched
whole-slide canvas this is ~1.1 s of conv/elementwise work per bench
slide — pure MXU/VPU material. This module runs the same math as one
jitted program over the HBM-resident hv canvas, so the engine fetches
ONE energy channel instead of the two hv channels and the host keeps
only the genuinely sequential steps (connected-component labelling,
hole filling, the watershed flood).

Numerics: cv2 does the Sobel in float64; the device program uses
float32 (TPU f64 is emulated). After the [0, 1] minmax normalizations
the difference is ~1e-7 — ``tests/engines/test_hovernet_energy.py``
asserts identical watershed partitions on calibrated maps.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def sobel_kernels(ksize: int) -> tuple[np.ndarray, np.ndarray]:
    """cv2's separable Sobel taps: (derivative, smoothing) 1-D kernels."""
    import cv2

    kd, ks = cv2.getDerivKernels(1, 0, ksize=ksize, normalize=False)
    return kd.ravel().astype(np.float32), ks.ravel().astype(np.float32)


@functools.lru_cache(maxsize=8)
def _energy_program(ksize: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    kd_np, ks_np = sobel_kernels(ksize)
    radius = ksize // 2

    def _sep_conv(x: "jnp.ndarray", k_x: np.ndarray, k_y: np.ndarray):
        """Separable correlation with cv2's BORDER_REFLECT_101 edges."""
        xp = jnp.pad(x, ((radius, radius), (radius, radius)), mode="reflect")
        img = xp[None, :, :, None]
        dn = ("NHWC", "HWIO", "NHWC")
        out = lax.conv_general_dilated(
            img, jnp.asarray(k_x).reshape(1, -1, 1, 1), (1, 1), "VALID",
            dimension_numbers=dn,
        )
        out = lax.conv_general_dilated(
            out, jnp.asarray(k_y).reshape(-1, 1, 1, 1), (1, 1), "VALID",
            dimension_numbers=dn,
        )
        return out[0, :, :, 0]

    def _minmax(x: "jnp.ndarray") -> "jnp.ndarray":
        mn, mx = jnp.min(x), jnp.max(x)
        return (x - mn) / jnp.maximum(mx - mn, jnp.float32(1e-30))

    @jax.jit
    def energy(hv: "jnp.ndarray") -> "jnp.ndarray":
        """[H, W, 2] float hv maps → [H, W] float32 energy landscape."""
        h_dir = _minmax(hv[..., 0].astype(jnp.float32))
        v_dir = _minmax(hv[..., 1].astype(jnp.float32))
        # Sobel dx on h, Sobel dy on v (cv2 correlation semantics)
        sobel_h = _minmax(_sep_conv(h_dir, kd_np, ks_np))
        sobel_v = _minmax(_sep_conv(v_dir, ks_np, kd_np))
        return jnp.maximum(1.0 - sobel_h, 1.0 - sobel_v)

    return energy


def hv_energy(hv, scale_factor: float = 1.0):
    """Watershed energy landscape of device-resident hv maps.

    Args:
        hv: [H, W, 2] device (or host) array of horizontal/vertical
            direction maps (count-normalized canvas channels).
        scale_factor: reference ksize rule ``int(20 * sf) + 1``.

    Returns:
        [H, W] float32 device array: ``max(1 - Sh_norm, 1 - Sv_norm)``,
        the reference's ``overall`` map before the background subtract.
    """
    ksize = int(20 * scale_factor) + 1
    return _energy_program(ksize)(hv)
