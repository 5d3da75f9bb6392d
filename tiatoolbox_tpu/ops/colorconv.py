"""Color-space conversions as JAX device functions.

Device equivalents of ``utils/transforms.py`` rgb2od/od2rgb (reference
``tiatoolbox/utils/transforms.py:209-258``), numerically matched to the
host/NumPy versions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb2od(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB → optical density; zeros treated as 1 (matches host)."""
    img = jnp.asarray(img)
    img = jnp.where(img == 0, 1, img).astype(jnp.float32)
    return jnp.maximum(-jnp.log(img / 255.0), 1e-6)


def od2rgb(od: jnp.ndarray) -> jnp.ndarray:
    """Optical density → uint8 RGB."""
    od = jnp.maximum(od, 1e-6)
    return (255.0 * jnp.exp(-od)).astype(jnp.uint8)


@jax.jit
def rgb2grey(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 RGB → uint8 grey with OpenCV's BT.601 rounding."""
    img = img.astype(jnp.float32)
    grey = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.round(grey).astype(jnp.uint8)
