"""Device-side canvas stitching (scatter-add with count normalization).

TPU-native form of the reference's NumPy canvas merge
(``semantic_segmentor.py:1186-1536``): a jitted ``lax.scan`` scatters a
batch of fixed-shape probability patches into an HBM-resident canvas
and count map via ``dynamic_update_slice`` (static patch shapes keep
XLA happy; positions are data). Used by engines when the whole-slide
canvas fits HBM; larger canvases fall back to the host/zarr path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def scatter_accumulate_impl(
    canvas: jnp.ndarray,
    count: jnp.ndarray,
    patches: jnp.ndarray,
    positions: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Functional scatter-accumulate body (traceable inside shard_map —
    the multi-chip dryrun runs it per-device with a psum reduction)."""
    patch_h, patch_w = patches.shape[1:3]

    def body(carry, inputs):
        canvas, count = carry
        patch, pos, is_valid = inputs
        y, x = pos[0], pos[1]
        cur = jax.lax.dynamic_slice(
            canvas, (y, x, 0), (patch_h, patch_w, canvas.shape[-1])
        )
        cur_count = jax.lax.dynamic_slice(count, (y, x, 0), (patch_h, patch_w, 1))
        add = jnp.where(is_valid, patch, 0.0)
        inc = jnp.where(is_valid, 1.0, 0.0)
        canvas = jax.lax.dynamic_update_slice(canvas, cur + add, (y, x, 0))
        count = jax.lax.dynamic_update_slice(
            count, cur_count + inc, (y, x, 0)
        )
        return (canvas, count), None

    (canvas, count), _ = jax.lax.scan(
        body, (canvas, count), (patches, positions, valid)
    )
    return canvas, count


@functools.partial(jax.jit, donate_argnums=(0, 1))
def scatter_accumulate(
    canvas: jnp.ndarray,
    count: jnp.ndarray,
    patches: jnp.ndarray,
    positions: jnp.ndarray,
    valid: jnp.ndarray,
):
    """Accumulate patches into (canvas, count) at given positions.

    Args:
        canvas: [H, W, C] float32 accumulator (donated).
        count: [H, W, 1] float32 hit counter (donated).
        patches: [N, h, w, C] patch values.
        positions: [N, 2] int32 (y, x) top-left offsets (pre-clipped to
            keep the patch inside the canvas).
        valid: [N] bool; invalid entries contribute nothing.

    Returns:
        Updated (canvas, count).
    """
    return scatter_accumulate_impl(canvas, count, patches, positions, valid)


@jax.jit
def normalize_canvas(canvas: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Divide the accumulated canvas by per-pixel hit counts."""
    return canvas / jnp.maximum(count, 1.0)


@jax.jit
def canvas_argmax(canvas: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel argmax over channels (prediction map)."""
    return jnp.argmax(canvas, axis=-1).astype(jnp.uint8)


class DeviceCanvas:
    """HBM-resident stitching canvas with host-free accumulation.

    Example:
        >>> canvas = DeviceCanvas((1024, 1024), n_channels=2)
        >>> canvas.add(patches, positions)      # [N,h,w,2], [N,2] (y,x)
        >>> probs = canvas.normalized()          # fetches to host
    """

    def __init__(self, shape_hw: tuple[int, int], n_channels: int) -> None:
        self.canvas = jnp.zeros((*shape_hw, n_channels), jnp.float32)
        self.count = jnp.zeros((*shape_hw, 1), jnp.float32)

    def add(self, patches, positions, valid=None) -> None:
        import numpy as np

        patches = jnp.asarray(patches, jnp.float32)
        h, w = self.canvas.shape[:2]
        ph, pw = patches.shape[1:3]
        positions = np.asarray(positions, np.int32)
        if valid is None:
            valid = np.ones(len(positions), bool)
        valid = np.asarray(valid, bool)
        # clip positions so the static-shape slice stays in bounds;
        # out-of-range patches are marked invalid instead of clipped
        in_range = (
            (positions[:, 0] >= 0)
            & (positions[:, 1] >= 0)
            & (positions[:, 0] + ph <= h)
            & (positions[:, 1] + pw <= w)
        )
        valid = valid & in_range
        positions = np.clip(positions, 0, [max(h - ph, 0), max(w - pw, 0)])
        self.canvas, self.count = scatter_accumulate(
            self.canvas,
            self.count,
            patches,
            jnp.asarray(positions),
            jnp.asarray(valid),
        )

    def normalized(self, dtype=None):
        """Count-normalized canvas; ``dtype`` casts ON DEVICE before any
        host fetch (e.g. float16 halves device→host wire bytes — the
        fetch, not the compute, bounds whole-slide merge on slow links).
        """
        out = normalize_canvas(self.canvas, self.count)
        if dtype is not None:
            out = out.astype(dtype)
        return out

    def predictions(self):
        return canvas_argmax(self.normalized())
