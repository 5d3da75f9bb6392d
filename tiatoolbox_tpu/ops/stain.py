"""Fused stain-normalization device programs (JAX + Pallas).

The per-tile hot path of stain normalization (reference
``tools/stainnorm.py:50-114``) expressed as one fused device program:

    uint8 RGB → OD → concentrations (od @ P) → scale → exp → uint8 RGB

Stain-matrix *estimation* (per-image, host-side, float64) produces the
small constant matrices ``P = pinv(stain_matrix.T).T`` and the target
stain matrix; this module applies them to batches of tiles on device.
Two implementations are provided:

- ``stain_transform`` — jnp program; XLA fuses the elementwise chain.
  Measured ~10 GPix/s HBM-resident on v5e (transcendental-bound: 3
  log + 3 exp per pixel on the VPU). This is the default.
- ``stain_transform_pallas`` — explicit Pallas kernel using a
  channels-planar layout. Measured ~3x SLOWER than the XLA-fused
  path on v5e: the uint8 planar gather/scatter costs more than the
  lane packing saves, so it is opt-in
  (``rcParam["stain_use_pallas"] = True``) and kept as the kernel
  reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu import rcParam


@functools.partial(jax.jit, static_argnames=())
def stain_transform(
    tiles: jnp.ndarray,
    conc_proj: jnp.ndarray,
    target_stains: jnp.ndarray,
    conc_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Apply a precomputed stain transform to uint8 RGB tiles.

    Args:
        tiles: uint8 array [..., 3].
        conc_proj: float32 [3, 2] projection OD → concentrations
            (``pinv(stain_matrix_source.T).T`` computed host-side).
        target_stains: float32 [2, 3] target stain matrix.
        conc_scale: float32 [2] per-stain concentration rescale
            (``maxC_target / maxC_source``).

    Returns:
        uint8 array of the same shape.
    """
    x = jnp.where(tiles == 0, 1, tiles).astype(jnp.float32)
    od = jnp.maximum(-jnp.log(x / 255.0), 1e-6)
    conc = od @ conc_proj  # [..., 2]
    conc = conc * conc_scale
    out = 255.0 * jnp.exp(-(conc @ target_stains))
    out = jnp.clip(out, 0.0, 255.0)
    return out.astype(jnp.uint8)


def _stain_kernel(r_ref, g_ref, b_ref, coef_ref, or_ref, og_ref, ob_ref):
    """Pallas kernel: planar RGB block → stain-normalized planar RGB.

    ``coef_ref`` is a (1, 16) SMEM row packing [P (3x2), scale (2),
    M_target (2x3)] — 14 scalars, padded to 16.
    """
    p00, p01 = coef_ref[0, 0], coef_ref[0, 1]
    p10, p11 = coef_ref[0, 2], coef_ref[0, 3]
    p20, p21 = coef_ref[0, 4], coef_ref[0, 5]
    s0, s1 = coef_ref[0, 6], coef_ref[0, 7]
    m00, m01, m02 = coef_ref[0, 8], coef_ref[0, 9], coef_ref[0, 10]
    m10, m11, m12 = coef_ref[0, 11], coef_ref[0, 12], coef_ref[0, 13]

    def od(ref):
        # Mosaic can't lower uint8→f32 directly; hop through int32.
        x = ref[...].astype(jnp.int32).astype(jnp.float32)
        x = jnp.where(x == 0.0, 1.0, x)
        return jnp.maximum(-jnp.log(x * (1.0 / 255.0)), 1e-6)

    od_r, od_g, od_b = od(r_ref), od(g_ref), od(b_ref)
    c0 = (od_r * p00 + od_g * p10 + od_b * p20) * s0
    c1 = (od_r * p01 + od_g * p11 + od_b * p21) * s1

    def store(out_ref, w0, w1):
        val = 255.0 * jnp.exp(-(c0 * w0 + c1 * w1))
        # f32→uint8 isn't lowerable either; hop through int32
        out_ref[...] = (
            jnp.clip(val, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
        )

    store(or_ref, m00, m10)
    store(og_ref, m01, m11)
    store(ob_ref, m02, m12)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _stain_pallas_program(tiles, coefs, block_rows: int = 256):
    """Jitted wrapper: layout shuffle + kernel as ONE device program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = tiles.shape
    n_pix = int(np.prod(orig_shape[:-1]))
    lanes = 128
    rows = -(-n_pix // lanes)
    pad = rows * lanes - n_pix

    flat = tiles.reshape(n_pix, 3)
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    planes = [flat[:, c].reshape(rows, lanes) for c in range(3)]

    grid = (-(-rows // block_rows),)
    block = (block_rows, lanes)
    spec = pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM)
    coef_spec = pl.BlockSpec((1, 16), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_shape = jax.ShapeDtypeStruct((rows, lanes), jnp.uint8)

    out_r, out_g, out_b = pl.pallas_call(
        _stain_kernel,
        grid=grid,
        in_specs=[spec, spec, spec, coef_spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
    )(planes[0], planes[1], planes[2], coefs)

    out = jnp.stack(
        [out_r.reshape(-1), out_g.reshape(-1), out_b.reshape(-1)], axis=-1
    )
    if pad:
        out = out[:n_pix]
    return out.reshape(orig_shape)


def stain_transform_pallas(
    tiles: np.ndarray | jnp.ndarray,
    conc_proj,
    target_stains,
    conc_scale,
    block_rows: int = 256,
) -> jnp.ndarray:
    """Pallas-fused stain transform over uint8 RGB tiles.

    Flattens pixels to a (rows, 128) planar layout per channel, runs a
    single-VMEM-pass kernel, and restores the original shape. The whole
    thing (layout + kernel) compiles to one XLA program → one dispatch
    per call (dispatch latency dominates on remote-attached devices).
    """
    coefs = np.zeros((1, 16), np.float32)
    coefs[0, 0:6] = np.asarray(conc_proj, np.float32).reshape(-1)
    coefs[0, 6:8] = np.asarray(conc_scale, np.float32).reshape(-1)
    coefs[0, 8:14] = np.asarray(target_stains, np.float32).reshape(-1)
    return _stain_pallas_program(jnp.asarray(tiles), jnp.asarray(coefs), block_rows)


def apply_stain_transform(tiles, conc_proj, target_stains, conc_scale):
    """Dispatch to the XLA-fused program (default) or opt-in Pallas."""
    use_pallas = rcParam.get("stain_use_pallas", False) and any(
        d.platform in ("tpu", "axon") for d in jax.devices()
    )
    if use_pallas:
        try:
            return stain_transform_pallas(
                tiles, conc_proj, target_stains, conc_scale
            )
        except Exception:  # pragma: no cover - fall back on compile failure
            pass
    return stain_transform(
        jnp.asarray(tiles),
        jnp.asarray(conc_proj, jnp.float32),
        jnp.asarray(target_stains, jnp.float32),
        jnp.asarray(conc_scale, jnp.float32),
    )
