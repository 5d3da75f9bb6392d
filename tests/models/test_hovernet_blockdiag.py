"""Block-diagonal dense-unit conv rewrite (HoVerNet decoder).

``HoVerNet.optimize_for_inference`` rewrites the decoder dense units'
g=4 grouped convs as dense convs with block-diagonal kernels (MXU
output-lane fill: measured 2% → 12% of peak on v5e; see
docs/MFU_HOVERNET.md). The nonzero arithmetic is identical — these
tests pin the numerics and the gating.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tiatoolbox_tpu.models.architecture.hovernet import (
    HoVerNet,
    _expand_dense_group_kernels,
)


def _forward(model, x):
    return {
        k: np.asarray(v)
        for k, v in model.module.apply(model.variables, x).items()
    }


def test_blockdiag_expand_matches_grouped_f32() -> None:
    """The kernel expansion itself: grouped vs block-diag dense forward
    on the same weights, float32 (zeros contribute exactly zero)."""
    model = HoVerNet(num_types=5, mode="fast")
    model.init(input_shape=(1, 256, 256, 3))
    x = (
        np.random.default_rng(0)
        .integers(0, 255, (1, 256, 256, 3))
        .astype(np.float32)
    )
    ref = _forward(model, x)

    dense_vars = _expand_dense_group_kernels(model.variables, split=4)
    dense_module = model.module.clone(dense_split=1)
    out = {
        k: np.asarray(v) for k, v in dense_module.apply(dense_vars, x).items()
    }
    assert set(out) == {"np", "hv", "tp"}
    for k in ref:
        assert np.abs(out[k] - ref[k]).max() < 1e-5, k


def test_expand_kernel_structure() -> None:
    """Expanded kernels are block-diagonal with the original taps."""
    model = HoVerNet(num_types=None, mode="fast")
    model.init(input_shape=(1, 256, 256, 3))
    params = model.variables["params"]
    kern = np.asarray(params["np"]["u3_dense"]["u0_conv2"]["kernel"])
    assert kern.shape == (3, 3, 32, 32)  # grouped: cin/g = 128/4

    expanded = _expand_dense_group_kernels(model.variables, split=4)
    ek = np.asarray(expanded["params"]["np"]["u3_dense"]["u0_conv2"]["kernel"])
    assert ek.shape == (3, 3, 128, 32)
    diag_mask = np.zeros(ek.shape, bool)
    for g in range(4):
        blk = ek[:, :, g * 32 : (g + 1) * 32, g * 8 : (g + 1) * 8]
        assert np.array_equal(blk, kern[:, :, :, g * 8 : (g + 1) * 8])
        diag_mask[:, :, g * 32 : (g + 1) * 32, g * 8 : (g + 1) * 8] = True
    # everything off the diagonal blocks is exactly zero
    assert not ek[~diag_mask].any()
    # non-dense kernels untouched
    assert np.asarray(
        expanded["params"]["np"]["u3_conva"]["kernel"]
    ).shape == np.asarray(params["np"]["u3_conva"]["kernel"]).shape


def test_optimize_for_inference_gating() -> None:
    """f32 keeps the grouped topology; bf16 switches to block-diag and
    the serving outputs stay numerically equivalent."""
    f32 = HoVerNet(num_types=None, mode="fast")
    f32.init(input_shape=(1, 256, 256, 3))
    f32.optimize_for_inference()
    assert f32.module.dense_split == 4  # bit-exact no-op under f32

    bf16 = HoVerNet(num_types=None, mode="fast", compute_dtype=jnp.bfloat16)
    bf16.init(input_shape=(1, 256, 256, 3))
    bf16.load_weights(f32.variables)  # same f32 weights
    x = (
        np.random.default_rng(1)
        .integers(0, 255, (1, 256, 256, 3))
        .astype(np.uint8)
    )
    before = HoVerNet.infer_batch(bf16, x)
    bf16.optimize_for_inference()
    assert bf16.module.dense_split == 1
    after = HoVerNet.infer_batch(bf16, x)
    for b, a in zip(before, after):
        # bf16 logits; head outputs are f32 probabilities/maps
        assert np.abs(np.asarray(b) - np.asarray(a)).max() < 2e-2
    # idempotent
    bf16.optimize_for_inference()
    assert bf16.module.dense_split == 1


def test_hovernetplus_blockdiag() -> None:
    """HoVerNetPlus inherits the rewrite across all four branches."""
    from tiatoolbox_tpu.models.architecture.hovernetplus import HoVerNetPlus

    model = HoVerNetPlus(
        num_types=3, num_layers=5, compute_dtype=jnp.bfloat16
    )
    model.init(input_shape=(1, 256, 256, 3))
    x = (
        np.random.default_rng(2)
        .integers(0, 255, (1, 256, 256, 3))
        .astype(np.uint8)
    )
    before = HoVerNetPlus.infer_batch(model, x)
    model.optimize_for_inference()
    assert model.module.dense_split == 1
    kern = np.asarray(
        model.variables["params"]["ls"]["u2_dense"]["u0_conv2"]["kernel"]
    )
    assert kern.shape == (3, 3, 128, 32)
    after = HoVerNetPlus.infer_batch(model, x)
    for b, a in zip(before, after):
        b, a = np.asarray(b), np.asarray(a)
        if np.issubdtype(b.dtype, np.floating) and not np.array_equal(
            b, np.round(b)
        ):
            assert np.abs(b - a).max() < 2e-2  # continuous heads (np/hv)
        else:
            # argmax heads (tp/ls): bf16 reassociation may flip
            # near-tied logits on a handful of random-weight pixels
            assert np.mean(b != a) < 0.02
