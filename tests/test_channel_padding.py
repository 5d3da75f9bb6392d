"""Zero channel padding is numerics-preserving (VERDICT r02 item 2).

The round-2 review proposed padding the 64-channel stage-1 convs to
MXU-friendly multiples, asserting (correctly) that zero-padding conv
input/output channels preserves the model's outputs. These tests pin
down exactly how true that is: the padded lanes carry exact zeros end
to end, and the real channels match to reduction-order noise (~1e-5
relative — XLA blocks the 2x-larger contraction differently, so the
summation tree over the real products changes; x+0 is exact but
reassociation is not). The decision NOT to ship the transform rests on
the measured wall-time regression (scripts/mfu_experiments.py: the
padded conv executes 4x the MACs at 95% vs 79% efficiency, i.e. 3.3x
slower), not on numerics.
"""

from __future__ import annotations

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def _conv(x, k, stride=1):
    return lax.conv_general_dilated(
        x, k, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_padded_conv_matches_unpadded() -> None:
    """Cin 64->128 (zero rows) + Cout 64->128 (zero cols): real lanes
    match to reduction-order noise; padded lanes are exactly zero."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 14, 14, 64)).astype(np.float32)
    k = rng.standard_normal((3, 3, 64, 64)).astype(np.float32)

    x_pad = np.concatenate([x, np.zeros((2, 14, 14, 64), np.float32)], axis=-1)
    k_pad = np.zeros((3, 3, 128, 128), np.float32)
    k_pad[:, :, :64, :64] = k

    ref = np.asarray(_conv(jnp.asarray(x), jnp.asarray(k)))
    got = np.asarray(_conv(jnp.asarray(x_pad), jnp.asarray(k_pad)))
    np.testing.assert_allclose(got[..., :64], ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[..., 64:], 0.0)


def test_padded_residual_block_chain() -> None:
    """conv -> BN-affine -> relu -> conv -> residual add, padded end to end.

    The padded lanes carry exact zeros through the whole block (BN on a
    padded lane uses scale=0/bias=0 -> 0; relu(0)=0; the next conv's
    padded input rows are zero), so chaining compounds only
    reduction-order noise — the property that would have let a padded
    stage 1 feed stage 2 with its outputs intact.
    """
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 64)).astype(np.float32)
    k1 = rng.standard_normal((3, 3, 64, 64)).astype(np.float32)
    k2 = rng.standard_normal((3, 3, 64, 64)).astype(np.float32)
    mul = rng.standard_normal(64).astype(np.float32)
    add = rng.standard_normal(64).astype(np.float32)

    def block(xv, ka, kb, m, a):
        out = _conv(xv, ka) * m + a
        out = jax.nn.relu(out)
        out = _conv(out, kb)
        return jax.nn.relu(out + xv)

    ref = np.asarray(block(jnp.asarray(x), jnp.asarray(k1), jnp.asarray(k2),
                           jnp.asarray(mul), jnp.asarray(add)))

    def pad_k(k):
        kp = np.zeros((3, 3, 128, 128), np.float32)
        kp[:, :, :64, :64] = k
        return jnp.asarray(kp)

    x_pad = jnp.asarray(np.concatenate(
        [x, np.zeros((2, 8, 8, 64), np.float32)], axis=-1))
    mul_pad = jnp.asarray(np.concatenate([mul, np.zeros(64, np.float32)]))
    add_pad = jnp.asarray(np.concatenate([add, np.zeros(64, np.float32)]))

    got = np.asarray(block(x_pad, pad_k(k1), pad_k(k2), mul_pad, add_pad))
    np.testing.assert_allclose(got[..., :64], ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(got[..., 64:], 0.0)


def test_bf16_padded_conv_matches() -> None:
    """Same property holds in the bf16 serving dtype (zero products are
    exact in any float format; tolerance covers bf16 reassociation)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 8, 64)).astype(jnp.bfloat16)
    k = rng.standard_normal((3, 3, 64, 64)).astype(jnp.bfloat16)
    x_pad = jnp.concatenate([jnp.asarray(x), jnp.zeros((2, 8, 8, 64), jnp.bfloat16)], -1)
    k_pad = jnp.zeros((3, 3, 128, 128), jnp.bfloat16).at[:, :, :64, :64].set(jnp.asarray(k))
    ref = np.asarray(_conv(jnp.asarray(x), jnp.asarray(k)).astype(jnp.float32))
    got = np.asarray(_conv(x_pad, k_pad).astype(jnp.float32))
    np.testing.assert_allclose(got[..., :64], ref, rtol=2e-2, atol=2e-2)
