"""Storage-dtype round trips beyond the native four (u8/f32/f64/bf16).

float16 and signed-integer images are computed in float32 and cast back;
integer targets get Pillow's rounding convention (floor(v + 0.5) clamped
to the dtype range) instead of a truncating cast — generalising the uint8
epilogue the reference applies via Python-side clamp + .byte()
(/root/reference/test.py:71-75).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_antialiasing_tpu as ia
from interpolate_antialiasing_tpu.ops.resize import resize_nd


@pytest.mark.parametrize("dtype", [np.int16, np.int32])
def test_signed_integer_round_half_not_truncate(rng, dtype):
    """Signed-int images resize like uint8 does: f32 compute, then
    floor(v+0.5) clamped — NOT astype truncation (which biases every
    pixel down half an ulp).  Negative values keep the same convention."""
    lo, hi = (-900, 900) if dtype == np.int16 else (-10**6, 10**6)
    x = rng.integers(lo, hi, (2, 3, 40, 56)).astype(dtype)
    y = ia.resize(jnp.asarray(x), (19, 27), method="bicubic")
    assert y.dtype == jnp.dtype(dtype)
    yf = ia.resize(jnp.asarray(x, jnp.float32), (19, 27), method="bicubic")
    info = np.iinfo(dtype)
    want = np.clip(
        np.floor(np.asarray(yf) + 0.5), info.min, info.max
    ).astype(dtype)
    np.testing.assert_array_equal(np.asarray(y), want)


def test_int32_extremes_clamp_without_overflow():
    """A constant plane at int32 max must come back clamped to the largest
    float32-representable int32 (2147483520) — not wrap negative through
    an overflowing float->int cast (float32(2**31 - 1) rounds UP to 2**31)."""
    x = jnp.full((1, 1, 16, 16), np.iinfo(np.int32).max, jnp.int32)
    y = np.asarray(ia.resize(x, (8, 8)))
    assert y.dtype == np.int32
    assert np.all(y > 0), "overflowed float->int32 cast wrapped negative"
    assert np.all(y >= 2147483392)  # within a few f32 ulps of the max


def test_float16_computes_in_float32(rng):
    """f16 storage resizes through f32 arithmetic (TPU has no native f16;
    the 10-bit mantissa would quantise the weights) and casts back — the
    result is exactly the f32 resize cast to f16."""
    x = rng.random((2, 3, 33, 47)).astype(np.float16)
    y = ia.resize(jnp.asarray(x), (17, 23), method="bilinear")
    assert y.dtype == jnp.float16
    ref = ia.resize(jnp.asarray(x, jnp.float32), (17, 23), method="bilinear")
    np.testing.assert_array_equal(
        np.asarray(y), np.asarray(ref).astype(np.float16)
    )


def test_resize_nd_integer_round_trip(rng):
    """resize_nd applies the same integer epilogue as resize(): an int16
    volume comes back int16 and rounded, not truncated (it previously
    leaked the raw float32 intermediate for non-uint8 integers)."""
    x = rng.integers(-500, 500, (2, 12, 14, 18)).astype(np.int16)
    y = resize_nd(jnp.asarray(x), [7, 9, 11], axes=(-3, -2, -1))
    assert y.dtype == jnp.int16 and y.shape == (2, 7, 9, 11)
    yf = resize_nd(jnp.asarray(x, jnp.float32), [7, 9, 11], axes=(-3, -2, -1))
    want = np.floor(np.asarray(yf) + 0.5).astype(np.int16)
    np.testing.assert_array_equal(np.asarray(y), want)


def test_crop_and_resize_preserves_storage_dtype(rng):
    """crop_and_resize follows the same policy: bf16/f16/f64 inputs come
    back in their own dtype (it used to leak the f32 intermediate for any
    non-uint8 input) and integer inputs round+clamp like resize()."""
    b = jnp.asarray([[0.1, 0.1, 0.9, 0.9]])
    for dt in (jnp.bfloat16, jnp.float16, jnp.float64):
        x = jnp.asarray(rng.random((1, 1, 16, 16)), dt)
        assert ia.crop_and_resize(x, b, (8, 8)).dtype == dt
    xi = jnp.asarray(rng.integers(-900, 900, (1, 1, 16, 16)), jnp.int16)
    yi = ia.crop_and_resize(xi, b, (8, 8))
    assert yi.dtype == jnp.int16
    yf = ia.crop_and_resize(xi.astype(jnp.float32), b, (8, 8))
    np.testing.assert_array_equal(
        np.asarray(yi), np.floor(np.asarray(yf) + 0.5).astype(np.int16)
    )


def test_output_dtype_integer_from_float_input(rng):
    """output_dtype=int16 on a float input rounds + clamps through the
    same epilogue (values far outside int16 saturate, not wrap)."""
    x = (rng.random((1, 1, 20, 20)) * 1e6 - 5e5).astype(np.float32)
    y = np.asarray(
        ia.resize(jnp.asarray(x), (10, 10), output_dtype=jnp.int16)
    )
    assert y.dtype == np.int16
    assert np.any(y == np.iinfo(np.int16).max) and np.any(
        y == np.iinfo(np.int16).min
    ), "saturation bounds not exercised"
