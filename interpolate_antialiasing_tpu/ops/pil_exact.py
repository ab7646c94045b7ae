"""Bit-exact Pillow uint8 resize (MaxAbsE = 0 against PIL.Image.resize).

The fast banded-MXU paths compute in float and land within MaxAbsE <= 1 of
Pillow — the residual ±1 is *Pillow's* 8-bit fixed-point quantisation, not
ours.  This module goes the other way: it emulates Pillow's integer pipeline
exactly (Pillow `src/libImaging/Resample.c`, 8bpc path), so outputs are
bit-identical:

  * coefficients: double weights scaled by ``1 << PRECISION_BITS`` and
    rounded half-away-from-zero (``normalize_coeffs_8bpc``),
  * per-pass accumulate in int32 starting from ``1 << (PRECISION_BITS-1)``,
    then arithmetic-shift and clip to uint8 (``clip8``),
  * horizontal pass first, producing a *uint8 intermediate image*, then the
    vertical pass on that (the intermediate quantisation is exactly why
    float pipelines differ by ±1).

The reference could only assert MaxAbsE <= 1 against this behaviour
(test.py:370-372); emulating the integer pipeline upgrades the oracle test
to exact equality.  Everything is jnp int32 arithmetic (XLA integer
dot_general), so it runs under jit on CPU and TPU — it is a *parity/oracle
backend*, not the fast path.
"""

from __future__ import annotations

from functools import cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .weights import dense_matrix, make_axis_spec

__all__ = ["resize_pil_exact", "PRECISION_BITS"]

PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c


@cache
def _int_matrix(in_size: int, out_size: int, mode: str) -> np.ndarray:
    """Dense [out, in] int32 coefficient matrix, Pillow-normalised
    (normalize_coeffs_8bpc: trunc(w * 2^22 ± 0.5), i.e. round half away
    from zero — applied to the float64 banded matrix, whose zeros quantise
    to zero)."""
    spec = make_axis_spec(in_size, out_size, mode, antialias=True)
    W = dense_matrix(spec, dtype=np.float64)
    scaled = W * (1 << PRECISION_BITS)
    return np.where(scaled < 0, scaled - 0.5, scaled + 0.5).astype(np.int32)


@cache
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Pillow NEAREST source indices: Image.resize(NEAREST) goes through the
    incremental affine scaler (ImagingScaleAffine), which starts at
    ``xin = 0.5 * a`` and truncates after repeated ``xin += a`` float64
    additions — the accumulation drift is observable and must be reproduced
    addition-by-addition for bit parity (verified empirically across
    down/up/mixed sizes)."""
    a = in_size / out_size
    xin = a * 0.5
    idx = np.empty(out_size, np.int32)
    for o in range(out_size):
        idx[o] = min(max(int(xin), 0), in_size - 1)
        xin += a
    return idx


def _clip8(acc: jax.Array) -> jax.Array:
    """Pillow clip8: arithmetic shift then clamp to [0, 255]."""
    v = acc >> PRECISION_BITS
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def _pass_last_int(x_u8: jax.Array, M: jax.Array) -> jax.Array:
    """uint8 [..., in] -> uint8 [..., out] via int32 fixed-point MAC."""
    acc = jax.lax.dot_general(
        x_u8.astype(jnp.int32),
        M.T,
        (((x_u8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _clip8(acc + (1 << (PRECISION_BITS - 1)))


def resize_pil_exact(
    x: jax.Array,
    size: Sequence[int],
    method: str = "bilinear",
    data_format: str | None = None,
) -> jax.Array:
    """Bit-identical Pillow antialiased uint8 resize.

    ``x``: uint8 ``[H, W]``, ``[C, H, W]``, ``[N, C, H, W]`` (or NHWC via
    ``data_format``).  ``size``: ``(height, width)``.  Matches
    ``PIL.Image.resize((w, h), resample)`` exactly, byte for byte —
    verified per mode/size in tests/test_pil_exact.py.
    """
    from .resize import _axes_for

    if x.dtype != jnp.uint8:
        raise ValueError("resize_pil_exact is the uint8 (8bpc) pipeline")
    oh, ow = int(size[0]), int(size[1])
    h_axis, w_axis = _axes_for(x, data_format)
    h_axis, w_axis = h_axis % x.ndim, w_axis % x.ndim
    if method == "pil_nearest":
        # PIL.Image.NEAREST is a point sample through the affine scaler,
        # not the resample machinery — a pure index gather, trivially
        # bit-exact.  It is named 'pil_nearest' here because this library
        # (following the reference, test.py) uses 'nearest' for PIL's BOX
        # antialias filter; the two are very different resamplers.
        y = jnp.take(x, jnp.asarray(_nearest_indices(x.shape[h_axis], oh)),
                     axis=h_axis)
        return jnp.take(y, jnp.asarray(_nearest_indices(x.shape[w_axis], ow)),
                        axis=w_axis)
    Mh = jnp.asarray(_int_matrix(x.shape[h_axis], oh, method))
    Mw = jnp.asarray(_int_matrix(x.shape[w_axis], ow, method))
    # Pillow: horizontal pass first, uint8 intermediate, then vertical.
    y = jnp.moveaxis(x, w_axis, -1)
    y = _pass_last_int(y, Mw)
    y = jnp.moveaxis(y, -1, w_axis)
    y = jnp.moveaxis(y, h_axis, -1)
    y = _pass_last_int(y, Mh)
    return jnp.moveaxis(y, -1, h_axis)
