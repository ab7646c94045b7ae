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
to exact equality.

Two execution paths, byte-identical by construction:

  * **XLA int32 path** (CPU / fallback): dense integer ``dot_general`` per
    axis — simple, the oracle of the oracle.
  * **Pallas digit-split path** (TPU): each int32 coefficient is decomposed
    into three balanced base-256 digits ``k = d2*2^16 + d1*2^8 + d0`` with
    ``d_i in [-128, 128)``.  Every digit plane is *exact* in bfloat16 and
    every product ``d_i * pixel`` fits 15 bits, so each 1-D pass is three
    native-rate bf16 MXU matmuls with exact f32 accumulation (all partial
    sums stay integers < 2^24), recombined in int32 on the VPU:
    ``acc = (S2 << 16) + (S1 << 8) + S0 + 2^21``, then ``acc >> 22`` and
    clip — bit-for-bit Pillow's fixed-point accumulate.  Both separable
    passes (uint8 intermediate included) run in ONE pallas_call per image
    block, making the bit-exact backend as fast as the float fast path
    instead of a dense int32 matmul (round-1 state: 3x slower).
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


def _split_digits(K: np.ndarray) -> np.ndarray:
    """Balanced base-256 digit planes of an int32 coefficient matrix.

    Returns ``D[3, out, in]`` float32 with ``K = D[2]*2^16 + D[1]*2^8 + D[0]``
    and every digit in ``[-128, 128]`` — exactly representable in bfloat16
    (7 fraction bits + implicit 1 covers integers to ±256).
    """
    k = K.astype(np.int64)
    d0 = ((k + 128) % 256) - 128
    k1 = (k - d0) >> 8
    d1 = ((k1 + 128) % 256) - 128
    d2 = (k1 - d1) >> 8
    assert np.abs(d2).max() <= 255, "coefficient exceeds 3 balanced digits"
    return np.stack([d0, d1, d2]).astype(np.float32)


@cache
def _digit_tiles(in_size: int, out_size: int, mode: str):
    """Tile-compacted digit bands for the Pallas path.

    One window layout (starts, k_in) derived from the full coefficient
    matrix's nonzero structure, shared by all three digit planes:
    ``bands[3, n_tiles, k_in, 128]`` bfloat16 (digits are bf16-exact).
    """
    from .weights import banded_tiles_from_matrix

    K = _int_matrix(in_size, out_size, mode)
    base = banded_tiles_from_matrix(
        K.astype(np.float64), tile=128, dtype=np.float32, align=1,
        in_cap=in_size,
    )
    D = _split_digits(K)  # [3, out, in]
    n_tiles, k_in = base.n_tiles, base.k_in
    bands = np.zeros((3, n_tiles, k_in, 128), dtype=np.float32)
    for t in range(n_tiles):
        s = int(base.starts[t])
        rows = D[:, t * 128 : min((t + 1) * 128, out_size), :]
        seg = rows[:, :, s : min(s + k_in, in_size)]
        bands[:, t, : seg.shape[2], : seg.shape[1]] = np.swapaxes(seg, 1, 2)
    # NB: return a *numpy* bf16 array, never a jax array: this function is
    # @cache'd and may first run inside a jit trace, where jnp.asarray
    # yields a DynamicJaxprTracer constant — caching that tracer leaks it
    # into every later trace (UnexpectedTracerError on the second jit;
    # caught by the sustained benchmark sweep, round 2).  Callers convert.
    return base, bands.astype(jnp.bfloat16)


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


# ---------------------------------------------------------------------------
# Pallas single-kernel digit-split pipeline (TPU fast path, bit-identical)
# ---------------------------------------------------------------------------


def _fixup_int(S0, S1, S2):
    """Recombine exact digit sums into Pillow's int32 accumulator and clip:
    ``clip8((S2<<16) + (S1<<8) + S0 + 2^21)`` — every S is an f32-held exact
    integer (|S| < 2^24), so the int32 casts are exact."""
    acc = (
        jax.lax.shift_left(S2.astype(jnp.int32), jnp.int32(16))
        + jax.lax.shift_left(S1.astype(jnp.int32), jnp.int32(8))
        + S0.astype(jnp.int32)
        + jnp.int32(1 << (PRECISION_BITS - 1))
    )
    v = jax.lax.shift_right_arithmetic(acc, jnp.int32(PRECISION_BITS))
    return jnp.clip(v, jnp.int32(0), jnp.int32(255))


def _kernel_2pass_pil(
    x_ref, bandw_ref, bandh_ref, o_ref, scratch,
    *, bsz, OH, OW, starts_w, k_in_w, starts_h, k_in_h,
):
    """Both Pillow fixed-point passes (uint8 intermediate included) in one
    kernel: per axis, 3 bf16 digit matmuls + int32 recombine."""
    for bi in range(bsz):
        # pass 1 (W, Pillow's horizontal-first order) -> u8 values in scratch
        for t, s in enumerate(starts_w):
            win = x_ref[bi, :, s : s + k_in_w].astype(jnp.int32).astype(
                jnp.bfloat16
            )  # u8 pixels are bf16-exact
            S = [
                jax.lax.dot_general(
                    win, bandw_ref[d, t], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for d in range(3)
            ]
            u8 = _fixup_int(*S)
            scratch[bi, :, t * 128 : (t + 1) * 128] = u8.astype(
                jnp.bfloat16
            )  # values <= 255: bf16-exact
        # pass 2 (H) on the quantised intermediate -> u8 output rows
        for t, s in enumerate(starts_h):
            win = scratch[bi, s : s + k_in_h, :]
            S = [
                jax.lax.dot_general(
                    bandh_ref[d, t], win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for d in range(3)
            ]
            u8 = _fixup_int(*S)
            rows = min(128, OH - t * 128)
            o_ref[bi, t * 128 : t * 128 + rows, :OW] = (
                u8[:rows, :OW].astype(jnp.uint8)
            )


def _pil_vmem_bytes(H, W, OH, OW, btw, bth, bsz) -> int:
    def up(a, m):
        return -(-a // m) * m

    band = 3 * (btw.n_tiles * btw.k_in + bth.n_tiles * bth.k_in) * 128 * 2
    per_img = (
        up(H, 32) * up(W, 128) * 2  # u8 in, double buffered
        + up(H, 16) * btw.out_padded * 2  # bf16 intermediate scratch
        + up(OH, 32) * up(OW, 128) * 2  # u8 out, double buffered
    )
    return band + bsz * per_img


_PIL_VMEM_BUDGET = 12 * 1024 * 1024
_PIL_MAX_TILES = 32


def pil_exact_pallas_supported(shape, oh, ow, method: str) -> bool:
    if method == "pil_nearest":
        return False
    if len(shape) < 2:
        return False
    H, W = shape[-2], shape[-1]
    btw, _ = _digit_tiles(W, ow, method)
    bth, _ = _digit_tiles(H, oh, method)
    if btw.k_in > W or bth.k_in > H:
        return False
    if btw.n_tiles > _PIL_MAX_TILES or bth.n_tiles > _PIL_MAX_TILES:
        return False
    return _pil_vmem_bytes(H, W, oh, ow, btw, bth, 1) <= _PIL_VMEM_BUDGET


def _resize_pil_exact_pallas(x3: jax.Array, oh: int, ow: int, method: str):
    """x3: uint8 [B, H, W] -> uint8 [B, oh, ow], bit-identical to Pillow."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = x3.shape
    btw, bandsw = _digit_tiles(W, ow, method)
    bth, bandsh = _digit_tiles(H, oh, method)
    bsz = 1
    for cand in range(min(8, B), 0, -1):
        if B % cand == 0 and _pil_vmem_bytes(
            H, W, oh, ow, btw, bth, cand
        ) <= _PIL_VMEM_BUDGET:
            bsz = cand
            break
    kern = _partial(
        _kernel_2pass_pil,
        bsz=bsz,
        OH=oh,
        OW=ow,
        starts_w=tuple(int(s) for s in btw.starts),
        k_in_w=btw.k_in,
        starts_h=tuple(int(s) for s in bth.starts),
        k_in_h=bth.k_in,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, oh, ow), jnp.uint8),
        grid=(B // bsz,),
        in_specs=[
            pl.BlockSpec((bsz, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, btw.n_tiles, btw.k_in, 128),
                         lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bth.n_tiles, bth.k_in, 128),
                         lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsz, oh, ow), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bsz, H, btw.out_padded), jnp.bfloat16)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * (H * btw.k_in * btw.out_padded
                               + bth.k_in * bth.out_padded * btw.out_padded),
            bytes_accessed=B * (H * W + oh * ow),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, bandsw, bandsh)


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
    # TPU fast path: single-kernel digit-split pipeline (bit-identical).
    if jax.default_backend() == "tpu":
        trailing = h_axis == x.ndim - 2 and w_axis == x.ndim - 1
        channels_last = (
            x.ndim >= 3 and h_axis == x.ndim - 3 and w_axis == x.ndim - 2
        )
        xk = x
        if channels_last:  # C-sized lanes waste the MXU; transpose round-trip
            xk = jnp.moveaxis(x, -1, -3)
        if (trailing or channels_last) and pil_exact_pallas_supported(
            xk.shape, oh, ow, method
        ):
            from ..config import debug_enabled

            if debug_enabled():
                print("[ia-tpu] pil_exact digit-split single-kernel")
            lead = xk.shape[:-2]
            B = int(np.prod(lead)) if lead else 1
            y = _resize_pil_exact_pallas(
                xk.reshape(B, xk.shape[-2], xk.shape[-1]), oh, ow, method
            ).reshape(*lead, oh, ow)
            return jnp.moveaxis(y, -3, -1) if channels_last else y
    Mh = jnp.asarray(_int_matrix(x.shape[h_axis], oh, method))
    Mw = jnp.asarray(_int_matrix(x.shape[w_axis], ow, method))
    # Pillow: horizontal pass first, uint8 intermediate, then vertical.
    y = jnp.moveaxis(x, w_axis, -1)
    y = _pass_last_int(y, Mw)
    y = jnp.moveaxis(y, -1, w_axis)
    y = jnp.moveaxis(y, h_axis, -1)
    y = _pass_last_int(y, Mh)
    return jnp.moveaxis(y, -1, h_axis)
