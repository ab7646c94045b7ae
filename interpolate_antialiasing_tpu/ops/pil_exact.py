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
    ``d_i in [-128, 127]`` — native int8 MXU operands.  Pixels enter the
    MXU as ``xs = x - 128`` (int8); each 1-D pass is three int8 matmuls
    with int32 accumulation (exact by construction), recombined on the
    VPU with a per-output constant that restores the unsigned accumulate
    and adds Pillow's rounding bias: ``acc = (S2<<16) + (S1<<8) + S0 +
    (128*colsum(K) + 2^21)``, then ``acc >> 22`` and clip — bit-for-bit
    Pillow's fixed-point pipeline (shifted partials may wrap int32; the
    true accumulator fits, so modular addition cancels the wrap).  Both
    separable passes (uint8 intermediate included, stored signed) run in
    ONE pallas_call per image block.  v5e's int8 matmul path measures
    ~2.5x the bf16 rate in-session, which makes the BIT-EXACT backend the
    fastest uint8 path in the library — round 1 ran this as a dense int32
    XLA matmul 3x slower than float; round 2 as 3 bf16 matmuls at ~0.9x
    float; round 2b's int8 digits overtake the float path outright.
"""

from __future__ import annotations

import math
from functools import cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import debug_enabled
from .pallas_compat import block_spec as _bspec
from .weights import _round_up, make_axis_spec, pil_box_f32

__all__ = ["resize_pil_exact", "reduce_pil_exact", "PRECISION_BITS"]

PRECISION_BITS = 32 - 8 - 2  # Pillow Resample.c


@cache
def _int_matrix(
    in_size: int, out_size: int, mode: str,
    span: tuple[float, float] | None = None,
    pb: int = PRECISION_BITS,
) -> np.ndarray:
    """Dense [out, in] int32 coefficient matrix, Pillow-normalised
    (normalize_coeffs_8bpc: trunc(w * 2^pb ± 0.5), i.e. round half away
    from zero, zeros quantising to zero; Pillow's own pb is 22).  Scatter
    of the banded :func:`_int_tables` — the quantisation itself lives
    there, once."""
    xmin, Wb = _int_tables(in_size, out_size, mode, span, pb)
    ntaps = Wb.shape[1]
    K = np.zeros((out_size, in_size), np.int32)
    rows = np.repeat(np.arange(out_size), ntaps)
    cols = (xmin[:, None].astype(np.int64) + np.arange(ntaps)[None, :]).reshape(-1)
    keep = (cols >= 0) & (cols < in_size)
    K[rows[keep], cols[keep]] = Wb.reshape(-1)[keep]
    return K


@cache
def _nearest_indices(
    in_size: int, out_size: int,
    span: tuple[float, float] | None = None,
) -> np.ndarray:
    """Pillow NEAREST source indices: Image.resize(NEAREST) goes through the
    incremental affine scaler (ImagingScaleAffine), which starts at
    ``xin = 0.5 * a`` and truncates after repeated ``xin += a`` float64
    additions — the accumulation drift is observable and must be reproduced
    addition-by-addition for bit parity (verified empirically across
    down/up/mixed sizes).  With a resize ``box``, the affine coefficients
    become ``a = (hi - lo) / out`` and the start ``lo + 0.5 * a``
    (_imaging.c ``_resize`` NEAREST branch) — with the box coords rounded
    through C float and the span length subtracted in float32 before the
    double divide (the box is parsed as ``float[4]``; see
    :func:`..weights.pil_box_f32`)."""
    if span is not None:
        lo, _, span_len = pil_box_f32(*span)
    else:
        lo, span_len = 0.0, float(in_size)
    a = span_len / out_size
    xin = lo + a * 0.5
    idx = np.empty(out_size, np.int32)
    for o in range(out_size):
        idx[o] = min(max(int(xin), 0), in_size - 1)
        xin += a
    return idx


def _split_digits(K: np.ndarray, ndig: int = 3) -> np.ndarray:
    """Balanced base-256 digit planes of an int32 coefficient matrix.

    Returns ``D[ndig, out, in]`` int8 with ``K = sum_i D[i] * 256^i`` and
    every digit in ``[-128, 127]`` — each plane is a native int8 MXU
    operand (v5e's int8 matmul path runs ~2.5x the bf16 rate, measured
    in-session; see docs/BENCHMARKS.md).  ``ndig=3`` covers Pillow's own
    pb=22 coefficients; ``ndig=2`` the pb=14 fast-dial grid.
    """
    k = K.astype(np.int64)
    digs = []
    for i in range(ndig):
        if i == ndig - 1:
            d = k  # top digit: remaining headroom
        else:
            d = ((k + 128) % 256) - 128
        digs.append(d)
        k = (k - d) >> 8
    assert np.abs(digs[-1]).max() <= 127, (
        f"coefficient exceeds {ndig} int8 digits")
    return np.stack(digs).astype(np.int8)


@cache
def _digit_tiles(in_size: int, out_size: int, mode: str, align: int = 1,
                 tile: int = 128, pitch: int | None = None,
                 pb: int = PRECISION_BITS, ndig: int = 3):
    """Tile-compacted digit bands + rounding/bias constants (Pallas path).

    One window layout (starts, k_in) derived from the full coefficient
    matrix's nonzero structure, shared by all three digit planes:
    ``bands[n_tiles, k_in, 3*128]`` int8 (digit planes side by side along
    the lane dim — one MXU matmul per tile).  The kernel feeds the MXU
    *signed* pixels ``xs = x - 128`` (uint8 does not fit int8), so the
    per-output constant ``ct[t, u] = 128 * sum_h K[o,h] + 2^(PB-1)``
    restores the unsigned accumulate AND carries Pillow's rounding bias;
    int32 addition is associative mod 2^32 and the true accumulator fits
    int32, so wrap-around in the shifted partial sums cancels exactly.

    ``align=1`` keeps windows inside the unpadded input (the whole-image
    kernel's exact blocks); ``align=8`` produces 8-aligned window starts
    against the 8-row-padded input (the streamed kernel's DMA contract,
    cf. pallas_resize._tiles_stream_cached).

    ``tile`` is the output-tile width (digit planes at lane offsets 0,
    ``pitch``, ``2*pitch``; ``pitch`` defaults to ``tile``).  The H pass
    uses sub-128 tiles when that lands the contraction width ``k_in`` on
    a smaller multiple of the MXU's 128-deep K pass (the round-3 geometry
    study: int8 matmul time goes as ``ceil(K/128)``, so e.g. K=287 -> 384
    effective pays 33% more MXU time than a 112-wide tile's K<=256);
    digit slicing there is along result *sublanes*, where non-128 offsets
    are free.  The W pass slices digits along result LANES, where only
    128-multiple offsets are free — so its sub-128 tiles keep
    ``pitch=128`` (digit planes at fixed lane offsets 0/128/256, the top
    ``128-tile`` lanes of each group zero-padded) and the caller compacts
    the strided output lanes once, on the final uint8 array (see
    :func:`_pick_tile_w`).
    """
    from .weights import banded_tiles_from_matrix

    pitch = tile if pitch is None else pitch
    assert pitch >= tile
    cap = in_size if align == 1 else -(-in_size // align) * align
    K = _int_matrix(in_size, out_size, mode, None, pb)
    base = banded_tiles_from_matrix(
        K.astype(np.float64), tile=tile, dtype=np.float32, align=align,
        in_cap=cap,
    )
    D = _split_digits(K, ndig)  # [ndig, out, in] int8
    n_tiles, k_in = base.n_tiles, base.k_in
    # digit planes concatenated along the output (lane) dim: one
    # [k_in, ndig*pitch] int8 matmul per tile instead of ndig [k_in, tile]
    # ones — the MXU amortises the weight load over ndig x the output cols.
    bands = np.zeros((n_tiles, k_in, ndig * pitch), dtype=np.int8)
    ct = np.zeros((n_tiles, pitch), dtype=np.int64)
    colsum = K.astype(np.int64).sum(axis=1)  # [out]
    for t in range(n_tiles):
        s = int(base.starts[t])
        o1 = min((t + 1) * tile, out_size)
        rows = D[:, t * tile : o1, :]
        seg = rows[:, :, s : min(s + k_in, in_size)]
        for d in range(ndig):
            bands[t, : seg.shape[2], d * pitch : d * pitch + seg.shape[1]] = (
                np.swapaxes(seg[d], 0, 1)
            )
        ct[t, : o1 - t * tile] = 128 * colsum[t * tile : o1]
    ct += 1 << (pb - 1)
    assert np.abs(ct).max() < 2**31
    # NB: return *numpy* arrays, never jax arrays: this function is
    # @cache'd and may first run inside a jit trace, where jnp.asarray
    # yields a DynamicJaxprTracer constant — caching that tracer leaks it
    # into every later trace (UnexpectedTracerError on the second jit;
    # caught by the sustained benchmark sweep, round 2).  Callers convert.
    return base, bands, ct.astype(np.int32)


@cache
def _pick_tile_h(in_size: int, out_size: int, mode: str,
                 align: int = 1) -> int:
    """Output-tile width for the H pass, chosen by the MXU cost model.

    The round-3 on-chip geometry study measured int8 matmul time as
    ``M_eff * ceil(K/128)*128 * N_eff`` (K consumed in 128-deep passes;
    see benchmarks/mxu_geometry.py and docs/BENCHMARKS.md).  The H-pass
    matmul per tile is ``[k_in, 3*T] x [k_in, OWp]`` with K = k_in ~
    T*scale + ntaps, so shrinking T below 128 can drop ``ceil(K/128)``
    by a whole MXU pass while the digit-recombine slices stay on result
    sublanes (8-granular, free).  Cost = sum over tiles of
    ceil(k_in/128)*128 * roundup(3T, N_QUANT) plus a per-tile fixed
    cost (the measured ~1 us/grid-step analogue at matmul scale).
    Model constants and the pick loop live in ops/mxu_model.py (one copy
    for all three pickers).
    """
    from . import mxu_model

    # streamed (align=8) output blocks are BlockSpec-indexed at t*tile_h, so
    # the u8 (32, 128) memory tiling demands 32-multiples; the whole-image
    # kernel stores *inside* one block (masked sublane stores), so any
    # 8-multiple works there.
    forced = mxu_model.env_tile(
        "IA_TPU_PIL_TILE_H",  # bench/experiment knob
        quantum=32 if align == 8 else 8,
    )
    if forced is not None:
        return forced
    K = _int_matrix(in_size, out_size, mode)
    nz = K != 0
    lo = np.argmax(nz, axis=1)
    hi = in_size - np.argmax(nz[:, ::-1], axis=1)  # exclusive
    # candidate floor 32 (was 56): the round-4 headline sweep measured
    # tile 40 fastest (0.2921 vs 0.2995 ms at the old pick 56) — with the
    # retuned TILE_FIXED_COST the model reproduces that optimum, and the
    # sub-56 widths are legal for the whole-image kernel (masked sublane
    # stores, any 8-multiple).
    cands = range(128, 31, -8) if align == 1 else (128, 96, 64, 32)
    return mxu_model.pick_tile(
        out_size=out_size,
        in_size=in_size,
        lo=lo,
        hi=hi,
        cands=cands,
        per_tile_cost=lambda t, keff: (
            keff * _round_up(3 * t, mxu_model.N_QUANT)
            + mxu_model.TILE_FIXED_COST
        ),
        align=align,
        max_tiles=_PIL_MAX_TILES,
    )


@cache
def _pick_tile_w(in_size: int, out_size: int, mode: str, k_rows: int,
                 tile_h: int) -> int:
    """Output-tile width for the streamed kernel's W pass (MXU cost model).

    The W pass slices digit sums along result LANES, so the digit planes
    must stay at fixed 128-lane offsets (``_digit_tiles`` ``pitch=128``)
    and the matmul's N stays 3*128 whatever the tile width — but K
    (``k_in ~ tile*scale + ntaps``) still quantises to 128-deep MXU
    passes, so a sub-128 tile can drop a whole pass: at the 4K->HD
    geometry (scale 2) tile 120 lands K=246 -> 2 passes where tile 128
    pays K=262 -> 3.  The price, unlike the H knob, is real: each extra
    W tile adds 128 garbage lanes the H matmul contracts over
    (``N_h = n_tiles*128``) and one lane-strided slice in the final
    output compaction.  Cost model (full M*K_eff*N units, both passes):

      cost(T) = n_tiles(T) * ( k_rows * roundup(k_in(T), 128) * 384
                               + 3*tile_h * roundup(k_rows, 128) * 128
                               + fixed )

    ``IA_TPU_PIL_TILE_W`` forces a width for on-chip sweeps
    (benchmarks/tile_h_sweep.py's 4k_stream_w sweep is the end-to-end
    ground truth).  Model constants and the pick loop live in
    ops/mxu_model.py (one copy for all three pickers).
    """
    from . import mxu_model

    # quantum 8: digit-lane groups sit at fixed 128-lane pitch whatever
    # the tile, but the per-tile output slice is sublane-copied in
    # 8-granular chunks; >128 is not a valid digit-lane layout.
    forced = mxu_model.env_tile("IA_TPU_PIL_TILE_W", quantum=8)
    if forced is not None:
        return forced
    K = _int_matrix(in_size, out_size, mode)
    nz = K != 0
    lo = np.argmax(nz, axis=1)
    hi = in_size - np.argmax(nz[:, ::-1], axis=1)  # exclusive
    h_term = 3 * tile_h * _round_up(k_rows, 128) * 128
    return mxu_model.pick_tile(
        out_size=out_size,
        in_size=in_size,
        lo=lo,
        hi=hi,
        cands=range(128, 63, -8),
        per_tile_cost=lambda t, keff: (
            k_rows * keff * 384 + h_term + mxu_model.TILE_W_FIXED_COST
        ),
        max_tiles=_PIL_MAX_TILES,
    )


@cache
def _needs_clip(in_size: int, out_size: int, mode: str) -> bool:
    """Whether the clip in Pillow's clip8 can actually fire for this axis.

    For a NON-NEGATIVE coefficient row (bilinear/box/hamming — checked on
    the actual matrix, not a mode list) the accumulator is provably in
    range: ``acc = sum K*x + 2^21`` with ``x in [0,255]`` gives
    ``0 < acc <= 255*colsum + 2^21``, and per-coefficient rounding bounds
    ``colsum <= 2^22 + ntaps/2``, so ``acc >> 22 in [0, 255]`` always
    (``255*ntaps/2 + 2^21 < 2^22`` for any real ntaps).  Dropping the two
    clamp ops then changes nothing byte-wise but trims the VPU recombine
    epilogue — the measured bottleneck of the digit kernels.  Negative
    lobes (bicubic/lanczos) genuinely overshoot: keep the clip.
    """
    K = _int_matrix(in_size, out_size, mode)
    if K.min() < 0:
        return True
    assert K.astype(np.int64).sum(axis=1).max() <= (1 << PRECISION_BITS) + (
        1 << 12
    ), "colsum slack assumption violated"
    return False


def _use_tpu_kernels() -> bool:
    """Route gate for the digit kernels (separate from the pallas
    ``interpret`` flag so tests can exercise the routing on CPU)."""
    return jax.default_backend() == "tpu"


def _clip8(acc: jax.Array, pb: int = PRECISION_BITS) -> jax.Array:
    """Pillow clip8: arithmetic shift then clamp to [0, 255]."""
    v = acc >> pb
    return jnp.clip(v, 0, 255).astype(jnp.uint8)


def _pass_last_int(x_u8: jax.Array, M: jax.Array,
                   pb: int = PRECISION_BITS) -> jax.Array:
    """uint8 [..., in] -> uint8 [..., out] via int32 fixed-point MAC."""
    acc = jax.lax.dot_general(
        x_u8.astype(jnp.int32),
        M.T,
        (((x_u8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _clip8(acc + (1 << (pb - 1)), pb)


@cache
def _int_tables(
    in_size: int, out_size: int, mode: str,
    span: tuple[float, float] | None = None,
    pb: int = PRECISION_BITS,
):
    """Banded form of :func:`_int_matrix`: ``(xmin[out] int32,
    Wb[out, ntaps] int32)`` with the same normalize_coeffs_8bpc
    quantisation applied to the banded float64 tables — elementwise
    identical to the dense matrix's nonzeros (``dense_matrix`` scatters
    these very weights), without materialising ``[out, in]`` (the sharded
    giant-image path needs tables whose size tracks the filter support,
    not the image)."""
    from .weights import compute_tables

    spec = make_axis_spec(in_size, out_size, mode, antialias=True, span=span)
    xmin, _, w = compute_tables(spec, dtype=np.float64)
    scaled = w * (1 << pb)
    Wb = np.where(scaled < 0, scaled - 0.5, scaled + 0.5).astype(np.int32)
    xmin = xmin.astype(np.int32)
    for a in (xmin, Wb):
        a.setflags(write=False)
    return xmin, Wb


def _pass_last_int_banded(
    x_u8: jax.Array, xmin: jax.Array, Wb: jax.Array,
    pb: int = PRECISION_BITS,
) -> jax.Array:
    """uint8 [..., in] -> uint8 [..., out] via banded int32 fixed-point
    MAC: gather each output's ``ntaps`` window and contract — the exact
    arithmetic of :func:`_pass_last_int` without the dense ``[out, in]``
    operand.  Out-of-window taps carry weight 0, so the index clamp can
    never contribute."""
    ntaps = Wb.shape[-1]
    idx = xmin[:, None] + jnp.arange(ntaps, dtype=xmin.dtype)[None, :]
    idx = jnp.clip(idx, 0, x_u8.shape[-1] - 1)
    g = jnp.take(x_u8, idx, axis=-1).astype(jnp.int32)  # [..., out, ntaps]
    acc = (g * Wb).sum(-1)
    return _clip8(acc + (1 << (pb - 1)), pb)


# ---------------------------------------------------------------------------
# Dynamic digit mid-axis pass (sharded byte-exact route's MXU promotion)
# ---------------------------------------------------------------------------


def _kernel_mid_digit(starts_ref, x_ref, band_ref, ct_ref, o_ref, *,
                      k_in, clip):
    """out[1, 128, WT] u8 = clip8(digit-recombine(band[j]^T @ (x-128))).

    The int8-digit twin of pallas_resize._kernel_mid: band values, window
    starts, and rounding constants are TRACED operands (each shard_map
    device selects its shard's tables with lax.axis_index outside), only
    the geometry (n_tiles, k_in) is static.  Digit planes stack along
    result sublanes [d0 | d1 | d2], exactly _digit_tiles' H layout."""
    from jax.experimental import pallas as pl

    j = pl.program_id(2)
    s = pl.multiple_of(starts_ref[j], 8)
    xs = jax.lax.bitcast_convert_type(
        x_ref[0, pl.ds(s, k_in), :] ^ jnp.uint8(128), jnp.int8
    )
    S = jax.lax.dot_general(
        band_ref[j], xs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [3*128, WT]
    u = _fixup_int((S[:128], S[128:256], S[256:]), ct_ref[j][:, None],
                   clip=clip)
    o_ref[0, :, :] = u.astype(jnp.uint8)


def digit_pass_mid_dynamic(
    x3: jax.Array,
    starts: jax.Array,
    bands: jax.Array,
    ct: jax.Array,
    out_size: int,
    clip: bool = True,
) -> jax.Array:
    """Axis-1 Pillow-exact integer contraction with traced digit tables.

    ``x3 [B, IN, W] uint8`` (the quantised intermediate), ``starts
    [n_tiles] int32`` (8-aligned, ``start + k_in <= IN`` after row
    padding), ``bands [n_tiles, k_in, 3*128] int8`` (balanced base-256
    digit planes side by side along lanes), ``ct [n_tiles, 128] int32``
    (``128*colsum + 2^(PB-1)`` per output row) -> ``[B, out_size, W]``
    uint8, bit-identical to the dense integer pass.  The banded float
    counterpart is pallas_resize.banded_pass_mid_dynamic."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, IN, W = x3.shape
    n_tiles, k_in, lanes3 = bands.shape
    assert lanes3 == 3 * 128
    in_pad = max(_round_up(IN, 8), k_in)
    out_padded = n_tiles * 128
    # per-step W chunk: the x window [in_pad, wt] u8 is the big operand
    wt = min(512, (_PIL_VMEM_BUDGET // 3) // max(in_pad, 1))
    wt = max(128, (wt // 128) * 128)
    w_pad = _round_up(max(W, wt), wt)
    x3 = jnp.pad(x3, ((0, 0), (0, in_pad - IN), (0, w_pad - W)))
    from functools import partial as _partial

    y = pl.pallas_call(
        _partial(_kernel_mid_digit, k_in=k_in, clip=clip),
        out_shape=jax.ShapeDtypeStruct((B, out_padded, w_pad), jnp.uint8),
        grid=(B, w_pad // wt, n_tiles),
        in_specs=[
            _bspec(memory_space=pltpu.SMEM),
            _bspec((1, in_pad, wt), lambda b, c, j: (b, 0, c),
                         memory_space=pltpu.VMEM),
            _bspec((n_tiles, k_in, 3 * 128), lambda b, c, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((n_tiles, 128), lambda b, c, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_bspec((1, 128, wt), lambda b, c, j: (b, j, c),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(starts.astype(jnp.int32), x3, bands, ct)
    return y[:, :out_size, :W]


# ---------------------------------------------------------------------------
# Pallas single-kernel digit-split pipeline (TPU fast path, bit-identical)
# ---------------------------------------------------------------------------


def _fixup_int(parts, ct, clip=True, pb=PRECISION_BITS):
    """Recombine int32 digit sums into Pillow's accumulator and clip:
    ``clip8(sum_i(parts[i] << 8i) + ct)`` where ``ct`` carries both the
    signed-pixel bias and Pillow's rounding constant (see _digit_tiles).
    The shifted partials may wrap int32; the true accumulator fits, so
    modular addition lands on the exact value."""
    acc = ct
    for i, S in enumerate(parts):
        acc = acc + (S if i == 0 else jax.lax.shift_left(S, jnp.int32(8 * i)))
    v = jax.lax.shift_right_arithmetic(acc, jnp.int32(pb))
    if not clip:
        return v  # provably in [0, 255]: see _needs_clip
    return jnp.clip(v, jnp.int32(0), jnp.int32(255))


def _kernel_2pass_pil(
    x_ref, bandw_ref, bandh_ref, ctw_ref, cth_ref, o_ref,
    *, bsz, OH, OW, starts_w, k_in_w, starts_h, k_in_h,
    clip_w=True, clip_h=True, tile_h=128, pb=PRECISION_BITS, ndig=3,
):
    """Both Pillow fixed-point passes (uint8 intermediate included) in one
    kernel: per axis, 3 native int8 MXU digit matmuls (signed pixels
    ``x - 128``; the bias constant restores unsigned semantics) + int32
    recombine.  Round 2 ran the digits as bf16 matmuls; int8 measures
    ~2.5x the bf16 MXU rate on v5e, and the operands halve again.

    Round 3: the uint8 intermediate lives in SSA VALUES, not a VMEM
    scratch ref, and the trace runs ALL images' W passes before ANY H
    pass.  Round 2's roofline measured the kernel epilogue-bound (0.406
    ms actual vs a 0.245 ms matmuls+IO floor at the headline shape, with
    the matmuls at ~100% of the session int8 ceiling), and a probe
    series (benchmarks/epilogue_probe.py) showed (a) trace-order
    software-pipelining within an image changes nothing — Mosaic
    schedules the dataflow graph, not the trace order (lag1 0.373 vs
    inorder 0.376); (b) the scratch REF's conservative memory-dependency
    ordering was serialising the VPU recombine against in-flight
    matmuls — SSA values freed that (0.414 -> 0.376 ms); and (c) of the
    bit-equivalent trace structures probed (inorder / split-H per column
    group 0.394 / lag1 / all-W-then-all-H), the all-W-first structure
    measures fastest (0.354 ms): it gives the scheduler the largest
    window of independent cross-image work to hide the recombine under.
    The reference's analogous step is its unroll/hoist epilogue
    micro-optimisation (step_two_dot_one/aa_interpolation_impl.h:141-170).
    """

    def w_epilogue(S, t):
        # pass-1 epilogue -> signed u8-grid intermediate (int8: (clip8
        # result) - 128).  The -128 re-centering folds into the bias
        # constant: shifting ct by 128<<PB before the arithmetic shift
        # yields clip8(acc)-128 as clip(acc'>>PB, -128, 127) exactly
        # (floor-shift composes), so the subtract runs on the [128]-wide
        # constant, not the whole tile.
        ct1 = ctw_ref[t] - jnp.int32(128 << pb)
        acc = ct1[None, :]
        for d in range(ndig):
            Sd = S[:, d * 128 : (d + 1) * 128]
            acc = acc + (
                Sd if d == 0 else jax.lax.shift_left(Sd, jnp.int32(8 * d))
            )
        v = jax.lax.shift_right_arithmetic(acc, jnp.int32(pb))
        if clip_w:
            v = jnp.clip(v, jnp.int32(-128), jnp.int32(127))
        return v.astype(jnp.int8)

    per_img = []
    for bi in range(bsz):
        # signed pixels once per image block: x - 128 == x XOR 0x80 for u8,
        # so it's a single VPU op + bitcast (no i32 widening round-trip)
        xs = jax.lax.bitcast_convert_type(
            x_ref[bi] ^ jnp.uint8(128), jnp.int8
        )
        # pass 1 (W, Pillow's horizontal-first order)
        wtiles = []
        for t, s in enumerate(starts_w):
            win = xs[:, s : s + k_in_w]
            S = jax.lax.dot_general(
                win, bandw_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [rows, ndig*128]: the digit sums side by side
            wtiles.append(w_epilogue(S, t))
        per_img.append(wtiles)
    # pass 2 (H) on the quantised intermediates -> u8 output rows; all
    # images' W passes are traced BEFORE any H pass (all-W-first measures
    # fastest of the probed bit-equivalent structures — see docstring)
    for bi in range(bsz):
        inter = per_img[bi][0] if len(per_img[bi]) == 1 else jnp.concatenate(
            per_img[bi], axis=1
        )
        th = tile_h
        for t, s in enumerate(starts_h):
            win = inter[s : s + k_in_h, :]
            S = jax.lax.dot_general(
                bandh_ref[t], win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # [ndig*tile_h, OWp]: digit sums stacked along result
            # SUBLANES (sub-128 tile_h keeps these slices 8-granular and
            # free while dropping a whole 128-deep MXU K pass, _pick_tile_h)
            u8v = _fixup_int(
                tuple(S[d * th : (d + 1) * th] for d in range(ndig)),
                cth_ref[t][:, None], clip=clip_h, pb=pb,
            )
            rows = min(th, OH - t * th)
            o_ref[bi, t * th : t * th + rows, :OW] = (
                u8v[:rows, :OW].astype(jnp.uint8)
            )


def _pil_vmem_bytes(H, W, OH, OW, btw, bth, bsz, ndig=3) -> int:
    up = _round_up
    band = ndig * (btw.n_tiles * btw.k_in * btw.tile
                   + bth.n_tiles * bth.k_in * bth.tile)
    per_img = (
        up(H, 32) * up(W, 128) * 2  # u8 in, double buffered
        + up(H, 32) * btw.out_padded  # int8 intermediate scratch
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
    btw, _, _ = _digit_tiles(W, ow, method)
    bth, _, _ = _digit_tiles(H, oh, method, tile=_pick_tile_h(H, oh, method))
    if btw.k_in > W or bth.k_in > H:
        return False
    if btw.n_tiles > _PIL_MAX_TILES or bth.n_tiles > _PIL_MAX_TILES:
        return False
    return _pil_vmem_bytes(H, W, oh, ow, btw, bth, 1) <= _PIL_VMEM_BUDGET


def _resize_pil_exact_pallas(x3: jax.Array, oh: int, ow: int, method: str,
                             pb: int = PRECISION_BITS, ndig: int = 3):
    """x3: uint8 [B, H, W] -> uint8 [B, oh, ow], bit-identical to Pillow
    (at the default pb=22/ndig=3; the pb=14/ndig=2 fast dial holds
    MaxAbsE <= 1, see resize_pil_exact(digits=2))."""
    from functools import partial as _partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W = x3.shape
    tile_h = _pick_tile_h(H, oh, method)
    btw, bandsw, ctw = _digit_tiles(W, ow, method, pb=pb, ndig=ndig)
    bth, bandsh, cth = _digit_tiles(H, oh, method, tile=tile_h, pb=pb,
                                    ndig=ndig)
    bsz = 1
    for cand in range(min(8, B), 0, -1):
        if B % cand == 0 and _pil_vmem_bytes(
            H, W, oh, ow, btw, bth, cand, ndig
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
        clip_w=_needs_clip(W, ow, method),
        clip_h=_needs_clip(H, oh, method),
        tile_h=tile_h,
        pb=pb,
        ndig=ndig,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, oh, ow), jnp.uint8),
        grid=(B // bsz,),
        in_specs=[
            _bspec((bsz, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((btw.n_tiles, btw.k_in, ndig * 128),
                         lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            _bspec((bth.n_tiles, bth.k_in, ndig * tile_h),
                         lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            _bspec((btw.n_tiles, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((bth.n_tiles, tile_h), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_bspec((bsz, oh, ow), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        # NB: no scratch ref — the intermediate is SSA values (Mosaic
        # allocates equivalent VMEM, still counted by _pil_vmem_bytes)
        cost_estimate=pl.CostEstimate(
            flops=2 * ndig * B * (H * btw.k_in * btw.out_padded
                                  + bth.k_in * bth.out_padded * btw.out_padded),
            bytes_accessed=B * (H * W + oh * ow),
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x3, jnp.asarray(bandsw), jnp.asarray(bandsh),
      jnp.asarray(ctw), jnp.asarray(cth))


# ---------------------------------------------------------------------------
# Streamed digit pipeline: bit-exact Pillow for images too large for the
# whole-image VMEM block (e.g. 4K frames) — the same halo'd row-window DMA
# structure as pallas_resize.resize2d_streamed, with int8 digit matmuls.
# ---------------------------------------------------------------------------


def _pil_streamed_vmem(ccols, tiles_per_chunk, btw, bth, bsz=1,
                       single_chunk=False, ndig=3) -> int:
    k_rows = bth.k_in
    # the W band block is double-buffered only while it actually streams
    # (n_chunks > 1); with a single chunk its index map is constant and
    # Mosaic DMAs it once (same as the whole-image kernel's resident bands)
    wband_bufs = 1 if single_chunk else 2
    return (
        2 * bsz * k_rows * ccols  # u8 window, double buffered
        + bsz * k_rows * tiles_per_chunk * 128  # int8 intermediate
        + wband_bufs * tiles_per_chunk * btw.k_in * ndig * 128
        + bth.n_tiles * k_rows * ndig * bth.tile  # H band resident
        + (2 * tiles_per_chunk * 128 + bth.n_tiles * bth.tile) * 4  # biases
        + 2 * bsz * bth.tile * tiles_per_chunk * 128  # u8 out blocks
    )


def _pil_stream_bsz(B: int, plan, btw, bth, max_bsz: int = 8,
                    ndig: int = 3) -> int:
    """Images per grid step.  The on-chip step-count sweep (round 3)
    measured ~1.1 us of fixed cost per grid step (window-DMA setup + grid
    bookkeeping) on top of near-floor compute, so batching images into one
    step is nearly-free throughput: pick the biggest divisor of B whose
    windows still fit.  At the 4K->HD reference workload (24 planes,
    whole-row chunks) the VMEM model admits bsz=6 — 92 grid steps instead
    of 552 at bsz=1.  Planned against 5/6 of the kernel budget (vs the
    chunk plan's 2/3): the bsz decision has its own retry ladder — a
    Mosaic VMEM rejection steps down through the smaller candidates
    before shrinking the chunk plan.  ``max_bsz`` is that ladder's rung.
    """
    budget = _PIL_VMEM_BUDGET * 5 // 6
    for bsz in (8, 7, 6, 5, 4, 3, 2):
        if bsz > max_bsz:
            continue
        if B % bsz == 0 and _pil_streamed_vmem(
            plan.ccols, plan.tiles_per_chunk, btw, bth, bsz,
            single_chunk=plan.n_chunks == 1, ndig=ndig,
        ) <= budget:
            return bsz
    return 1


def _pil_stream_plan(W, btw, bth, max_tiles: int | None = None,
                     ndig: int = 3):
    """Largest-chunk column plan that fits the VMEM budget, or None —
    the digit twin of pallas_resize._stream_plan (same chunk geometry:
    consecutive W tiles share one 128-aligned DMA'd column window).

    ``max_tiles`` caps tiles_per_chunk — the retry ladder for
    :func:`_resize_pil_exact_streamed`'s compile-failure fallback.
    """
    from .pallas_resize import _stream_chunk_plan

    Wp = _round_up(W, 128)
    # Mosaic's scoped-VMEM accounting runs ~40% above this static model on
    # chunked cases (observed on-chip: 16.9M actual vs ~11M estimated at a
    # 24576-wide 8x shrink), so plan against a 2/3 budget for headroom.
    # If real overhead ever exceeds that on some chunk geometry, the
    # executor catches the Mosaic VMEM failure and retries the
    # next-smaller plan (round-2 advisor finding) rather than failing.
    budget = _PIL_VMEM_BUDGET * 2 // 3
    hi = btw.n_tiles if max_tiles is None else min(max_tiles, btw.n_tiles)
    for ct in range(hi, 0, -1):
        plan = _stream_chunk_plan(btw, Wp, ct)
        if _pil_streamed_vmem(plan.ccols, plan.tiles_per_chunk, btw, bth,
                              ndig=ndig) <= budget:
            return plan
    return None


_PIL_AUTO_METHODS = ("bilinear", "bicubic", "box", "nearest", "lanczos3",
                     "hamming")


def pil_auto_promotable(shape, oh, ow, method: str, antialias: bool = True
                        ) -> bool:
    """Whether a plain-PIL-semantics resize of ``shape`` can run the
    bit-exact digit kernels (whole-image or streamed).

    The SINGLE source of truth for the ``backend="auto"`` u8->u8 promotion
    eligibility — ops/resize.py's dispatcher and utils/inspect.py's
    kernel_report both call this, so the reported route cannot drift from
    the dispatch (a round-2 advisor finding against hand-duplicated
    gates).  Callers still check dtype/layout/backend/align_corners/
    scale_factors, which depend on call-site arguments this module does
    not see.
    """
    if not antialias or method not in _PIL_AUTO_METHODS:
        return False
    m = "box" if method == "nearest" else method
    return pil_exact_pallas_supported(
        shape, oh, ow, m
    ) or pil_exact_streamed_supported(shape, oh, ow, m)


def _stream_tiles(H, W, oh, ow, method, pb=PRECISION_BITS, ndig=3):
    """The streamed route's (btw, bandsw, ctw, bth, bandsh, cth) with both
    round-3 tile-width knobs applied: sub-128 H tiles (sublane-sliced,
    free) and sub-128 W tiles at lane pitch 128 (see _pick_tile_w) — one
    place, so the admission gate and the executor can never disagree on
    the geometry."""
    bth, bandsh, cth = _digit_tiles(
        H, oh, method, align=8, tile=_pick_tile_h(H, oh, method, align=8),
        pb=pb, ndig=ndig)
    tile_w = _pick_tile_w(W, ow, method, k_rows=bth.k_in, tile_h=bth.tile)
    btw, bandsw, ctw = _digit_tiles(W, ow, method, tile=tile_w, pitch=128,
                                    pb=pb, ndig=ndig)
    return btw, bandsw, ctw, bth, bandsh, cth


def pil_exact_streamed_supported(shape, oh, ow, method: str) -> bool:
    if method == "pil_nearest" or len(shape) < 2:
        return False
    H, W = shape[-2], shape[-1]
    btw, _, _, bth, _, _ = _stream_tiles(H, W, oh, ow, method)
    if btw.k_in > W or bth.k_in > _round_up(H, 8):
        return False
    if btw.n_tiles > _PIL_MAX_TILES:
        return False
    return _pil_stream_plan(W, btw, bth) is not None


def _kernel_2pass_pil_streamed(
    starts_ref, cstarts_ref, x_hbm, bandw_ref, bandh_ref, ctw_ref, cth_ref,
    o_ref, win, sem, *, k_rows, chunks, k_in_w, bsz=1,
    clip_w=True, clip_h=True, tile_h=128, pb=PRECISION_BITS, ndig=3,
):
    """One (bsz-image block, output-row tile, column chunk) per step: DMA
    the halo'd uint8 row-and-column window for ``bsz`` images at once, run
    both Pillow fixed-point passes with int8 digit matmuls (cf.
    _kernel_2pass_pil), store the chunk's exact uint8 output blocks.  A
    single whole-row chunk is the common case; very wide images split the
    W pass across column chunks exactly like
    pallas_resize._kernel_2pass_streamed.  ``bsz > 1`` amortises the
    measured ~1.1 us/step fixed cost (round-3 step-count sweep) and gives
    the scheduler independent cross-image work to hide the recombines
    under — the same all-W-then-all-H structure as the whole-image
    kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)  # block of bsz images
    t = pl.program_id(1)
    c = pl.program_id(2)
    B = jnp.int32(pl.num_programs(0))
    T = jnp.int32(pl.num_programs(1))
    C = jnp.int32(pl.num_programs(2))
    step = (b * T + t) * C + c

    def dma(slot, b_i, t_i, c_i):
        slot = jnp.int32(slot)  # a bare 0 would lower i64 under x64
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(b_i * jnp.int32(bsz), bsz),
                pl.ds(pl.multiple_of(starts_ref[t_i], 8), k_rows),
                pl.ds(pl.multiple_of(cstarts_ref[c_i], 128), win.shape[3]),
            ],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma(0, b, t, c).start()

    nc = jax.lax.rem(c + jnp.int32(1), C)
    tc = t + (c + jnp.int32(1)) // C
    nt = jax.lax.rem(tc, T)
    nb = b + tc // T

    @pl.when(step + 1 < B * T * C)
    def _():
        dma(jax.lax.rem(step + jnp.int32(1), jnp.int32(2)), nb, nt, nc).start()

    slot = jax.lax.rem(step, jnp.int32(2))
    dma(slot, b, t, c).wait()

    for ci, tiles in enumerate(chunks):

        @pl.when(c == ci)
        def _(tiles=tiles):
            # pass 1 (W) for this chunk's tiles, ALL images first -> signed
            # u8-grid intermediates, kept in SSA VALUES (a scratch ref's
            # conservative memory ordering would serialize the VPU
            # recombine against in-flight matmuls — measured on the
            # whole-image kernel, benchmarks/epilogue_probe.py)
            wci = len(tiles) * 128
            inters = []
            for bi in range(bsz):
                xs = jax.lax.bitcast_convert_type(
                    win[slot, bi] ^ jnp.uint8(128), jnp.int8
                )
                wtiles = []
                for j, (wt, off) in enumerate(tiles):
                    # bandw_ref/ctw_ref hold only this chunk's tiles (the
                    # BlockSpec streams chunk c's band slice into VMEM), so
                    # they are indexed by the LOCAL tile position j.
                    S = jax.lax.dot_general(
                        xs[:, off : off + k_in_w], bandw_ref[j],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    ct1 = ctw_ref[wt] - jnp.int32(128 << pb)
                    acc = ct1[None, :]
                    for d in range(ndig):
                        Sd = S[:, d * 128 : (d + 1) * 128]
                        acc = acc + (
                            Sd if d == 0
                            else jax.lax.shift_left(Sd, jnp.int32(8 * d))
                        )
                    v = jax.lax.shift_right_arithmetic(acc, jnp.int32(pb))
                    if clip_w:
                        v = jnp.clip(v, jnp.int32(-128), jnp.int32(127))
                    wtiles.append(v.astype(jnp.int8))
                # concat, not per-tile split — the split-H structure
                # measured SLOWER on the whole-image kernel
                inters.append(
                    wtiles[0] if len(wtiles) == 1 else jnp.concatenate(
                        wtiles, axis=1
                    )
                )
            # pass 2 (H) on the quantised intermediates, per image
            th = tile_h
            for bi in range(bsz):
                S = jax.lax.dot_general(
                    bandh_ref[t], inters[bi], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [ndig*tile_h, wci]: digits along result sublanes
                u8v = _fixup_int(
                    tuple(S[d * th : (d + 1) * th] for d in range(ndig)),
                    cth_ref[t][:, None], clip=clip_h, pb=pb)
                o_ref[bi, :, :wci] = u8v.astype(jnp.uint8)


def _resize_pil_exact_streamed(x3: jax.Array, oh: int, ow: int, method: str,
                               pb: int = PRECISION_BITS, ndig: int = 3):
    """x3: uint8 [B, H, W] -> uint8 [B, oh, ow], bit-identical to Pillow,
    streaming halo'd row windows (input never fully resident in VMEM).

    The column-chunk plan is sized against a conservative VMEM model; if
    Mosaic's scoped-VMEM accounting still rejects it on some geometry, the
    eager path catches the compile failure and retries the next-smaller
    chunk plan (round-2 advisor finding).  Under an outer jit the compile
    happens later, out of reach — the conservative planner is the defence
    there, as before.
    """
    B, H, W = x3.shape
    btw, bandsw, ctw, bth, bandsh, cth = _stream_tiles(H, W, oh, ow, method,
                                                       pb, ndig)
    Hp, Wp = _round_up(H, 8), _round_up(W, 128)
    if (Hp, Wp) != (H, W):
        # zero pad rows/cols carry zero digit weight -> bit-identical
        x3 = jnp.pad(x3, ((0, 0), (0, Hp - H), (0, Wp - W)))
    plan = _pil_stream_plan(W, btw, bth, ndig=ndig)
    if plan is None:
        raise ValueError(
            "pil_exact streamed: no column-chunk plan fits VMEM "
            f"(W={W}, k_rows={bth.k_in})"
        )
    tracing = isinstance(x3, jax.core.Tracer)
    bsz = _pil_stream_bsz(x3.shape[0], plan, btw, bth, ndig=ndig)
    while True:
        try:
            return _pil_streamed_call(
                x3, H, W, oh, ow, method, plan,
                btw, bandsw, ctw, bth, bandsh, cth, bsz=bsz, pb=pb,
                ndig=ndig,
            )
        except Exception as e:  # Mosaic VMEM admission (eager path only)
            if not tracing and "vmem" in str(e).lower() and bsz > 1:
                # first rungs: step the image batching down, keep the plan
                bsz = _pil_stream_bsz(x3.shape[0], plan, btw, bth,
                                      max_bsz=bsz - 1, ndig=ndig)
                continue
            retryable = (
                not tracing
                and "vmem" in str(e).lower()
                and plan.tiles_per_chunk > 1
            )
            if not retryable:
                raise
            plan = _pil_stream_plan(
                W, btw, bth, max_tiles=plan.tiles_per_chunk - 1, ndig=ndig,
            )
            if plan is None:
                raise
            # the smaller plan's windows may re-admit image batching
            bsz = _pil_stream_bsz(x3.shape[0], plan, btw, bth, ndig=ndig)


def _pil_streamed_call(
    x3, H, W, oh, ow, method, plan, btw, bandsw, ctw, bth, bandsh, cth,
    bsz=None, pb=PRECISION_BITS, ndig=3,
):
    from functools import partial as _partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = x3.shape[0]
    T = bth.n_tiles
    C, CT = plan.n_chunks, plan.tiles_per_chunk
    if bsz is None:
        bsz = _pil_stream_bsz(B, plan, btw, bth)
    if B % bsz:
        bsz = 1
    if C * CT > btw.n_tiles:  # pad the band array to whole chunks
        padt = C * CT - btw.n_tiles
        bandsw = np.concatenate(
            [bandsw, np.zeros((padt, btw.k_in, ndig * 128), np.int8)])
    kern = _partial(
        _kernel_2pass_pil_streamed,
        k_rows=bth.k_in,
        chunks=plan.chunks,
        k_in_w=btw.k_in,
        bsz=bsz,
        clip_w=_needs_clip(W, ow, method),
        clip_h=_needs_clip(H, oh, method),
        tile_h=bth.tile,
        pb=pb,
        ndig=ndig,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // bsz, T, C),
        in_specs=[
            _bspec(memory_space=pl.ANY),  # x stays in HBM
            _bspec((CT, btw.k_in, ndig * 128),
                         lambda b, t, c, starts, cstarts: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((bth.n_tiles, bth.k_in, ndig * bth.tile),
                         lambda b, t, c, starts, cstarts: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # bias constants are tiny (n_tiles x tile int32): fully
            # resident — a CT-sized block would violate Mosaic's
            # (8, 128)-divisible block rule
            _bspec((btw.n_tiles, 128),
                         lambda b, t, c, starts, cstarts: (0, 0),
                         memory_space=pltpu.VMEM),
            _bspec((bth.n_tiles, bth.tile),
                         lambda b, t, c, starts, cstarts: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_bspec(
            (bsz, bth.tile, CT * 128),
            lambda b, t, c, starts, cstarts: (b, t, c),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, bsz, bth.k_in, plan.ccols), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # Ragged rows (round 5, cf. pallas_resize.resize2d_streamed): emit OH
    # directly — pallas clips the last H tile's store — so the row slice
    # (and its full-output copy at HBM rate) disappears from the epilogue.
    # The W lanes stay padded: the sub-128 W tiles the int8 K model picks
    # still need the one compact_lanes pass.
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, oh, C * CT * 128), jnp.uint8),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * ndig * B * T * bth.k_in * (btw.k_in + 128) * btw.out_padded,
            bytes_accessed=B * T * C * bth.k_in * plan.ccols + B * oh * ow,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(bth.starts, dtype=jnp.int32),
      jnp.asarray(plan.col_starts, dtype=jnp.int32), x3, jnp.asarray(bandsw),
      jnp.asarray(bandsh), jnp.asarray(ctw), jnp.asarray(cth))
    from .pallas_resize import compact_lanes

    # sub-128 W tiles live at lane pitch 128 inside the kernel (digit
    # slices must stay at 128-lane offsets); compact the strided valid
    # lanes ONCE, on the final uint8 array (shared helper — an XLA strided
    # slice at HBM stream rate, ~us at HD, vs the whole dropped MXU K pass
    # the narrow tile buys, ~100s of us).
    return compact_lanes(y, btw.tile)[:, :, :ow]


def _reduce_grids(span: int, out: int, f: int) -> np.ndarray:
    """Block extent per output index along ONE axis (edge-clipped)."""
    d = np.full(out, f, np.int64)
    if out * f > span:
        d[-1] = span - (out - 1) * f
    return d


def reduce_pil_exact(
    x: jax.Array,
    factor: int | tuple[int, int],
    box: tuple[int, int, int, int] | None = None,
    data_format: str | None = None,
) -> jax.Array:
    """Bit-identical ``PIL.Image.reduce``: integer-factor block average.

    ``factor``: int or ``(factor_x, factor_y)`` (PIL order: x = width).
    ``box``: optional INTEGER source window ``(x0, y0, x1, y1)``.  Output
    size rounds UP (partial edge blocks average over their clipped pixel
    count).

    Pillow's Reduce.c does not divide: each output byte is
    ``((sum + d//2) * uint32(float32(2**32) / float32(256*d))) >> 24`` with
    ``d`` the block's (clipped) pixel count — a truncated float32
    fixed-point reciprocal whose off-by-one-from-true-rounding cases are
    part of the observable contract.  Reproduced exactly (fuzz-pinned
    against ``PIL.Image.reduce`` in tests/test_box.py); the reduction runs
    as a pad-free reshape block-sum, so it stays one XLA reduce per call.
    """
    from .resize import _axes_for

    if x.dtype != jnp.uint8:
        raise ValueError("reduce_pil_exact is the uint8 (8bpc) pipeline")
    fx, fy = (factor, factor) if isinstance(factor, int) else (int(factor[0]), int(factor[1]))
    if fx < 1 or fy < 1:
        raise ValueError(f"factor must be >= 1, got {(fx, fy)}")
    h_axis, w_axis = _axes_for(x, data_format)
    h_axis, w_axis = h_axis % x.ndim, w_axis % x.ndim
    ih, iw = x.shape[h_axis], x.shape[w_axis]
    if box is None:
        box = (0, 0, iw, ih)
    x0, y0, x1, y1 = (int(v) for v in box)
    if not (0 <= x0 < x1 <= iw and 0 <= y0 < y1 <= ih):
        raise ValueError(f"reduce box {box} must be integral within (0, 0, {iw}, {ih})")
    sw, sh = x1 - x0, y1 - y0
    ow, oh = -(-sw // fx), -(-sh // fy)
    # Host-side epilogue tables: block pixel counts and Reduce.c multipliers.
    dxs, dys = _reduce_grids(sw, ow, fx), _reduce_grids(sh, oh, fy)
    d = dys[:, None] * dxs[None, :]  # [oh, ow]
    amend = (d // 2).astype(np.uint32)
    mult = (np.float32(2**32) / (256 * d).astype(np.float32)).astype(np.uint32)
    # Device: crop, zero-pad to whole blocks (zeros never change sums),
    # reshape block-sum, then the exact fixed-point epilogue in uint32
    # (the s*mult product is < 2^32 by construction: s <= 255.5*d,
    # mult <= 2^24/d).
    y = jnp.moveaxis(x, (h_axis, w_axis), (-2, -1))
    lead = y.shape[:-2]
    y = y[..., y0:y1, x0:x1]
    pad = [(0, 0)] * (y.ndim - 2) + [(0, oh * fy - sh), (0, ow * fx - sw)]
    y = jnp.pad(y, pad)
    s = y.reshape(*lead, oh, fy, ow, fx).astype(jnp.uint32).sum(axis=(-3, -1))
    v = ((s + jnp.asarray(amend)) * jnp.asarray(mult)) >> 24
    v = v.astype(jnp.uint8)
    return jnp.moveaxis(v, (-2, -1), (h_axis, w_axis))


def resize_pil_exact(
    x: jax.Array,
    size: Sequence[int],
    method: str = "bilinear",
    data_format: str | None = None,
    box: tuple[float, float, float, float] | None = None,
    reducing_gap: float | None = None,
    digits: int | None = None,
) -> jax.Array:
    """Bit-identical Pillow antialiased uint8 resize.

    ``x``: uint8 ``[H, W]``, ``[C, H, W]``, ``[N, C, H, W]`` (or NHWC via
    ``data_format``).  ``size``: ``(height, width)``.  Matches
    ``PIL.Image.resize((w, h), resample)`` exactly, byte for byte —
    verified per mode/size in tests/test_pil_exact.py.

    ``box``: optional fractional source window ``(x0, y0, x1, y1)`` in PIL
    order — byte-identical to ``PIL.Image.resize(size, resample, box=box)``
    (precompute_coeffs' ``in0/in1`` span).  The box route contracts banded
    int32 tables (XLA) rather than the digit kernels; tap indices still
    clamp at the full image edges exactly like Pillow.

    ``digits``: the accuracy/speed dial.  ``3`` (default) is Pillow's own
    pb=22 grid — byte-identical output.  ``2`` quantises the same double
    weights at pb=14 into TWO balanced int8 digits — 2/3 the MXU work on
    the digit kernels, guaranteed ``MaxAbsE <= 1`` vs Pillow whenever the
    per-axis tap count is <= 57 (per-pass pre-round error
    ``ntaps * 0.5 * 255 / 2^14 < 0.45``, two passes < 1 — the same bound
    the crop route's _digit_plan uses; wider windows silently upgrade
    back to 3 digits).  The round-5 byte-exactness study
    (benchmarks/digit2_study.py, data/digit2_study.json) shows pb=14 is
    byte-identical only for degenerate geometries, so 2-digit ships as a
    documented +-1 dial rather than an exactness mode.
    """
    from .resize import _axes_for

    if x.dtype != jnp.uint8:
        raise ValueError("resize_pil_exact is the uint8 (8bpc) pipeline")
    if digits is None:
        from ..config import default_pil_digits

        digits = default_pil_digits()  # IA_TPU_PIL_DIGITS, trace-time
    if digits not in (2, 3):
        raise ValueError(f"digits must be 2 or 3, got {digits!r}")
    oh, ow = int(size[0]), int(size[1])
    h_axis, w_axis = _axes_for(x, data_format)
    h_axis, w_axis = h_axis % x.ndim, w_axis % x.ndim
    pb, ndig = PRECISION_BITS, 3
    if digits == 2 and method != "pil_nearest":
        from .weights import make_axis_spec as _mas

        ntaps = max(
            _mas(x.shape[h_axis], oh, method, antialias=True).ntaps,
            _mas(x.shape[w_axis], ow, method, antialias=True).ntaps,
        )
        if ntaps <= 57:  # the +-1 bound's admission (see docstring)
            pb, ndig = 14, 2
        elif debug_enabled():
            print(f"[ia-tpu] digits=2 declined (ntaps={ntaps} > 57): "
                  "falling back to the exact 3-digit grid")
    if reducing_gap is not None:
        if reducing_gap < 1.0:
            raise ValueError("reducing_gap must be 1.0 or greater")
        # PIL.Image.resize's two-step optimisation, replicated expression by
        # expression (truncating int() factor picks, _get_safe_box support
        # margins, box rescale) so the shortcut output stays byte-identical.
        # NEAREST skips it, exactly like Pillow.
        if method != "pil_nearest":
            from .filters import get_filter

            iw, ih = x.shape[w_axis], x.shape[h_axis]
            b = tuple(float(v) for v in box) if box is not None else (
                0.0, 0.0, float(iw), float(ih))
            factor_x = int((b[2] - b[0]) / ow / reducing_gap) or 1
            factor_y = int((b[3] - b[1]) / oh / reducing_gap) or 1
            if factor_x > 1 or factor_y > 1:
                fsup = get_filter(method).support - 0.5
                sx = fsup * (b[2] - b[0]) / ow
                sy = fsup * (b[3] - b[1]) / oh
                rb = (
                    max(0, int(b[0] - sx)),
                    max(0, int(b[1] - sy)),
                    min(iw, math.ceil(b[2] + sx)),
                    min(ih, math.ceil(b[3] + sy)),
                )
                x = reduce_pil_exact(
                    x, (factor_x, factor_y), box=rb, data_format=data_format
                )
                box = (
                    (b[0] - rb[0]) / factor_x,
                    (b[1] - rb[1]) / factor_y,
                    (b[2] - rb[0]) / factor_x,
                    (b[3] - rb[1]) / factor_y,
                )
    span_h = span_w = None
    if box is not None:
        bx0, by0, bx1, by1 = (float(v) for v in box)
        iw, ih = x.shape[w_axis], x.shape[h_axis]
        if not (0.0 <= bx0 < bx1 <= iw and 0.0 <= by0 < by1 <= ih):
            raise ValueError(
                f"box {box} must lie within (0, 0, {iw}, {ih}) with "
                "x0 < x1 and y0 < y1 (PIL order: x = width axis)"
            )
        if (bx0, by0, bx1, by1) != (0.0, 0.0, float(iw), float(ih)):
            span_w, span_h = (bx0, bx1), (by0, by1)
    if method == "pil_nearest":
        # PIL.Image.NEAREST is a point sample through the affine scaler,
        # not the resample machinery — a pure index gather, trivially
        # bit-exact.  It is named 'pil_nearest' here because this library
        # (following the reference, test.py) uses 'nearest' for PIL's BOX
        # antialias filter; the two are very different resamplers.
        y = jnp.take(
            x, jnp.asarray(_nearest_indices(x.shape[h_axis], oh, span_h)),
            axis=h_axis,
        )
        return jnp.take(
            y, jnp.asarray(_nearest_indices(x.shape[w_axis], ow, span_w)),
            axis=w_axis,
        )
    if span_h is not None or span_w is not None:
        # Resize-box route: banded int32 contraction — the identical Pillow
        # fixed-point arithmetic with [out, ntaps] tables (the digit TPU
        # kernels are span-agnostic; the band tracks filter support, not
        # image size, so this also serves 4K-class inputs).
        th = _int_tables(x.shape[h_axis], oh, method, span_h, pb)
        tw = _int_tables(x.shape[w_axis], ow, method, span_w, pb)
        y = jnp.moveaxis(x, w_axis, -1)
        y = _pass_last_int_banded(y, jnp.asarray(tw[0]), jnp.asarray(tw[1]),
                                  pb)
        y = jnp.moveaxis(y, -1, w_axis)
        y = jnp.moveaxis(y, h_axis, -1)
        y = _pass_last_int_banded(y, jnp.asarray(th[0]), jnp.asarray(th[1]),
                                  pb)
        return jnp.moveaxis(y, -1, h_axis)
    # TPU fast path: single-kernel digit-split pipeline (bit-identical).
    if _use_tpu_kernels():
        trailing = h_axis == x.ndim - 2 and w_axis == x.ndim - 1
        channels_last = (
            x.ndim >= 3 and h_axis == x.ndim - 3 and w_axis == x.ndim - 2
        )
        xk = x
        if channels_last:  # C-sized lanes waste the MXU; transpose round-trip
            xk = jnp.moveaxis(x, -1, -3)
        if trailing or channels_last:

            lead = xk.shape[:-2]
            B = int(np.prod(lead)) if lead else 1
            x3 = None
            if pil_exact_pallas_supported(xk.shape, oh, ow, method):
                if debug_enabled():
                    print("[ia-tpu] pil_exact digit-split single-kernel")
                x3 = _resize_pil_exact_pallas(
                    xk.reshape(B, xk.shape[-2], xk.shape[-1]), oh, ow, method,
                    pb=pb, ndig=ndig,
                )
            elif pil_exact_streamed_supported(xk.shape, oh, ow, method):
                # too large for whole-image VMEM blocks (e.g. 4K frames):
                # stream halo'd row windows, still bit-identical
                if debug_enabled():
                    print("[ia-tpu] pil_exact digit-split streamed")
                x3 = _resize_pil_exact_streamed(
                    xk.reshape(B, xk.shape[-2], xk.shape[-1]), oh, ow, method,
                    pb=pb, ndig=ndig,
                )
            if x3 is not None:
                y = x3.reshape(*lead, oh, ow)
                return jnp.moveaxis(y, -3, -1) if channels_last else y
    Mh = jnp.asarray(_int_matrix(x.shape[h_axis], oh, method, None, pb))
    Mw = jnp.asarray(_int_matrix(x.shape[w_axis], ow, method, None, pb))
    # Pillow: horizontal pass first, uint8 intermediate, then vertical.
    y = jnp.moveaxis(x, w_axis, -1)
    y = _pass_last_int(y, Mw, pb)
    y = jnp.moveaxis(y, -1, w_axis)
    y = jnp.moveaxis(y, h_axis, -1)
    y = _pass_last_int(y, Mh, pb)
    return jnp.moveaxis(y, -1, h_axis)
