"""Pallas TPU kernels for the banded-contraction resize passes.

This is the rebuild of the reference's L0 hot loops
(``interpolate_aa_single_dim*``, step_two_dot_two/aa_interpolation_impl.h:29-120)
— but instead of a per-output-pixel gather-MAC with a runtime tap count, each
output tile is one static-shape MXU matmul against a tile of the banded
weight matrix:

  * pass over the LAST axis:      ``out[mt, jt] = x[mt, s_j : s_j+K] @ B_j``
  * pass over a MIDDLE axis:      ``out[b, jt, wt] = B_j^T @ x[b, s_j:s_j+K, wt]``

with ``B_j in [K, TILE]`` the tile-compacted band (weights.banded_tiles) and
``s_j`` the per-tile input window start (scalar, SMEM).  The full band is held
VMEM-resident (its index_map is constant, so it is DMA'd exactly once),
x row-blocks stream through VMEM, and the window slice is a VMEM ``pl.ds`` —
no gathers, no dynamic shapes, MXU-shaped tiles throughout.

Because the workload is HBM-bandwidth-bound, the kernels do dtype
conversion **in VMEM**: uint8 / bfloat16 inputs are sliced raw and widened
to float32 in-register, and uint8 outputs are rounded PIL-style
(floor(v+0.5), clip [0,255]) before the store — input and output travel
HBM at 1 or 2 bytes/px instead of 4.  Accumulation is always float32.

Two band sources:
  * ``fused=False`` — band precomputed on host in float64 (bit-matches the
    XLA oracle path; the default).
  * ``fused=True``  — band synthesised *inside the kernel* from the closed
    form (broadcasted_iota + filter + per-column normalisation), the answer
    to the reference's CUDA question of precompute-vs-fuse
    (playground_cuda/playground.cu:31-62): zero band HBM traffic.  Only for
    continuous filters (see _synth_band).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .pallas_compat import block_spec as _bspec
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import debug_enabled, default_precision
from .weights import AxisSpec, BandedTiles, banded_tiles

__all__ = ["resize_axis_pallas", "pallas_supported"]

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # headroom below the ~16MB/core VMEM


def compact_lanes(y: jax.Array, tile: int) -> jax.Array:
    """Compact sub-128 W tiles out of their fixed 128-lane slots.

    The streamed kernels' W pass keeps sub-128 output tiles at lane pitch
    128 (lane slicing is only free at 128-multiples inside a kernel), so
    tile ``j``'s valid columns live at lanes ``[j*128, j*128+tile)`` of
    the raw kernel output.  One XLA strided slice on the final array
    (runs at HBM stream rate) packs them; shared by resize2d_streamed and
    pil_exact so the two routes can never diverge on the layout."""
    if tile == _LANE:
        return y
    *lead, n = y.shape
    return y.reshape(*lead, n // _LANE, _LANE)[..., :tile].reshape(
        *lead, (n // _LANE) * tile
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sublane(dtype) -> int:
    """Minimum sublane granularity per dtype ((8,128) f32, (16,128) bf16,
    (32,128) int8/uint8)."""
    if dtype in (jnp.uint8, jnp.int8):
        return 32
    if dtype == jnp.bfloat16:
        return 16
    return 8


def _widen(win):
    """Widen a raw VMEM tile to float32 (Mosaic has no direct u8->f32)."""
    if win.dtype == jnp.uint8:
        return win.astype(jnp.int32).astype(jnp.float32)
    if win.dtype == jnp.float32:
        return win
    return win.astype(jnp.float32)


def _store(o_ref, idx, val_f32, out_dtype):
    if out_dtype == jnp.uint8:
        v = jnp.clip(jnp.floor(val_f32 + 0.5), 0.0, 255.0)
        o_ref[idx] = v.astype(jnp.int32).astype(jnp.uint8)
    else:
        o_ref[idx] = val_f32.astype(out_dtype)


def _quant_u8grid(v):
    """Round/clamp to the uint8 lattice but stay float.

    The u8->u8 pipelines apply this to the pass-1 intermediate, exactly
    like Pillow quantises its horizontal-pass output to uint8 before the
    vertical pass (ImagingResampleHorizontal_8bpc's clip8) — the reference
    inherits that via its PIL oracle.  Besides tracking the oracle more
    closely, integers 0..255 are bf16-exact, so the H pass's pixel operand
    loses its lo digit and the split contraction drops from 3 to 2 bf16
    MXU passes (~12% of the headline's executed MACs)."""
    return jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)


def _resolve_precision(precision):
    """Map the public dial (split|bf16|f32, env IA_TPU_PRECISION) to the
    kernel-level precision argument; pass-through for explicit jax
    Precision values or 'split'."""
    if precision == "default":
        precision = default_precision()
    if precision == "bf16":
        return jax.lax.Precision.DEFAULT
    if precision == "f32":
        return jax.lax.Precision.HIGHEST
    return precision


def _mxu_dot(a, b, dims, precision, a_exact_bf16=False, b_exact_bf16=False):
    """Banded contraction with a precision/speed dial.

    ``precision='split'`` decomposes the f32 operands into bf16 hi+lo parts
    and runs 1-3 native-rate bf16 MXU passes with f32 accumulation:
    ``a@b ~= a_hi@b_hi (+ a_hi@b_lo) (+ a_lo@b_hi)``, dropping the lo*lo term
    (~2^-16 relative).  An operand that came from uint8 pixels or was already
    bfloat16 is *exact* in bf16, so its lo term vanishes and that pass is
    skipped — pass the matching ``*_exact_bf16`` flag.  The weight band is
    always split (its bf16 rounding alone would cost ~0.4%): in the
    last-axis kernels the band is ``b``, in the mid-axis kernels it is
    ``a``, so callers set the flag for whichever operand holds pixels.
    """
    if precision == "split":
        a_hi = a.astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        y = jax.lax.dot_general(a_hi, b_hi, dims, preferred_element_type=jnp.float32)
        if not b_exact_bf16:
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = y + jax.lax.dot_general(
                a_hi, b_lo, dims, preferred_element_type=jnp.float32
            )
        if not a_exact_bf16:
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            y = y + jax.lax.dot_general(
                a_lo, b_hi, dims, preferred_element_type=jnp.float32
            )
        return y
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=precision
    )


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _kernel_last(
    starts_ref, x_ref, band_ref, o_ref, *, k_in, precision, out_dtype, in_align,
    in_exact
):
    """out[MT, TILE] = cast(x[MT, s:s+K]) @ band[j]."""
    j = pl.program_id(1)
    s = pl.multiple_of(starts_ref[j], in_align)
    win = _widen(x_ref[:, pl.ds(s, k_in)])
    y = _mxu_dot(win, band_ref[j], (((1,), (0,)), ((), ())), precision, in_exact)
    _store(o_ref, (slice(None), slice(None)), y, out_dtype)


def _kernel_mid(
    starts_ref, x_ref, band_ref, o_ref, *, k_in, precision, out_dtype, in_align,
    in_exact
):
    """out[1, TILE, WT] = band[j]^T @ cast(x[1, s:s+K, WT])."""
    j = pl.program_id(2)
    s = pl.multiple_of(starts_ref[j], in_align)
    win = _widen(x_ref[0, pl.ds(s, k_in), :])
    y = _mxu_dot(band_ref[j], win, (((0,), (0,)), ((), ())), precision,
                 b_exact_bf16=in_exact)
    _store(o_ref, (0, slice(None), slice(None)), y, out_dtype)


def _synth_band(spec: AxisSpec, start, j, tile: int, k_in: int):
    """Build the [k_in, tile] band tile in-register from the closed form.

    Valid for *continuous* filters (bilinear/bicubic/lanczos): taps at the
    window's floor-boundary carry ~zero weight there, so masking by the
    input range alone reproduces the reference's clipped+renormalised
    windows up to float32 filter-evaluation error.  The box filter is
    discontinuous at its support edge, so fused synthesis is disallowed for
    box/nearest (the host-table path is used instead) — the same boundary
    hazard the reference hit with static unrolling
    (step_three/aa_interpolation_impl.h:84-88 "static-5 ... INCORRECT").
    """
    o_global = jax.lax.broadcasted_iota(jnp.int32, (k_in, tile), 1) + j * tile
    k = jax.lax.broadcasted_iota(jnp.int32, (k_in, tile), 0)
    if spec.align_corners:
        center = spec.scale * o_global.astype(jnp.float32) + 0.5
    else:
        center = spec.scale * (o_global.astype(jnp.float32) + 0.5)
        if spec.span is not None:
            # fractional source window (PIL resize box): offset the centers
            center = center + jnp.float32(spec.span[0])
    pos = (start + k).astype(jnp.float32)  # absolute input position of tap k
    arg = (pos - center + 0.5) * spec.invscale
    w = spec.filter(arg, jnp)
    valid = (pos >= 0.0) & (pos <= float(spec.in_size) - 1.0)
    w = jnp.where(valid, w, 0.0)
    total = jnp.sum(w, axis=0, keepdims=True)
    return w / jnp.where(total == 0.0, 1.0, total)


def _kernel_last_fused(
    starts_ref, x_ref, o_ref, *, spec, tile, k_in, precision, out_dtype, in_align,
    in_exact
):
    j = pl.program_id(1)
    s = pl.multiple_of(starts_ref[j], in_align)
    band = _synth_band(spec, s, j, tile, k_in)
    win = _widen(x_ref[:, pl.ds(s, k_in)])
    y = _mxu_dot(win, band, (((1,), (0,)), ((), ())), precision, in_exact)
    _store(o_ref, (slice(None), slice(None)), y, out_dtype)


def _kernel_mid_fused(
    starts_ref, x_ref, o_ref, *, spec, tile, k_in, precision, out_dtype, in_align,
    in_exact
):
    j = pl.program_id(2)
    s = pl.multiple_of(starts_ref[j], in_align)
    band = _synth_band(spec, s, j, tile, k_in)
    win = _widen(x_ref[0, pl.ds(s, k_in), :])
    y = _mxu_dot(band, win, (((0,), (0,)), ((), ())), precision,
                 b_exact_bf16=in_exact)
    _store(o_ref, (0, slice(None), slice(None)), y, out_dtype)


# ---------------------------------------------------------------------------
# Static-unrolled kernel bodies (few fat grid steps; per-tile window starts
# are Python constants, so every slice is static)
# ---------------------------------------------------------------------------


def _kernel_last_unrolled(
    x_ref, band_ref, o_ref, *, starts, k_in, tile, precision, out_dtype,
    in_exact=False, fused_spec=None, quant_inter=False
):
    """out[MT, OUT_PAD] = concat_t cast(x[MT, s_t:s_t+K]) @ band[t]."""
    for t, s in enumerate(starts):
        if fused_spec is not None:
            band_t = _synth_band(fused_spec, s, t, tile, k_in)
        else:
            band_t = band_ref[t]
        win = _widen(x_ref[:, s : s + k_in])
        y = _mxu_dot(win, band_t, (((1,), (0,)), ((), ())), precision, in_exact)
        if quant_inter:
            y = _quant_u8grid(y)
        _store(o_ref, (slice(None), slice(t * tile, (t + 1) * tile)), y, out_dtype)


def _kernel_mid_unrolled(
    x_ref, band_ref, o_ref, *, starts, k_in, tile, bt, precision, out_dtype,
    in_exact=False, fused_spec=None
):
    """out[BT, OUT_PAD, WT] = per-image band^T @ cast(x[bi, s_t:s_t+K, :])."""
    for t, s in enumerate(starts):
        if fused_spec is not None:
            band_t = _synth_band(fused_spec, s, t, tile, k_in)
        else:
            band_t = band_ref[t]
        for bi in range(bt):
            win = _widen(x_ref[bi, s : s + k_in, :])
            y = _mxu_dot(band_t, win, (((0,), (0,)), ((), ())), precision,
                         b_exact_bf16=in_exact)
            _store(
                o_ref, (bi, slice(t * tile, (t + 1) * tile), slice(None)), y, out_dtype
            )


# ---------------------------------------------------------------------------
# Host-side drivers
# ---------------------------------------------------------------------------

_MAX_UNROLL_TILES = 32


@functools.cache
def _tiles_cached(spec: AxisSpec, tile: int, align: int) -> BandedTiles:
    return banded_tiles(spec, tile=tile, dtype=np.float32, align=align)


@functools.cache
def _transpose_tiles_cached(spec: AxisSpec, tile: int, align: int) -> BandedTiles:
    """Tiles of the adjoint matrix W^T — the backward pass's band."""
    from .weights import banded_tiles_from_matrix, dense_matrix

    Wt = dense_matrix(spec, dtype=np.float64).T
    return banded_tiles_from_matrix(Wt, tile=tile, dtype=np.float32, align=align)


def _pass_last(x2, spec, fused, precision, out_dtype, tiles=None, out_size=None):
    """x2: [M, IN] (u8/bf16/f32) -> [M, OUT] out_dtype."""
    M, IN = x2.shape
    in_exact = x2.dtype in (jnp.uint8, jnp.bfloat16)  # exact in bf16
    out_size = out_size if out_size is not None else spec.out_size
    bt = tiles if tiles is not None else _tiles_cached(spec, _LANE, _LANE)
    in_pad = max(_round_up(IN, _LANE), bt.k_in)
    ibytes = x2.dtype.itemsize
    obytes = jnp.dtype(out_dtype).itemsize
    sub = max(_sublane(x2.dtype), _sublane(out_dtype))

    # Preferred shape: static-unrolled kernel writing full output rows —
    # one grid step per row-tile (per-step overhead amortised over all
    # output tiles).  Fall back to the streamed per-tile kernel when the
    # row blocks would not fit VMEM.
    def row_bytes(mt):
        return mt * (in_pad * ibytes + bt.out_padded * obytes)

    mt = min(1024, max(sub, (_VMEM_BUDGET // 2) // max(row_bytes(1), 1)))
    mt = max(sub, (mt // sub) * sub)
    band_bytes = bt.n_tiles * bt.k_in * _LANE * 4
    use_unrolled = (
        bt.n_tiles <= _MAX_UNROLL_TILES
        and row_bytes(mt) * 2 + band_bytes <= _VMEM_BUDGET
    )
    if use_unrolled:
        m_pad = _round_up(max(M, mt), mt)
        x2 = jnp.pad(x2, ((0, m_pad - M), (0, in_pad - IN)))
        starts_static = tuple(int(s) for s in bt.starts)
        body = functools.partial(
            _kernel_last_unrolled,
            starts=starts_static,
            k_in=bt.k_in,
            tile=_LANE,
            precision=precision,
            out_dtype=out_dtype,
            in_exact=in_exact,
            fused_spec=spec if fused else None,
        )
        in_specs = [
            _bspec((mt, in_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ]
        operands = [x2]
        if not fused:
            in_specs.append(
                _bspec(
                    (bt.n_tiles, bt.k_in, _LANE),
                    lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(jnp.asarray(bt.band))
            kern = body
        else:
            kern = lambda x_ref, o_ref: body(x_ref, None, o_ref)
        # ragged output (round 5): emit [M, out_size] directly — pallas
        # clips the last/partial blocks' stores, so no slice-copy epilogue
        y = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, out_size), out_dtype),
            out_specs=_bspec(
                (mt, bt.out_padded), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            grid=(m_pad // mt,),
            in_specs=in_specs,
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * bt.k_in * bt.out_padded,
                bytes_accessed=m_pad * in_pad * ibytes
                + m_pad * bt.out_padded * obytes
                + band_bytes,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(*operands)
        return y

    mt = min(512, (_VMEM_BUDGET // 3) // max(in_pad * ibytes, 1))
    mt = max(sub, (mt // sub) * sub)
    m_pad = _round_up(max(M, mt), mt)
    x2 = jnp.pad(x2, ((0, m_pad - M), (0, in_pad - IN)))
    starts = jnp.asarray(bt.starts, dtype=jnp.int32)
    grid = (m_pad // mt, bt.n_tiles)

    common = dict(
        # ragged: [M, out_size] emitted directly (see unrolled variant)
        out_shape=jax.ShapeDtypeStruct((M, out_size), out_dtype),
        out_specs=_bspec(
            (mt, _LANE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        grid=grid,
        interpret=_interpret(),
    )
    cost = pl.CostEstimate(
        flops=2 * m_pad * bt.k_in * bt.out_padded,
        bytes_accessed=m_pad * in_pad * ibytes
        + m_pad * bt.out_padded * jnp.dtype(out_dtype).itemsize
        + bt.band.size * 4,
        transcendentals=0,
    )
    kw = dict(k_in=bt.k_in, precision=precision, out_dtype=out_dtype, in_align=_LANE, in_exact=in_exact)
    if fused:
        y = pl.pallas_call(
            functools.partial(_kernel_last_fused, spec=spec, tile=_LANE, **kw),
            in_specs=[
                _bspec(memory_space=pltpu.SMEM),
                _bspec((mt, in_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x2)
    else:
        band = jnp.asarray(bt.band)  # [n_tiles, k_in, tile] — VMEM-resident
        y = pl.pallas_call(
            functools.partial(_kernel_last, **kw),
            in_specs=[
                _bspec(memory_space=pltpu.SMEM),
                _bspec((mt, in_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                _bspec(
                    (bt.n_tiles, bt.k_in, _LANE),
                    lambda i, j: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x2, band)
    return y


def _pass_mid(x3, spec, fused, precision, out_dtype, tiles=None, out_size=None):
    """x3: [B, IN, W] (u8/bf16/f32) -> [B, OUT, W] out_dtype (axis-1 pass)."""
    B, IN, W = x3.shape
    in_exact = x3.dtype in (jnp.uint8, jnp.bfloat16)  # exact in bf16
    out_size = out_size if out_size is not None else spec.out_size
    in_align = _sublane(x3.dtype)  # sublane-dim windows
    bt = tiles if tiles is not None else _tiles_cached(spec, _LANE, in_align)
    in_pad = max(_round_up(IN, in_align), bt.k_in)
    w_pad = _round_up(W, _LANE)
    ibytes = x3.dtype.itemsize
    obytes = jnp.dtype(out_dtype).itemsize
    band_bytes = bt.n_tiles * bt.k_in * _LANE * 4

    # Preferred: static-unrolled kernel over several images per step.
    def blk_bytes(bsz, wtile):
        return bsz * wtile * (in_pad * ibytes + bt.out_padded * obytes)

    wt0 = min(512, max(_LANE, w_pad))
    wt0 = max(_LANE, (wt0 // _LANE) * _LANE)
    bsz = max(1, (_VMEM_BUDGET // 2) // max(blk_bytes(1, wt0), 1))
    bsz = min(bsz, 8, B)
    use_unrolled = (
        bt.n_tiles <= _MAX_UNROLL_TILES
        and blk_bytes(bsz, wt0) * 2 + band_bytes <= _VMEM_BUDGET
    )
    if use_unrolled:
        wt = wt0
        w_pad2 = _round_up(w_pad, wt)
        b_pad = _round_up(B, bsz)
        x3 = jnp.pad(x3, ((0, b_pad - B), (0, in_pad - IN), (0, w_pad2 - W)))
        starts_static = tuple(int(s) for s in bt.starts)
        body = functools.partial(
            _kernel_mid_unrolled,
            starts=starts_static,
            k_in=bt.k_in,
            tile=_LANE,
            bt=bsz,
            precision=precision,
            out_dtype=out_dtype,
            in_exact=in_exact,
            fused_spec=spec if fused else None,
        )
        in_specs = [
            _bspec(
                (bsz, in_pad, wt), lambda b, k: (b, 0, k), memory_space=pltpu.VMEM
            )
        ]
        operands = [x3]
        if not fused:
            in_specs.append(
                _bspec(
                    (bt.n_tiles, bt.k_in, _LANE),
                    lambda b, k: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(jnp.asarray(bt.band))
            kern = body
        else:
            kern = lambda x_ref, o_ref: body(x_ref, None, o_ref)
        y = pl.pallas_call(
            kern,
            # ragged: [B, out_size, W] emitted directly (round 5)
            out_shape=jax.ShapeDtypeStruct((B, out_size, W), out_dtype),
            out_specs=_bspec(
                (bsz, bt.out_padded, wt), lambda b, k: (b, 0, k),
                memory_space=pltpu.VMEM,
            ),
            grid=(b_pad // bsz, w_pad2 // wt),
            in_specs=in_specs,
            cost_estimate=pl.CostEstimate(
                flops=2 * b_pad * w_pad2 * bt.k_in * bt.out_padded,
                bytes_accessed=b_pad * in_pad * w_pad2 * ibytes
                + b_pad * bt.out_padded * w_pad2 * obytes
                + band_bytes,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(*operands)
        return y

    wt = min(512, (_VMEM_BUDGET // 3) // max(in_pad * ibytes, 1))
    wt = max(_LANE, (wt // _LANE) * _LANE)
    w_pad = _round_up(w_pad, wt)
    x3 = jnp.pad(x3, ((0, 0), (0, in_pad - IN), (0, w_pad - W)))
    starts = jnp.asarray(bt.starts, dtype=jnp.int32)
    # out sublane dim is the OH tile (128) — fine for every out dtype.
    grid = (B, w_pad // wt, bt.n_tiles)

    common = dict(
        # ragged: [B, out_size, W] emitted directly (round 5)
        out_shape=jax.ShapeDtypeStruct((B, out_size, W), out_dtype),
        out_specs=_bspec(
            (1, _LANE, wt), lambda b, k, j: (b, j, k), memory_space=pltpu.VMEM
        ),
        grid=grid,
        interpret=_interpret(),
    )
    cost = pl.CostEstimate(
        flops=2 * B * w_pad * bt.k_in * bt.out_padded,
        bytes_accessed=B * in_pad * w_pad * ibytes
        + B * bt.out_padded * w_pad * jnp.dtype(out_dtype).itemsize
        + bt.band.size * 4,
        transcendentals=0,
    )
    kw = dict(k_in=bt.k_in, precision=precision, out_dtype=out_dtype, in_align=in_align, in_exact=in_exact)
    if fused:
        y = pl.pallas_call(
            functools.partial(_kernel_mid_fused, spec=spec, tile=_LANE, **kw),
            in_specs=[
                _bspec(memory_space=pltpu.SMEM),
                _bspec(
                    (1, in_pad, wt), lambda b, k, j: (b, 0, k), memory_space=pltpu.VMEM
                ),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x3)
    else:
        band = jnp.asarray(bt.band)
        y = pl.pallas_call(
            functools.partial(_kernel_mid, **kw),
            in_specs=[
                _bspec(memory_space=pltpu.SMEM),
                _bspec(
                    (1, in_pad, wt), lambda b, k, j: (b, 0, k), memory_space=pltpu.VMEM
                ),
                _bspec(
                    (bt.n_tiles, bt.k_in, _LANE),
                    lambda b, k, j: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x3, band)
    return y


def banded_pass_mid_dynamic(
    x3: jax.Array,
    starts: jax.Array,
    band: jax.Array,
    out_size: int,
    precision="default",
    out_dtype=None,
) -> jax.Array:
    """Axis-1 banded contraction with *traced* starts and band values.

    ``x3 [B, IN, W]``, ``starts [n_tiles] int32`` (each a multiple of 8),
    ``band [n_tiles, k_in, 128] f32`` -> ``[B, out_size, W]``.

    Unlike :func:`_pass_mid`, the band geometry (n_tiles, k_in) is static
    but the VALUES (weights and window starts) are runtime arrays — this is
    what the sharded halo pass needs: under ``shard_map`` every device runs
    the same program, selecting its own shard's band with
    ``lax.axis_index``.  Reuses the `_kernel_mid` body (SMEM starts are
    runtime values there anyway).
    """
    precision = _resolve_precision(precision)
    B, IN, W = x3.shape
    n_tiles, k_in, tile = band.shape
    assert tile == _LANE
    if out_dtype is None:
        out_dtype = x3.dtype if x3.dtype != jnp.uint8 else jnp.float32
    out_dtype = jnp.dtype(out_dtype)
    in_align = 8
    in_pad = max(_round_up(IN, in_align), k_in)
    out_padded = n_tiles * _LANE
    ibytes = x3.dtype.itemsize
    wt = min(512, (_VMEM_BUDGET // 3) // max(in_pad * ibytes, 1))
    wt = max(_LANE, (wt // _LANE) * _LANE)
    w_pad = _round_up(max(W, wt), wt)
    x3 = jnp.pad(x3, ((0, 0), (0, in_pad - IN), (0, w_pad - W)))
    grid = (B, w_pad // wt, n_tiles)
    y = pl.pallas_call(
        functools.partial(
            _kernel_mid,
            k_in=k_in,
            precision=precision,
            out_dtype=out_dtype,
            in_align=in_align,
            in_exact=x3.dtype in (jnp.uint8, jnp.bfloat16),
        ),
        # ragged: [B, out_size, W] emitted directly (round 5)
        out_shape=jax.ShapeDtypeStruct((B, out_size, W), out_dtype),
        out_specs=_bspec(
            (1, _LANE, wt), lambda b, k, j: (b, j, k), memory_space=pltpu.VMEM
        ),
        grid=grid,
        in_specs=[
            _bspec(memory_space=pltpu.SMEM),
            _bspec(
                (1, in_pad, wt), lambda b, k, j: (b, 0, k),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (n_tiles, k_in, _LANE), lambda b, k, j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * w_pad * k_in * out_padded,
            bytes_accessed=B * in_pad * w_pad * ibytes
            + B * out_padded * w_pad * out_dtype.itemsize
            + band.size * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(starts.astype(jnp.int32), x3, band.astype(jnp.float32))
    return y


def pallas_supported(x: jax.Array, spec: AxisSpec, axis: int) -> bool:
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.uint8):
        return False
    axis = axis % x.ndim
    trail = int(np.prod(x.shape[axis + 1 :])) if axis + 1 < x.ndim else 1
    align = _LANE if trail == 1 else _sublane(x.dtype)
    bt = _tiles_cached(spec, _LANE, align)
    in_pad = max(_round_up(spec.in_size, align), bt.k_in)
    band_bytes = bt.n_tiles * bt.k_in * _LANE * 4
    if band_bytes > _VMEM_BUDGET // 2:
        return False
    if in_pad * x.dtype.itemsize * 32 > _VMEM_BUDGET // 3:  # even 32 rows too big
        return False
    return True


def resize_axis_pallas(
    x: jax.Array,
    spec: AxisSpec,
    axis: int,
    fused: bool = False,
    precision="default",
    out_dtype=None,
) -> jax.Array:
    """Resize ``axis`` of ``x`` (any rank) with the Pallas banded kernels.

    The array is viewed as ``[lead..., IN, trail...]``; trailing axes are
    flattened into the lane dimension (middle-axis kernel) or, when there
    are none, the leading axes are flattened into rows (last-axis kernel) —
    so both NCHW and NHWC run without transposes.

    ``x`` may be uint8 / bfloat16 / float32 (widened to f32 in VMEM);
    ``out_dtype`` may be uint8 (PIL-style round+clip in-kernel), bfloat16
    or float32.  Default out_dtype: f32 for u8 inputs, else x.dtype.
    """
    precision = _resolve_precision(precision)
    if x.shape[axis] != spec.in_size:
        raise ValueError(f"axis {axis} has {x.shape[axis]} != {spec.in_size}")
    if fused and (spec.mode in ("box", "nearest", "area")
                  or spec.border != "renorm"):
        fused = False  # discontinuous filter / replicate borders (see _synth_band)
    if out_dtype is None:
        out_dtype = jnp.float32 if x.dtype == jnp.uint8 else x.dtype
    out_dtype = jnp.dtype(out_dtype)
    axis = axis % x.ndim
    lead, trail = x.shape[:axis], x.shape[axis + 1 :]
    nlead = int(np.prod(lead)) if lead else 1
    ntrail = int(np.prod(trail)) if trail else 1
    if debug_enabled():
        print(
            f"[ia-tpu] pallas {'mid' if ntrail > 1 else 'last'} axis={axis} "
            f"{spec.in_size}->{spec.out_size} {x.dtype}->{out_dtype} fused={fused}"
        )
    if ntrail == 1:
        y = _pass_last(x.reshape(nlead, spec.in_size), spec, fused, precision, out_dtype)
        return y.reshape(*lead, spec.out_size, *trail)
    y = _pass_mid(
        x.reshape(nlead, spec.in_size, ntrail), spec, fused, precision, out_dtype
    )
    return y.reshape(*lead, spec.out_size, *trail)


# ---------------------------------------------------------------------------
# Fused two-pass pipeline: pad once, chain W then H pass entirely in padded
# layout, slice once at the end.  Removes the inter-pass pad/slice copies
# (each a full read+write of the intermediate) that dominate the separate-
# pass path on bandwidth-bound chips.
# ---------------------------------------------------------------------------


def _divisor_near(n: int, target: int) -> int:
    """Largest divisor of n that is <= target (>=1)."""
    d = min(max(target, 1), n)
    while n % d:
        d -= 1
    return d


def resize2d_supported(
    x: jax.Array, spec_h: AxisSpec, spec_w: AxisSpec, inter_dtype=jnp.float32
) -> bool:
    """Admission check for :func:`resize2d_pallas` — must mirror the tile
    geometry the kernel actually builds (same ``inter_dtype``-dependent
    sublane alignment), or the router would admit shapes the kernel cannot
    compile."""
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.uint8):
        return False
    if x.ndim < 2:
        return False
    ii = jnp.dtype(inter_dtype).itemsize
    btw = _tiles_cached(spec_w, _LANE, _LANE)
    bth = _tiles_cached(spec_h, _LANE, _sublane(jnp.dtype(inter_dtype)))
    if btw.n_tiles > _MAX_UNROLL_TILES or bth.n_tiles > _MAX_UNROLL_TILES:
        return False
    w_pad = max(_round_up(spec_w.in_size, _LANE), btw.k_in)
    h_pad = _round_up(
        max(_round_up(spec_h.in_size, _sublane(jnp.dtype(inter_dtype))), bth.k_in),
        _LANE,
    )
    band_bytes = (btw.n_tiles * btw.k_in + bth.n_tiles * bth.k_in) * _LANE * 4
    # pass 1 tiles by rows (any divisor of h_pad), pass 2 chunks the width
    # (any 128-multiple divisor of ow_pad) — both need just one minimal
    # block + the resident band in VMEM.
    p1_min = _LANE * (w_pad * x.dtype.itemsize + btw.out_padded * ii)
    p2_min = _LANE * (h_pad * ii + bth.out_padded * ii)
    return (
        p1_min * 2 + band_bytes <= _VMEM_BUDGET
        and p2_min * 2 + band_bytes <= _VMEM_BUDGET
    )


def resize2d_pallas(
    x: jax.Array,
    spec_h: AxisSpec,
    spec_w: AxisSpec,
    out_dtype=None,
    inter_dtype=jnp.float32,
    precision="default",
    fused: bool = False,
) -> jax.Array:
    """Separable 2-D resize of the trailing [H, W] axes with one input pad
    and one output slice.

    Pipeline: pad x to [B, H_pad, W_pad] (H_pad a multiple of 128 so pass-1
    row-tiles align with image boundaries) → last-axis kernel over rows
    (u8/bf16 decode in-kernel) → reshape (free) → middle-axis kernel per
    image (u8 encode in-kernel) → slice.  The intermediate stays in its
    padded [B, H_pad, OW_padded] form and never round-trips through
    pad/slice copies.
    """
    precision = _resolve_precision(precision)
    if out_dtype is None:
        out_dtype = jnp.float32 if x.dtype == jnp.uint8 else x.dtype
    out_dtype = jnp.dtype(out_dtype)
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    H, W = x.shape[-2], x.shape[-1]
    if fused and (spec_w.mode in ("box", "nearest", "area")
                  or spec_w.border != "renorm"):
        fused = False

    btw = _tiles_cached(spec_w, _LANE, _LANE)
    bth = _tiles_cached(spec_h, _LANE, _sublane(inter_dtype))
    w_pad = max(_round_up(W, _LANE), btw.k_in)
    h_pad = _round_up(max(_round_up(H, 8), bth.k_in), _LANE)
    ow_pad = btw.out_padded  # multiple of 128 — serves as pass-2 lane tile
    oh_pad = bth.out_padded

    xp = jnp.pad(x.reshape(B, H, W), ((0, 0), (0, h_pad - H), (0, w_pad - W)))

    # ---- pass 1: rows (contract W) ----
    ib = x.dtype.itemsize
    rows_budget = max(1, (_VMEM_BUDGET // 3) // max(w_pad * ib + ow_pad * 4, 1))
    if rows_budget >= h_pad:
        # whole images per block
        mt = _divisor_near(B, rows_budget // h_pad) * h_pad
    else:
        # sub-image row tiles: any 128-multiple divisor of h_pad works
        # (rows of pass 1 are independent and image boundaries stay
        # block-aligned; 128 always divides h_pad and satisfies every
        # dtype's sublane granularity)
        cands = [
            d
            for d in range(_LANE, h_pad + 1, _LANE)
            if h_pad % d == 0 and d <= rows_budget
        ]
        mt = max(cands) if cands else _LANE
    x2 = xp.reshape(B * h_pad, w_pad)
    starts_w = tuple(int(s) for s in btw.starts)
    quant_inter = bool(x.dtype == jnp.uint8 and out_dtype == jnp.uint8)
    body1 = functools.partial(
        _kernel_last_unrolled,
        starts=starts_w,
        k_in=btw.k_in,
        tile=_LANE,
        precision=precision,
        out_dtype=inter_dtype,
        in_exact=x.dtype in (jnp.uint8, jnp.bfloat16),
        fused_spec=spec_w if fused else None,
        quant_inter=quant_inter,
    )
    in_specs = [_bspec((mt, w_pad), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    operands = [x2]
    if not fused:
        in_specs.append(
            _bspec(
                (btw.n_tiles, btw.k_in, _LANE),
                lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(jnp.asarray(btw.band))
        kern1 = body1
    else:
        kern1 = lambda x_ref, o_ref: body1(x_ref, None, o_ref)
    t = pl.pallas_call(
        kern1,
        out_shape=jax.ShapeDtypeStruct((B * h_pad, ow_pad), inter_dtype),
        out_specs=_bspec((mt, ow_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        grid=(B * h_pad // mt,),
        in_specs=in_specs,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * h_pad * btw.k_in * ow_pad,
            bytes_accessed=B * h_pad * (w_pad * ib + ow_pad * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands)

    # ---- pass 2: per image (contract H), chunked along the width ----
    t3 = t.reshape(B, h_pad, ow_pad)
    ob = out_dtype.itemsize
    col_budget = max(1, (_VMEM_BUDGET // 3) // max(h_pad * 4 + oh_pad * ob, 1))
    wts = [
        d for d in range(_LANE, ow_pad + 1, _LANE) if ow_pad % d == 0 and d <= col_budget
    ]
    wt = max(wts) if wts else _LANE
    bsz = 1
    if wt == ow_pad:
        bsz = min(_divisor_near(B, col_budget // ow_pad), 8)
        while B % bsz:
            bsz -= 1
    starts_h = tuple(int(s) for s in bth.starts)
    body2 = functools.partial(
        _kernel_mid_unrolled,
        starts=starts_h,
        k_in=bth.k_in,
        tile=_LANE,
        bt=bsz,
        precision=precision,
        out_dtype=out_dtype,
        # bf16 inter is exact; so is a u8-grid-quantised f32 inter
        in_exact=quant_inter or jnp.dtype(inter_dtype) == jnp.bfloat16,
        fused_spec=spec_h if fused else None,
    )
    in_specs2 = [
        _bspec(
            (bsz, h_pad, wt), lambda b, k: (b, 0, k), memory_space=pltpu.VMEM
        )
    ]
    operands2 = [t3]
    if not fused:
        in_specs2.append(
            _bspec(
                (bth.n_tiles, bth.k_in, _LANE),
                lambda b, k: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands2.append(jnp.asarray(bth.band))
        kern2 = body2
    else:
        kern2 = lambda x_ref, o_ref: body2(x_ref, None, o_ref)
    # ragged output (round 5): emit [B, OH, OW] directly — pallas clips
    # the partial edge blocks — and iterate only the lane chunks that
    # intersect OW (dead all-padding chunks dropped from the grid)
    n_wchunks = -(-spec_w.out_size // wt)
    y = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct(
            (B, spec_h.out_size, spec_w.out_size), out_dtype
        ),
        out_specs=_bspec(
            (bsz, oh_pad, wt), lambda b, k: (b, 0, k), memory_space=pltpu.VMEM
        ),
        grid=(B // bsz, n_wchunks),
        in_specs=in_specs2,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_wchunks * wt * bth.k_in * oh_pad,
            bytes_accessed=B * ow_pad * (h_pad * 4 + oh_pad * ob),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*operands2)
    return y.reshape(*lead, spec_h.out_size, spec_w.out_size)


# ---------------------------------------------------------------------------
# Whole-image single-kernel pipeline: one pallas_call does BOTH separable
# passes per image, holding the intermediate in VMEM scratch.  HBM traffic is
# exactly input-bytes + output-bytes (+ the band, DMA'd once): no host pad, no
# intermediate round-trip, no output slice.  This is the speed-of-light
# formulation for images that fit VMEM (the reference's headline 906x438
# config and everything near it).
#
# The trick that removes the host pad: band-window starts are Python
# constants clamped into the *unpadded* input (weights.banded_tiles with
# align=1, in_cap=in_size), so every slice the kernel takes is a static
# in-bounds slice of an exact-shaped block — Mosaic masks the unaligned
# edges, and rows/cols it pads internally are never read.
# ---------------------------------------------------------------------------


@functools.cache
def _tiles_exact_cached(spec: AxisSpec, tile: int = _LANE) -> BandedTiles:
    return banded_tiles(spec, tile=tile, dtype=np.float32, align=1,
                        in_cap=spec.in_size)


@functools.cache
def _tiles_exact_h_cached(spec: AxisSpec) -> BandedTiles:
    """H-pass tiles at the cost-model-picked width (weights.pick_tile_h:
    sub-128 output tiles slice the contract-over-sublanes result for free
    and can drop whole 128-deep MXU K passes)."""
    from .weights import pick_tile_h

    return _tiles_exact_cached(spec, tile=pick_tile_h(spec))


def _onekernel_vmem(x_dtype, out_dtype, H, W, OH, OW, btw, bth, bsz) -> int:
    ib = jnp.dtype(x_dtype).itemsize
    ob = jnp.dtype(out_dtype).itemsize
    band_bytes = (btw.n_tiles * btw.k_in * btw.tile
                  + bth.n_tiles * bth.k_in * bth.tile) * 4
    per_img = (
        _round_up(H, 32) * _round_up(W, _LANE) * ib * 2  # in block, 2x buffered
        + _round_up(H, 8) * btw.out_padded * 4  # scratch intermediate
        + _round_up(OH, 32) * _round_up(OW, _LANE) * ob * 2  # out block
    )
    return bsz * per_img + band_bytes


def resize2d_onekernel_supported(
    x: jax.Array, spec_h: AxisSpec, spec_w: AxisSpec, out_dtype=None
) -> bool:
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.uint8):
        return False
    if x.ndim < 2:
        return False
    out_dtype = out_dtype if out_dtype is not None else (
        jnp.float32 if x.dtype == jnp.uint8 else x.dtype
    )
    H, W = spec_h.in_size, spec_w.in_size
    btw = _tiles_exact_cached(spec_w)
    bth = _tiles_exact_h_cached(spec_h)
    if btw.k_in > W or bth.k_in > H:
        return False
    if btw.n_tiles > _MAX_UNROLL_TILES or bth.n_tiles > _MAX_UNROLL_TILES:
        return False
    return (
        _onekernel_vmem(x.dtype, out_dtype, H, W, spec_h.out_size,
                        spec_w.out_size, btw, bth, 1)
        <= _VMEM_BUDGET
    )


def _kernel_2pass(
    x_ref, bandw_ref, bandh_ref, o_ref,
    *, bsz, H, OH, OW, starts_w, k_in_w, starts_h, k_in_h,
    precision, out_dtype, in_exact, quant_inter=False, tile_h=_LANE,
):
    per_img = []
    for bi in range(bsz):
        # pass 1: contract W for all H rows of image bi.  The intermediate
        # stays in SSA VALUES, not a VMEM scratch ref: a ref's conservative
        # memory-dependency ordering serializes the inter-pass VPU work
        # (quantise/convert) against in-flight matmuls — measured on the
        # digit kernel (benchmarks/epilogue_probe.py, 0.414 -> 0.376 ms).
        wtiles = []
        for t, s in enumerate(starts_w):
            win = _widen(x_ref[bi, :, s : s + k_in_w])  # (H, k_in_w)
            y = _mxu_dot(
                win, bandw_ref[t], (((1,), (0,)), ((), ())), precision, in_exact
            )
            wtiles.append(_quant_u8grid(y) if quant_inter else y)
        per_img.append(wtiles)
    # pass 2: contract H -> output rows.  All images' W passes are traced
    # before any H pass — the all-W-first structure gives the scheduler
    # the largest window of independent cross-image work to hide the
    # inter-pass VPU epilogues under (fastest of the bit-equivalent trace
    # structures probed on the digit kernel, epilogue_probe schedule).
    # Partial final tiles are static masked stores; o_ref is exact-shaped.
    for bi in range(bsz):
        wtiles = per_img[bi]
        inter = wtiles[0] if len(wtiles) == 1 else jnp.concatenate(
            wtiles, axis=1
        )
        for t, s in enumerate(starts_h):
            win = inter[s : s + k_in_h, :]  # (k_in_h, OWP)
            y = _mxu_dot(bandh_ref[t], win, (((0,), (0,)), ((), ())), precision,
                         b_exact_bf16=quant_inter)
            rows = min(tile_h, OH - t * tile_h)
            _store(
                o_ref,
                (bi, slice(t * tile_h, t * tile_h + rows), slice(0, OW)),
                y[:rows, :OW],
                out_dtype,
            )


def resize2d_onekernel(
    x: jax.Array,
    spec_h: AxisSpec,
    spec_w: AxisSpec,
    out_dtype=None,
    precision="default",
    tiles_w: BandedTiles | None = None,
    tiles_h: BandedTiles | None = None,
    out_h: int | None = None,
    out_w: int | None = None,
) -> jax.Array:
    """Separable 2-D resize of the trailing [H, W] axes in ONE pallas_call.

    Grid is over images only; each grid step DMAs one exact-shaped
    [bsz, H, W] block in, runs the W pass into a VMEM f32 scratch, the H
    pass out of it, and stores the exact-shaped [bsz, OH, OW] result
    (uint8 round+clip in-register when requested).  The rebuild's answer
    to the reference's whole optimisation journey (its best CPU kernel
    still paid two full passes over HBM-resident intermediates;
    step_two_dot_two/aa_interpolation_impl.h:655-679)."""
    precision = _resolve_precision(precision)
    if out_dtype is None:
        out_dtype = jnp.float32 if x.dtype == jnp.uint8 else x.dtype
    out_dtype = jnp.dtype(out_dtype)
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    H, W = x.shape[-2], x.shape[-1]
    OH = out_h if out_h is not None else spec_h.out_size
    OW = out_w if out_w is not None else spec_w.out_size
    btw = tiles_w if tiles_w is not None else _tiles_exact_cached(spec_w)
    bth = tiles_h if tiles_h is not None else _tiles_exact_h_cached(spec_h)

    # Largest image-count per grid step that fits VMEM (cap 8), preferring
    # divisors of B so the grid is exact.
    bsz = 1
    for cand in range(min(8, B), 0, -1):
        if B % cand == 0 and _onekernel_vmem(
            x.dtype, out_dtype, H, W, OH, OW, btw, bth, cand
        ) <= _VMEM_BUDGET:
            bsz = cand
            break

    x3 = x.reshape(B, H, W)
    kern = functools.partial(
        _kernel_2pass,
        bsz=bsz,
        H=H,
        OH=OH,
        OW=OW,
        starts_w=tuple(int(s) for s in btw.starts),
        k_in_w=btw.k_in,
        starts_h=tuple(int(s) for s in bth.starts),
        k_in_h=bth.k_in,
        precision=precision,
        out_dtype=out_dtype,
        in_exact=x.dtype in (jnp.uint8, jnp.bfloat16),
        quant_inter=bool(x.dtype == jnp.uint8 and out_dtype == jnp.uint8),
        tile_h=bth.tile,
    )
    ib = x.dtype.itemsize
    y = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, OH, OW), out_dtype),
        grid=(B // bsz,),
        in_specs=[
            _bspec((bsz, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            _bspec(
                (btw.n_tiles, btw.k_in, _LANE),
                lambda b: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (bth.n_tiles, bth.k_in, bth.tile),
                lambda b: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=_bspec(
            (bsz, OH, OW), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        # no scratch ref — the intermediate is SSA values (equivalent VMEM
        # still counted by _onekernel_vmem)
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * btw.k_in * btw.out_padded
            + 2 * B * btw.out_padded * bth.k_in * bth.out_padded,
            bytes_accessed=B * (H * W * ib + OH * OW * out_dtype.itemsize),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x3, jnp.asarray(btw.band), jnp.asarray(bth.band))
    return y.reshape(*lead, OH, OW)


# ---------------------------------------------------------------------------
# Whole-image single-kernel ADJOINT: the VJP of the separable resize is the
# same two-pass pipeline with transposed bands (grad [B, OH, OW] -> [B, H, W]),
# so it reuses _kernel_2pass verbatim with tiles built from W^T.
# ---------------------------------------------------------------------------


@functools.cache
def _tiles_exact_T_cached(spec: AxisSpec) -> BandedTiles:
    from .weights import banded_tiles_from_matrix, dense_matrix

    Wt = dense_matrix(spec, dtype=np.float64).T  # [in, out]
    return banded_tiles_from_matrix(Wt, tile=_LANE, dtype=np.float32, align=1,
                                    in_cap=spec.out_size)


def resize2d_onekernel_transpose_supported(
    g: jax.Array, spec_h: AxisSpec, spec_w: AxisSpec
) -> bool:
    if g.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    if g.ndim < 2:
        return False
    btwT = _tiles_exact_T_cached(spec_w)
    bthT = _tiles_exact_T_cached(spec_h)
    if btwT.k_in > spec_w.out_size or bthT.k_in > spec_h.out_size:
        return False
    if btwT.n_tiles > _MAX_UNROLL_TILES or bthT.n_tiles > _MAX_UNROLL_TILES:
        return False
    return (
        _onekernel_vmem(g.dtype, g.dtype, spec_h.out_size, spec_w.out_size,
                        spec_h.in_size, spec_w.in_size, btwT, bthT, 1)
        <= _VMEM_BUDGET
    )


def resize2d_onekernel_transpose(
    g: jax.Array, spec_h: AxisSpec, spec_w: AxisSpec, precision="default"
) -> jax.Array:
    """Fused backward: apply ``W_w^T`` then ``W_h^T`` to the cotangent in one
    pallas_call (replaces two padded per-axis adjoint calls)."""
    return resize2d_onekernel(
        g,
        spec_h,
        spec_w,
        out_dtype=g.dtype,
        precision=precision,
        tiles_w=_tiles_exact_T_cached(spec_w),
        tiles_h=_tiles_exact_T_cached(spec_h),
        out_h=spec_h.in_size,
        out_w=spec_w.in_size,
    )


# ---------------------------------------------------------------------------
# Streamed single-kernel pipeline for images too tall for VMEM: grid over
# (image, output-row tile); each step manually DMAs the halo'd input row
# window [start_h[t], start_h[t]+k_rows) from HBM into a double-buffered VMEM
# scratch (next window prefetched while the current one computes), runs BOTH
# separable passes on it, and stores one 128-row output tile.  HBM traffic is
# input-bytes x (1 + halo overlap, ~2-3%) + output-bytes — no host pad, no
# intermediate round-trip.  This is the Pallas double-buffering pattern from
# the TPU guide applied to the reference's separable driver.
# ---------------------------------------------------------------------------


@functools.cache
def _tiles_stream_cached(spec: AxisSpec, fine: bool = False) -> BandedTiles:
    from .weights import pick_tile_h

    # Output tile width by the MXU K-pass cost model (see pick_tile_h).
    # Default cands are 32-multiples: the streamed output block is
    # BlockSpec-indexed at t*tile, and 32 satisfies every out-dtype's
    # sublane tiling (u8 32, bf16 16, f32 8).  ``fine=True`` (16-or-wider
    # out dtypes only) adds 16-multiples: the round-5 config-5 sweep
    # measured tile 48 fastest (3.691 ms vs 64's 3.871 — one 128-deep K
    # pass AND under the 32-tile cap, which is what kept the model off
    # 32-multiples' best pick at that geometry).
    cands = (128, 112, 96, 80, 64, 48, 32) if fine else (128, 96, 64, 32)
    tile = pick_tile_h(spec, align=8, cands=cands)
    return _tiles_stream_cached_at(spec, tile)


@functools.cache
def _tiles_stream_cached_at(spec: AxisSpec, tile: int) -> BandedTiles:
    # Dynamic DMA row offsets are 8-aligned; in_cap = round_up(in_size, 8)
    # keeps every window (and its 8-aligned clamped start) inside the
    # 8-row-padded input the caller guarantees (resize2d_streamed pads the
    # trailing rows host-side only when H % 8 != 0; pad rows carry zero
    # weight so they never contribute).
    # Note: 8 is the HBM *memref* row-tile granularity for DMA slicing and
    # differs from the VMEM vector-slice sublane rule (_sublane(dtype):
    # 16/32 for bf16/u8) used by the pl.ds kernels — validated on hardware:
    # the uint8 440x1024 case (starts = {0, 280}; 280 % 32 != 0) and the
    # bf16 4K case (starts % 16 != 0) both run bit-identical to the padded
    # pipeline on the real chip (tests/test_resize2d_fused.py STREAM_CASES
    # cover the math in interpret mode; the hardware check is in the
    # commit-time verification log).
    return banded_tiles(spec, tile=tile, dtype=np.float32, align=8,
                        in_cap=_round_up(spec.in_size, 8))


@functools.cache
def _tiles_stream_w_cached(spec: AxisSpec,
                           spec_h: AxisSpec | None = None) -> BandedTiles:
    """W-pass tiles for the streamed kernel, optionally at a sub-128
    output width padded to the fixed 128-lane pitch — the float twin of
    ops/pil_exact._pick_tile_w's layout: the W pass slices the result
    along LANES where only 128-multiple offsets are free, so a narrower
    tile keeps its band in a zero-padded ``[k_in, 128]`` operand (same
    kernel) and the caller compacts the strided valid lanes once on the
    final output array.  Width resolution order:

    1. ``IA_TPU_FLOAT_TILE_W`` (hardened env knob — sweeps);
    2. the mxu_model cost-model pick, IF ``mxu_model.FLOAT_W_MODEL_DEFAULT``
       is on and the caller provided ``spec_h`` (the model needs the
       H-pass contraction depth) — flip the flag only after the bf16 K
       sweep (mxu_geometry.py) and the float-W end-to-end sweep validate
       the bf16 ceil(K/128) behaviour on chip;
    3. 128 (status quo).

    Env read is cached with the spec: sweeps must clear this cache after
    changing it."""
    from . import mxu_model

    tile = mxu_model.env_tile("IA_TPU_FLOAT_TILE_W", quantum=8)
    if tile is None and mxu_model.FLOAT_W_MODEL_DEFAULT and spec_h is not None:
        tile = _pick_tile_w_float(spec, spec_h)
    if tile is None or tile >= _LANE:
        return _tiles_exact_cached(spec)
    bt = banded_tiles(spec, tile=tile, dtype=np.float32, align=1,
                      in_cap=spec.in_size)
    band = np.zeros((bt.n_tiles, bt.k_in, _LANE), np.float32)
    band[:, :, : bt.tile] = bt.band
    return dataclasses.replace(bt, band=band)


def _pick_tile_w_float(spec: AxisSpec, spec_h: AxisSpec) -> int:
    """Cost-model W-tile width for the float streamed kernel — the bf16
    twin of ops/pil_exact._pick_tile_w.  Same two-term trade: a sub-128
    tile can drop a whole ceil(K/128) MXU pass from the W matmul, but
    each extra W tile adds 128 zero-padded lanes the H matmul contracts
    over plus one strided slice in the output compaction.  Under 'split'
    precision both passes run 2 bf16 MXU passes (pixel/intermediate
    operands are exact-bf16, the weight band is split), so the 2x cancels
    between terms and the *relative* cost matches the int8 model with the
    digit factor 3 replaced by 1.  Gated off by default
    (mxu_model.FLOAT_W_MODEL_DEFAULT) until the bf16 quantisation is
    measured — see that flag's comment."""
    from . import mxu_model
    from .weights import compute_tables

    xmin, size, _ = compute_tables(spec, dtype=np.float32)
    lo = xmin.astype(np.int64)
    hi = lo + size.astype(np.int64)
    bth = _tiles_stream_cached(spec_h)
    k_rows, tile_h = bth.k_in, bth.tile
    h_term = tile_h * mxu_model.round_up(k_rows, 128) * 128
    return mxu_model.pick_tile(
        out_size=spec.out_size,
        in_size=spec.in_size,
        lo=lo,
        hi=hi,
        cands=range(128, 63, -8),
        per_tile_cost=lambda t, keff: (
            k_rows * keff * 128 + h_term + mxu_model.TILE_W_FIXED_COST
        ),
        max_tiles=_MAX_UNROLL_TILES,
    )


@dataclasses.dataclass(frozen=True)
class _StreamChunkPlan:
    """Column-chunking of the W pass for the streamed kernel.

    ``chunks[c]`` is a tuple of ``(w_tile_index, offset_in_window)`` pairs:
    the W-band tiles chunk ``c`` computes and where each tile's static
    ``k_in_w`` input slice begins inside the chunk's DMA'd column window.
    ``col_starts[c]`` is the (128-aligned, clamped) first input column of
    chunk ``c``'s window and ``ccols`` its static width.  One chunk that
    spans every W tile (``n_chunks == 1``, ``ccols == Wp``) reproduces the
    round-2 whole-row kernel exactly.
    """

    chunks: tuple
    col_starts: tuple  # [n_chunks] int, 128-aligned
    ccols: int
    tiles_per_chunk: int

    @property
    def n_chunks(self) -> int:
        return len(self.chunks)


def _stream_chunk_plan(btw, Wp: int, tiles_per_chunk: int) -> _StreamChunkPlan:
    """Group ``tiles_per_chunk`` consecutive W-output tiles per column chunk.

    Consecutive tiles read a contiguous input column range (band starts are
    monotone), so each chunk's window is one strided HBM->VMEM DMA with a
    128-aligned column offset.  Windows are clamped into ``[0, Wp]``; tile
    offsets are recomputed against the clamped start, so clamping never
    changes which pixels a tile reads.
    """
    ct = max(1, int(tiles_per_chunk))
    n_chunks = -(-btw.n_tiles // ct)
    spans = []
    for c in range(n_chunks):
        t0, t1 = c * ct, min((c + 1) * ct, btw.n_tiles)
        lo = (int(btw.starts[t0]) // _LANE) * _LANE
        hi = int(btw.starts[t1 - 1]) + btw.k_in
        spans.append(hi - lo)
    ccols = min(_round_up(max(spans), _LANE), Wp)
    chunks, col_starts = [], []
    for c in range(n_chunks):
        t0, t1 = c * ct, min((c + 1) * ct, btw.n_tiles)
        lo = (int(btw.starts[t0]) // _LANE) * _LANE
        lo = max(0, min(lo, Wp - ccols))
        col_starts.append(lo)
        chunks.append(tuple((wt, int(btw.starts[wt]) - lo) for wt in range(t0, t1)))
    return _StreamChunkPlan(
        chunks=tuple(chunks),
        col_starts=tuple(col_starts),
        ccols=ccols,
        tiles_per_chunk=ct,
    )


def _streamed_vmem(x_dtype, out_dtype, inter_dtype, ccols, tiles_per_chunk,
                   btw, bth, bsz: int = 1, slots: int = 2) -> int:
    ib = jnp.dtype(x_dtype).itemsize
    k_rows = bth.k_in
    # btw.band is lane-padded to 128 when btw.tile < 128 (fixed lane
    # pitch, _tiles_stream_w_cached) — count the stored width, not tile
    band_bytes = (btw.n_tiles * btw.k_in * btw.band.shape[-1]
                  + bth.n_tiles * bth.k_in * bth.tile) * 4
    win = slots * bsz * k_rows * ccols * ib
    inter = (bsz * k_rows * tiles_per_chunk * _LANE
             * jnp.dtype(inter_dtype).itemsize)
    outb = (2 * bsz * bth.tile * tiles_per_chunk * _LANE
            * jnp.dtype(out_dtype).itemsize)
    return band_bytes + win + inter + outb


def _stream_bsz(B, plan, x_dtype, out_dtype, inter_dtype, btw, bth,
                max_bsz: int = 8) -> int:
    """Images per grid step for the float streamed kernel — the float twin
    of ops/pil_exact._pil_stream_bsz (same on-chip finding: ~1.1 us fixed
    cost per grid step, so batching images per step is nearly-free
    throughput).  Planned against 5/6 of the budget; a Mosaic VMEM
    rejection steps down the ladder via ``max_bsz``."""
    budget = _VMEM_BUDGET * 5 // 6
    for bsz in (8, 7, 6, 5, 4, 3, 2):
        if bsz > max_bsz:
            continue
        if B % bsz == 0 and _streamed_vmem(
            x_dtype, out_dtype, inter_dtype, plan.ccols,
            plan.tiles_per_chunk, btw, bth, bsz,
        ) <= budget:
            return bsz
    return 1


def _stream_slots(plan, x_dtype, out_dtype, inter_dtype, btw, bth,
                  bsz: int) -> int:
    """Window-DMA pipeline depth (the kernel handles any depth >= 2).

    Round-5 on-chip ablations (config-5 bf16 4K) found the route's real
    overhead was the XLA epilogue (lane compaction + output slice), NOT
    unhidden DMA latency: with the ragged slice-free output in place,
    depths 2/3/4 measure within noise of each other (3.81-3.88 ms),
    while the VMEM a deeper pipeline consumes is better spent on ``bsz``
    (more images per step amortise the ~1 us fixed step cost).  Default
    2; ``IA_TPU_STREAM_SLOTS`` overrides for sweeps."""
    import os

    v = os.environ.get("IA_TPU_STREAM_SLOTS")
    if v:
        slots = max(2, int(v))
        while slots > 2 and _streamed_vmem(
            x_dtype, out_dtype, inter_dtype, plan.ccols,
            plan.tiles_per_chunk, btw, bth, bsz, slots,
        ) > _VMEM_BUDGET:
            slots -= 1
        return slots
    return 2


def _stream_plan(x_dtype, out_dtype, inter_dtype, Wp, btw, bth):
    """Largest-chunk plan that fits the VMEM budget, or None.

    Prefers one whole-row chunk (fewest DMAs, zero column-halo re-read) and
    shrinks the chunk width only when the row window would not fit — the
    wide-f32 case that round 2's whole-row kernel had to fall back on."""
    for ct in range(btw.n_tiles, 0, -1):
        plan = _stream_chunk_plan(btw, Wp, ct)
        if (
            _streamed_vmem(x_dtype, out_dtype, inter_dtype, plan.ccols,
                           plan.tiles_per_chunk, btw, bth)
            <= _VMEM_BUDGET
        ):
            return plan
    return None


def resize2d_streamed_supported(
    x: jax.Array, spec_h: AxisSpec, spec_w: AxisSpec, out_dtype=None,
    inter_dtype=jnp.float32,
) -> bool:
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.uint8):
        return False
    if x.ndim < 2:
        return False
    H, W = spec_h.in_size, spec_w.in_size
    # Arbitrary H/W: the wrapper pads rows to a multiple of 8 (aligned DMA
    # starts) and columns to a multiple of 128 (lane-aligned DMA extents)
    # host-side only when needed; windows are built against the padded
    # height, so no shape restriction remains.
    out_dtype = out_dtype if out_dtype is not None else (
        jnp.float32 if x.dtype == jnp.uint8 else x.dtype
    )
    btw = _tiles_stream_w_cached(spec_w, spec_h)
    bth = _tiles_stream_cached(
        spec_h, fine=jnp.dtype(out_dtype).itemsize >= 2
    )
    if btw.k_in > W or bth.k_in > _round_up(H, 8):
        return False
    if btw.n_tiles > _MAX_UNROLL_TILES:
        return False
    return (
        _stream_plan(x.dtype, out_dtype, inter_dtype, _round_up(W, _LANE),
                     btw, bth)
        is not None
    )


def _kernel_2pass_streamed(
    starts_ref, cstarts_ref, x_hbm, bandw_ref, bandh_ref, o_ref, win,
    sem, *, k_rows, chunks, k_in_w, precision, out_dtype, inter_dtype,
    in_exact, quant_inter=False, bsz=1,
):
    b = pl.program_id(0)  # block of bsz images
    t = pl.program_id(1)
    c = pl.program_id(2)
    B = jnp.int32(pl.num_programs(0))
    T = jnp.int32(pl.num_programs(1))
    C = jnp.int32(pl.num_programs(2))
    step = (b * T + t) * C + c
    slots = win.shape[0]  # DMA pipeline depth (see _stream_slots)

    def dma(slot, b_i, t_i, c_i):
        slot = jnp.int32(slot)  # a bare 0 would lower i64 under x64
        return pltpu.make_async_copy(
            x_hbm.at[
                pl.ds(b_i * jnp.int32(bsz), bsz),
                pl.ds(pl.multiple_of(starts_ref[t_i], 8), k_rows),
                pl.ds(pl.multiple_of(cstarts_ref[c_i], _LANE), win.shape[3]),
            ],
            win.at[slot],
            sem.at[slot],
        )

    def idx_at(k):
        # grid indices of step + k (row-major over (B, T, C))
        nc = jax.lax.rem(c + jnp.int32(k), C)
        tc = t + (c + jnp.int32(k)) // C
        nt = jax.lax.rem(tc, T)
        nb = b + tc // T
        return nb, nt, nc

    # Fill the pipeline at step 0: windows for steps 0..slots-2.  In
    # steady state each step issues the window slots-1 ahead, so slots-1
    # DMAs are always in flight — enough to hide the ~5 us per-transfer
    # latency the 2-slot double buffer exposed (round-5 ablation; the
    # compute body alone is shorter than latency + transfer).
    @pl.when(step == 0)
    def _():
        for k in range(slots - 1):
            @pl.when(jnp.int32(k) < B * T * C)
            def _(k=k):
                dma(k % slots, *idx_at(k)).start()

    @pl.when(step + (slots - 1) < B * T * C)
    def _():
        dma(jax.lax.rem(step + jnp.int32(slots - 1), jnp.int32(slots)),
            *idx_at(slots - 1)).start()

    slot = jax.lax.rem(step, jnp.int32(slots))
    dma(slot, b, t, c).wait()

    # One static branch per column chunk: its W tiles have static offsets
    # inside the chunk's window.  With a single whole-row chunk this is the
    # unconditional round-2 body.
    for ci, tiles in enumerate(chunks):

        @pl.when(c == ci)
        def _(tiles=tiles):
            # pass 1: contract W for this chunk's tiles, ALL images first
            # (all-W-then-all-H gives the scheduler the largest window of
            # independent cross-image work — measured on the digit twin,
            # benchmarks/epilogue_probe.py).  SSA-value intermediate (no
            # scratch ref): lets the scheduler overlap the inter-pass VPU
            # work with in-flight matmuls (see _kernel_2pass).
            inters = []
            for bi in range(bsz):
                wtiles = []
                for j, (wt, off) in enumerate(tiles):
                    xw = _widen(win[slot, bi][:, off : off + k_in_w])
                    y = _mxu_dot(
                        xw, bandw_ref[wt], (((1,), (0,)), ((), ())),
                        precision, in_exact,
                    )
                    if quant_inter:
                        y = _quant_u8grid(y)
                    wtiles.append(y.astype(inter_dtype))
                # concat, not per-tile split — split-H measured slower on
                # the whole-image digit kernel (epilogue_probe schedule)
                inters.append(
                    wtiles[0] if len(wtiles) == 1 else jnp.concatenate(
                        wtiles, axis=1
                    )
                )
            # pass 2: contract the window rows with this tile's H band
            wci = len(tiles) * _LANE
            for bi in range(bsz):
                y = _mxu_dot(
                    bandh_ref[t], _widen(inters[bi]), (((0,), (0,)), ((), ())),
                    precision,
                    b_exact_bf16=quant_inter
                    or jnp.dtype(inter_dtype) == jnp.bfloat16,
                )
                _store(o_ref, (bi, slice(None), slice(0, wci)), y, out_dtype)


def resize2d_streamed(
    x: jax.Array,
    spec_h: AxisSpec,
    spec_w: AxisSpec,
    out_dtype=None,
    inter_dtype=jnp.float32,
    precision="default",
    max_tiles_per_chunk: int | None = None,
) -> jax.Array:
    """Separable 2-D resize of trailing [H, W] in one pallas_call, streaming
    halo'd row windows for images whose full height does not fit VMEM.

    Arbitrary shapes: when H is not a multiple of 8 or W of 128 (Mosaic DMA
    alignment), the input is zero-padded host-side to the next aligned shape
    — one extra HBM copy of the input, but the streamed profile (no
    intermediate round-trip) is preserved; pad rows/cols carry zero weight
    in the band so the result is bit-identical to the aligned case.

    Rows too WIDE for a whole-row window (e.g. 8K float32 at shrink >= 2)
    are handled by column chunking (:func:`_stream_plan`): the grid gains a
    third dimension over column chunks, each step DMAs only the
    ``[k_rows, ccols]`` sub-window its W tiles read, and pass 2 — separable
    over output columns — contracts just that chunk.  The only extra HBM
    traffic is the column halo between adjacent chunks (~``k_in_w`` cols
    per chunk boundary)."""
    precision = _resolve_precision(precision)
    if out_dtype is None:
        out_dtype = jnp.float32 if x.dtype == jnp.uint8 else x.dtype
    out_dtype = jnp.dtype(out_dtype)
    lead = x.shape[:-2]
    B = int(np.prod(lead)) if lead else 1
    H, W = x.shape[-2], x.shape[-1]
    OH, OW = spec_h.out_size, spec_w.out_size
    btw = _tiles_stream_w_cached(spec_w, spec_h)
    bth = _tiles_stream_cached(
        spec_h, fine=jnp.dtype(out_dtype).itemsize >= 2
    )
    T = bth.n_tiles
    x3 = x.reshape(B, H, W)
    Hp, Wp = _round_up(H, 8), _round_up(W, _LANE)
    if (Hp, Wp) != (H, W):
        x3 = jnp.pad(x3, ((0, 0), (0, Hp - H), (0, Wp - W)))
    plan = _stream_plan(x.dtype, out_dtype, inter_dtype, Wp, btw, bth)
    if plan is None:
        raise ValueError(
            "resize2d_streamed: no column-chunk plan fits the VMEM budget "
            f"(W={W}, k_rows={bth.k_in}, dtype={x.dtype})"
        )
    if max_tiles_per_chunk is not None and (
        max_tiles_per_chunk < plan.tiles_per_chunk
    ):  # test hook: force column chunking on shapes that would fit whole-row
        plan = _stream_chunk_plan(btw, Wp, max_tiles_per_chunk)
    C, CT = plan.n_chunks, plan.tiles_per_chunk
    bsz = _stream_bsz(B, plan, x.dtype, out_dtype, inter_dtype, btw, bth)
    slots = _stream_slots(plan, x.dtype, out_dtype, inter_dtype, btw, bth,
                          bsz)
    starts_h = jnp.asarray(bth.starts, dtype=jnp.int32)
    col_starts = jnp.asarray(plan.col_starts, dtype=jnp.int32)
    ib = x.dtype.itemsize

    def _call(bsz):
        kern = functools.partial(
            _kernel_2pass_streamed,
            k_rows=bth.k_in,
            chunks=plan.chunks,
            k_in_w=btw.k_in,
            precision=precision,
            out_dtype=out_dtype,
            inter_dtype=jnp.dtype(inter_dtype),
            in_exact=x.dtype in (jnp.uint8, jnp.bfloat16),
            quant_inter=bool(
                x.dtype == jnp.uint8 and jnp.dtype(out_dtype) == jnp.uint8
            ),
            bsz=bsz,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // bsz, T, C),
            in_specs=[
                _bspec(memory_space=pl.ANY),  # x stays in HBM
                _bspec(
                    (btw.n_tiles, btw.k_in, _LANE),
                    lambda b, t, c, starts, cstarts: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                _bspec(
                    (bth.n_tiles, bth.k_in, bth.tile),
                    lambda b, t, c, starts, cstarts: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=_bspec(
                (bsz, bth.tile, CT * _LANE),
                lambda b, t, c, starts, cstarts: (b, t, c),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((slots, bsz, bth.k_in, plan.ccols), x.dtype),
                pltpu.SemaphoreType.DMA((slots,)),
            ],
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, OH, ow_kernel), out_dtype),
            grid_spec=grid_spec,
            cost_estimate=pl.CostEstimate(
                flops=2 * B * T * bth.k_in * (btw.k_in * btw.out_padded
                                              + _LANE * btw.out_padded),
                bytes_accessed=B * T * C * bth.k_in * plan.ccols * ib
                + B * OH * OW * out_dtype.itemsize,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(starts_h, col_starts, x3, jnp.asarray(btw.band),
          jnp.asarray(bth.band))

    # Ragged slice-free output (round 5): rows are emitted at OH directly
    # (pallas clips the last H block's store), and with full-width W tiles
    # the lane dim is emitted at OW too — no compact_lanes pass, no final
    # slice copy.  The r4 epilogue (padded out + compaction + slice) cost
    # a full extra pass over the output at HBM rate: 5.05 -> 3.81 ms on
    # config-5 (on-chip ablation series, docs/BENCHMARKS.md round 5).
    # Sub-128 W tiles (env-forced) still need the compaction epilogue.
    ow_kernel = OW if btw.tile == _LANE else C * CT * _LANE
    tracing = isinstance(x3, jax.core.Tracer)
    while True:
        try:
            y = _call(bsz)
            break
        except Exception as e:  # Mosaic VMEM admission (eager path only)
            if tracing or "vmem" not in str(e).lower() or bsz == 1:
                raise
            bsz = _stream_bsz(B, plan, x.dtype, out_dtype, inter_dtype,
                              btw, bth, max_bsz=bsz - 1)
    if btw.tile != _LANE:
        y = compact_lanes(y, btw.tile)[:, :, :OW]
    return y.reshape(*lead, OH, OW)


def transpose_supported(g: jax.Array, spec: AxisSpec, axis: int) -> bool:
    if g.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    axis = axis % g.ndim
    trail = int(np.prod(g.shape[axis + 1 :])) if axis + 1 < g.ndim else 1
    align = _LANE if trail == 1 else _sublane(g.dtype)
    bt = _transpose_tiles_cached(spec, _LANE, align)
    band_bytes = bt.n_tiles * bt.k_in * _LANE * 4
    in_pad = max(_round_up(spec.out_size, align), bt.k_in)
    return (
        band_bytes <= _VMEM_BUDGET // 2
        and in_pad * g.dtype.itemsize * 32 <= _VMEM_BUDGET // 3
    )


def resize_axis_transpose_pallas(
    g: jax.Array, spec: AxisSpec, axis: int, precision="default"
) -> jax.Array:
    """Apply the adjoint ``W^T`` of ``spec`` along ``axis`` — the Pallas
    backward pass.  ``g`` has ``spec.out_size`` along ``axis``; the result
    has ``spec.in_size``.  This replaces the reference's (incorrect) non-AA
    C++ backward (aa_interpolation_backward_impl.h) with the true adjoint
    running on the same banded MXU kernels."""
    precision = _resolve_precision(precision)
    if g.shape[axis % g.ndim] != spec.out_size:
        raise ValueError(
            f"axis {axis} has {g.shape[axis % g.ndim]} != {spec.out_size}"
        )
    axis = axis % g.ndim
    lead, trail = g.shape[:axis], g.shape[axis + 1 :]
    nlead = int(np.prod(lead)) if lead else 1
    ntrail = int(np.prod(trail)) if trail else 1
    if ntrail == 1:
        bt = _transpose_tiles_cached(spec, _LANE, _LANE)
        y = _pass_last(
            g.reshape(nlead, spec.out_size),
            spec,
            False,
            precision,
            g.dtype,
            tiles=bt,
            out_size=spec.in_size,
        )
        return y.reshape(*lead, spec.in_size, *trail)
    bt = _transpose_tiles_cached(spec, _LANE, _sublane(g.dtype))
    y = _pass_mid(
        g.reshape(nlead, spec.out_size, ntrail),
        spec,
        False,
        precision,
        g.dtype,
        tiles=bt,
        out_size=spec.in_size,
    )
    return y.reshape(*lead, spec.in_size, *trail)
