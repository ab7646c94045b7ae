"""Windowed (banded traced-window) crop-and-resize Pallas kernels.

The dense traced-box formulation (``ops/crop.py``) contracts full
``[OH, H]`` / ``[OW, W]`` per-image matrices — at 4K that first
contraction is ~`N*C*OH*H*W` MACs, ~16x off the resize paths (VERDICT
round-2 weak item 4).  This module cuts it to per-tile
static-max-extent windows: the crop box's *position* is traced, but its
*size* is bounded at trace time (a normalised box spans at most
``max_box_frac`` of the image), so 128 consecutive output rows can only
ever touch ``K ~= (128 + 2*support) * scale_max`` consecutive input
rows.  Each output tile becomes one static-shape MXU matmul against a
``[K, 128]`` band whose VALUES (weights and window starts) are runtime
arrays — the same dynamic-band pattern the sharded halo pass uses
(pallas_resize.banded_pass_mid_dynamic), extended with a per-image
leading dim.

Pipeline (uint8 NCHW, non-negative filters):

  pass 1 (H, middle axis): ``inter[n,c,t*128+o,w] = band_h[n,t]^T @
      x[n,c,s_h[n,t] : s_h[n,t]+K_h, w]`` — output quantised to the u8
      lattice in-kernel (Pillow's own convention, cf. _quant_u8grid), so
      the intermediate crosses HBM at 1 byte/px and pass 2's pixel
      operand is bf16-exact.
  pass 2 (W, last axis):  ``y[n,c,m,t*128+u] = inter[n,c,m,s_w[n,t] :
      s_w[n,t]+K_w] @ band_w[n,t]`` — stored as uint8 (PIL round/clip).

Two contraction precisions, both inside the +-1-of-f64-oracle gate:
the default quantises the traced weights to a fixed-point grid and runs
the library's int8 digit machinery (ops/pil_exact.py) on traced bands —
two balanced base-256 digits at 2^14 scale when the tap count allows
(see _digit_plan), Pillow's own 3x2^22 otherwise; ``precision="split"``
keeps the split-bf16 float contraction (weights hi+lo, pixels exact),
bit-compatible with the dense route.  Admission: uint8 input +
non-negative filter (the quantised intermediate and the clip-free digit
epilogue are only safe there — same derivation as crop.py's
``quant_inter``); negative-lobe filters and float inputs keep the dense
differentiable path.

Reference analogue: the reference's kernels only resize whole images
(crop+resize is the downstream torchvision composition, cf. SURVEY);
the banded window math is the same interp_size bound its AA tables use
(/root/reference/step_zero/aa_interpolation_impl.h:208-210), applied to
a traced interval.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import CUBIC_NAMES, get_filter, filter_is_nonnegative
from .pallas_compat import block_spec as _bspec
from .pallas_resize import (
    _LANE,
    _VMEM_BUDGET,
    _interpret,
    _mxu_dot,
    _round_up,
    _store,
    _sublane,
    _widen,
)

__all__ = ["crop_windowed_supported", "crop_and_resize_windowed"]


# ---------------------------------------------------------------------------
# Static window geometry
# ---------------------------------------------------------------------------


def _window_k(
    in_size: int,
    out_size: int,
    support: float,
    antialias: bool,
    max_box_frac: float,
    start_align: int,
    k_mult: int,
) -> int:
    """Static K for one axis: K input pixels cover any 128 consecutive
    output rows of any box spanning <= max_box_frac*in_size.

    K is chosen so `(in_size - K) % start_align == 0` (and
    `K % k_mult == 0`): the clipped, alignment-floored window starts then
    stay inside the UNPADDED input — padding a 4K batch to alignment is a
    full-HBM copy (~4 ms at b64) that would eat the windowing win.
    Callers guarantee `in_size % k_mult == 0` (pad the input first
    otherwise; k_mult is 8 for the row pass, 128 for the column pass).
    """
    scale_max = max_box_frac * in_size / out_size
    widen = max(scale_max, 1.0) if antialias else 1.0
    # centers of one tile span (LANE-1)*scale; taps extend +-(support*widen
    # + 0.5); +2 guards float rounding of traced centers at the boundary.
    ext = (_LANE - 1) * scale_max + 2.0 * (support * widen + 0.5) + 2.0
    k = int(np.ceil(ext)) + start_align  # slack lost to start flooring
    k = _round_up(k, k_mult)
    if k >= in_size:
        return in_size  # window covers the whole input; start == 0
    # bump k until (in_size - k) is start_align-aligned (solvable in
    # <= start_align/k_mult steps when in_size % k_mult == 0)
    while (in_size - k) % start_align and k < in_size:
        k += k_mult
    return min(k, in_size)


# ---------------------------------------------------------------------------
# Traced band construction (XLA, per image)
# ---------------------------------------------------------------------------


def _windowed_band(
    lo,  # [N] f32, box start in pixel coords
    hi,  # [N] f32, box end   in pixel coords
    in_size: int,
    out_size: int,
    k: int,
    in_limit: int,  # slicable extent of the input array (>= in_size)
    start_align: int,
    mode: str,
    antialias: bool,
):
    """Per-image banded weights: (starts [N, nt] i32, band [N, nt, k, 128]).

    Same math as crop._axis_matrix (which IS the PIL algorithm on a traced
    interval) evaluated only on the K-wide window: center/arg/filter/mask/
    renormalise, with the degenerate sub-pixel-box nearest fallback.  Rows
    past out_size are identically zero.
    """
    filt = get_filter(mode)
    N = lo.shape[0]
    nt = -(-out_size // _LANE)
    out_pad = nt * _LANE
    lo = lo.astype(jnp.float32)
    hi = hi.astype(jnp.float32)
    span = hi - lo  # [N]
    scale = span / out_size
    one = jnp.asarray(1.0, jnp.float32)
    widen = jnp.maximum(scale, one) if antialias else jnp.ones_like(scale)
    support = filt.support * widen  # [N]

    o = jnp.arange(out_pad, dtype=jnp.float32).reshape(nt, _LANE)  # [nt, L]
    center = lo[:, None, None] + scale[:, None, None] * (o + 0.5)  # [N,nt,L]

    # Window start per (image, tile): lowest contributing tap of the tile's
    # first row, floored to the DMA alignment, clipped into the padded array.
    raw = jnp.floor(center[:, :, 0] - support[:, None] - 0.5) - 1.0
    hi_start = jnp.asarray(
        (in_limit - k) // start_align * start_align, jnp.float32
    )
    starts = jnp.clip(
        jnp.floor(raw / start_align) * start_align, 0.0, hi_start
    ).astype(jnp.int32)  # [N, nt]

    pos = (
        starts.astype(jnp.float32)[:, :, None, None]
        + jnp.arange(k, dtype=jnp.float32)[None, None, :, None]
    )  # [N, nt, k, 1]
    c4 = center[:, :, None, :]  # [N, nt, 1, L]
    w4 = widen[:, None, None, None]
    arg = (pos - c4 + 0.5) / w4
    w = filt(arg, jnp)  # [N, nt, k, L]
    valid = (
        (jnp.abs(pos - c4 + 0.5) <= support[:, None, None, None])
        & (pos + 0.5 >= lo[:, None, None, None])
        & (pos + 0.5 <= hi[:, None, None, None])
        & (pos <= float(in_size) - 1.0)  # zero-pad region carries no weight
        & (o[None, :, None, :] <= float(out_size) - 1.0)  # dead pad rows
    )
    w = jnp.where(valid, w, 0.0)
    total = jnp.sum(w, axis=2, keepdims=True)
    # Degenerate sub-pixel boxes: nearest-pixel fallback (crop._axis_matrix).
    nearest = jnp.clip(jnp.round(c4 - 0.5), 0.0, float(in_size - 1))
    onehot = ((pos == nearest) & (o[None, :, None, :] <= float(out_size) - 1.0)
              ).astype(w.dtype)
    band = jnp.where(total > 0.0, w / jnp.where(total == 0.0, 1.0, total), onehot)
    return starts, band


# ---------------------------------------------------------------------------
# Traced digit quantisation (the pil_exact int8 machinery, per-image)
# ---------------------------------------------------------------------------


def _digitize_band(band, pb=None, ndig=3):
    """Quantise a traced f32 band to a fixed-point convention and split
    into balanced base-256 int8 digits (pil_exact._split_digits, in jnp
    on traced values).

    ``band [N, nt, k, 128]`` f32 (rows renormalised, non-negative) ->
    ``(dig [N, nt, k, ndig*128] int8, ct [N, nt, 128] int32)`` with
    ``K = sum_i d_i * 256^i`` and ``ct = 128*sum_k K + 2^(pb-1)`` (the
    signed-pixel bias + rounding constant, cf. pil_exact._digit_tiles).

    ``pb``/``ndig``: Pillow's own convention is pb=22 / 3 digits.  The
    crop gate is +-1 of the f64 oracle (not bit-exactness), which a
    TWO-digit pb=14 grid already clears when the tap count is small
    enough — ``|err| <= ntaps * 0.5 * 255 / 2^14 < 0.45`` for ntaps <=
    57 — at 2/3 the MXU work (callers gate via :func:`_digit_plan`).
    Row sums stay within ``2^pb + ntaps/2`` of the exact scale (f32
    renorm error ~2^-20 relative), so the clip-free epilogue argument of
    pil_exact._needs_clip holds for the non-negative filters this route
    admits.
    """
    from .pil_exact import PRECISION_BITS

    if pb is None:
        pb = PRECISION_BITS
    scaled = band * np.float32(1 << pb)
    # round half away from zero; non-negative here, but keep the general
    # form so the convention matches _int_matrix exactly
    K = jnp.where(scaled < 0, scaled - 0.5, scaled + 0.5).astype(jnp.int32)
    digs = []
    rem = K
    for i in range(ndig):
        if i == ndig - 1:
            d = rem  # top digit: remaining headroom (|d| <= 127 by pb)
        else:
            d = ((rem + 128) % 256) - 128
        digs.append(d.astype(jnp.int8))
        # jnp.int32 literal: under enable_x64 a bare python 8 becomes int64
        # and lax.shift_* rejects the mixed dtypes
        rem = jax.lax.shift_right_arithmetic(rem - d, jnp.int32(8))
    dig = jnp.concatenate(digs, axis=-1)  # [N, nt, k, ndig*128]
    # dtype= pins int32 under enable_x64 (jnp.sum would promote to int64)
    ct = 128 * jnp.sum(K, axis=2, dtype=jnp.int32) + jnp.int32(1 << (pb - 1))
    return dig, ct


def _digit_plan(in_size, out_size, support, antialias, frac):
    """(pb, ndig) for one crop axis: two digits at pb=14 when the worst-
    case tap count keeps the quantisation error inside the +-1 gate
    (see _digitize_band), else Pillow's 3-digit pb=22."""
    scale_max = frac * in_size / out_size
    widen = max(scale_max, 1.0) if antialias else 1.0
    ntaps = 2.0 * support * widen + 2.0
    return (14, 2) if ntaps <= 57 else (22, 3)


# ---------------------------------------------------------------------------
# Kernel bodies (per-image dynamic bands)
# ---------------------------------------------------------------------------


def _kernel_crop_mid_dig(
    starts_ref, x_ref, band_ref, ct_ref, o_ref, *, k_in, in_align, pb, ndig
):
    """Digit pass 1: out[1,1,LANE,WT] int8 (signed u8-grid intermediate)
    = recombine(dig[n,t]^T @ (x[n,c,s:s+K,wt] - 128))."""
    n = pl.program_id(0)
    t = pl.program_id(3)
    s = pl.multiple_of(starts_ref[n, t], in_align)
    xs = jax.lax.bitcast_convert_type(
        x_ref[0, 0, pl.ds(s, k_in), :] ^ jnp.uint8(128), jnp.int8
    )
    S = jax.lax.dot_general(
        band_ref[0, t], xs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [ndig*128, wt]: digit sums stacked along rows
    # interpret-mode dot_general yields int64 under enable_x64 despite
    # preferred_element_type; force int32 (free on TPU)
    S = S.astype(jnp.int32)
    # -128 recentering folds into the bias (cf. pil_exact w_epilogue)
    acc = ct_ref[0, t][:, None] - jnp.int32(128 << pb)
    for i in range(ndig):
        acc = acc + jax.lax.shift_left(
            S[i * 128 : (i + 1) * 128], jnp.int32(8 * i)
        )
    v = jax.lax.shift_right_arithmetic(acc, jnp.int32(pb))
    # clip-free: non-negative renormalised rows (admission) keep the
    # accumulator provably in range (pil_exact._needs_clip argument)
    o_ref[0, 0, :, :] = v.astype(jnp.int8)


def _kernel_crop_last_dig(
    starts_ref, x_ref, band_ref, ct_ref, o_ref, *, k_in, pb, ndig
):
    """Digit pass 2: out[1,1,MT,LANE] u8 = recombine(inter[n,c,:,s:s+K] @
    dig[n,t]) — the intermediate is already signed int8."""
    n = pl.program_id(0)
    t = pl.program_id(3)
    s = pl.multiple_of(starts_ref[n, t], _LANE)
    win = x_ref[0, 0, :, pl.ds(s, k_in)]  # int8 [mt, k]
    S = jax.lax.dot_general(
        win, band_ref[0, t], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [mt, ndig*128]
    S = S.astype(jnp.int32)  # interpret + enable_x64 (see pass 1)
    acc = ct_ref[0, t][None, :] + S[:, :128]
    for i in range(1, ndig):
        acc = acc + jax.lax.shift_left(
            S[:, i * 128 : (i + 1) * 128], jnp.int32(8 * i)
        )
    v = jax.lax.shift_right_arithmetic(acc, jnp.int32(pb))
    o_ref[0, 0, :, :] = v.astype(jnp.uint8)


def _kernel_crop_mid(
    starts_ref, x_ref, band_ref, o_ref, *, k_in, precision, out_dtype, in_align
):
    """out[1,1,LANE,WT] = band[n,t]^T @ cast(x[n,c, s:s+K, wt-chunk])."""
    n = pl.program_id(0)
    t = pl.program_id(3)
    s = pl.multiple_of(starts_ref[n, t], in_align)
    win = _widen(x_ref[0, 0, pl.ds(s, k_in), :])
    y = _mxu_dot(
        band_ref[0, t], win, (((0,), (0,)), ((), ())), precision,
        b_exact_bf16=True,  # uint8 pixels are bf16-exact
    )
    _store(o_ref, (0, 0, slice(None), slice(None)), y, out_dtype)


def _kernel_crop_last(
    starts_ref, x_ref, band_ref, o_ref, *, k_in, precision, out_dtype, in_exact
):
    """out[1,1,MT,LANE] = cast(x[n,c, row-chunk, s:s+K]) @ band[n,t]."""
    n = pl.program_id(0)
    t = pl.program_id(3)
    s = pl.multiple_of(starts_ref[n, t], _LANE)
    win = _widen(x_ref[0, 0, :, pl.ds(s, k_in)])
    y = _mxu_dot(
        win, band_ref[0, t], (((1,), (0,)), ((), ())), precision,
        a_exact_bf16=in_exact,
    )
    _store(o_ref, (0, 0, slice(None), slice(None)), y, out_dtype)


# ---------------------------------------------------------------------------
# Admission + entry
# ---------------------------------------------------------------------------


def _fracs(max_box_frac) -> tuple[float, float]:
    """Normalise the (scalar or per-axis (frac_h, frac_w)) box-span bound."""
    if isinstance(max_box_frac, (tuple, list)):
        fh, fw = float(max_box_frac[0]), float(max_box_frac[1])
    else:
        fh = fw = float(max_box_frac)
    return fh, fw


def _geom(H, W, oh, ow, support, antialias, max_box_frac, in_dtype=jnp.uint8):
    """Static geometry: (align_h, Hp, k_h, W2, k_w).

    Hp: row extent after the (rare, H % 8 only) row pre-pad.  W2: the
    128-aligned logical column extent — NOT a pre-pad of x (boundary
    blocks OOB-read past W; the garbage columns carry zero weight in the
    pass-2 band, `pos <= W-1`), just the width pass 1 emits.
    """
    fh, fw = _fracs(max_box_frac)
    align_h = _sublane(in_dtype)
    Hp = _round_up(H, 8)
    k_h = _window_k(Hp, oh, support, antialias, fh, align_h, k_mult=8)
    W2 = _round_up(W, _LANE)
    k_w = _window_k(W2, ow, support, antialias, fw, _LANE, k_mult=_LANE)
    return align_h, Hp, k_h, W2, k_w


def crop_windowed_supported(
    x, out_hw, method: str, antialias: bool, max_box_frac: float = 1.0
) -> bool:
    """Admission for the windowed Pallas route.

    uint8 NCHW + non-negative filter only: the quantised-u8 intermediate
    (the 1 byte/px trick) is only within the +-1 gate for filters whose
    rows cannot overshoot (same matrix-free derivation as crop.py), and
    integer outputs need no autodiff — float inputs keep the dense
    differentiable path.
    """
    if x.ndim != 4 or x.dtype != jnp.uint8:
        return False
    fh, fw = _fracs(max_box_frac)
    if not (0.0 < fh <= 1.0 and 0.0 < fw <= 1.0):
        return False
    mode = method
    if not antialias and get_filter(method).name in CUBIC_NAMES:
        mode = "bicubic075"
    if not filter_is_nonnegative(mode):
        return False
    N, C, H, W = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    support = get_filter(mode).support
    align_h, Hp, k_h, W2, k_w = _geom(
        H, W, oh, ow, support, antialias, max_box_frac
    )
    # Windowing must save enough combined two-pass MACs to cover the
    # route's per-tile/DMA overheads, else dense's single big matmul
    # wins.  Threshold re-measured in round 5 after the dense route
    # gained 2-digit int8 contractions (crop.py one_digits — dense got
    # ~1.5x faster, moving the crossover): b64/b16 -> 224^2, boxes
    # spanning 0.6, max_box_frac 1, device time:
    #   720x1280  ratio 0.752  windowed 1.552 vs dense 1.504  (loses)
    #   1080x1920 ratio 0.713  windowed 2.976 vs dense 2.711  (loses)
    #   2160x3840 ratio 0.689  windowed 1.748 vs dense 1.936  (wins)
    # (round-4 numbers for the then-slower dense route: 720p won at
    # 0.752, 1080p at 0.713.)  A tighter max_box_frac shrinks k_* and
    # the ratio with it, so bounded-box callers still admit earlier.
    nt_h, nt_w = -(-oh // _LANE), -(-ow // _LANE)
    mac_win = k_h * nt_h * _LANE * W + k_w * nt_w * _LANE * oh
    mac_dense = oh * H * W + ow * W * oh
    if mac_win >= 0.70 * mac_dense:
        return False
    # VMEM admission, pass 1: x block (whole padded H x wt) + band + out.
    band_h_bytes = nt_h * k_h * _LANE * 4
    wt = _LANE
    if Hp * wt + band_h_bytes + _LANE * wt > _VMEM_BUDGET // 2:
        return False
    # pass 2: row block (mt x W2) + band + out.
    band_w_bytes = nt_w * k_w * _LANE * 4
    mt = _LANE
    if mt * W2 + band_w_bytes + mt * _LANE > _VMEM_BUDGET // 2:
        return False
    return True


def crop_and_resize_windowed(
    x: jax.Array,
    boxes: jax.Array,
    out_hw: tuple[int, int],
    method: str = "bilinear",
    antialias: bool = True,
    max_box_frac: float = 1.0,
    precision="pil_int8",
) -> jax.Array:
    """Windowed-band crop+resize: uint8 [N,C,H,W] + boxes [N,4] -> uint8
    [N,C,OH,OW].  Semantics identical to crop.crop_and_resize's dense path
    (PIL algorithm on the traced interval, quantised u8 intermediate);
    callers route via :func:`crop_windowed_supported`.

    ``max_box_frac`` bounds the box span per axis (1.0 = whole image); a
    tighter static bound shrinks the window K proportionally.  Boxes larger
    than the bound renormalise over the truncated window (don't do that).

    ``precision``:
      * ``"pil_int8"`` (default) — the traced weights are quantised to
        Pillow's fixed-point convention (coeff * 2^22, round half away
        from zero) and contracted as three balanced base-256 int8 digit
        planes per pass: the library's flagship digit machinery
        (ops/pil_exact.py) on traced bands.  int8 MXU runs ~2.5x the bf16
        rate and the bands cross HBM at 1 B/coeff; output is
        deterministic fixed-point, within the same +-1-of-f64-oracle gate
        as the split path.
      * ``"split"`` — split-bf16 float contraction (hi+lo weight digits,
        bf16-exact pixels), bit-compatible with the dense route's
        convention.
    """
    N, C, H, W = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    mode = method
    if not antialias and get_filter(method).name in CUBIC_NAMES:
        mode = "bicubic075"
    filt = get_filter(mode)
    support = filt.support
    align_h, Hp, k_h, W2, k_w = _geom(
        H, W, oh, ow, support, antialias, max_box_frac
    )
    nt_h, nt_w = -(-oh // _LANE), -(-ow // _LANE)
    out_pad_h, out_pad_w = nt_h * _LANE, nt_w * _LANE

    digit = precision == "pil_int8"
    fh, fw = _fracs(max_box_frac)
    pb_h, ndig_h = _digit_plan(Hp, oh, support, antialias, fh)
    pb_w, ndig_w = _digit_plan(W2, ow, support, antialias, fw)
    b = boxes.astype(jnp.float32)
    if Hp > H:  # rare (H % 8 != 0): the only case that copies the input
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Hp - H), (0, 0)))
    starts_h, band_h = _windowed_band(
        b[:, 0] * H, b[:, 2] * H, H, oh, k_h, Hp, align_h, mode, antialias
    )

    # ---- pass 1: H (middle axis) -> quantised intermediate --------------
    # x is used UNPADDED along W: wt is a 128-multiple and the last column
    # block may read past W (Pallas boundary block) — those columns carry
    # zero weight in the pass-2 band (`pos <= W-1`), so the garbage never
    # reaches the output.  _window_k's alignment guarantee keeps the row
    # windows inside [0, Hp) with no row pad for any H % 8 == 0.
    ibytes = 1
    band_el = 1 if digit else 4
    band_h_bytes = nt_h * k_h * (ndig_h * _LANE if digit else _LANE) * band_el
    wt = min(1280, max(_LANE, (_VMEM_BUDGET // 2 - band_h_bytes)
                       // max(Hp * ibytes + _LANE, 1)))
    wt = max(_LANE, (wt // _LANE) * _LANE)
    # prefer a wt that divides W2 (no boundary block, inter width == W2)
    from .pallas_resize import _divisor_near

    d = _divisor_near(W2 // _LANE, wt // _LANE) * _LANE
    if d >= max(2 * _LANE, wt // 2) and d <= wt:
        wt = d
    n_wchunks = -(-W2 // wt)
    grid1 = (N, C, n_wchunks, nt_h)
    if digit:
        band_h, ct_h = _digitize_band(band_h, pb=pb_h, ndig=ndig_h)
        kern1 = functools.partial(
            _kernel_crop_mid_dig, k_in=k_h, in_align=align_h,
            pb=pb_h, ndig=ndig_h,
        )
        inter_dtype = jnp.int8  # signed u8-grid (x - 128) convention
        ops1 = (starts_h, x, band_h, ct_h)
        in_specs1 = [
            _bspec(memory_space=pltpu.SMEM),
            _bspec(
                (1, 1, Hp, wt), lambda n, c, j, t: (n, c, 0, j),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (1, nt_h, k_h, ndig_h * _LANE),
                lambda n, c, j, t: (n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (1, nt_h, _LANE), lambda n, c, j, t: (n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        kern1 = functools.partial(
            _kernel_crop_mid,
            k_in=k_h,
            precision=precision,
            out_dtype=jnp.uint8,
            in_align=align_h,
        )
        inter_dtype = jnp.uint8
        ops1 = (starts_h, x, band_h)
        in_specs1 = [
            _bspec(memory_space=pltpu.SMEM),
            _bspec(
                (1, 1, Hp, wt), lambda n, c, j, t: (n, c, 0, j),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (1, nt_h, k_h, _LANE), lambda n, c, j, t: (n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    inter = pl.pallas_call(
        kern1,
        out_shape=jax.ShapeDtypeStruct(
            (N, C, out_pad_h, n_wchunks * wt), inter_dtype
        ),
        out_specs=_bspec(
            (1, 1, _LANE, wt), lambda n, c, j, t: (n, c, t, j),
            memory_space=pltpu.VMEM,
        ),
        grid=grid1,
        in_specs=in_specs1,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * out_pad_h * k_h * n_wchunks * wt
            * (ndig_h if digit else 1),
            bytes_accessed=N * C * Hp * W
            + N * C * out_pad_h * n_wchunks * wt
            + N * band_h_bytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*ops1)

    # ---- pass 2: W (last axis), uint8 out --------------------------------
    in_pad2 = n_wchunks * wt  # inter's emitted width; >= W2, 128-multiple
    starts_w, band_w = _windowed_band(
        b[:, 1] * W, b[:, 3] * W, W, ow, k_w, in_pad2, _LANE, mode, antialias
    )
    band_w_bytes = nt_w * k_w * (ndig_w * _LANE if digit else _LANE) * band_el
    mt = min(512, max(_LANE, (_VMEM_BUDGET // 2 - band_w_bytes)
                      // max(in_pad2 * ibytes + _LANE, 1)))
    mt = max(_LANE, (mt // _LANE) * _LANE)
    while out_pad_h % mt:  # mt | out_pad_h (both 128-multiples)
        mt -= _LANE
    grid2 = (N, C, out_pad_h // mt, nt_w)
    if digit:
        band_w, ct_w = _digitize_band(band_w, pb=pb_w, ndig=ndig_w)
        kern2 = functools.partial(
            _kernel_crop_last_dig, k_in=k_w, pb=pb_w, ndig=ndig_w
        )
        ops2 = (starts_w, inter, band_w, ct_w)
        in_specs2 = [
            _bspec(memory_space=pltpu.SMEM),
            _bspec(
                (1, 1, mt, in_pad2), lambda n, c, i, t: (n, c, i, 0),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (1, nt_w, k_w, ndig_w * _LANE),
                lambda n, c, i, t: (n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (1, nt_w, _LANE), lambda n, c, i, t: (n, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        kern2 = functools.partial(
            _kernel_crop_last,
            k_in=k_w,
            precision=precision,
            out_dtype=jnp.uint8,
            in_exact=True,  # quantised-u8 intermediate is bf16-exact
        )
        ops2 = (starts_w, inter, band_w)
        in_specs2 = [
            _bspec(memory_space=pltpu.SMEM),
            _bspec(
                (1, 1, mt, in_pad2), lambda n, c, i, t: (n, c, i, 0),
                memory_space=pltpu.VMEM,
            ),
            _bspec(
                (1, nt_w, k_w, _LANE), lambda n, c, i, t: (n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
    y = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((N, C, out_pad_h, out_pad_w), jnp.uint8),
        out_specs=_bspec(
            (1, 1, mt, _LANE), lambda n, c, i, t: (n, c, i, t),
            memory_space=pltpu.VMEM,
        ),
        grid=grid2,
        in_specs=in_specs2,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * C * out_pad_h * k_w * out_pad_w
            * (ndig_w if digit else 1),
            bytes_accessed=N * C * out_pad_h * in_pad2
            + N * C * out_pad_h * out_pad_w
            + N * band_w_bytes,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*ops2)
    return y[:, :, :oh, :ow]
