"""Compiler/kernel inspection — the TPU analogue of the reference's
compiler-explorer probe (godbolt/step_zero.cpp:1-119, which extracted the
inner loop and checked gcc's vectorisation report with -fopt-info-vec-all)
and of its VERBOSE stride/dispatch tracing (step_zero/aa_interpolation_impl.h
TI_SHOW_* ifdefs).

On TPU the equivalent questions are: what did this shape lower to
(StableHLO), what did XLA/Mosaic make of it (optimized HLO), and what does
the banded formulation cost (band geometry, MAC counts, HBM bytes)?
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lower_text", "compiled_text", "kernel_report", "KernelReport", "sharded_report"]


def lower_text(fn, *args) -> str:
    """StableHLO of ``fn`` traced at the abstract shapes of ``args``."""
    return jax.jit(fn).lower(*args).as_text()


def compiled_text(fn, *args) -> str:
    """Optimized (post-XLA) HLO — what actually runs on the chip."""
    return jax.jit(fn).lower(*args).compile().as_text()


@dataclasses.dataclass
class KernelReport:
    """Static cost/geometry report for one resize configuration."""

    in_shape: tuple
    out_hw: tuple
    mode: str
    dtype: str
    route: str  # which kernel the dispatcher picks
    axes: list  # per-axis dicts: ntaps, k_in, n_tiles, density, MMACs
    total_mmacs: float  # MACs in millions, single-precision-pass count
    hbm_mbytes: float  # essential input+output traffic
    # algorithmically necessary MACs (nonzero weight taps only — no band
    # padding, no digit redundancy); executed/useful is the overhead the
    # implementation pays for static shapes + bit-exactness
    total_useful_mmacs: float = 0.0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    def __str__(self) -> str:  # human-readable table
        lines = [
            f"resize {self.in_shape} -> {self.out_hw} mode={self.mode} "
            f"dtype={self.dtype} route={self.route}",
            f"  essential HBM traffic: {self.hbm_mbytes:.2f} MB; "
            f"MACs/plane (1 pass): {self.total_mmacs:.1f} M",
        ]
        for a in self.axes:
            lines.append(
                f"  axis {a['axis']}: {a['in_size']}->{a['out_size']} "
                f"ntaps={a['ntaps']} k_in={a['k_in']} n_tiles={a['n_tiles']} "
                f"band density={a['density']:.3f} MACs={a['mmacs']:.1f}M"
            )
        return "\n".join(lines)


def kernel_report(
    in_shape,
    out_hw,
    mode: str = "bilinear",
    dtype=jnp.uint8,
    antialias: bool = True,
    backend: str = "auto",
    output_dtype=None,
    align_corners: bool = False,
    scale_factors=None,
    data_format: str | None = None,
) -> KernelReport:
    """Report band geometry and cost for a resize config without running it.

    Mirrors what the reference's VERBOSE build printed per call (which loop
    specialisation fired, the operand strides) in banded-MXU terms: per-axis
    tap count, static window ``k_in``, tile count, band density (fraction of
    MXU MACs that touch nonzero weights), and MAC/byte totals.

    The ``route`` field reports what ops/resize.py's dispatcher would pick
    ON TPU for these exact call-site arguments — the full keyword surface
    resize() gates on (backend / output_dtype / align_corners /
    scale_factors / data_format) is accepted and forwarded, so the report
    cannot drift from actual dispatch (round-2 advisor finding).
    """
    from ..ops.weights import make_axis_spec, banded_tiles
    from ..ops.resize import _axes_for
    from ..ops.pallas_resize import (
        _tiles_exact_cached,
        _tiles_exact_h_cached,
        _tiles_stream_cached,
        _tiles_stream_w_cached,
        resize2d_onekernel_supported,
        resize2d_streamed_supported,
    )

    in_shape = tuple(int(s) for s in in_shape)
    oh, ow = int(out_hw[0]), int(out_hw[1])
    dt = jnp.dtype(dtype)
    ndim = len(in_shape)

    class _Fake:
        shape = in_shape
        ndim = len(in_shape)
        dtype = dt

    h_axis, w_axis = _axes_for(_Fake, data_format)
    h_axis, w_axis = h_axis % ndim, w_axis % ndim
    trailing_hw = h_axis == ndim - 2 and w_axis == ndim - 1
    channels_last = ndim >= 3 and h_axis == ndim - 3 and w_axis == ndim - 2
    H, W = in_shape[h_axis], in_shape[w_axis]
    lead = int(np.prod(in_shape)) // (H * W)
    sfh, sfw = scale_factors if scale_factors is not None else (None, None)
    spec_h = make_axis_spec(H, oh, mode, antialias, align_corners, sfh)
    spec_w = make_axis_spec(W, ow, mode, antialias, align_corners, sfw)
    # the kernels see the NCHW-transposed shape for channels-last calls
    shape_k = (
        in_shape[:-3] + (in_shape[-1], in_shape[-3], in_shape[-2])
        if channels_last
        else in_shape
    )

    class _FakeK:
        shape = shape_k
        ndim = len(shape_k)
        dtype = dt

    # Resolve the output/intermediate dtypes EXACTLY like ops/resize.py so
    # the reported route always matches dispatch: resize() keeps the output
    # dtype equal to the input dtype by default (uint8 in -> uint8 out), and
    # uses a bf16 intermediate only for bf16 inputs.  Under backend="auto"
    # every dtype prefers the fused pipelines (round 2b dropped the
    # large-plane gate), with u8->u8 promoting to the pil int8 kernel first.
    odt = jnp.dtype(output_dtype) if output_dtype is not None else dt
    inter = jnp.dtype(jnp.bfloat16) if dt == jnp.bfloat16 else jnp.dtype(jnp.float32)
    # u8 -> u8 plain-PIL calls promote to the bit-exact int8 digit kernel
    # first (resize.py's 'auto' gate, round 2b) — same gate conditions.
    pil_int8 = False
    if (
        dt == jnp.uint8
        and odt == jnp.dtype(jnp.uint8)
        and backend == "auto"
        and not align_corners
        and scale_factors is None
        and (trailing_hw or channels_last)
    ):
        try:
            from ..ops.pil_exact import pil_auto_promotable

            pil_int8 = pil_auto_promotable(shape_k, oh, ow, mode, antialias)
        except Exception:
            pil_int8 = False
    # 'auto'/'pallas' prefer the fused pipelines; explicit xla/dense/gather/
    # banded backends never reach them (resize.py's backend_resolved gates)
    float_fused_gate = backend in ("auto", "pallas") and (
        trailing_hw or channels_last
    )
    try:
        onek = (
            not pil_int8
            and float_fused_gate
            and resize2d_onekernel_supported(_FakeK(), spec_h, spec_w, odt)
        )
    except Exception:
        onek = False
    try:
        streamed = (
            float_fused_gate
            and not pil_int8
            and not onek
            and resize2d_streamed_supported(
                _FakeK(), spec_h, spec_w, odt, inter_dtype=inter
            )
        )
    except Exception:
        streamed = False
    pil_whole = False
    if pil_int8:
        from ..ops.pil_exact import pil_exact_pallas_supported

        m = "box" if mode == "nearest" else mode
        try:
            pil_whole = pil_exact_pallas_supported(shape_k, oh, ow, m)
        except Exception:
            pil_whole = False
        route = ("pil_exact int8 digit kernel (bit-exact)" if pil_whole
                 else "pil_exact int8 digit kernel, streamed (bit-exact)")
    elif onek:
        route = "single-kernel (resize2d_onekernel)"
    elif streamed:
        route = "streamed single-kernel (resize2d_streamed)"
    elif dt == jnp.float64 and backend in ("auto", "xla"):
        # mirror resize._pick_method_f64 (round 4): large planes take the
        # banded XLA contraction, small ones the dense matmul
        from ..ops.resize import _pick_method_f64

        per_axis = {
            name: _pick_method_f64(spec)
            for name, spec in (("W", spec_w), ("H", spec_h))
        }
        route = (
            "f64 XLA per-axis "
            f"(W={per_axis['W']}, H={per_axis['H']}; no f64 MXU)"
        )
    else:
        route = "padded pipeline / per-axis / XLA"

    axes = []
    total = 0.0
    for name, spec, rows in (("W", spec_w, H), ("H", spec_h, spec_w.out_size)):
        if onek:  # the geometry the onekernel actually executes
            bt = (_tiles_exact_h_cached(spec) if name == "H"
                  else _tiles_exact_cached(spec))
        elif streamed:  # ... and the float streamed kernel (round-3 knobs)
            # pass spec_h like dispatch does (pallas_resize.py:1414) so the
            # reported W geometry cannot drift from the route once the
            # float W cost model (mxu_model.FLOAT_W_MODEL_DEFAULT) is on;
            # the H tile mirrors the executor's dtype-aware fine cands
            bt = (
                _tiles_stream_cached(spec, fine=odt.itemsize >= 2)
                if name == "H"
                else _tiles_stream_w_cached(spec, spec_h)
            )
        else:
            bt = banded_tiles(spec)
        nz = float((bt.band != 0).sum())
        density = nz / bt.band.size if bt.band.size else 0.0
        mmacs = rows * bt.k_in * bt.out_padded / 1e6
        axes.append(
            dict(
                axis=name,
                in_size=spec.in_size,
                out_size=spec.out_size,
                ntaps=spec.ntaps,
                k_in=bt.k_in,
                n_tiles=bt.n_tiles,
                density=density,
                mmacs=mmacs,
                # nonzero taps only: the algorithmic lower bound per pass
                useful_mmacs=rows * nz / 1e6,
            )
        )
        total += mmacs
    if pil_int8:
        # report the geometry the digit kernel actually executes (incl. the
        # round-3 tile-width knobs and effective 128-deep MXU K passes) —
        # whole-image (align=1, W tile pinned 128) vs streamed (align=8 H
        # windows, W tile by _pick_tile_w at lane pitch 128)
        from ..ops.pil_exact import _digit_tiles, _pick_tile_h, _stream_tiles

        if pil_whole:
            tile_h = _pick_tile_h(H, oh, m)
            # (tiles, tile, lane pitch): the W pass slices digit planes
            # along result lanes at pitch 128; the H pass along sublanes
            # at pitch = tile (see _digit_tiles docstring)
            geo = [(_digit_tiles(W, ow, m)[0], 128, 128),
                   (_digit_tiles(H, oh, m, tile=tile_h)[0], tile_h, tile_h)]
        else:
            btw, _, _, bth, _, _ = _stream_tiles(H, W, oh, ow, m)
            geo = [(btw, btw.tile, 128), (bth, bth.tile, bth.tile)]
        for ax, rows, (bt, tl, pitch) in zip(axes, (H, ow), geo):
            # what the digit kernel hands the MXU per plane: one
            # [rows, k_in] @ [k_in, 3*pitch] matmul per tile (3 digit
            # planes side by side); 'eff' additionally pads K to the
            # MXU's 128-deep passes (measured: int8 matmul time goes as
            # ceil(K/128) — the round-3 geometry study), which is the
            # honest divisor against a dense-matmul ceiling.
            k_eff = 128 * (-(-bt.k_in // 128))
            ax.update(
                digit_tile=tl,
                digit_pitch=pitch,
                digit_k_in=bt.k_in,
                digit_n_tiles=bt.n_tiles,
                digit_k_passes=-(-bt.k_in // 128),
                digit_exec_mmacs=rows * bt.n_tiles * bt.k_in * 3 * pitch / 1e6,
                digit_exec_eff_mmacs=rows * bt.n_tiles * k_eff * 3 * pitch / 1e6,
            )
    hbm = lead * (H * W * dt.itemsize + oh * ow * dt.itemsize) / 1e6
    return KernelReport(
        in_shape=in_shape,
        out_hw=(oh, ow),
        mode=mode,
        dtype=str(dt),
        route=route,
        axes=axes,
        total_mmacs=total,
        hbm_mbytes=hbm,
        total_useful_mmacs=sum(a["useful_mmacs"] for a in axes),
    )


def sharded_report(in_h: int, out_h: int, mode: str, n_shards: int,
                   width: int | None = None) -> dict:
    """Geometry + communication report for the sharded H-split routes
    (parallel/halo.py) — what an operator sizes a mesh with.

    Returns a dict (also printable) with the halo plan (halo rows, local
    block sizes, extended frame), the per-device ICI wire bytes, and the
    digit-promotion table footprints.  Both sharded routes exchange rows
    AFTER their local W pass, so ``width`` is the OUTPUT width: the float
    route ships f32 rows (4 B/px), the byte-exact route ships the
    quantised u8 intermediate (1 B/px — a quarter of the wire)."""
    from ..parallel.halo import _digit_halo_tables, plan_halo_banded

    plan = plan_halo_banded(in_h, out_h, mode, True, n_shards)
    rep = {
        "in_h": in_h,
        "out_h": out_h,
        "mode": mode,
        "n_shards": n_shards,
        "halo_rows": plan.halo,
        "local_in_rows": plan.hl,
        "local_out_rows": plan.ol,
        "extended_rows": plan.ext,
        "float_band_geometry": {
            "n_tiles": plan.n_tiles,
            "k_in": plan.k_in,
            "bands_bytes_per_shard": int(plan.bands[0].nbytes),
        },
    }
    _, dstarts, dbands, dct = _digit_halo_tables(in_h, out_h, mode, n_shards)
    rep["digit_table_geometry"] = {
        "n_tiles": int(dbands.shape[1]),
        "k_in": int(dbands.shape[2]),
        "bands_bytes_per_shard": int(dbands[0].nbytes + dct[0].nbytes),
    }
    if width is not None:
        # two ppermutes of `halo` rows each, both directions
        rep["wire_bytes_per_device_float32"] = 2 * plan.halo * width * 4
        rep["wire_bytes_per_device_u8_exact"] = 2 * plan.halo * width
    return rep
