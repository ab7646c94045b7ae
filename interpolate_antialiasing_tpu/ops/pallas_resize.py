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

Two band sources:
  * ``fused=False`` — band precomputed on host in float64 (bit-matches the
    XLA oracle path; the default).
  * ``fused=True``  — band synthesised *inside the kernel* from the closed
    form (broadcasted_iota + filter + per-column normalisation), the answer
    to the reference's CUDA question of precompute-vs-fuse
    (playground_cuda/playground.cu:31-62): zero band HBM traffic.  Window
    starts/xmin still come from exact host tables (int32, tiny), so float32
    floor-boundary flips cannot move the window.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import debug_enabled
from .weights import AxisSpec, BandedTiles, banded_tiles, compute_tables

__all__ = ["resize_axis_pallas", "pallas_supported"]

_LANE = 128
_SUBLANE = 8
_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom below the ~16MB/core VMEM


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Kernel bodies
# ---------------------------------------------------------------------------


def _kernel_last(starts_ref, x_ref, band_ref, o_ref, *, k_in: int, precision):
    """out[MT, TILE] = x[MT, s:s+K] @ band[j]  (contraction over last axis)."""
    j = pl.program_id(1)
    s = pl.multiple_of(starts_ref[j], _LANE)
    win = x_ref[:, pl.ds(s, k_in)]
    o_ref[:, :] = jax.lax.dot_general(
        win,
        band_ref[j],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _kernel_mid(starts_ref, x_ref, band_ref, o_ref, *, k_in: int, precision):
    """out[1, TILE, WT] = band[j]^T @ x[1, s:s+K, WT]  (middle-axis pass)."""
    j = pl.program_id(2)
    s = pl.multiple_of(starts_ref[j], _SUBLANE)
    win = x_ref[0, pl.ds(s, k_in), :]
    o_ref[0, :, :] = jax.lax.dot_general(
        band_ref[j],
        win,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


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
    o_local = jax.lax.broadcasted_iota(jnp.int32, (k_in, tile), 1)
    o_global = o_local + j * tile
    k = jax.lax.broadcasted_iota(jnp.int32, (k_in, tile), 0)
    if spec.align_corners:
        center = spec.scale * o_global.astype(jnp.float32) + 0.5
    else:
        center = spec.scale * (o_global.astype(jnp.float32) + 0.5)
    pos = (start + k).astype(jnp.float32)  # absolute input position of tap k
    arg = (pos - center + 0.5) * spec.invscale
    w = spec.filter(arg, jnp)
    valid = (pos >= 0.0) & (pos <= float(spec.in_size) - 1.0)
    w = jnp.where(valid, w, 0.0)
    total = jnp.sum(w, axis=0, keepdims=True)
    w = w / jnp.where(total == 0.0, 1.0, total)
    return w


def _kernel_last_fused(
    starts_ref, x_ref, o_ref, *, spec: AxisSpec, tile: int, k_in: int, precision
):
    j = pl.program_id(1)
    s = pl.multiple_of(starts_ref[j], _LANE)
    band = _synth_band(spec, s, j, tile, k_in)
    win = x_ref[:, pl.ds(s, k_in)]
    o_ref[:, :] = jax.lax.dot_general(
        win,
        band,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _kernel_mid_fused(
    starts_ref, x_ref, o_ref, *, spec: AxisSpec, tile: int, k_in: int, precision
):
    j = pl.program_id(2)
    s = pl.multiple_of(starts_ref[j], _SUBLANE)
    band = _synth_band(spec, s, j, tile, k_in)
    win = x_ref[0, pl.ds(s, k_in), :]
    o_ref[0, :, :] = jax.lax.dot_general(
        band,
        win,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


# ---------------------------------------------------------------------------
# Host-side drivers
# ---------------------------------------------------------------------------


@functools.cache
def _tiles_cached(spec: AxisSpec, tile: int, align: int) -> BandedTiles:
    return banded_tiles(spec, tile=tile, dtype=np.float32, align=align)


def _pass_last(
    x2: jax.Array, spec: AxisSpec, fused: bool, precision
) -> jax.Array:
    """x2: [M, IN] float32 -> [M, OUT] float32."""
    M, IN = x2.shape
    bt = _tiles_cached(spec, _LANE, _LANE)
    in_pad = max(_round_up(IN, _LANE), bt.k_in)
    # Row tile: keep the (double-buffered) x block within budget.
    mt = max(_SUBLANE, min(512, (_VMEM_BUDGET // 3) // max(in_pad * 4, 1)))
    mt = max(_SUBLANE, (mt // _SUBLANE) * _SUBLANE)
    m_pad = _round_up(max(M, mt), mt)
    x2 = jnp.pad(x2, ((0, m_pad - M), (0, in_pad - IN)))
    starts = jnp.asarray(bt.starts, dtype=jnp.int32)
    grid = (m_pad // mt, bt.n_tiles)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((m_pad, bt.out_padded), jnp.float32),
        out_specs=pl.BlockSpec(
            (mt, _LANE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        grid=grid,
        interpret=_interpret(),
    )
    cost = pl.CostEstimate(
        flops=2 * m_pad * bt.k_in * bt.out_padded,
        bytes_accessed=(m_pad * in_pad + m_pad * bt.out_padded) * 4
        + bt.band.size * 4,
        transcendentals=0,
    )
    if fused:
        y = pl.pallas_call(
            functools.partial(
                _kernel_last_fused,
                spec=spec,
                tile=_LANE,
                k_in=bt.k_in,
                precision=precision,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((mt, in_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x2)
    else:
        band = jnp.asarray(bt.band)  # [n_tiles, k_in, tile] — VMEM-resident
        y = pl.pallas_call(
            functools.partial(_kernel_last, k_in=bt.k_in, precision=precision),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((mt, in_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (bt.n_tiles, bt.k_in, _LANE),
                    lambda i, j: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x2, band)
    return y[:M, : spec.out_size]


def _pass_mid(
    x3: jax.Array, spec: AxisSpec, fused: bool, precision
) -> jax.Array:
    """x3: [B, IN, W] float32 -> [B, OUT, W] float32 (contraction over axis 1)."""
    B, IN, W = x3.shape
    bt = _tiles_cached(spec, _LANE, _SUBLANE)
    in_pad = max(_round_up(IN, _SUBLANE), bt.k_in)
    w_pad = _round_up(W, _LANE)
    # Column tile: x block is (1, in_pad, wt).
    wt = max(_LANE, min(512, (_VMEM_BUDGET // 3) // max(in_pad * 4, 1)))
    wt = max(_LANE, (wt // _LANE) * _LANE)
    w_pad = _round_up(w_pad, wt)
    x3 = jnp.pad(x3, ((0, 0), (0, in_pad - IN), (0, w_pad - W)))
    starts = jnp.asarray(bt.starts, dtype=jnp.int32)
    grid = (B, w_pad // wt, bt.n_tiles)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((B, bt.out_padded, w_pad), jnp.float32),
        out_specs=pl.BlockSpec(
            (1, _LANE, wt), lambda b, k, j: (b, j, k), memory_space=pltpu.VMEM
        ),
        grid=grid,
        interpret=_interpret(),
    )
    cost = pl.CostEstimate(
        flops=2 * B * w_pad * bt.k_in * bt.out_padded,
        bytes_accessed=(B * in_pad * w_pad + B * bt.out_padded * w_pad) * 4
        + bt.band.size * 4,
        transcendentals=0,
    )
    if fused:
        y = pl.pallas_call(
            functools.partial(
                _kernel_mid_fused,
                spec=spec,
                tile=_LANE,
                k_in=bt.k_in,
                precision=precision,
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, in_pad, wt), lambda b, k, j: (b, 0, k), memory_space=pltpu.VMEM
                ),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x3)
    else:
        band = jnp.asarray(bt.band)
        y = pl.pallas_call(
            functools.partial(_kernel_mid, k_in=bt.k_in, precision=precision),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (1, in_pad, wt), lambda b, k, j: (b, 0, k), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (bt.n_tiles, bt.k_in, _LANE),
                    lambda b, k, j: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            cost_estimate=cost,
            **common,
        )(starts, x3, band)
    return y[:, : spec.out_size, :W]


def pallas_supported(x: jax.Array, spec: AxisSpec, axis: int) -> bool:
    if x.dtype not in (jnp.float32,):
        return False
    axis = axis % x.ndim
    trail = int(np.prod(x.shape[axis + 1 :])) if axis + 1 < x.ndim else 1
    align = _LANE if trail == 1 else _SUBLANE
    bt = _tiles_cached(spec, _LANE, align)
    in_pad = max(_round_up(spec.in_size, align), bt.k_in)
    # x row-block + resident band must fit the VMEM budget.
    band_bytes = bt.n_tiles * bt.k_in * _LANE * 4
    if band_bytes > _VMEM_BUDGET // 2:
        return False
    if in_pad * 4 * _SUBLANE > _VMEM_BUDGET // 3:  # even 8 rows won't fit
        return False
    return True


def resize_axis_pallas(
    x: jax.Array,
    spec: AxisSpec,
    axis: int,
    fused: bool = False,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Resize ``axis`` of ``x`` (any rank) with the Pallas banded kernels.

    The array is viewed as ``[lead..., IN, trail...]``; trailing axes are
    flattened into the lane dimension (middle-axis kernel) or, when there are
    none, the leading axes are flattened into rows (last-axis kernel) — so
    both NCHW and NHWC run without transposes.
    """
    if x.shape[axis] != spec.in_size:
        raise ValueError(f"axis {axis} has {x.shape[axis]} != {spec.in_size}")
    if fused and spec.mode in ("box", "nearest"):
        fused = False  # discontinuous filter: edge taps are not ~0 (see _synth_band)
    axis = axis % x.ndim
    lead = x.shape[:axis]
    trail = x.shape[axis + 1 :]
    nlead = int(np.prod(lead)) if lead else 1
    ntrail = int(np.prod(trail)) if trail else 1
    if ntrail == 1:
        y = _pass_last(
            x.reshape(nlead, spec.in_size).astype(jnp.float32), spec, fused, precision
        )
        return y.reshape(*lead, spec.out_size, *trail)
    y = _pass_mid(
        x.reshape(nlead, spec.in_size, ntrail).astype(jnp.float32),
        spec,
        fused,
        precision,
    )
    return y.reshape(*lead, spec.out_size, *trail)
