"""Pure-XLA resize passes: the rebuild's "step zero" and permanent oracle.

Two formulations of the 1-D banded contraction ``y = W @ x``:

  * ``resize_axis_dense`` — materialise the full ``W[out, in]`` (float64
    tables cast to the compute dtype) and contract with ``einsum``.  Exact,
    simple, the parity oracle; MXU-bound.  This replaces the reference's
    step_zero/"reference implementation" role (SURVEY §7 item 2).
  * ``resize_axis_gather`` — compact ``O(out * ntaps)`` formulation: gather
    the ``ntaps`` source pixels per output pixel and reduce with the packed
    weight table (the reference's "step two" packed-weights layout,
    step_two_dot_two/aa_interpolation_impl.h:244-283, as a vector op instead
    of a scalar loop).  Bandwidth-bound; no wasted FLOPs; used when the dense
    matrix would be too wasteful and the Pallas kernel is unavailable.

Both are linear in ``x`` with weights that are compile-time constants per
``AxisSpec`` (shape-specialised jit, the XLA norm — SURVEY §7 item 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .weights import AxisSpec, banded_tiles, compute_tables, dense_matrix, make_axis_spec

__all__ = [
    "resize_axis_dense",
    "resize_axis_gather",
    "resize_axis_banded",
    "resize_plane_xla",
]

# Parity contractions must not be demoted to bf16 passes on the MXU: with
# DEFAULT precision a f32 dot is computed with bf16 multiplies, costing ~3
# decimal digits — enough to flip uint8 rounding boundaries.  The perf path
# opts into lower precision explicitly (bf16 inputs), never implicitly.
_PRECISION = jax.lax.Precision.HIGHEST


def _table_dtype_for(dtype) -> np.dtype:
    return np.float64 if dtype == jnp.float64 else np.float32


def resize_axis_dense(x: jax.Array, spec: AxisSpec, axis: int) -> jax.Array:
    """Contract ``axis`` of ``x`` with the dense banded matrix ``W[out, in]``."""
    if x.shape[axis] != spec.in_size:
        raise ValueError(f"axis {axis} has size {x.shape[axis]} != {spec.in_size}")
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    W = jnp.asarray(dense_matrix(spec, dtype=_table_dtype_for(cdtype)), dtype=cdtype)
    x = jnp.moveaxis(x.astype(cdtype), axis, -1)
    y = jnp.einsum(
        "...i,oi->...o", x, W, preferred_element_type=cdtype, precision=_PRECISION
    )
    return jnp.moveaxis(y, -1, axis)


def resize_axis_gather(x: jax.Array, spec: AxisSpec, axis: int) -> jax.Array:
    """Compact gather-reduce along ``axis``: no wasted FLOPs, VPU-bound."""
    if x.shape[axis] != spec.in_size:
        raise ValueError(f"axis {axis} has size {x.shape[axis]} != {spec.in_size}")
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    # Tables are always built in float64 (Pillow evaluates filters in double)
    # and cast once — float32 table construction can flip xmin boundaries.
    xmin, _size, w = compute_tables(spec, dtype=np.float64)
    idx = np.clip(
        xmin[:, None].astype(np.int64) + np.arange(spec.ntaps)[None, :],
        0,
        spec.in_size - 1,
    )  # [out, ntaps]; out-of-range taps carry zero weight so the clamp is inert
    idx_j = jnp.asarray(idx, dtype=jnp.int32)
    w_j = jnp.asarray(w, dtype=cdtype)
    xm = jnp.moveaxis(x.astype(cdtype), axis, -1)  # [..., in]
    g = jnp.take(xm, idx_j, axis=-1)  # [..., out, ntaps]
    y = jnp.einsum(
        "...ok,ok->...o", g, w_j, preferred_element_type=cdtype, precision=_PRECISION
    )
    return jnp.moveaxis(y, -1, axis)


def resize_axis_banded(
    x: jax.Array, spec: AxisSpec, axis: int, tile: int = 128
) -> jax.Array:
    """Tiled banded matmul in plain XLA: for each tile of ``tile`` output
    pixels, slice the static-width input window and contract ``[.., k_in] @
    [k_in, tile]``.  Same tiling the Pallas kernel uses (and a second oracle
    for it), expressed with ``dynamic_slice`` + ``dot``.
    """
    if x.shape[axis] != spec.in_size:
        raise ValueError(f"axis {axis} has size {x.shape[axis]} != {spec.in_size}")
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    align = 8
    bt = banded_tiles(spec, tile=tile, dtype=_table_dtype_for(cdtype), align=align)
    xm = jnp.moveaxis(x.astype(cdtype), axis, -1)  # [..., in]
    # Window starts may reach round_up(in, align) - k_in, so pad to the
    # aligned input length (dynamic_slice would otherwise clamp and read a
    # shifted window).
    in_cap = -(-spec.in_size // align) * align
    pad_in = max(in_cap, bt.k_in) - spec.in_size
    if pad_in:
        xm = jnp.pad(xm, [(0, 0)] * (xm.ndim - 1) + [(0, pad_in)])
    band = jnp.asarray(bt.band, dtype=cdtype)  # [n_tiles, k_in, tile]
    starts = bt.starts  # host ints — static per spec

    outs = []
    for t in range(bt.n_tiles):
        win = jax.lax.dynamic_slice_in_dim(xm, int(starts[t]), bt.k_in, axis=-1)
        outs.append(
            jax.lax.dot_general(
                win,
                band[t],
                ((( win.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=cdtype,
                precision=_PRECISION,
            )
        )
    y = jnp.concatenate(outs, axis=-1)[..., : spec.out_size]
    return jnp.moveaxis(y, -1, axis)


def resize_plane_xla(
    x: jax.Array,
    out_hw: tuple[int, int],
    h_axis: int,
    w_axis: int,
    mode: str = "bilinear",
    antialias: bool = True,
    align_corners: bool = False,
    method: str = "dense",
    scale_factors: tuple[float, float] | None = None,
) -> jax.Array:
    """Separable 2-D resize: W axis first, then H — same pass order as the
    reference's separable driver (step_two_dot_two/aa_interpolation_impl.h:655-679)."""
    oh, ow = out_hw
    sfh, sfw = scale_factors if scale_factors is not None else (None, None)
    spec_w = make_axis_spec(
        x.shape[w_axis], ow, mode, antialias, align_corners, sfw
    )
    spec_h = make_axis_spec(
        x.shape[h_axis], oh, mode, antialias, align_corners, sfh
    )
    fn = {
        "dense": resize_axis_dense,
        "gather": resize_axis_gather,
        "banded": resize_axis_banded,
    }[method]
    y = fn(x, spec_w, w_axis)
    y = fn(y, spec_h, h_axis)
    return y
