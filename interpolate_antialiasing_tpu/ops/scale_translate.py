"""``jax.image.scale_and_translate`` drop-in on the banded kernel stack.

``jax.image``'s second entry point (next to ``resize``, which
:func:`..resize.image_resize` already mirrors) applies a per-axis affine
map in output space: axis ``d`` of the output samples the input at
``sample_f = (i + 0.5)/scale[d] - translation[d]/scale[d] - 0.5`` through
an antialiased kernel.  That is exactly this library's span machinery —
``center = lo + (i + 0.5) * (1/scale)`` with ``lo = -translation/scale``
— so static affine params route through :func:`make_affine_axis_spec`
onto the registered primitives (full backend stack incl. the Pallas MXU
kernels, fwd+rev autodiff, vmap), while traced params fall back to a
jittable dense-weight contraction with the identical formulas.

Reference analogue: the fractional-window semantics the span machinery
inherits from PIL (/root/reference/step_two_dot_two/
aa_interpolation_impl.h:251-257); jax.image is the parity oracle
(tests/test_scale_translate.py, tolerance well under the 5e-4 target).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .filters import get_filter
from .weights import make_affine_axis_spec

__all__ = ["scale_and_translate"]

# jax.image.scale_and_translate method vocabulary -> registry names.
# (jax has no box/nearest kernel for this entry point.)
_METHODS = {
    "linear": "linear",
    "bilinear": "linear",
    "trilinear": "linear",
    "triangle": "linear",
    "cubic": "cubic",
    "bicubic": "cubic",
    "tricubic": "cubic",
    "lanczos3": "lanczos3",
    "lanczos5": "lanczos5",
}


def _is_concrete(v) -> bool:
    return not isinstance(v, jax.core.Tracer)


def _weight_matrix_traced(in_size, out_size, zoom, translation, mode,
                          antialias, dtype):
    """Traceable [in, out] weight matrix — jax.image's compute_weight_mat
    with this library's filter registry (identical kernels).  Used when
    scale/translation are tracers (shapes stay static; only the affine
    params are dynamic) and for >2 spatial dims; handles negative zoom."""
    filt = get_filter(mode)
    inv = 1.0 / zoom
    # jax quirk, reproduced deliberately: kernel_scale = max(inv, 1) on the
    # SIGNED inverse — a negative zoom therefore never widens the kernel
    # (no antialias), even with antialias=True.
    kernel_scale = jnp.maximum(inv, 1.0) if antialias else 1.0
    i = jnp.arange(out_size, dtype=dtype)
    sample_f = (i + 0.5) * inv - translation * inv - 0.5
    arg = (
        sample_f[jnp.newaxis, :]
        - jnp.arange(in_size, dtype=dtype)[:, jnp.newaxis]
    ) / kernel_scale
    w = filt(arg, jnp).astype(dtype)
    total = w.sum(axis=0, keepdims=True)
    ok = jnp.abs(total) > 1000.0 * np.finfo(np.float32).eps
    w = jnp.where(ok, w / jnp.where(ok, total, 1.0), 0.0)
    in_range = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return jnp.where(in_range[jnp.newaxis, :], w, 0.0)


def scale_and_translate(
    image: jax.Array,
    shape: Sequence[int],
    spatial_dims: Sequence[int],
    scale: jax.Array | Sequence[float],
    translation: jax.Array | Sequence[float],
    method: str = "linear",
    antialias: bool = True,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Drop-in for :func:`jax.image.scale_and_translate`.

    Apply an affine (zoom + shift) resampling along ``spatial_dims``:
    output pixel ``i`` of axis ``d`` looks at input coordinate
    ``(i + 0.5)/scale[d] - translation[d]/scale[d] - 0.5``.

    * Static (Python/NumPy) ``scale``/``translation`` with exactly two
      spatial dims ride the registered banded primitives — MXU kernels on
      TPU, exact transposed-band VJP, vmap — with negative scales handled
      by axis flips.
    * Traced affine params (inside ``jit`` with dynamic zoom/shift) and
      1-D/3-D+ spatial dims use the jittable dense contraction (same
      formulas; still differentiable, via plain XLA autodiff).

    ``precision`` is accepted for signature compatibility; the kernel
    routes fix their own (documented) precision policy.
    """
    del precision
    if method not in _METHODS:
        raise ValueError(
            f"unknown method {method!r}; expected one of {sorted(_METHODS)}"
        )
    mode = _METHODS[method]
    shape = tuple(int(s) for s in shape)
    if len(shape) != image.ndim:
        raise ValueError(
            f"shape must have the input rank {image.ndim}, got {len(shape)}"
        )
    spatial_dims = tuple(int(d) % image.ndim for d in spatial_dims)
    n = len(spatial_dims)
    if len(set(spatial_dims)) != n or n == 0:
        raise ValueError(f"spatial_dims must be distinct and non-empty: {spatial_dims}")
    for d in range(image.ndim):
        if d not in spatial_dims and shape[d] != image.shape[d]:
            raise ValueError(
                f"non-spatial dim {d}: shape {shape[d]} != input {image.shape[d]}"
            )
    scale_l = list(scale) if not hasattr(scale, "shape") else [scale[k] for k in range(n)]
    trans_l = (
        list(translation)
        if not hasattr(translation, "shape")
        else [translation[k] for k in range(n)]
    )
    if len(scale_l) != n or len(trans_l) != n:
        raise ValueError(
            f"scale/translation must have one entry per spatial dim ({n})"
        )
    if not jnp.issubdtype(image.dtype, jnp.inexact):
        image = image.astype(jnp.float32)

    static = all(_is_concrete(v) for v in (*scale_l, *trans_l))
    if static and n == 2:
        h_axis, w_axis = spatial_dims
        x = image
        specs = []
        for axis, s, t in zip(spatial_dims, scale_l, trans_l):
            s = float(np.asarray(s))
            t = float(np.asarray(t))
            if s == 0.0:
                # jax zeroes every sample (sample_f = +-inf is out of range)
                return jnp.zeros(shape, image.dtype)
            aa = antialias
            if s < 0.0:
                # flip identity: resampling with (s, t) equals resampling the
                # flipped axis with (|s|, t - |s| * in_size) (even kernels).
                # jax's kernel_scale = max(1/s, 1) is SIGNED, so a negative
                # zoom never widens the kernel — mirror that by disabling
                # antialias widening on the flipped axis.
                x = jnp.flip(x, axis)
                s = -s
                t = t - s * x.shape[axis]
                aa = False
            specs.append(
                make_affine_axis_spec(
                    x.shape[axis], shape[axis], s, t, mode, aa
                )
            )
        from .resize import resize_plane_vjp

        spec_h, spec_w = specs
        return resize_plane_vjp(x, spec_h, spec_w, h_axis, w_axis, "auto").astype(
            image.dtype
        )

    # Traced / N-D fallback: dense per-axis contractions, fully jittable.
    cdt = jnp.float64 if image.dtype == jnp.float64 else jnp.float32
    y = image.astype(cdt)
    for axis, s, t in zip(spatial_dims, scale_l, trans_l):
        W = _weight_matrix_traced(
            y.shape[axis], shape[axis], jnp.asarray(s, cdt), jnp.asarray(t, cdt),
            mode, antialias, cdt,
        )
        y = jnp.moveaxis(
            jnp.tensordot(jnp.moveaxis(y, axis, -1), W, axes=[[-1], [0]]),
            -1, axis,
        )
    return y.astype(image.dtype)
