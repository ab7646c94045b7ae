"""Reference-surface shims.

These mirror the pybind surface of the canonical step
(reference: step_two_dot_two/extension_interpolate.cpp:46-51 exporting
``linear_forward`` / ``nearest_forward`` / ``cubic_forward`` /
``linear_backward``) so a user of the reference can switch 1:1.  They all
operate on NCHW float arrays with ``antialias=True`` like the reference ops.

The reference's ``linear_backward`` implements the *non-antialiased* 2-tap
adjoint (aa_interpolation_backward_impl.h:29-167 — SURVEY §2.3 flags this as
inconsistent with the AA forward).  Ours is the exact adjoint of the AA
forward (the transposed banded contraction); ``nearest_backward`` and
``cubic_backward`` are provided too (the reference left cubic backward as a
commented-out TODO, test.py:110-116).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .weights import make_axis_spec
from .resize import resize_plane, _transpose_axis

__all__ = [
    "linear_forward",
    "nearest_forward",
    "cubic_forward",
    "linear_backward",
    "nearest_backward",
    "cubic_backward",
]


def _forward(x: jax.Array, size: Sequence[int], align_corners: bool, mode: str):
    if x.ndim != 4:
        raise ValueError("expected NCHW input")
    return resize_plane(
        x,
        (int(size[0]), int(size[1])),
        h_axis=2,
        w_axis=3,
        mode=mode,
        antialias=True,
        align_corners=align_corners,
    )


def linear_forward(x, size, align_corners: bool = False):
    return _forward(x, size, align_corners, "bilinear")


def nearest_forward(x, size, align_corners: bool = False):
    return _forward(x, size, align_corners, "nearest")


def cubic_forward(x, size, align_corners: bool = False):
    return _forward(x, size, align_corners, "bicubic")


def _backward(grad_output, osize, input_shape, align_corners, mode):
    """grad wrt input of the AA forward: apply the transposed band per axis.

    ``input_shape`` is the full NCHW shape (like the reference's
    ``input_size`` argument, aa_interpolation_backward_impl.h:185-219).
    """
    g = jnp.asarray(grad_output)
    if g.ndim != 4:
        raise ValueError("expected NCHW grad_output")
    ih, iw = int(input_shape[2]), int(input_shape[3])
    oh, ow = int(osize[0]), int(osize[1])
    spec_h = make_axis_spec(ih, oh, mode, True, align_corners)
    spec_w = make_axis_spec(iw, ow, mode, True, align_corners)
    gh = _transpose_axis(g, spec_h, 2)
    return _transpose_axis(gh, spec_w, 3)


def linear_backward(grad_output, osize, input_shape, align_corners: bool = False):
    return _backward(grad_output, osize, input_shape, align_corners, "bilinear")


def nearest_backward(grad_output, osize, input_shape, align_corners: bool = False):
    return _backward(grad_output, osize, input_shape, align_corners, "nearest")


def cubic_backward(grad_output, osize, input_shape, align_corners: bool = False):
    return _backward(grad_output, osize, input_shape, align_corners, "bicubic")
