"""The banded separable resize as first-class JAX primitives.

Round 1 wrapped the passes in ``jax.custom_vjp``, which gives reverse-mode
only and made differentiability depend on backend routing (the Pallas routes
were wrapped, the XLA routes were not).  Registering real primitives removes
both warts the proper JAX way:

  * ``aa_resize_axis_p``  — one 1-D banded pass along ``axis``;
  * ``aa_resize_plane_p`` — the fused separable 2-pass (W then H) over a
    ``(h_axis, w_axis)`` plane, so the whole-image single-kernel Pallas
    pipelines stay reachable from a single traceable op.

Both ops are *linear* in the image, so ``ad.deflinear2`` supplies both the
jvp (the op applied to the tangent) and the transpose (the exact adjoint:
the transposed banded contraction), which is what makes
``check_grads(modes=["fwd", "rev"], order=2)`` pass on every backend —
unlike the reference, whose committed backward is the non-antialiased 2-tap
kernel and not the adjoint of its forward
(reference: aa_interpolation_backward_impl.h:29-167; autograd bridge
test.py:123-157 is reverse-only).

Primitive params (``AxisSpec``, axis indices, backend string) are hashable
statics: the jaxpr carries no weight tensors, tables are rebuilt inside the
lowering (constant-folded by XLA per shape specialisation).
"""

from __future__ import annotations

from functools import partial

import jax
from jax import core
from jax.extend.core import Primitive
from jax.interpreters import ad, batching, mlir

from .weights import AxisSpec

__all__ = ["aa_resize_axis_p", "aa_resize_plane_p", "apply_axis_p", "resize_plane_p"]


# ---------------------------------------------------------------------------
# 1-D axis pass
# ---------------------------------------------------------------------------

aa_resize_axis_p = Primitive("aa_resize_axis")


def _axis_impl(x, *, spec: AxisSpec, axis: int, backend: str):
    from .resize import _apply_axis

    return _apply_axis(x, spec, axis, backend)


def _require_float(x, name):
    import jax.numpy as jnp

    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(
            f"{name} operates on floating dtypes (got {x.dtype}); cast first "
            "— the public resize() handles uint8 round-tripping"
        )


def _axis_abstract(x, *, spec: AxisSpec, axis: int, backend: str):
    if x.shape[axis] != spec.in_size:
        raise ValueError(
            f"aa_resize_axis: axis {axis} has size {x.shape[axis]}, "
            f"spec expects {spec.in_size}"
        )
    shape = list(x.shape)
    shape[axis] = spec.out_size
    return core.ShapedArray(tuple(shape), x.dtype)


def _axis_transpose(ct, x, *, spec: AxisSpec, axis: int, backend: str):
    from .resize import _transpose_axis

    return (_transpose_axis(ct, spec, axis),)


def _axis_batcher(args, dims, *, spec: AxisSpec, axis: int, backend: str):
    (x,), (bd,) = args, dims
    new_axis = axis + (1 if bd <= axis else 0)
    out = aa_resize_axis_p.bind(x, spec=spec, axis=new_axis, backend=backend)
    return out, bd


aa_resize_axis_p.def_impl(_axis_impl)
aa_resize_axis_p.def_abstract_eval(_axis_abstract)
ad.deflinear2(aa_resize_axis_p, _axis_transpose)
batching.primitive_batchers[aa_resize_axis_p] = _axis_batcher
mlir.register_lowering(
    aa_resize_axis_p, mlir.lower_fun(_axis_impl, multiple_results=False)
)


def apply_axis_p(x, spec: AxisSpec, axis: int, backend: str):
    """Bind the 1-D pass primitive (axis normalised to a non-negative index)."""
    _require_float(x, "aa_resize_axis")
    return aa_resize_axis_p.bind(x, spec=spec, axis=axis % x.ndim, backend=backend)


# ---------------------------------------------------------------------------
# Separable 2-D plane pass (kept as one primitive so the fused single-kernel
# forward AND the fused single-kernel adjoint stay reachable)
# ---------------------------------------------------------------------------

aa_resize_plane_p = Primitive("aa_resize_plane")


def _plane_impl(x, *, spec_h, spec_w, h_axis, w_axis, backend):
    from .resize import _resize_plane_impl

    return _resize_plane_impl(x, spec_h, spec_w, h_axis, w_axis, backend)


def _plane_abstract(x, *, spec_h, spec_w, h_axis, w_axis, backend):
    for ax, spec in ((h_axis, spec_h), (w_axis, spec_w)):
        if x.shape[ax] != spec.in_size:
            raise ValueError(
                f"aa_resize_plane: axis {ax} has size {x.shape[ax]}, "
                f"spec expects {spec.in_size}"
            )
    shape = list(x.shape)
    shape[h_axis] = spec_h.out_size
    shape[w_axis] = spec_w.out_size
    return core.ShapedArray(tuple(shape), x.dtype)


def _plane_transpose(ct, x, *, spec_h, spec_w, h_axis, w_axis, backend):
    from .resize import _plane_adjoint

    return (_plane_adjoint(ct, spec_h, spec_w, h_axis, w_axis),)


def _plane_batcher(args, dims, *, spec_h, spec_w, h_axis, w_axis, backend):
    (x,), (bd,) = args, dims
    nh = h_axis + (1 if bd <= h_axis else 0)
    nw = w_axis + (1 if bd <= w_axis else 0)
    out = aa_resize_plane_p.bind(
        x, spec_h=spec_h, spec_w=spec_w, h_axis=nh, w_axis=nw, backend=backend
    )
    return out, bd


aa_resize_plane_p.def_impl(_plane_impl)
aa_resize_plane_p.def_abstract_eval(_plane_abstract)
ad.deflinear2(aa_resize_plane_p, _plane_transpose)
batching.primitive_batchers[aa_resize_plane_p] = _plane_batcher
mlir.register_lowering(
    aa_resize_plane_p, mlir.lower_fun(_plane_impl, multiple_results=False)
)


def resize_plane_p(x, spec_h, spec_w, h_axis: int, w_axis: int, backend: str):
    """Bind the plane primitive (axes normalised to non-negative indices)."""
    _require_float(x, "aa_resize_plane")
    return aa_resize_plane_p.bind(
        x,
        spec_h=spec_h,
        spec_w=spec_w,
        h_axis=h_axis % x.ndim,
        w_axis=w_axis % x.ndim,
        backend=backend,
    )
