"""Pallas kernel tests in interpret mode (CPU, no TPU required).

The same kernels run compiled on TPU; interpret mode is the CI-friendly
equivalent of the reference's ASAN/gdb recipes (SURVEY §4/§5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from interpolate_antialiasing_tpu.ops.pallas_resize import (
    pallas_supported,
    resize_axis_pallas,
)
from interpolate_antialiasing_tpu.ops.resize_xla import resize_axis_dense
from interpolate_antialiasing_tpu.ops.weights import make_axis_spec

CASES = [
    # (shape, out, axis, mode) — last-axis and middle-axis kernels, both
    # directions, NCHW and NHWC layouts.
    ((2, 3, 50, 906), 320, 3, "bilinear"),
    ((2, 3, 438, 64), 196, 2, "bicubic"),
    ((1, 3, 438, 906), 196, 2, "bilinear"),
    ((4, 37, 53, 3), 80, 1, "bicubic"),
    ((2, 3, 40, 60), 90, 3, "bilinear"),
    ((1, 3, 438, 906), 196, 2, "box"),
    ((2, 130, 140), 64, 1, "bilinear"),  # 3-D input
]


@pytest.mark.parametrize("shape,out,axis,mode", CASES)
@pytest.mark.parametrize("fused", [False, True])
def test_kernel_matches_dense(rng, shape, out, axis, mode, fused):
    x = jnp.asarray(rng.random(shape).astype(np.float32))
    spec = make_axis_spec(shape[axis], out, mode)
    d = resize_axis_dense(x, spec, axis)
    p = resize_axis_pallas(x, spec, axis, fused=fused)
    err = float(jnp.max(jnp.abs(d - p)))
    tol = 3e-5  # split-precision bound (~2^-16 relative on row sums)
    assert err < tol * max(1.0, float(jnp.max(jnp.abs(d)))), err


def test_supported_guard():
    spec = make_axis_spec(906, 320, "bilinear")
    x = jnp.zeros((4, 906), jnp.float32)
    assert pallas_supported(x, spec, 1)
    assert not pallas_supported(x.astype(jnp.float64), spec, 1)


def test_upsample_kernel(rng):
    x = jnp.asarray(rng.random((2, 3, 40, 50)).astype(np.float32))
    spec = make_axis_spec(50, 300, "bilinear")
    d = resize_axis_dense(x, spec, 3)
    p = resize_axis_pallas(x, spec, 3)
    assert float(jnp.max(jnp.abs(d - p))) < 3e-5
