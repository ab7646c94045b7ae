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


def test_precision_env_dial(rng, monkeypatch):
    """IA_TPU_PRECISION selects the kernel precision (split|bf16|f32);
    bf16 is coarser than split, f32 is at least as accurate."""
    from interpolate_antialiasing_tpu.ops.pallas_resize import resize2d_onekernel

    x = jnp.asarray(rng.random((1, 438, 906)).astype(np.float32) * 255)
    spec_h = make_axis_spec(438, 196, "bilinear")
    spec_w = make_axis_spec(906, 320, "bilinear")
    ref = np.asarray(resize_axis_dense(
        resize_axis_dense(x, spec_w, 2), spec_h, 1))

    errs = {}
    for mode in ["split", "bf16", "f32"]:
        monkeypatch.setenv("IA_TPU_PRECISION", mode)
        y = np.asarray(resize2d_onekernel(x, spec_h, spec_w))
        errs[mode] = np.abs(y - ref).max()
    assert errs["f32"] <= errs["split"] + 1e-4
    # every mode stays within sane bounds (the bf16-vs-split ordering only
    # shows on real hardware; interpret mode computes DEFAULT in full f32)
    assert all(e < 0.01 * 255 for e in errs.values()), errs

    monkeypatch.setenv("IA_TPU_PRECISION", "bogus")
    with pytest.raises(ValueError, match="IA_TPU_PRECISION"):
        resize2d_onekernel(x, spec_h, spec_w)
