"""Property-based tests (hypothesis): structural invariants on random
geometries, complementing the fixed-oracle and randomized-loop fuzz suites
(SURVEY §4).  All properties run the fast XLA routes on small shapes;
deadlines are disabled because first-trace compile time dwarfs any single
example.

Properties:
  * byte-equality vs PIL on arbitrary geometry (the library's headline
    guarantee, here searched rather than sampled),
  * partition of unity: resizing a constant image returns the constant,
  * flip equivariance: integer Pillow arithmetic commutes with mirroring
    EXACTLY (commutative int adds; float path within fp tolerance),
  * range preservation for non-negative filters,
  * adjoint identity: <y_bar, f(x)> == <f^T(y_bar), x> in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import interpolate_antialiasing_tpu as ia

MODES = ["bilinear", "bicubic", "box", "hamming", "lanczos3"]
_PIL = {
    "bilinear": "BILINEAR",
    "bicubic": "BICUBIC",
    "box": "BOX",
    "hamming": "HAMMING",
    "lanczos3": "LANCZOS",
}


def _pil(img2d: np.ndarray, oh: int, ow: int, mode: str) -> np.ndarray:
    from PIL import Image

    res = getattr(Image.Resampling, _PIL[mode])
    return np.asarray(Image.fromarray(img2d).resize((ow, oh), res))


geom = st.tuples(
    st.integers(4, 64),  # H
    st.integers(4, 64),  # W
    st.integers(3, 80),  # oh
    st.integers(3, 80),  # ow
    st.sampled_from(MODES),
)


@settings(max_examples=25, deadline=None)
@given(geom, st.integers(0, 2**31 - 1))
def test_pil_exact_byte_equality_searched(g, seed):
    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    H, W, oh, ow, mode = g
    img = np.random.default_rng(seed).integers(0, 256, (H, W), np.uint8)
    ref = _pil(img, oh, ow, mode)
    got = np.asarray(resize_pil_exact(jnp.asarray(img), (oh, ow), method=mode))
    np.testing.assert_array_equal(got, ref, err_msg=str(g))


@settings(max_examples=20, deadline=None)
@given(geom, st.floats(-100.0, 100.0, allow_nan=False))
def test_partition_of_unity(g, c):
    H, W, oh, ow, mode = g
    x = jnp.full((H, W), np.float32(c))
    y = np.asarray(ia.resize(x, (oh, ow), method=mode))
    np.testing.assert_allclose(y, np.float32(c), rtol=0, atol=5e-4 + 1e-5 * abs(c))


@settings(max_examples=20, deadline=None)
@given(geom, st.integers(0, 2**31 - 1))
def test_flip_equivariance_exact_u8(g, seed):
    """Pillow's integer pipeline commutes with horizontal mirroring
    byte-for-byte WHEN the W table itself mirrors: the mirrored weights
    equal the weights of the mirrored geometry and int32 addition is
    commutative, so both orders land on the same accumulator.

    Pillow itself is NOT equivariant on tie geometries — when an output
    window edge lands exactly on a pixel boundary, ``xmin = int(center -
    support + 0.5)`` truncates toward the same side in both orientations
    (e.g. 4x4 -> 3x5 box: the ox=2 center is exactly 2.0, direct picks
    source pixel 2, mirrored picks 1 — verified directly against
    PIL.Image.resize, which produces the same asymmetry).  Since the
    library's contract is byte-equality WITH Pillow, the property is
    conditioned on the table mirror relation; tie geometries are covered
    by the unconditional Pillow byte-equality test above."""
    from hypothesis import assume

    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _int_matrix,
        resize_pil_exact,
    )

    H, W, oh, ow, mode = g
    K = _int_matrix(W, ow, mode)
    assume(np.array_equal(K, K[::-1, ::-1]))  # W table mirrors exactly
    img = np.random.default_rng(seed).integers(0, 256, (H, W), np.uint8)
    a = np.asarray(
        resize_pil_exact(jnp.asarray(img[:, ::-1].copy()), (oh, ow), method=mode)
    )
    b = np.asarray(resize_pil_exact(jnp.asarray(img), (oh, ow), method=mode))
    np.testing.assert_array_equal(a, b[:, ::-1], err_msg=str(g))


@settings(max_examples=20, deadline=None)
@given(geom, st.integers(0, 2**31 - 1))
def test_range_preserved_nonnegative_filters(g, seed):
    """bilinear/box/hamming have non-negative weights summing to 1, so
    every output is a convex combination: min(x) <= y <= max(x)."""
    H, W, oh, ow, mode = g
    if mode in ("bicubic", "lanczos3"):  # negative lobes overshoot by design
        return
    x = np.random.default_rng(seed).random((H, W)).astype(np.float32)
    y = np.asarray(ia.resize(jnp.asarray(x), (oh, ow), method=mode))
    assert y.min() >= x.min() - 1e-5 and y.max() <= x.max() + 1e-5, str(g)


@settings(max_examples=15, deadline=None)
@given(geom, st.integers(0, 2**31 - 1))
def test_adjoint_identity_f64(g, seed):
    """<y_bar, f(x)> == <f^T(y_bar), x>: the registered transpose is the
    exact adjoint on arbitrary geometry (f64 accumulation)."""
    H, W, oh, ow, mode = g
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float64)
    yb = jnp.asarray(rng.standard_normal((oh, ow)), jnp.float64)
    f = lambda t: ia.resize(t, (oh, ow), method=mode, backend="dense")
    y, vjp = jax.vjp(f, x)
    (xb,) = vjp(yb)
    lhs = float(jnp.vdot(yb, y))
    rhs = float(jnp.vdot(xb, x))
    assert abs(lhs - rhs) <= 1e-9 * max(1.0, abs(lhs)), (g, lhs, rhs)


@settings(max_examples=20, deadline=None)
@given(
    st.tuples(
        st.integers(4, 48),
        st.integers(4, 48),
        st.integers(3, 64),
        st.integers(3, 64),
        st.sampled_from(["bilinear", "bicubic"]),
    ),
    st.integers(0, 2**31 - 1),
)
def test_torch_aa_parity_searched(g, seed):
    """Searched parity with torch.nn.functional.interpolate(antialias=True)
    — the reference's own upstreamed behaviour — on arbitrary geometry
    (the fixed-size parity suite is tests/test_torch_parity.py; same
    2e-4 float32 gate)."""
    import torch
    import torch.nn.functional as F

    H, W, oh, ow, mode = g
    x = np.random.default_rng(seed).standard_normal((1, 2, H, W)).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(x), size=(oh, ow), mode=mode, antialias=True
    ).numpy()
    y = np.asarray(
        ia.interpolate(jnp.asarray(x), size=(oh, ow), mode=mode, antialias=True)
    )
    np.testing.assert_allclose(y, ref, atol=2e-4, rtol=1e-6, err_msg=str(g))


@settings(max_examples=15, deadline=None)
@given(geom, st.integers(0, 2**31 - 1),
       st.floats(-3, 3, allow_nan=False), st.floats(-3, 3, allow_nan=False))
def test_linearity_float_path(g, seed, a, b):
    """The float forward is LINEAR: f(a*x + b*z) == a*f(x) + b*f(z).
    Pins that no clamp/quantise step leaks into the float path (those
    belong to the uint8 routes only) — the property the custom-primitive
    jvp/transpose rules rely on."""
    H, W, oh, ow, mode = g
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((H, W)), jnp.float64)
    z = jnp.asarray(rng.standard_normal((H, W)), jnp.float64)
    f = lambda t: ia.resize(t, (oh, ow), method=mode, backend="dense")
    lhs = np.asarray(f(a * x + b * z))
    rhs = a * np.asarray(f(x)) + b * np.asarray(f(z))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12, rtol=1e-12)


@settings(max_examples=15, deadline=None)
@given(st.integers(4, 80), st.integers(4, 80),
       st.sampled_from(MODES), st.integers(0, 2**31 - 1))
def test_same_size_pil_exact_is_identity(H, W, mode, seed):
    """resize_pil_exact(x, x.shape) == x for every mode: the quantised
    out==in tables are the exact identity (the fact the sharded route's
    W-pass promotion reuses — pinned here at the public surface)."""
    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    img = np.random.default_rng(seed).integers(0, 256, (H, W), np.uint8)
    y = np.asarray(resize_pil_exact(jnp.asarray(img), (H, W), method=mode))
    np.testing.assert_array_equal(y, img, err_msg=f"{H}x{W} {mode}")
