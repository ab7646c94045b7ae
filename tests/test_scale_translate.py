"""scale_and_translate — drop-in parity with jax.image.scale_and_translate.

jax.image is the executable oracle here (the role Pillow plays for resize):
every case asserts against jax.image.scale_and_translate at tolerances far
under the 5e-4 drop-in target.  The static-params route rides the
registered banded primitives (the span machinery generalised to per-axis
affine (scale, translation)); traced params and non-2D spatial dims use
the jittable dense contraction with identical formulas.
"""

import jax
import jax.image as jimage
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import interpolate_antialiasing_tpu as ia
from interpolate_antialiasing_tpu.ops.weights import make_affine_axis_spec


def _ref(x, shape, dims, sc, tr, method, antialias=True):
    return jimage.scale_and_translate(
        x, shape, dims, jnp.asarray(sc, jnp.float32),
        jnp.asarray(tr, jnp.float32), method, antialias=antialias,
    )


@pytest.fixture()
def img(rng):
    return jnp.asarray(rng.random((2, 3, 47, 61)).astype(np.float32))


CASES = [
    # (out_hw, scale, translation, method, antialias)
    ((23, 31), (0.5, 0.52), (0.0, 0.0), "linear", True),
    ((23, 31), (0.45, 0.5), (3.0, -2.5), "cubic", True),
    ((80, 90), (1.7, 1.5), (-4.0, 6.0), "lanczos3", True),
    ((23, 31), (0.33, 3.0), (0.25, -0.75), "lanczos5", True),
    ((23, 31), (0.5, 0.52), (1.0, -1.0), "linear", False),
    ((23, 31), (0.7, 0.7), (-30.0, 55.0), "cubic", True),  # partly out of range
]


@pytest.mark.parametrize("out_hw,sc,tr,method,aa", CASES)
def test_matches_jax_image(img, out_hw, sc, tr, method, aa):
    shape = (2, 3) + out_hw
    ref = _ref(img, shape, (2, 3), sc, tr, method, aa)
    got = ia.scale_and_translate(img, shape, (2, 3), sc, tr, method, antialias=aa)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    assert float(jnp.max(jnp.abs(ref - got))) < 5e-5


def test_fully_out_of_range_is_zero(img):
    shape = (2, 3, 23, 31)
    got = ia.scale_and_translate(img, shape, (2, 3), (0.5, 0.5), (40.0, -40.0),
                                 "linear")
    ref = _ref(img, shape, (2, 3), (0.5, 0.5), (40.0, -40.0), "linear")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert float(jnp.max(jnp.abs(got))) == 0.0


@pytest.mark.parametrize("sc,tr,method,aa", [
    ((-0.5, 0.5), (23.0, 0.0), "cubic", True),
    ((-0.5, -0.52), (23.5, 30.0), "lanczos3", True),
    ((-1.7, 0.5), (70.0, 0.0), "linear", False),
])
def test_negative_scale_flip(img, sc, tr, method, aa):
    """Negative zoom = flipped resampling; jax's SIGNED kernel_scale quirk
    (no antialias widening for negative scale) is reproduced."""
    shape = (2, 3, 23, 31)
    ref = _ref(img, shape, (2, 3), sc, tr, method, aa)
    got = ia.scale_and_translate(img, shape, (2, 3), sc, tr, method, antialias=aa)
    assert float(jnp.max(jnp.abs(ref - got))) < 5e-5


def test_zero_scale_is_zero(img):
    got = ia.scale_and_translate(img, (2, 3, 23, 31), (2, 3), (0.0, 0.5),
                                 (0.0, 0.0), "linear")
    assert float(jnp.max(jnp.abs(got))) == 0.0


def test_traced_params_under_jit(img):
    """Dynamic scale/translation inside jit — the dense traced route."""
    f = jax.jit(lambda v, s, t: ia.scale_and_translate(
        v, (2, 3, 23, 31), (2, 3), s, t, "cubic"))
    s = jnp.array([0.45, 0.5], jnp.float32)
    t = jnp.array([3.0, -2.5], jnp.float32)
    ref = _ref(img, (2, 3, 23, 31), (2, 3), s, t, "cubic")
    got = f(img, s, t)
    assert float(jnp.max(jnp.abs(ref - got))) < 5e-5
    # a second call with different params must NOT retrace/recompile-miss
    got2 = f(img, s * 1.1, t + 1.0)
    ref2 = _ref(img, (2, 3, 23, 31), (2, 3), s * 1.1, t + 1.0, "cubic")
    assert float(jnp.max(jnp.abs(ref2 - got2))) < 5e-5


def test_one_spatial_dim(img):
    ref = _ref(img, (2, 3, 23, 61), (2,), [0.5], [1.5], "linear")
    got = ia.scale_and_translate(img, (2, 3, 23, 61), (2,), [0.5], [1.5], "linear")
    assert float(jnp.max(jnp.abs(ref - got))) < 5e-5


def test_three_spatial_dims(rng):
    vol = jnp.asarray(rng.random((1, 13, 17, 19)).astype(np.float32))
    shape = (1, 7, 9, 11)
    sc, tr = [0.55, 0.5, 0.6], [0.5, -0.25, 1.0]
    ref = _ref(vol, shape, (1, 2, 3), sc, tr, "linear")
    got = ia.scale_and_translate(vol, shape, (1, 2, 3), sc, tr, "linear")
    assert float(jnp.max(jnp.abs(ref - got))) < 5e-5


def test_grads_static_route(rng):
    x = jnp.asarray(rng.random((1, 1, 24, 31)))
    f = lambda v: ia.scale_and_translate(
        v, (1, 1, 10, 12), (2, 3), (0.42, 0.39), (1.5, -0.75), "linear")
    check_grads(f, (x,), order=2, modes=("fwd", "rev"), atol=1e-6, rtol=1e-6)


def test_grads_traced_route(rng):
    x = jnp.asarray(rng.random((1, 1, 24, 31)))
    s = jnp.array([0.42, 0.39])
    t = jnp.array([1.5, -0.75])
    f = lambda v, s_, t_: ia.scale_and_translate(
        v, (1, 1, 10, 12), (2, 3), s_, t_, "cubic")
    # differentiable in the image AND the affine params on the traced route
    g = jax.grad(lambda v: jax.jit(f)(v, s, t).sum())(x)
    assert np.isfinite(np.asarray(g)).all()
    gs = jax.grad(lambda s_: jax.jit(f)(x, s_, t).sum())(s)
    assert np.isfinite(np.asarray(gs)).all()


def test_affine_spec_matches_span_spec():
    """A full-frame affine (zoom = out/in, t = 0) is the plain resize spec."""
    spec = make_affine_axis_spec(96, 48, 0.5, 0.0, "linear", True)
    assert spec.span is None and spec.border == "renorm"
    assert spec.ntaps == int(np.ceil(spec.support)) * 2 + 1


def test_bfloat16_static_route(img):
    xb = img.astype(jnp.bfloat16)
    got = ia.scale_and_translate(xb, (2, 3, 23, 31), (2, 3), (0.5, 0.52),
                                 (1.0, -1.0), "linear")
    assert got.dtype == jnp.bfloat16
    ref = _ref(img, (2, 3, 23, 31), (2, 3), (0.5, 0.52), (1.0, -1.0), "linear")
    assert float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))) < 0.02


@pytest.mark.parametrize("bad", [
    dict(method="box"),
    dict(shape=(2, 3, 23)),
    dict(spatial_dims=(2, 2)),
    dict(scale=(0.5,)),
])
def test_validation_errors(img, bad):
    kw = dict(shape=(2, 3, 23, 31), spatial_dims=(2, 3), scale=(0.5, 0.5),
              translation=(0.0, 0.0), method="linear")
    kw.update(bad)
    with pytest.raises(ValueError):
        ia.scale_and_translate(img, kw["shape"], kw["spatial_dims"],
                               kw["scale"], kw["translation"], kw["method"])


def test_fuzz_random_affine_params(rng):
    """Randomised drop-in parity sweep: scales in [-2, 3] \\ {~0},
    translations in [-15, 15], all four methods, static route."""
    img = jnp.asarray(rng.random((1, 3, 29, 41)).astype(np.float32))
    methods = ["linear", "cubic", "lanczos3", "lanczos5"]
    for i in range(12):
        sc = tuple(float(s) for s in rng.uniform(-2.0, 3.0, 2))
        if abs(sc[0]) < 0.05 or abs(sc[1]) < 0.05:
            continue
        tr = tuple(float(t) for t in rng.uniform(-15.0, 15.0, 2))
        m = methods[i % 4]
        shape = (1, 3, int(rng.integers(5, 40)), int(rng.integers(5, 40)))
        ref = _ref(img, shape, (2, 3), sc, tr, m)
        got = ia.scale_and_translate(img, shape, (2, 3), sc, tr, m)
        d = float(jnp.max(jnp.abs(ref - got)))
        assert d < 5e-5, (sc, tr, m, shape, d)
