"""Resize ``box`` (fractional source window) — PIL.Image.resize's third
argument, the ``in0/in1`` span of Pillow's ``precompute_coeffs``.

Contract (mirrors the library's two-tier exactness gates):
  * uint8 ``backend='pil_exact'`` / ``'auto'``: BYTE-identical to
    ``PIL.Image.resize(size, resample, box=box)`` for every resample
    filter, including the NEAREST point-sample (``pil_nearest``).
  * float paths: the continuous analogue through the same spec/tables —
    checked against the dense float oracle and for PIL proximity.
  * autodiff: the span spec flows through the registered primitives, so
    check_grads must pass with a box like everywhere else.

Reference for the algorithm being generalised:
step_two_dot_two/aa_interpolation_impl.h:194-283 (the PIL weight windows;
the reference itself has no box argument — Pillow, the shared oracle,
does).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads
from PIL import Image

import interpolate_antialiasing_tpu as ia
from interpolate_antialiasing_tpu.ops.pallas_resize import resize_axis_pallas
from interpolate_antialiasing_tpu.ops.resize_xla import resize_axis_dense
from interpolate_antialiasing_tpu.ops.weights import compute_tables, make_axis_spec

PIL_RESAMPLE = {
    "bilinear": Image.BILINEAR,
    "bicubic": Image.BICUBIC,
    "box": Image.BOX,
    "lanczos3": Image.LANCZOS,
    "hamming": Image.HAMMING,
}

BOXES = [
    (3.5, 2.25, 90.0, 60.0),     # fractional interior window
    (10, 10, 20.5, 21.5),        # small window -> upsample per axis
]


@pytest.fixture(scope="module")
def u8img(request):
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (64, 97), np.uint8)


# ---------------------------------------------------------------------------
# Spec / table level
# ---------------------------------------------------------------------------

def test_span_tables_rows_normalised():
    spec = make_axis_spec(97, 30, "bicubic", span=(3.25, 90.5))
    xmin, size, w = compute_tables(spec, dtype=np.float64)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
    assert (xmin >= 0).all() and (xmin + size <= 97).all()
    assert (size >= 1).all()


def test_full_span_canonicalises_to_none():
    a = make_axis_spec(97, 30, "bilinear", span=(0.0, 97.0))
    b = make_axis_spec(97, 30, "bilinear")
    assert a == b and a.span is None


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(span=(-1.0, 50.0)),
        dict(span=(10.0, 10.0)),
        dict(span=(0.0, 98.0)),
        dict(span=(0.0, 50.0), align_corners=True),
        dict(span=(0.0, 50.0), scale_factor=2.0),
        dict(span=(0.0, 50.0), mode="area"),
    ],
)
def test_span_validation(kwargs):
    mode = kwargs.pop("mode", "bilinear")
    with pytest.raises(ValueError):
        make_axis_spec(97, 30, mode, **kwargs)


def test_resize_box_validation(u8img):
    x = jnp.asarray(u8img)
    with pytest.raises(ValueError):
        ia.resize(x, (20, 30), box=(0, 0, 200.0, 50.0))
    with pytest.raises(ValueError):
        ia.resize(x, (20, 30), method="area", box=(0, 0, 50.0, 50.0))
    with pytest.raises(ValueError):
        ia.resize(x, (20, 30), box=(0, 0, 50.0, 50.0), align_corners=True)


# ---------------------------------------------------------------------------
# uint8 byte-exactness vs Pillow
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", sorted(PIL_RESAMPLE))
@pytest.mark.parametrize("box", BOXES)
def test_pil_exact_box_byte_identical(u8img, mode, box):
    ref = np.asarray(
        Image.fromarray(u8img).resize((30, 20), PIL_RESAMPLE[mode], box=box)
    )
    got = np.asarray(
        ia.resize(jnp.asarray(u8img), (20, 30), method=mode, box=box,
                  backend="pil_exact")
    )
    np.testing.assert_array_equal(ref, got)


@pytest.mark.parametrize("box", BOXES)
def test_pil_nearest_box_byte_identical(u8img, box):
    ref = np.asarray(Image.fromarray(u8img).resize((30, 20), Image.NEAREST, box=box))
    got = np.asarray(
        ia.resize_pil_exact(jnp.asarray(u8img), (20, 30), method="pil_nearest",
                            box=box)
    )
    np.testing.assert_array_equal(ref, got)


def test_u8_auto_box_byte_identical(u8img):
    """backend='auto' u8->u8 with a box promotes to the exact PIL route."""
    box = (3.5, 2.25, 90.0, 60.0)
    ref = np.asarray(Image.fromarray(u8img).resize((30, 20), Image.BILINEAR, box=box))
    got = np.asarray(ia.resize(jnp.asarray(u8img), (20, 30), box=box))
    np.testing.assert_array_equal(ref, got)


def test_box_batched_channels(u8img):
    """NCHW batch: every image/channel equals the per-plane PIL resize."""
    box = (10, 10, 20.5, 21.5)
    x = np.stack([np.stack([u8img, u8img[::-1].copy()])])  # [1, 2, H, W]
    got = np.asarray(
        ia.resize(jnp.asarray(x), (20, 30), method="bicubic", box=box,
                  backend="pil_exact")
    )
    for c in range(2):
        ref = np.asarray(
            Image.fromarray(x[0, c]).resize((30, 20), Image.BICUBIC, box=box)
        )
        np.testing.assert_array_equal(ref, got[0, c])


# ---------------------------------------------------------------------------
# float paths: kernel/dense agreement and PIL proximity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fused", [False, True])
def test_span_pallas_matches_dense(rng, fused):
    """The banded Pallas kernels (host tables and in-kernel synthesis)
    reproduce the dense span contraction — the span flows through
    banded_tiles and _synth_band identically."""
    x = jnp.asarray(rng.random((2, 3, 50, 97)).astype(np.float32))
    spec = make_axis_spec(97, 40, "bilinear", span=(3.5, 90.0))
    d = resize_axis_dense(x, spec, 3)
    p = resize_axis_pallas(x, spec, 3, fused=fused)
    err = float(jnp.max(jnp.abs(d - p)))
    assert err < 3e-5 * max(1.0, float(jnp.max(jnp.abs(d)))), err


def test_float_box_close_to_pil(u8img):
    """Float route vs PIL uint8 pipeline: within the uint8-quantisation
    envelope for the positive-lobe filters (PIL quantises the intermediate
    to u8; the float path does not, so exact byte-parity is not the float
    contract — backend='pil_exact' is)."""
    box = (3.5, 2.25, 90.0, 60.0)
    ref = np.asarray(
        Image.fromarray(u8img).resize((40, 30), Image.BILINEAR, box=box)
    ).astype(np.float32)
    got = np.asarray(
        ia.resize(jnp.asarray(u8img, jnp.float32), (30, 40), method="bilinear",
                  box=box)
    )
    assert np.abs(ref - got).max() <= 1.0


def test_box_grads(rng):
    """check_grads through the span spec (dense f64 route, order 2)."""
    x = jnp.asarray(rng.random((1, 1, 24, 31)))
    f = lambda v: ia.resize_plane(
        v, (10, 12), -2, -1, mode="bilinear", backend="dense",
        span_h=(2.5, 20.0), span_w=(0.75, 30.0),
    )
    check_grads(f, (x,), order=2, modes=("fwd", "rev"), atol=1e-6, rtol=1e-6)
