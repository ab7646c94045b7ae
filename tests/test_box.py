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


# ---------------------------------------------------------------------------
# Pillow's C float boundary: non-float32-representable box coordinates
# ---------------------------------------------------------------------------

def test_pil_box_f32_helper():
    """pil_box_f32 rounds coords to f32 and subtracts IN f32 (not f64)."""
    from interpolate_antialiasing_tpu.ops.weights import pil_box_f32

    lo, hi = 1 / 3, 100 + 1 / 7
    lo32, hi32, ln = pil_box_f32(lo, hi)
    assert lo32 == float(np.float32(lo)) and hi32 == float(np.float32(hi))
    # the f32 subtraction differs from the exact f64 difference of the
    # rounded coords — this distinction is the whole point of the helper
    assert ln == float(np.float32(np.float32(hi) - np.float32(lo)))
    assert ln != hi32 - lo32
    # idempotent: feeding back the rounded values changes nothing
    assert pil_box_f32(lo32, hi32) == (lo32, hi32, ln)


@pytest.mark.parametrize("method", ["bilinear", "bicubic", "lanczos3"])
def test_box_f32_fuzz_byte_identical(method):
    """Fuzz: fractional boxes NOT representable in float32 stay byte-exact.

    Pillow parses the box as C float[4] and computes the span length with a
    float32 subtraction (Resample.c precompute_coeffs receives float
    in0/in1); full-f64 span math produces off-by-one bytes for such boxes
    (advisor finding, round 4 — verified 24/24 mismatching before the
    pil_box_f32 fix, 0/24 after)."""
    rng_ = np.random.default_rng(99)
    img = rng_.integers(0, 256, (96, 104, 3), dtype=np.uint8)
    pim = Image.fromarray(img)
    out = (41, 33)  # (w, h) — one jit specialisation per method
    for _ in range(4):
        x0 = float(rng_.uniform(0, 8) + 1 / 3)
        y0 = float(rng_.uniform(0, 8) + 1 / 7)
        x1 = float(rng_.uniform(90, 103) + 2 / 3)
        y1 = float(rng_.uniform(82, 95) + 5 / 7)
        box = (x0, y0, x1, y1)
        ref = np.asarray(pim.resize(out, PIL_RESAMPLE[method], box=box))
        got = np.asarray(
            ia.resize(jnp.asarray(img), (out[1], out[0]), method=method,
                      data_format="HWC", backend="pil_exact", box=box)
        )
        assert (ref == got).all(), (
            box, int(np.abs(ref.astype(int) - got.astype(int)).max()))


def test_box_f32_nearest_byte_identical(u8img):
    """NEAREST with a non-f32 box: the affine coefficients are built from
    the f32-rounded coords (f32 span subtraction) too."""
    box = (1 / 3, 1 / 7, 90 + 2 / 3, 60 + 5 / 7)
    ref = np.asarray(Image.fromarray(u8img).resize((40, 30), Image.NEAREST, box=box))
    got = np.asarray(
        ia.resize(jnp.asarray(u8img), (30, 40), method="pil_nearest",
                  data_format="HWC", box=box)
    )
    assert (ref == got).all()


# ---------------------------------------------------------------------------
# PIL.Image.reduce parity (reduce_pil_exact) and reducing_gap end-to-end
# ---------------------------------------------------------------------------

def test_reduce_pil_exact_fuzz():
    """Fuzz reduce_pil_exact vs PIL.Image.reduce: random shapes, factors,
    integer boxes, including partial edge blocks (output rounds UP and the
    clipped blocks average over their true pixel count via Reduce.c's
    truncated-f32 fixed-point reciprocal)."""
    from interpolate_antialiasing_tpu.ops.pil_exact import reduce_pil_exact

    rng_ = np.random.default_rng(7)
    for t in range(10):
        ih, iw = int(rng_.integers(9, 70)), int(rng_.integers(9, 70))
        fx, fy = int(rng_.integers(1, 7)), int(rng_.integers(1, 7))
        img = rng_.integers(0, 256, (ih, iw, 3), dtype=np.uint8)
        if t % 2:
            x0 = int(rng_.integers(0, iw // 3)); y0 = int(rng_.integers(0, ih // 3))
            x1 = int(rng_.integers(x0 + 1, iw + 1)); y1 = int(rng_.integers(y0 + 1, ih + 1))
            box = (x0, y0, x1, y1)
        else:
            box = None
        ref = np.asarray(Image.fromarray(img).reduce((fx, fy), box=box))
        got = np.asarray(reduce_pil_exact(jnp.asarray(img), (fx, fy), box=box,
                                          data_format="HWC"))
        assert got.shape == ref.shape, (ref.shape, got.shape, (ih, iw, fx, fy, box))
        assert (ref == got).all(), ((ih, iw, fx, fy, box),
                                    int(np.abs(ref.astype(int) - got.astype(int)).max()))


@pytest.mark.parametrize("reducing_gap", [2.0, 3.0])
def test_reducing_gap_byte_identical(u8img, reducing_gap):
    """End-to-end reducing_gap: PIL's two-step reduce+resize pipeline
    (Image.resize(reducing_gap=...)) byte-for-byte, no box."""
    ref = np.asarray(Image.fromarray(u8img).resize(
        (40, 30), Image.BILINEAR, reducing_gap=reducing_gap))
    got = np.asarray(ia.resize(jnp.asarray(u8img), (30, 40), method="bilinear",
                               data_format="HWC", reducing_gap=reducing_gap))
    assert (ref == got).all()


def test_reducing_gap_with_box_byte_identical(u8img):
    """reducing_gap + fractional box: the Python-level f64 box rescale
    (Image.py) composes with the C-level f32 rounding of the FINAL box —
    both boundaries must be modelled to stay byte-exact."""
    box = (1 / 3, 2 / 7, 90 + 1 / 3, 62 + 3 / 7)
    ref = np.asarray(Image.fromarray(u8img).resize(
        (24, 18), Image.BICUBIC, box=box, reducing_gap=2.0))
    got = np.asarray(ia.resize(jnp.asarray(u8img), (18, 24), method="bicubic",
                               data_format="HWC", box=box, reducing_gap=2.0))
    assert (ref == got).all()
