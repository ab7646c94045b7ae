"""Cross-backend fuzz over odd/degenerate shapes (CPU; Pallas = interpret).

All float backends must agree with the dense oracle for every shape the
public API accepts — including 1-pixel axes, extreme aspect ratios, and
identity sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_antialiasing_tpu as ia


def _cases():
    rng = np.random.default_rng(99)
    shapes = [
        (1, 1, 1, 1), (1, 1, 1, 7), (1, 1, 7, 1), (1, 3, 2, 2),
        (2, 1, 5, 9), (1, 2, 129, 257), (3, 1, 131, 3),
    ]
    outs = [(1, 1), (1, 5), (5, 1), (3, 3), (17, 129), (130, 2)]
    for i in range(18):
        shp = shapes[i % len(shapes)]
        out = outs[(i * 7 + 3) % len(outs)]
        mode = ["bilinear", "bicubic", "box", "lanczos3"][i % 4]
        yield shp, out, mode


@pytest.mark.parametrize("shape,out,mode", list(_cases()))
def test_backends_agree_on_odd_shapes(rng, shape, out, mode):
    x = jnp.asarray((rng.random(shape) * 255).astype(np.float32))
    ref = ia.resize(x, out, method=mode, backend="dense")
    assert ref.shape == (*shape[:2], *out)
    assert bool(jnp.isfinite(ref).all())
    for backend in ["gather", "banded", "pallas"]:
        y = ia.resize(x, out, method=mode, backend=backend)
        err = float(jnp.max(jnp.abs(y - ref)))
        assert err < 1e-2 * 255, (backend, err)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_uint8_odd_shapes(rng, mode):
    for shape, out in [((1, 3, 1, 50), (1, 25)), ((2, 1, 3, 3), (9, 9)),
                       ((1, 1, 255, 1), (1, 1))]:
        x = jnp.asarray((rng.random(shape) * 255).astype(np.uint8))
        y = ia.resize(x, out, method=mode)
        assert y.shape == (*shape[:2], *out) and y.dtype == jnp.uint8


# ---------------------------------------------------------------------------
# Round-4 widened fuzz net (VERDICT r3 ask #8): randomized cases over the
# routes that carry production traffic — the int8 digit kernels (the uint8
# 'auto' promotion target), NHWC layouts, mixed up/down per axis, forced
# tile knobs, and windowed-crop boxes near image edges.  Mirrors the
# reference's randomized size sweep (/root/reference/test.py:15-21) but
# asserts each route against ITS OWN gate:
#
# * digit kernels (resize_pil_exact, the TPU uint8-auto target): byte-equal
#   to Pillow for every admitted geometry and filter — they reproduce
#   Pillow's uint8 *intermediate* between the two passes;
# * public uint8 surface on the generic/XLA route: consistent with its own
#   float path (round+clip of the dense result, +-1), and MaxAbsE <= 1 vs
#   Pillow for NON-NEGATIVE filters (bilinear/box/hamming/nearest).  For
#   negative-lobe filters (bicubic/lanczos3) on adversarial noise, Pillow
#   byte-parity is a property of the u8-intermediate convention only the
#   quantising kernels implement: Pillow clamps inter-pass overshoot to
#   [0, 255] while the float route keeps it (matching torch float
#   antialias semantics to ~2e-3 — the route's actual contract; the
#   natural-image Pillow gate is tests/test_parity_pillow.py).
# ---------------------------------------------------------------------------

_PIL_RESAMPLE = None


def _pil_ref(img_u8, ow, oh, method):
    """Per-plane Pillow reference for a [..., H, W] uint8 stack."""
    global _PIL_RESAMPLE
    from PIL import Image

    if _PIL_RESAMPLE is None:
        _PIL_RESAMPLE = {
            "bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
            "box": Image.BOX, "nearest": Image.BOX,
            "lanczos3": Image.LANCZOS, "hamming": Image.HAMMING,
        }
    flat = img_u8.reshape((-1,) + img_u8.shape[-2:])
    out = np.stack([
        np.asarray(Image.fromarray(p).resize((ow, oh), _PIL_RESAMPLE[method]))
        for p in flat
    ])
    return out.reshape(img_u8.shape[:-2] + (oh, ow))


def _rand_geoms(rng, n):
    """n random (H, W, oh, ow, method): mixed up/down per axis by
    construction (a quarter each of down/down, down/up, up/down, up/up)."""
    methods = ["bilinear", "bicubic", "box", "hamming", "lanczos3",
               "nearest"]
    for i in range(n):
        H = int(rng.integers(8, 220))
        W = int(rng.integers(8, 220))
        up_h, up_w = bool(i & 1), bool(i & 2)
        oh = int(rng.integers(H + 1, 2 * H + 8)) if up_h else int(
            rng.integers(4, max(H, 5)))
        ow = int(rng.integers(W + 1, 2 * W + 8)) if up_w else int(
            rng.integers(4, max(W, 5)))
        yield H, W, oh, ow, methods[i % len(methods)]


@pytest.mark.parametrize("chunk", range(4))
def test_fuzz_uint8_digit_routes_byte_exact(rng, chunk):
    """Randomized geometries through resize_pil_exact (the kernel the uint8
    'auto' route promotes to on TPU, ops/resize.py:395-424): byte-identical
    to Pillow wherever the promotion gate admits the shape; the public
    resize() surface simultaneously holds its MaxAbsE <= 1 float-path gate.
    """
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        pil_auto_promotable, resize_pil_exact,
    )

    rng = np.random.default_rng(1000 + chunk)  # decorrelate chunks
    n_exact = 0
    for H, W, oh, ow, method in _rand_geoms(rng, 12):
        img = rng.integers(0, 256, (2, H, W), dtype=np.uint8)
        ref = _pil_ref(img, ow, oh, method)
        tag = f"{H}x{W}->{oh}x{ow} {method}"
        y = np.asarray(ia.resize(jnp.asarray(img), (oh, ow), method=method))
        yf = np.asarray(ia.resize(jnp.asarray(img, jnp.float32), (oh, ow),
                                  method=method, backend="dense"))
        yf8 = np.clip(np.floor(yf + 0.5), 0, 255).astype(int)
        assert np.abs(y.astype(int) - yf8).max() <= 1, tag
        if method in ("bilinear", "box", "hamming", "nearest"):
            assert np.abs(y.astype(int) - ref.astype(int)).max() <= 1, tag
        pil_m = "box" if method == "nearest" else method
        if pil_auto_promotable((2, H, W), oh, ow, method):
            got = np.asarray(
                resize_pil_exact(jnp.asarray(img), (oh, ow), method=pil_m))
            np.testing.assert_array_equal(got, ref, err_msg=tag)
            n_exact += 1
    assert n_exact >= 4  # the digit routes actually ran, not all skipped


def test_fuzz_uint8_nhwc_layout(rng):
    """Randomized NHWC cases: the channels-last entry (resize_pil_exact
    data_format + the public surface) matches the per-plane PIL oracle —
    pins the NHWC->NCHW transpose routing (ops/resize.py:471-491)."""
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        pil_auto_promotable, resize_pil_exact,
    )

    rng = np.random.default_rng(2024)
    n_exact = 0
    for H, W, oh, ow, method in _rand_geoms(rng, 16):
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        ref = np.moveaxis(
            _pil_ref(np.moveaxis(img, -1, 0), ow, oh, method), 0, -1)
        tag = f"NHWC {H}x{W}->{oh}x{ow} {method}"
        y = np.asarray(ia.resize(jnp.asarray(img), (oh, ow), method=method,
                                 data_format="NHWC"))
        assert y.shape == (oh, ow, 3), tag
        if method in ("bilinear", "box", "hamming", "nearest"):
            assert np.abs(y.astype(int) - ref.astype(int)).max() <= 1, tag
        pil_m = "box" if method == "nearest" else method
        if pil_auto_promotable((3, H, W), oh, ow, method):
            got = np.asarray(
                resize_pil_exact(jnp.asarray(img), (oh, ow), method=pil_m,
                                 data_format="NHWC"))
            np.testing.assert_array_equal(got, ref, err_msg=tag)
            n_exact += 1
    assert n_exact >= 4


def test_fuzz_forced_tile_knobs_byte_exact(rng, monkeypatch):
    """Random legal tile-knob widths through the digit kernels: every
    (tile_h, tile_w) combination is byte-identical to Pillow — the knobs
    change only the MXU geometry, never a byte (the property the on-chip
    sweeps rely on when they force widths via the env)."""
    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    rng = np.random.default_rng(77)
    img = rng.integers(0, 256, (2, 170, 230), dtype=np.uint8)
    oh, ow = 83, 141
    ref = {m: _pil_ref(img, ow, oh, m) for m in ("bilinear", "lanczos3")}

    def clear():
        pe._pick_tile_h.cache_clear()
        pe._pick_tile_w.cache_clear()
        pe._digit_tiles.cache_clear()

    try:
        for _ in range(8):
            th = int(rng.choice([32, 64, 96, 128]))       # streamed-legal
            tw = int(rng.choice(np.arange(64, 129, 8)))   # 8-granular
            monkeypatch.setenv("IA_TPU_PIL_TILE_H", str(th))
            monkeypatch.setenv("IA_TPU_PIL_TILE_W", str(tw))
            clear()
            for m in ("bilinear", "lanczos3"):
                tag = f"tile_h={th} tile_w={tw} {m}"
                got = np.asarray(
                    pe._resize_pil_exact_pallas(jnp.asarray(img), oh, ow, m))
                np.testing.assert_array_equal(got, ref[m], err_msg=tag)
                got_s = np.asarray(
                    pe._resize_pil_exact_streamed(jnp.asarray(img), oh, ow, m))
                np.testing.assert_array_equal(got_s, ref[m],
                                              err_msg="streamed " + tag)
    finally:
        clear()


@pytest.mark.parametrize("method", ["bilinear", "box", "hamming"])
def test_fuzz_crop_windowed_boxes_near_edges(rng, method):
    """Randomized windowed-crop boxes concentrated at image edges: exact
    border boxes (coord 0/1), near-border slivers, sub-pixel degenerates,
    and full-span axes.  One jit per method (boxes are traced), so the 24
    random boxes per method cost one compile.  Gate: MaxAbsE <= 1 vs the
    f64 quantised-intermediate oracle (split-bf16 rounding, same gate as
    tests/test_crop.py)."""
    from interpolate_antialiasing_tpu.ops.crop_pallas import (
        crop_and_resize_windowed,
    )
    from test_crop import _crop_oracle_u8

    rng = np.random.default_rng(4242)
    x = jnp.asarray(rng.integers(0, 256, (24, 2, 96, 160), dtype=np.uint8))
    boxes = []
    for i in range(24):
        kind = i % 4
        if kind == 0:      # touches one or two exact borders
            y0, x0 = float(rng.choice([0.0, rng.uniform(0, 0.3)])), 0.0
            y1, x1 = 1.0, float(rng.choice([1.0, rng.uniform(0.7, 1.0)]))
        elif kind == 1:    # near-border sliver (within a few pixels)
            y0, y1 = 0.0, float(rng.uniform(2 / 96, 6 / 96))
            x0, x1 = float(1 - rng.uniform(2 / 160, 6 / 160)), 1.0
            x0, x1 = min(x0, x1 - 1e-4), x1
        elif kind == 2:    # sub-pixel degenerate near a corner
            y0 = float(rng.uniform(0, 0.02))
            x0 = float(rng.uniform(0.97, 0.995))
            y1, x1 = y0 + 5e-4, x0 + 5e-4
        else:              # generic interior box
            y0, x0 = float(rng.uniform(0, 0.6)), float(rng.uniform(0, 0.6))
            y1 = float(rng.uniform(y0 + 0.05, 1.0))
            x1 = float(rng.uniform(x0 + 0.05, 1.0))
        boxes.append([y0, x0, y1, x1])
    boxes = jnp.asarray(boxes, jnp.float32)
    yw = np.asarray(crop_and_resize_windowed(x, boxes, (32, 48),
                                             method=method))
    for n in range(24):
        ref = _crop_oracle_u8(np.asarray(x[n]), np.asarray(boxes[n]),
                              32, 48, method)
        err = np.abs(yw[n].astype(int) - ref.astype(int)).max()
        assert err <= 1, (method, n, np.asarray(boxes[n]), err)


def test_signed_int_and_f16_random_geometries(rng):
    """Dtype policy over random geometries (round-5 depth rule): i16
    equals the f32 route rounded floor(v+0.5)+clamped, i32 equals the
    F64 route (wide ints compute in f64 under x64 — f32 cannot represent
    pixels above 2^24), f16 equals the f32 route cast — on every mode
    the auto router can pick at these sizes."""
    for i in range(10):
        h, w = int(rng.integers(3, 200)), int(rng.integers(3, 200))
        oh, ow = int(rng.integers(1, 150)), int(rng.integers(1, 150))
        mode = ["bilinear", "bicubic", "box", "lanczos3"][i % 4]
        dt = [np.int16, np.int32, np.float16][i % 3]
        if dt == np.float16:
            x = rng.random((1, 2, h, w)).astype(np.float16)
            y = ia.resize(jnp.asarray(x), (oh, ow), method=mode)
            ref = ia.resize(jnp.asarray(x, jnp.float32), (oh, ow), method=mode)
            assert y.dtype == jnp.float16
            np.testing.assert_array_equal(
                np.asarray(y), np.asarray(ref).astype(np.float16))
        else:
            info = np.iinfo(dt)
            x = rng.integers(max(info.min, -10**6), min(info.max, 10**6),
                             (1, 2, h, w)).astype(dt)
            y = ia.resize(jnp.asarray(x), (oh, ow), method=mode)
            fdt = jnp.float32 if dt == np.int16 else jnp.float64
            ref = ia.resize(jnp.asarray(x, fdt), (oh, ow), method=mode,
                            backend="dense" if dt == np.int32 else None)
            want = np.clip(np.floor(np.asarray(ref) + 0.5),
                           info.min, info.max).astype(dt)
            assert y.dtype == jnp.dtype(dt)
            np.testing.assert_array_equal(np.asarray(y), want)
