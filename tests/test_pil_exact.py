"""Bit-exact Pillow parity: MaxAbsE == 0 (the reference could only assert
MaxAbsE <= 1, test.py:370-372)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_antialiasing_tpu as ia

PIL = pytest.importorskip("PIL.Image")

PIL_MODES = {
    "bilinear": PIL.BILINEAR,
    "bicubic": PIL.BICUBIC,
    "lanczos3": PIL.LANCZOS,
    "box": PIL.BOX,
    "nearest": PIL.BOX,  # library convention: nearest == PIL box AA
    "pil_nearest": PIL.NEAREST,
    "hamming": PIL.HAMMING,
}

SIZES = [(438, 906, 196, 320), (57, 83, 24, 31), (96, 120, 196, 1200),
         (40, 1200, 1200, 120), (10, 10, 10, 10)]


@pytest.mark.parametrize("mode", list(PIL_MODES))
@pytest.mark.parametrize("hwos", SIZES)
def test_bit_exact_vs_pillow(rng, mode, hwos):
    H, W, oh, ow = hwos
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    ref = np.asarray(PIL.fromarray(img).resize((ow, oh), PIL_MODES[mode]))
    got = np.asarray(
        ia.resize_pil_exact(jnp.asarray(img), (oh, ow), method=mode,
                            data_format="HWC")
    )
    np.testing.assert_array_equal(got, ref)


def test_backend_routing_and_layouts(rng):
    img = (rng.random((3, 50, 70)) * 255).astype(np.uint8)
    via_backend = ia.resize(jnp.asarray(img), (25, 35), backend="pil_exact")
    direct = ia.resize_pil_exact(jnp.asarray(img), (25, 35))
    np.testing.assert_array_equal(np.asarray(via_backend), np.asarray(direct))
    ref = np.asarray(
        PIL.fromarray(np.moveaxis(img, 0, -1)).resize((35, 25), PIL.BILINEAR)
    )
    np.testing.assert_array_equal(np.moveaxis(np.asarray(direct), 0, -1), ref)
    # batched NCHW
    b = jnp.asarray(np.stack([img, img ^ 1]))
    yb = ia.resize(b, (25, 35), backend="pil_exact")
    assert yb.shape == (2, 3, 25, 35) and yb.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(yb[0]), np.asarray(direct))


def test_pil_exact_rejects_non_u8_and_flags(rng):
    xf = jnp.zeros((1, 3, 20, 20), jnp.float32)
    with pytest.raises(ValueError, match="uint8"):
        ia.resize(xf, (10, 10), backend="pil_exact")
    xu = jnp.zeros((1, 3, 20, 20), jnp.uint8)
    with pytest.raises(ValueError, match="antialias"):
        ia.resize(xu, (10, 10), backend="pil_exact", align_corners=True)


def test_jit_compatible(rng):
    x = jnp.asarray((rng.random((2, 3, 40, 60)) * 255).astype(np.uint8))
    f = jax.jit(lambda t: ia.resize_pil_exact(t, (20, 30)))
    y = f(x)
    assert y.shape == (2, 3, 20, 30) and y.dtype == jnp.uint8


def test_bit_exact_random_size_sweep(rng):
    """Randomised sweep: fixed size lists can miss one-ULP coefficient
    flips (the double-vs-float hamming window constants were caught this
    way), so sample many (in, out) pairs per mode."""
    npr = np.random.default_rng(42)
    for mode, pil_mode in PIL_MODES.items():
        for _ in range(12):
            H = int(npr.integers(4, 300))
            W = int(npr.integers(4, 300))
            oh = int(npr.integers(1, 200))
            ow = int(npr.integers(1, 200))
            img = npr.integers(0, 256, (H, W, 3), dtype=np.uint8)
            ref = np.asarray(PIL.fromarray(img).resize((ow, oh), pil_mode))
            got = np.asarray(
                ia.resize_pil_exact(jnp.asarray(img), (oh, ow), method=mode,
                                    data_format="HWC")
            )
            np.testing.assert_array_equal(got, ref, err_msg=f"{mode} {H}x{W}->{oh}x{ow}")


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "lanczos3", "box",
                                  "hamming"])
@pytest.mark.parametrize("hwos", [(64, 96, 32, 40), (57, 83, 24, 31),
                                  (40, 120, 96, 48), (33, 31, 65, 67)])
def test_digit_split_pallas_bit_identical(rng, mode, hwos):
    """The TPU digit-split single-kernel pipeline (interpret mode here) must
    be byte-identical to the XLA int32 path — i.e. to Pillow."""
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _resize_pil_exact_pallas,
        pil_exact_pallas_supported,
    )

    H, W, oh, ow = hwos
    img = (rng.random((2, H, W)) * 255).astype(np.uint8)
    assert pil_exact_pallas_supported((2, H, W), oh, ow, mode)
    got = np.asarray(_resize_pil_exact_pallas(jnp.asarray(img), oh, ow, mode))
    ref = np.asarray(ia.resize_pil_exact(jnp.asarray(img), (oh, ow),
                                         method=mode, data_format="NCHW"
                                         if img.ndim == 4 else None))
    np.testing.assert_array_equal(got, ref)


def test_digit_split_decomposition_exact():
    """k == d2*2^16 + d1*2^8 + d0 with d_i in [-128, 127] for every coefficient of
    every mode at the headline sizes (the int8-operand precondition — the
    digit planes feed v5e's native int8 MXU path)."""
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _int_matrix,
        _split_digits,
    )

    for mode in ["bilinear", "bicubic", "lanczos3", "box", "hamming"]:
        K = _int_matrix(906, 320, mode)
        D = _split_digits(K).astype(np.int64)
        assert D.max() <= 127 and D.min() >= -128  # int8 range
        recon = D[2] * 65536 + D[1] * 256 + D[0]
        np.testing.assert_array_equal(recon, K)


def test_digit_tiles_cache_never_holds_a_tracer():
    """Regression (round 2): _digit_tiles is @cache'd; its first call can
    happen inside a jit trace (pil_exact_pallas_supported runs under the
    dispatcher), where jnp.asarray would mint a DynamicJaxprTracer constant.
    Caching that tracer poisons every later trace — the sustained benchmark
    sweep hit UnexpectedTracerError on its second time_jit_loop jit.  The
    cache must therefore store numpy only."""
    import jax

    from interpolate_antialiasing_tpu.ops.pil_exact import _digit_tiles

    _digit_tiles.cache_clear()

    @jax.jit
    def first_touch(x):  # populate the cache from inside a trace
        _digit_tiles(40, 16, "bilinear")
        return x + 1

    first_touch(jnp.zeros((2, 2)))
    _, bands, _ct = _digit_tiles(40, 16, "bilinear")
    assert isinstance(bands, np.ndarray) and not isinstance(
        bands, jax.Array
    ), type(bands)

    # and the value must be usable from a *second*, unrelated trace
    @jax.jit
    def second_trace(x):
        return x + jnp.asarray(bands, dtype=jnp.float32).sum()

    float(second_trace(jnp.float32(0)))


def test_auto_backend_promotes_u8_to_pil_exact(rng, monkeypatch, capsys):
    """Round 2b: with the int8 digit kernel the bit-exact path is the
    FASTEST uint8 route, so resize(u8, backend='auto') promotes eligible
    plain-PIL-semantics calls to it (exact output instead of MaxAbsE<=1).
    Pinned by the debug route line AND byte-equality with PIL through the
    public resize() entry (the float path differs from PIL on ~1% of
    pixels at this size, so equality is a routing witness)."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops import resize as resize_mod

    monkeypatch.setattr(resize_mod, "_on_tpu", lambda: True)
    monkeypatch.setenv("IA_TPU_DEBUG", "1")
    x = (rng.random((3, 64, 80)) * 255).astype(np.uint8)
    y = np.asarray(ia.resize(jnp.asarray(x), (40, 48), method="bilinear"))
    out = capsys.readouterr().out
    assert "pil_exact int8 digit kernel" in out, out
    im = Image.fromarray(np.transpose(x, (1, 2, 0)))
    ref = np.transpose(
        np.asarray(im.resize((48, 40), Image.BILINEAR)), (2, 0, 1)
    )
    np.testing.assert_array_equal(y, ref)
    # non-PIL semantics must NOT be promoted (align_corners forces float)
    ia.resize(jnp.asarray(x), (40, 48), method="bilinear",
              align_corners=True)
    assert "pil_exact int8 digit kernel" not in capsys.readouterr().out


STREAM_PIL_CASES = [
    # (mode, (H, W, oh, ow)) under a shrunken VMEM budget (monkeypatched)
    # so the whole-image kernel is rejected and the streamed row-window
    # pipeline fires on CI-friendly shapes; the real-budget 4K behaviour
    # is validated on hardware (commit log / BENCHMARKS.md).
    ("bilinear", (1400, 900, 700, 450)),
    ("bicubic", (1400, 900, 560, 360)),
    ("lanczos3", (1200, 1000, 600, 400)),
    # unaligned H and W: host zero-pad, pad rows/cols carry zero weight
    ("bilinear", (1401, 903, 701, 451)),
]

_SMALL_BUDGET = 2 * 1024 * 1024


@pytest.mark.parametrize("mode,hwos", STREAM_PIL_CASES)
def test_streamed_digit_pipeline_bit_exact(rng, monkeypatch, mode, hwos):
    """Round 2b: images too large for the whole-image VMEM block stream
    halo'd row windows through the int8 digit kernel and remain
    bit-identical to PIL.Image.resize."""
    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    monkeypatch.setattr(pe, "_PIL_VMEM_BUDGET", _SMALL_BUDGET)
    H, W, oh, ow = hwos
    assert not pe.pil_exact_pallas_supported((1, H, W), oh, ow, mode)
    assert pe.pil_exact_streamed_supported((1, H, W), oh, ow, mode)
    x = (rng.random((1, H, W)) * 255).astype(np.uint8)
    y = np.asarray(pe._resize_pil_exact_streamed(jnp.asarray(x), oh, ow, mode))
    im = PIL.fromarray(np.repeat(x, 3, axis=0).transpose(1, 2, 0))
    ref = np.asarray(im.resize((ow, oh), PIL_MODES[mode])).transpose(2, 0, 1)[:1]
    np.testing.assert_array_equal(y, ref)


def test_streamed_digit_dispatch(rng, monkeypatch, capsys):
    """resize_pil_exact and resize(auto) route oversize images to the
    streamed digit pipeline (debug line pinned), byte-exact end to end."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops import pil_exact as pe
    from interpolate_antialiasing_tpu.ops import resize as resize_mod

    monkeypatch.setattr(resize_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(pe, "_use_tpu_kernels", lambda: True)
    monkeypatch.setattr(pe, "_PIL_VMEM_BUDGET", _SMALL_BUDGET)
    monkeypatch.setenv("IA_TPU_DEBUG", "1")
    H, W, oh, ow = 1400, 900, 700, 450
    x = (rng.random((1, H, W)) * 255).astype(np.uint8)
    y = np.asarray(ia.resize(jnp.asarray(x), (oh, ow), method="bilinear"))
    out = capsys.readouterr().out
    assert "pil_exact int8 digit kernel" in out, out
    assert "digit-split streamed" in out, out
    im = Image.fromarray(np.repeat(x, 3, axis=0).transpose(1, 2, 0))
    ref = np.asarray(im.resize((ow, oh), Image.BILINEAR)).transpose(2, 0, 1)[:1]
    np.testing.assert_array_equal(y, ref)


def test_digit_kernel_random_shape_fuzz(rng, monkeypatch):
    """Random (H, W, oh, ow, mode) sweep through the PALLAS digit kernels
    (whole-image and, via a shrunken budget, streamed) in interpret mode —
    byte-equality with PIL on every draw.  Complements the fixed-case
    tests; guards the window/chunk geometry against odd shapes."""
    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    monkeypatch.setattr(pe, "_use_tpu_kernels", lambda: True)
    modes = ["bilinear", "bicubic", "box", "lanczos3", "hamming"]
    for i in range(8):
        H, W = int(rng.integers(8, 320)), int(rng.integers(8, 320))
        oh, ow = int(rng.integers(4, 280)), int(rng.integers(4, 280))
        mode = modes[i % len(modes)]
        if i >= 6:  # force the streamed route on the last draws
            monkeypatch.setattr(pe, "_PIL_VMEM_BUDGET", 256 * 1024)
            if not pe.pil_exact_streamed_supported((1, H, W), oh, ow, mode):
                continue
        x = (rng.random((1, H, W)) * 255).astype(np.uint8)
        y = np.asarray(pe.resize_pil_exact(jnp.asarray(x), (oh, ow),
                                           method=mode))
        im = PIL.fromarray(np.repeat(x, 3, axis=0).transpose(1, 2, 0))
        ref = np.asarray(im.resize((ow, oh), PIL_MODES[mode]))
        ref = ref.transpose(2, 0, 1)[:1]
        np.testing.assert_array_equal(y, ref, err_msg=f"{(H,W,oh,ow,mode,i)}")


def test_streamed_digit_column_chunking_bit_exact(rng, monkeypatch):
    """Round 2b: very wide uint8 rows column-chunk the streamed digit
    kernel's W pass (shrunken budget forces n_chunks > 1 on CI shapes);
    output stays byte-identical to PIL."""
    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    monkeypatch.setattr(pe, "_PIL_VMEM_BUDGET", 1664 * 1024)
    H, W, oh, ow = 700, 1800, 350, 900
    btw, _, _ = pe._digit_tiles(W, ow, "bilinear")
    bth, _, _ = pe._digit_tiles(H, oh, "bilinear", align=8)
    plan = pe._pil_stream_plan(W, btw, bth)
    assert plan is not None and plan.n_chunks > 1, plan
    assert not pe.pil_exact_pallas_supported((1, H, W), oh, ow, "bilinear")
    x = (rng.random((1, H, W)) * 255).astype(np.uint8)
    y = np.asarray(pe._resize_pil_exact_streamed(jnp.asarray(x), oh, ow,
                                                 "bilinear"))
    im = PIL.fromarray(np.repeat(x, 3, axis=0).transpose(1, 2, 0))
    ref = np.asarray(im.resize((ow, oh), PIL.BILINEAR)).transpose(2, 0, 1)[:1]
    np.testing.assert_array_equal(y, ref)


def test_needs_clip_classification():
    """The clip-free epilogue proof: non-negative filters never clamp
    (clip8 can't fire — see _needs_clip's range argument), negative-lobe
    filters must keep it.  Pinned across down/up/mixed sizes so a future
    filter addition can't silently skip a needed clamp."""
    from interpolate_antialiasing_tpu.ops.pil_exact import _needs_clip

    for insz, outsz in [(906, 320), (64, 130), (1200, 196), (10, 10)]:
        for mode in ["bilinear", "box", "hamming"]:
            assert not _needs_clip(insz, outsz, mode), (mode, insz, outsz)
        for mode in ["bicubic", "lanczos3"]:
            assert _needs_clip(insz, outsz, mode) or insz == outsz, (
                mode, insz, outsz
            )
    # the check reads the actual matrix, so even a negative-lobe FILTER is
    # clip-free on an identity resize (every row is one unit tap)
    assert not _needs_clip(10, 10, "bicubic")


def test_image_resize_trailing_plane_promotes(rng, monkeypatch):
    """image_resize (the jax.image.resize drop-in) routes trailing-plane
    changes through the full resize() dispatcher, so eligible uint8 calls
    get the bit-exact digit route too."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops import pil_exact as pe
    from interpolate_antialiasing_tpu.ops import resize as resize_mod

    monkeypatch.setattr(resize_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(pe, "_use_tpu_kernels", lambda: True)
    x = (rng.random((3, 80, 100)) * 255).astype(np.uint8)
    y = np.asarray(ia.image_resize(jnp.asarray(x), (3, 40, 50)))
    ref = np.transpose(
        np.asarray(Image.fromarray(x.transpose(1, 2, 0)).resize(
            (50, 40), Image.BILINEAR)), (2, 0, 1))
    np.testing.assert_array_equal(y, ref)
    # single-trailing-axis changes stay on resize_nd's per-axis pass (a
    # 2-D resize() would add a full identity pass over the unchanged
    # axis): within the float-path gate of PIL, not necessarily exact
    y2 = np.asarray(ia.image_resize(jnp.asarray(x), (3, 80, 50)))
    ref2 = np.transpose(
        np.asarray(Image.fromarray(x.transpose(1, 2, 0)).resize(
            (50, 80), Image.BILINEAR)), (2, 0, 1))
    assert np.abs(y2.astype(int) - ref2.astype(int)).max() <= 1


def test_tile_h_parameterization_bit_exact(rng, monkeypatch):
    """Sub-128 H-pass output tiles (the round-3 MXU K-pass geometry knob,
    ops/pil_exact._pick_tile_h) are byte-identical to Pillow for every
    width, on both the whole-image and streamed kernels — the tile width
    only changes the matmul geometry the MXU executes, never a byte."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    H, W, oh, ow = 150, 260, 67, 119
    img = (rng.random((2, H, W)) * 255).astype(np.uint8)
    ref = np.stack([
        np.asarray(Image.fromarray(p).resize((ow, oh), Image.BILINEAR))
        for p in img
    ])
    try:
        for tile_h in (128, 112, 64, 56, 32):
            monkeypatch.setenv("IA_TPU_PIL_TILE_H", str(tile_h))
            pe._pick_tile_h.cache_clear()
            pe._digit_tiles.cache_clear()
            got = np.asarray(
                pe._resize_pil_exact_pallas(jnp.asarray(img), oh, ow,
                                            "bilinear"))
            np.testing.assert_array_equal(got, ref, err_msg=f"tile_h={tile_h}")
            got_s = np.asarray(
                pe._resize_pil_exact_streamed(jnp.asarray(img), oh, ow,
                                              "bilinear"))
            np.testing.assert_array_equal(got_s, ref,
                                          err_msg=f"streamed tile_h={tile_h}")
    finally:
        pe._pick_tile_h.cache_clear()
        pe._digit_tiles.cache_clear()


def test_tile_w_parameterization_bit_exact(rng, monkeypatch):
    """Sub-128 W-pass output tiles (round-3 MXU K-pass knob for the
    contract-over-lanes pass, ops/pil_exact._pick_tile_w) are
    byte-identical to Pillow for every width on the streamed kernel.
    Unlike the H knob, the digit planes stay at fixed 128-lane offsets
    (lane slicing is only free at 128-multiples) and the valid output
    lanes are compacted once on the final uint8 array — so this pins
    both the pitch!=tile band layout and the strided-lane compaction."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    H, W, oh, ow = 150, 260, 67, 119
    img = (rng.random((2, H, W)) * 255).astype(np.uint8)
    ref = {
        m: np.stack([
            np.asarray(Image.fromarray(p).resize((ow, oh), r))
            for p in img
        ])
        for m, r in [("bilinear", Image.BILINEAR),
                     ("lanczos3", Image.LANCZOS)]  # clip-free + clip paths
    }
    try:
        for tile_w in (128, 120, 96, 72, 64):
            monkeypatch.setenv("IA_TPU_PIL_TILE_W", str(tile_w))
            pe._pick_tile_w.cache_clear()
            pe._digit_tiles.cache_clear()
            for m in ("bilinear", "lanczos3"):
                got = np.asarray(
                    pe._resize_pil_exact_streamed(jnp.asarray(img), oh, ow, m))
                np.testing.assert_array_equal(
                    got, ref[m], err_msg=f"tile_w={tile_w} {m}")
    finally:
        pe._pick_tile_w.cache_clear()
        pe._digit_tiles.cache_clear()


def test_streamed_image_batching_bit_exact(rng):
    """bsz > 1 (images per grid step, _pil_stream_bsz): the batched DMA
    window (`b_i*bsz` block indexing) and per-image W/H trace must stay
    byte-identical to Pillow across multiple grid blocks — pins the
    round-3 image-batched streamed kernel (B=16 -> bsz=8 x 2 blocks,
    B=9 -> bsz=3 x 3 blocks)."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    H, W, oh, ow = 150, 260, 67, 119
    for B, want_bsz in ((16, 8), (9, 3)):
        img = (rng.random((B, H, W)) * 255).astype(np.uint8)
        ref = np.stack([
            np.asarray(Image.fromarray(p).resize((ow, oh), Image.BILINEAR))
            for p in img
        ])
        btw, _, _, bth, _, _ = pe._stream_tiles(H, W, oh, ow, "bilinear")
        plan = pe._pil_stream_plan(W, btw, bth)
        assert pe._pil_stream_bsz(B, plan, btw, bth) == want_bsz
        got = np.asarray(
            pe._resize_pil_exact_streamed(jnp.asarray(img), oh, ow,
                                          "bilinear"))
        np.testing.assert_array_equal(got, ref, err_msg=f"B={B}")


def test_pick_tile_w_is_8_granular_and_bounded():
    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    for in_size, out_size in [(3840, 1280), (3840, 1920), (906, 320),
                              (260, 119)]:
        t = pe._pick_tile_w(in_size, out_size, "bilinear", k_rows=208,
                            tile_h=96)
        assert 64 <= t <= 128 and t % 8 == 0
        assert -(-out_size // t) <= pe._PIL_MAX_TILES or t == 128


def test_pick_tile_h_is_8_granular_and_bounded():
    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    for in_size, out_size, mode in [(438, 196, "bilinear"), (2160, 720,
                                    "bilinear"), (438, 196, "lanczos3"),
                                    (512, 512, "bicubic")]:
        for align in (1, 8):
            t = pe._pick_tile_h(in_size, out_size, mode, align=align)
            assert 32 <= t <= 128 and t % 8 == 0


def test_int_matrix_is_scatter_of_int_tables():
    """_int_matrix (dense) must stay the exact scatter of _int_tables
    (banded) — the quantisation lives once, in the banded builder, and
    both the single-device digit kernels and the sharded route consume
    the same integers."""
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _int_matrix, _int_tables,
    )

    for in_size, out_size, mode in [(906, 320, "bilinear"), (97, 41, "lanczos3"),
                                    (50, 125, "bicubic")]:
        K = _int_matrix(in_size, out_size, mode)
        xmin, Wb = _int_tables(in_size, out_size, mode)
        K2 = np.zeros_like(K)
        for o in range(out_size):
            for j in range(Wb.shape[1]):
                c = int(xmin[o]) + j
                if 0 <= c < in_size and Wb[o, j]:
                    K2[o, c] = Wb[o, j]
        np.testing.assert_array_equal(K, K2, err_msg=f"{in_size}->{out_size} {mode}")
        assert K.dtype == np.int32


def test_digit_pass_mid_dynamic_multi_tile_chunk():
    """digit_pass_mid_dynamic across >1 output tiles AND >1 W chunks
    (the grid shape the on-chip 4K probe runs) — byte-identical to the
    banded gather reference, n=1 degenerate tables."""
    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _needs_clip,
        _pass_last_int_banded,
        digit_pass_mid_dynamic,
    )
    from interpolate_antialiasing_tpu.parallel.halo import (
        _digit_halo_tables,
        _int_halo_tables,
    )

    H, OH, OW, B = 520, 250, 700, 2  # 2 row tiles, 2 lane chunks
    rng = np.random.default_rng(3)
    inter = jnp.asarray(rng.integers(0, 256, (B, H, OW), np.uint8))
    _, rs, Wsh = _int_halo_tables(H, OH, "bicubic", 1)
    _, ds, db, dc = _digit_halo_tables(H, OH, "bicubic", 1)
    assert db.shape[1] >= 2, "geometry must exercise multiple tiles"
    ref = np.asarray(jnp.moveaxis(
        _pass_last_int_banded(jnp.moveaxis(inter, -2, -1),
                              jnp.asarray(rs[0]), jnp.asarray(Wsh[0])),
        -1, -2))
    got = np.asarray(digit_pass_mid_dynamic(
        inter, jnp.asarray(ds[0]), jnp.asarray(db[0]), jnp.asarray(dc[0]),
        OH, clip=_needs_clip(H, OH, "bicubic")))
    np.testing.assert_array_equal(got, ref)


# ---------------------------------------------------------------------------
# 2-digit pb=14 dial (round 5): MaxAbsE <= 1 at 2/3 the MXU work
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "lanczos3"])
def test_digits2_within_one_of_pillow(mode):
    """resize_pil_exact(digits=2): the pb=14 two-digit grid stays within
    +-1 of Pillow everywhere (guaranteed by |e| < 2^22, see
    benchmarks/digit2_study.py), while digits=3 stays byte-exact."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    rng_ = np.random.default_rng(5)
    img = rng_.integers(0, 256, (3, 97, 131), dtype=np.uint8)
    hwc = np.moveaxis(img, 0, -1)
    res = {"bilinear": Image.BILINEAR, "bicubic": Image.BICUBIC,
           "lanczos3": Image.LANCZOS}[mode]
    ref = np.moveaxis(np.asarray(Image.fromarray(hwc).resize((53, 41), res)),
                      -1, 0)
    g3 = np.asarray(resize_pil_exact(jnp.asarray(img), (41, 53), method=mode))
    g2 = np.asarray(resize_pil_exact(jnp.asarray(img), (41, 53), method=mode,
                                     digits=2))
    np.testing.assert_array_equal(g3, ref)
    assert np.abs(g2.astype(int) - ref.astype(int)).max() <= 1


def test_digits2_pallas_whole_image_matches_xla(rng):
    """The 2-digit Pallas whole-image kernel (interpret mode on CPU) is
    bit-identical to the 2-digit XLA fallback — the dial changes the
    GRID, not the kernel-vs-fallback agreement."""
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _resize_pil_exact_pallas,
        _int_matrix,
        _pass_last_int,
    )

    img = rng.integers(0, 256, (2, 64, 80), dtype=np.uint8)
    x = jnp.asarray(img)
    got = np.asarray(_resize_pil_exact_pallas(x, 30, 40, "bilinear",
                                              pb=14, ndig=2))
    Mw = jnp.asarray(_int_matrix(80, 40, "bilinear", None, 14))
    Mh = jnp.asarray(_int_matrix(64, 30, "bilinear", None, 14))
    ref = _pass_last_int(x, Mw, 14)
    ref = jnp.moveaxis(_pass_last_int(jnp.moveaxis(ref, -2, -1), Mh, 14),
                       -1, -2)
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_digits2_wide_window_falls_back_to_exact(monkeypatch):
    """Tap counts beyond the +-1 admission (ntaps > 57) silently upgrade
    back to the exact 3-digit grid — never a silent accuracy cliff."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    rng_ = np.random.default_rng(6)
    img = rng_.integers(0, 256, (800, 64), dtype=np.uint8)
    # 800 -> 16 rows, lanczos3: ntaps = ceil(3*50)*2+1 = 301 > 57
    ref = np.asarray(Image.fromarray(img).resize((64, 16), Image.LANCZOS))
    got = np.asarray(resize_pil_exact(jnp.asarray(img), (16, 64),
                                      method="lanczos3", digits=2))
    np.testing.assert_array_equal(got, ref)  # byte-exact: it ran 3-digit


def test_digits_env_dial(monkeypatch):
    """IA_TPU_PIL_DIGITS steers the default at trace time."""
    from interpolate_antialiasing_tpu.config import default_pil_digits

    monkeypatch.delenv("IA_TPU_PIL_DIGITS", raising=False)
    assert default_pil_digits() == 3
    monkeypatch.setenv("IA_TPU_PIL_DIGITS", "2")
    assert default_pil_digits() == 2
    monkeypatch.setenv("IA_TPU_PIL_DIGITS", "7")
    with pytest.raises(ValueError):
        default_pil_digits()


def test_digits_validation():
    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    with pytest.raises(ValueError):
        resize_pil_exact(jnp.zeros((8, 8), jnp.uint8), (4, 4), digits=1)
