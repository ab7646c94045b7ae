"""Regression tests for the parallel-layer review findings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interpolate_antialiasing_tpu.parallel import make_mesh, plan_halo


def test_plan_halo_rejects_oversized_halo():
    with pytest.raises(ValueError, match="halo .* exceeds"):
        plan_halo(64, 8, "lanczos3", True, 8)


def test_make_mesh_clear_error_when_underprovisioned():
    with pytest.raises(ValueError, match="needs .* devices"):
        make_mesh((1024,), ("data",))


def test_plan_halo_cache_immutable():
    halo, Wl = plan_halo(64, 32, "bilinear", True, 8)
    with pytest.raises(ValueError):
        Wl[0, 0, 0] = 99.0


def test_trainer_with_plain_data_mesh():
    """Trainer works with the package's own default (data-only) mesh."""
    from interpolate_antialiasing_tpu.models import Trainer

    t = Trainer(mesh=make_mesh(), resize_to=(8, 8))
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((8, 3, 16, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=8))
    loss = t.step(imgs, labels)
    assert np.isfinite(float(loss))


def test_data_parallel_resize_compiles_once(rng):
    from interpolate_antialiasing_tpu.parallel import data_parallel_resize
    from interpolate_antialiasing_tpu.parallel.sharding import _dp_resize_jit

    mesh = make_mesh()
    x = jnp.asarray(rng.random((8, 3, 32, 32)).astype(np.float32))
    before = _dp_resize_jit.cache_info().misses
    for _ in range(3):
        y = data_parallel_resize(x, (16, 16), mesh=mesh)
    after = _dp_resize_jit.cache_info()
    assert after.misses == before + 1 and after.hits >= 2
    assert y.shape == (8, 3, 16, 16)


def test_oracle_covers_pil_nearest(test_image):
    from interpolate_antialiasing_tpu.utils.oracle import pil_resize

    ref = pil_resize(np.asarray(test_image), (10, 12), "pil_nearest")
    assert ref.shape[-2:] == (10, 12) or ref.shape[:2] == (10, 12)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "lanczos3"])
def test_resize_sharded_pil_exact_byte_identical(mode):
    """The sharded byte-exact route (resize_sharded_pil_exact) equals
    PIL.Image.resize and the single-device pil_exact route byte-for-byte
    over the 8-device virtual mesh — divisible and ceil-padded sizes,
    CHW and bare 2-D layouts."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact
    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    mesh = make_mesh((8,), ("sp",))
    rng = np.random.default_rng(99)
    resample = {
        "bilinear": Image.Resampling.BILINEAR,
        "bicubic": Image.Resampling.BICUBIC,
        "lanczos3": Image.Resampling.LANCZOS,
    }[mode]
    # (in_h, in_w, oh, ow): divisible by 8, ceil-padded H, non-div output
    for H, W, oh, ow in [(96, 130, 40, 70), (97, 111, 41, 59)]:
        img = rng.integers(0, 256, (3, H, W), dtype=np.uint8)
        ref = np.stack([
            np.asarray(
                Image.fromarray(img[c]).resize((ow, oh), resample)
            )
            for c in range(3)
        ])
        got = np.asarray(
            resize_sharded_pil_exact(jnp.asarray(img), (oh, ow), mesh,
                                     axis="sp", mode=mode)
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"{mode} {H}x{W}")
        single = np.asarray(
            resize_pil_exact(jnp.asarray(img), (oh, ow), method=mode)
        )
        np.testing.assert_array_equal(got, single)
    # bare 2-D (taller image: 8 ceil-blocks must each cover their halo)
    img2 = rng.integers(0, 256, (240, 120), dtype=np.uint8)
    ref2 = np.asarray(Image.fromarray(img2).resize((50, 96), resample))
    got2 = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(img2), (96, 50), mesh,
                                 axis="sp", mode=mode)
    )
    np.testing.assert_array_equal(got2, ref2)


def test_resize_sharded_pil_exact_rejects_float():
    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    mesh = make_mesh((8,), ("sp",))
    with pytest.raises(TypeError, match="uint8-only"):
        resize_sharded_pil_exact(jnp.zeros((16, 16), jnp.float32),
                                 (8, 8), mesh)


def test_resize_sharded_pil_exact_tall_image_banded():
    """The giant-image use case the route documents: a tall input must
    byte-match PIL without any dense [out, in] matrix — the integer
    tables are banded (size tracks filter support), so this would OOM
    long before 4096 rows if a dense build crept back in."""
    from PIL import Image

    from interpolate_antialiasing_tpu.ops.pil_exact import _int_tables
    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    xmin, Wb = _int_tables(4096, 1024, "bilinear")
    assert Wb.shape[0] == 1024 and Wb.shape[1] <= 16  # banded, not dense

    mesh = make_mesh((8,), ("sp",))
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (4096, 256), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(img).resize((128, 1024), Image.Resampling.BILINEAR)
    )
    got = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(img), (1024, 128), mesh)
    )
    np.testing.assert_array_equal(got, ref)


def test_resize_sharded_pil_exact_nhwc():
    """channels-last layout through the sharded byte-exact route: the H
    axis (-3 under NHWC) is the sharded one; byte-equality vs PIL."""
    from PIL import Image

    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    mesh = make_mesh((8,), ("sp",))
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (160, 100, 3), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(img).resize((48, 72), Image.Resampling.BILINEAR)
    )
    got = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(img), (72, 48), mesh,
                                 data_format="NHWC")
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "lanczos3", "box"])
def test_resize_sharded_pil_exact_digit_promotion(mode):
    """use_tpu_kernels=True promotes the shard-local passes to the int8
    digit MXU kernels (W: fused kernels with the identity vertical table;
    H: digit_pass_mid_dynamic with per-shard tables) — byte-identical to
    PIL and to the default gather route, interpret mode on the 8-device
    mesh.  The identity-table claim (every Pillow filter quantises to the
    exact identity at out==in) is what makes the W reuse legal; byte
    equality here pins it for each mode."""
    from PIL import Image

    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    mesh = make_mesh((8,), ("sp",))
    rng = np.random.default_rng(7)
    resample = {
        "bilinear": Image.Resampling.BILINEAR,
        "bicubic": Image.Resampling.BICUBIC,
        "lanczos3": Image.Resampling.LANCZOS,
        "box": Image.Resampling.BOX,
    }[mode]
    img = rng.integers(0, 256, (2, 520, 260), dtype=np.uint8)
    ref = np.stack([
        np.asarray(Image.fromarray(img[c]).resize((120, 250), resample))
        for c in range(2)
    ])
    got = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(img), (250, 120), mesh,
                                 mode=mode, use_tpu_kernels=True)
    )
    np.testing.assert_array_equal(got, ref, err_msg=mode)
    base = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(img), (250, 120), mesh,
                                 mode=mode, use_tpu_kernels=False)
    )
    np.testing.assert_array_equal(got, base)


def test_resize_sharded_pil_exact_comm_pattern_hlo():
    """Pin the sharded byte-exact route's communication story in compiled
    HLO: the only collectives are the two neighbour collective-permutes
    of the halo exchange (u8 intermediate rows riding the ICI ring) — no
    all-gather / all-reduce / all-to-all / reduce-scatter may appear (an
    accidental full-H gather would still be byte-correct, so only the
    HLO can catch the regression)."""
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    mesh = make_mesh((8,), ("sp",))
    sh = NamedSharding(mesh, P(None, "sp", None))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (2, 240, 96), np.uint8))
    f = jax.jit(
        lambda t: resize_sharded_pil_exact(t, (96, 48), mesh),
        in_shardings=sh,
    )
    hlo = f.lower(x).compile().as_text()
    for coll in ("all-gather", "all-reduce", "all-to-all", "reduce-scatter"):
        assert coll not in hlo, f"unexpected collective {coll} in HLO"
    n_perm = len(re.findall(r"collective-permute(?:-start)?\(", hlo))
    assert 1 <= n_perm <= 2, f"expected the 2 halo ppermutes, saw {n_perm}"


def test_resize_sharded_pil_exact_promotion_hamming_and_nhwc_fallback():
    """hamming through the promoted path (the identity-vertical-table
    claim covers it: scale-1 hamming reduces to one full-weight tap);
    and NHWC + use_tpu_kernels=True must silently keep the gather route
    (promotion needs trailing [H, W] axes) while staying byte-exact."""
    from PIL import Image

    from interpolate_antialiasing_tpu.parallel import (
        make_mesh,
        resize_sharded_pil_exact,
    )

    mesh = make_mesh((8,), ("sp",))
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (2, 320, 180), dtype=np.uint8)
    ref = np.stack([
        np.asarray(Image.fromarray(img[c]).resize((90, 160),
                                                  Image.Resampling.HAMMING))
        for c in range(2)
    ])
    got = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(img), (160, 90), mesh,
                                 mode="hamming", use_tpu_kernels=True)
    )
    np.testing.assert_array_equal(got, ref)

    hwc = np.moveaxis(img, 0, -1)[:, :, :2]
    ref_hwc = np.moveaxis(ref, 0, -1)[:, :, :2]
    got_hwc = np.asarray(
        resize_sharded_pil_exact(jnp.asarray(hwc), (160, 90), mesh,
                                 mode="hamming", data_format="NHWC",
                                 use_tpu_kernels=True)
    )
    np.testing.assert_array_equal(got_hwc, ref_hwc)
