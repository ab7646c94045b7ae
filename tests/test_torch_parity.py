"""Cross-check against torch.nn.functional.interpolate (CPU).

The reference prototype *became* torch's ``antialias=True`` path, so stock
torch is a second executable oracle:
  * antialias=True  — must match our AA path,
  * antialias=False — must match our classic (non-AA) path, which the
    reference keeps alongside (step_zero/aa_interpolation_impl.h:378-407).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import interpolate_antialiasing_tpu as ia

torch = pytest.importorskip("torch")

SIZES = [(196, 320), (96, 120), (196, 1200), (67, 41)]


def _torch_resize(x_np, ohw, mode, antialias, align_corners):
    t = torch.from_numpy(x_np)
    ac = align_corners if mode != "nearest" else None
    out = torch.nn.functional.interpolate(
        t, size=ohw, mode=mode, align_corners=ac, antialias=antialias
    )
    return out.numpy()


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("ohw", SIZES)
def test_aa_matches_torch(rng, mode, ohw):
    x = rng.random((2, 3, 438, 906)).astype(np.float32) * 255.0
    ref = _torch_resize(x, ohw, mode, antialias=True, align_corners=False)
    y = np.asarray(
        ia.resize_plane(jnp.asarray(x), ohw, 2, 3, mode=mode, backend="dense")
    )
    np.testing.assert_allclose(y, ref, atol=2e-2, rtol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("ohw", [(96, 120), (67, 41), (500, 1000)])
def test_non_aa_matches_torch(rng, mode, align_corners, ohw):
    """antialias=False reproduces classic torch interpolation, both
    align_corners conventions — the reference's retained non-AA path."""
    x = rng.random((1, 2, 200, 300)).astype(np.float32)
    ref = _torch_resize(x, ohw, mode, antialias=False, align_corners=align_corners)
    y = np.asarray(
        ia.resize_plane(
            jnp.asarray(x), ohw, 2, 3, mode=mode, antialias=False,
            align_corners=align_corners, backend="dense",
        )
    )
    np.testing.assert_allclose(y, ref, atol=5e-5, rtol=1e-5)


def test_upsample_aa_matches_torch(rng):
    # AA upsample == non-AA upsample in torch and in PIL semantics.
    x = rng.random((1, 3, 50, 60)).astype(np.float32)
    ref = _torch_resize(x, (100, 90), "bilinear", True, False)
    y = np.asarray(ia.resize_plane(jnp.asarray(x), (100, 90), 2, 3, backend="dense"))
    np.testing.assert_allclose(y, ref, atol=2e-5, rtol=1e-5)


def test_nearest_exact_parity(rng):
    """method='nearest', antialias=False reproduces torch's 'nearest-exact'
    (the corrected rounding; torch's legacy 'nearest' uses an asymmetric
    floor that even PyTorch documents as a bug kept for compatibility)."""
    torch = pytest.importorskip("torch")
    x = (rng.random((2, 3, 17, 29)) * 255).astype(np.float32)
    for size in [(9, 14), (3, 4), (34, 58)]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=size, mode="nearest-exact"
        ).numpy()
        y = np.asarray(
            ia.resize(jnp.asarray(x), size, method="nearest", antialias=False)
        )
        np.testing.assert_array_equal(y, ref)


def test_interpolate_mode_aliases(rng):
    """torch F.interpolate mode aliases: 'area' (torch's exact
    adaptive-avg-pool window rule) and 'nearest'/'nearest-exact' (no
    antialias)."""
    torch = pytest.importorskip("torch")
    x = (rng.random((1, 3, 24, 36)) * 255).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(6, 9), mode="area"
    ).numpy()
    y = np.asarray(ia.interpolate(jnp.asarray(x), size=(6, 9), mode="area"))
    np.testing.assert_allclose(y, ref, atol=1e-3)
    refn = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(12, 18), mode="nearest-exact"
    ).numpy()
    yn = np.asarray(ia.interpolate(jnp.asarray(x), size=(12, 18),
                                   mode="nearest-exact"))
    np.testing.assert_array_equal(yn, refn)


def test_area_mode_fractional_fuzz(rng):
    """mode='area' matches torch's adaptive-average-pool window-inclusion
    rule exactly, for FRACTIONAL ratios too (round 2 documented a
    divergence here; round 3 implements the adaptive rule as its own
    banded table — weights.py::_compute_tables_area)."""
    torch = pytest.importorskip("torch")
    for _ in range(20):
        H, W = int(rng.integers(3, 130)), int(rng.integers(3, 130))
        oh = int(rng.integers(1, H + 1))  # area mode is for downsampling
        ow = int(rng.integers(1, W + 1))
        x = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="area"
        ).numpy()
        y = np.asarray(
            ia.interpolate(jnp.asarray(x), size=(oh, ow), mode="area")
        )
        np.testing.assert_allclose(
            y, ref, atol=2e-4, rtol=1e-6, err_msg=f"{H}x{W}->{oh}x{ow}"
        )
    # upsampling ratios hit the size-1/2 windows of the adaptive rule
    x = (rng.random((1, 2, 13, 17)) * 255).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(19, 23), mode="area"
    ).numpy()
    y = np.asarray(ia.interpolate(jnp.asarray(x), size=(19, 23), mode="area"))
    np.testing.assert_allclose(y, ref, atol=2e-4, rtol=1e-6)
    # area windows are exact through every backend route (same tables)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(5, 6), mode="area"
    ).numpy()
    for backend in ("dense", "gather", "banded"):
        y = np.asarray(
            ia.resize(jnp.asarray(x), (5, 6), method="area", backend=backend)
        )
        np.testing.assert_allclose(y, ref, atol=2e-4, rtol=1e-6,
                                   err_msg=backend)


def test_nearest_legacy_parity_fuzz(rng):
    """method='nearest_legacy' (and interpolate mode='nearest') is
    byte-exact vs torch's legacy asymmetric nearest across a size fuzz,
    including awkward ratios, upsampling and scale_factor-driven sizes."""
    torch = pytest.importorskip("torch")
    for _ in range(20):
        H, W = int(rng.integers(2, 120)), int(rng.integers(2, 120))
        oh, ow = int(rng.integers(1, 120)), int(rng.integers(1, 120))
        x = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="nearest"
        ).numpy()
        y = np.asarray(
            ia.resize(jnp.asarray(x), (oh, ow), method="nearest_legacy")
        )
        np.testing.assert_array_equal(y, ref, err_msg=f"{H}x{W}->{oh}x{ow}")
        yi = np.asarray(
            ia.interpolate(jnp.asarray(x), size=(oh, ow), mode="nearest")
        )
        np.testing.assert_array_equal(yi, ref)
    # scale_factor path (torch recomputes indices with 1/scale_factor)
    x = (rng.random((1, 2, 37, 53)) * 255).astype(np.float32)
    for sf in [0.4, 1.7, 2.0, 0.5]:
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), scale_factor=sf, mode="nearest"
        ).numpy()
        yi = np.asarray(
            ia.interpolate(jnp.asarray(x), scale_factor=sf, mode="nearest")
        )
        np.testing.assert_array_equal(yi, ref, err_msg=f"sf={sf}")


def test_nearest_legacy_uint8_and_grad(rng):
    """Gather path: dtype-preserving for uint8; differentiable for float."""
    u = jnp.asarray((rng.random((3, 20, 30)) * 255).astype(np.uint8))
    y = ia.resize(u, (9, 13), method="nearest_legacy", data_format="CHW")
    assert y.dtype == jnp.uint8 and y.shape == (3, 9, 13)
    x = jnp.asarray(rng.random((1, 1, 8, 8)).astype(np.float32))
    g = jax.grad(lambda t: ia.resize(t, (4, 4), method="nearest_legacy").sum())(x)
    assert g.shape == x.shape and float(g.sum()) == 16.0


@pytest.mark.parametrize("align_corners", [False, True])
def test_linear_and_trilinear_modes_match_torch(rng, align_corners):
    """interpolate() honours torch's 1-/3-spatial-axis mode aliases:
    mode='linear' on [N,C,W] and mode='trilinear' on [N,C,D,H,W] match
    F.interpolate (non-AA; torch rejects antialias for these modes).
    Gate is 1e-3, not the 2-D 5e-5: ATen's linear1d/trilinear kernels do
    their source-index math in float32 (same quirk class as the
    nearest-legacy f32-size arithmetic, SURVEY §2.2) while our tables are
    built in f64, so lambdas differ by an f32 ulp of the source index."""
    import torch

    x1 = rng.random((2, 3, 57)).astype(np.float32) * 255.0
    ref1 = torch.nn.functional.interpolate(
        torch.from_numpy(x1), size=23, mode="linear",
        align_corners=align_corners,
    ).numpy()
    y1 = np.asarray(ia.interpolate(
        jnp.asarray(x1), size=23, mode="linear",
        align_corners=align_corners, antialias=False, backend="dense",
    ))
    np.testing.assert_allclose(y1, ref1, atol=1e-3, rtol=1e-5)

    x3 = rng.random((1, 2, 9, 14, 18)).astype(np.float32) * 255.0
    ref3 = torch.nn.functional.interpolate(
        torch.from_numpy(x3), size=(5, 21, 11), mode="trilinear",
        align_corners=align_corners,
    ).numpy()
    y3 = np.asarray(ia.interpolate(
        jnp.asarray(x3), size=(5, 21, 11), mode="trilinear",
        align_corners=align_corners, antialias=False, backend="dense",
    ))
    np.testing.assert_allclose(y3, ref3, atol=1e-3, rtol=1e-5)

    # scale_factor-driven sizes + the AA superset run (finite, right shape)
    y_sf = ia.interpolate(jnp.asarray(x3), scale_factor=0.5, mode="trilinear")
    assert y_sf.shape == (1, 2, 4, 7, 9)
    assert bool(jnp.isfinite(y_sf).all())


@pytest.mark.parametrize("mode", ["nearest", "nearest-exact"])
def test_nearest_modes_3d_5d_match_torch(rng, mode):
    """interpolate() nearest-family on torch's 1-/3-spatial ranks: a 3-D
    [N,C,W] call used to fall into the 2-D shim and misread the layout;
    now every spatial axis point-samples with torch's rounding (legacy
    asymmetric for 'nearest', corrected for 'nearest-exact')."""
    import torch

    x1 = rng.random((2, 3, 57)).astype(np.float32) * 255.0
    ref1 = torch.nn.functional.interpolate(
        torch.from_numpy(x1), size=23, mode=mode
    ).numpy()
    y1 = np.asarray(ia.interpolate(jnp.asarray(x1), size=23, mode=mode))
    np.testing.assert_array_equal(y1, ref1)

    x3 = rng.random((1, 2, 9, 14, 18)).astype(np.float32) * 255.0
    ref3 = torch.nn.functional.interpolate(
        torch.from_numpy(x3), size=(5, 21, 11), mode=mode
    ).numpy()
    y3 = np.asarray(
        ia.interpolate(jnp.asarray(x3), size=(5, 21, 11), mode=mode)
    )
    np.testing.assert_array_equal(y3, ref3)

    # scale_factor-driven legacy path keeps ATen's f64-scale quirk
    ref_sf = torch.nn.functional.interpolate(
        torch.from_numpy(x3), scale_factor=0.5, mode=mode
    ).numpy()
    y_sf = np.asarray(
        ia.interpolate(jnp.asarray(x3), scale_factor=0.5, mode=mode)
    )
    np.testing.assert_array_equal(y_sf, ref_sf)


def test_area_mode_3d_5d_match_torch(rng):
    """mode='area' on torch's 1-/3-spatial ranks: adaptive-average-pool
    windows factorise exactly across axes, so the separable per-axis area
    tables match F.interpolate(mode='area') on 3-D and 5-D inputs to the
    same gate as the 2-D fuzz (incl. fractional ratios)."""
    import torch

    x1 = rng.random((2, 3, 57)).astype(np.float32) * 255.0
    ref1 = torch.nn.functional.interpolate(
        torch.from_numpy(x1), size=23, mode="area"
    ).numpy()
    y1 = np.asarray(ia.interpolate(jnp.asarray(x1), size=23, mode="area"))
    np.testing.assert_allclose(y1, ref1, atol=2e-4, rtol=1e-6)

    x3 = rng.random((1, 2, 9, 14, 18)).astype(np.float32) * 255.0
    ref3 = torch.nn.functional.interpolate(
        torch.from_numpy(x3), size=(5, 21, 11), mode="area"
    ).numpy()
    y3 = np.asarray(
        ia.interpolate(jnp.asarray(x3), size=(5, 21, 11), mode="area")
    )
    np.testing.assert_allclose(y3, ref3, atol=2e-4, rtol=1e-6)
