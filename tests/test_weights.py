"""Weight-table unit tests: properties + golden values.

Mirrors what the reference only validated end-to-end (the table builder at
step_two_dot_two/aa_interpolation_impl.h:194-283 had no direct tests).
"""

import numpy as np
import pytest

from interpolate_antialiasing_tpu.ops.weights import (
    banded_tiles,
    compute_tables,
    compute_tables_traced,
    dense_matrix,
    make_axis_spec,
)

MODES = ["bilinear", "bicubic", "box", "lanczos3"]
SIZES = [(906, 320), (438, 196), (10, 4), (4, 10), (7, 7), (1, 3), (3, 1), (906, 1200)]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("insz,outsz", SIZES)
def test_rows_sum_to_one(mode, insz, outsz):
    spec = make_axis_spec(insz, outsz, mode)
    xmin, size, w = compute_tables(spec)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-12)
    # zero tail beyond `size`
    for i in range(spec.out_size):
        assert np.all(w[i, size[i] :] == 0.0)


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("insz,outsz", SIZES)
def test_bounds_are_valid(mode, insz, outsz):
    spec = make_axis_spec(insz, outsz, mode)
    xmin, size, w = compute_tables(spec)
    assert np.all(xmin >= 0)
    assert np.all(size >= 0)
    assert np.all(xmin + size <= insz)
    assert np.all(size <= spec.ntaps)
    # xmin monotonically non-decreasing (band structure)
    assert np.all(np.diff(xmin) >= 0)


def test_ntaps_formula():
    # AA downsample: support widened by scale; reference
    # step_two_dot_two/aa_interpolation_impl.h:207-210.
    spec = make_axis_spec(906, 320, "bilinear")
    assert spec.scale == pytest.approx(906 / 320)
    assert spec.ntaps == int(np.ceil(1.0 * spec.scale)) * 2 + 1
    # upsample: no widening
    spec_up = make_axis_spec(320, 906, "bilinear")
    assert spec_up.support == 1.0 and spec_up.invscale == 1.0
    assert spec_up.ntaps == 3
    spec_cu = make_axis_spec(906, 320, "bicubic")
    assert spec_cu.support == pytest.approx(2.0 * 906 / 320)


def test_golden_bilinear_identity():
    # out == in with bilinear: W is the identity.
    spec = make_axis_spec(8, 8, "bilinear")
    W = dense_matrix(spec, dtype=np.float64)
    np.testing.assert_allclose(W, np.eye(8), atol=1e-12)


def test_golden_bilinear_2x_downsample():
    # 8 -> 4, scale 2, support 2, taps ceil(2)*2+1 = 5.
    # center of output 1 = 2*(1.5) = 3.0; window [1,5): weights from
    # triangle((j+1-3+0.5)*0.5) = [.25,.75,.75,.25]/2  (interior, exact)
    spec = make_axis_spec(8, 4, "bilinear")
    xmin, size, w = compute_tables(spec)
    assert xmin[1] == 1 and size[1] == 4
    np.testing.assert_allclose(w[1, :4], [0.125, 0.375, 0.375, 0.125], atol=1e-12)


def test_golden_edge_renormalisation():
    # Border windows are clipped and renormalised; first output pixel of
    # an 8->4 bilinear downsample has window [0,3) (3 taps).
    spec = make_axis_spec(8, 4, "bilinear")
    xmin, size, w = compute_tables(spec)
    assert xmin[0] == 0 and size[0] == 3
    raw = np.array([0.75, 0.75, 0.25])  # triangle((j-1+0.5)*0.5)
    np.testing.assert_allclose(w[0, :3], raw / raw.sum(), atol=1e-12)


def test_box_filter_partition():
    # Box/AA with integral scale: every input pixel contributes to exactly
    # one output pixel with equal weight.
    spec = make_axis_spec(12, 4, "box")
    W = dense_matrix(spec, dtype=np.float64)
    np.testing.assert_allclose(W.sum(axis=0), 1.0 / 3.0 * np.ones(12), atol=1e-12)
    np.testing.assert_allclose(W[W > 0], 1.0 / 3.0)


@pytest.mark.parametrize("mode", MODES)
def test_traced_matches_host(mode):
    import jax.numpy as jnp

    spec = make_axis_spec(97, 31, mode)
    xm_h, sz_h, w_h = compute_tables(spec, dtype=np.float64)
    xm_t, sz_t, w_t = compute_tables_traced(spec, jnp, jnp.float64)
    np.testing.assert_array_equal(np.asarray(xm_t), xm_h)
    np.testing.assert_array_equal(np.asarray(sz_t), sz_h)
    np.testing.assert_allclose(np.asarray(w_t), w_h, atol=1e-12)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("insz,outsz", [(906, 320), (64, 196), (500, 129)])
@pytest.mark.parametrize("align", [8, 128])
def test_banded_tiles_reconstruct_dense(mode, insz, outsz, align):
    """The tile-compacted band, scattered back, equals the dense matrix."""
    spec = make_axis_spec(insz, outsz, mode)
    bt = banded_tiles(spec, tile=128, dtype=np.float64, align=align)
    W = np.zeros((bt.out_padded, -(-insz // align) * align))
    for t in range(bt.n_tiles):
        s = int(bt.starts[t])
        assert s % align == 0
        assert s + bt.k_in <= W.shape[1]
        W[t * 128 : (t + 1) * 128, s : s + bt.k_in] += bt.band[t].T
    ref = dense_matrix(spec, dtype=np.float64)
    np.testing.assert_allclose(W[: spec.out_size, :insz], ref, atol=1e-12)
    # nothing scattered into the padding columns
    assert np.all(W[:, insz:] == 0)


def test_align_corners_scale():
    spec = make_axis_spec(10, 4, "bilinear", align_corners=True, antialias=False)
    assert spec.scale == pytest.approx(9 / 3)
    W = dense_matrix(spec, dtype=np.float64)
    # align_corners=True maps output 0 -> input 0 and output 3 -> input 9
    np.testing.assert_allclose(W[0, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(W[3, 9], 1.0, atol=1e-12)


def test_degenerate_sizes():
    for insz, outsz in [(1, 1), (1, 5), (5, 1)]:
        spec = make_axis_spec(insz, outsz, "bilinear")
        W = dense_matrix(spec, dtype=np.float64)
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-12)


def test_table_invariants_random_sweep():
    """Broad property sweep (SURVEY §4): for ~150 random (in,out,mode) pairs,
    rows sum to 1, window starts are monotone, tap counts respect the static
    bound, and the banded-tile reconstruction equals the dense matrix."""
    rng = np.random.default_rng(7)
    for _ in range(150):
        insz = int(rng.integers(1, 700))
        outsz = int(rng.integers(1, 700))
        mode = ["bilinear", "bicubic", "box", "lanczos3"][int(rng.integers(4))]
        spec = make_axis_spec(insz, outsz, mode)
        xmin, size, w = compute_tables(spec, dtype=np.float64)
        assert (size >= 1).all() and (size <= spec.ntaps).all()
        assert (np.diff(xmin) >= 0).all(), (insz, outsz, mode)
        assert (xmin >= 0).all() and (xmin + size <= insz).all()
        sums = w.sum(axis=1)
        np.testing.assert_allclose(sums[np.abs(sums) > 1e-12], 1.0, atol=1e-12)
        # banded tiles reconstruct the dense matrix exactly
        W = dense_matrix(spec, dtype=np.float64)
        bt = banded_tiles(spec, tile=128, dtype=np.float64, align=1, in_cap=insz)
        R = np.zeros_like(W)
        for t in range(bt.n_tiles):
            o0 = t * 128
            o1 = min(o0 + 128, outsz)
            seg = bt.band[t, :, : o1 - o0].T  # [out_tile, k_in]
            s = int(bt.starts[t])
            R[o0:o1, s : s + bt.k_in] += seg[:, : min(bt.k_in, insz - s)]
        np.testing.assert_allclose(R, W, atol=0)


def test_filter_sign_classifier():
    """The quantise-eligibility classifier is derived from the filter
    function, not a mode list: known-nonnegative filters pass, negative
    lobes fail, and a synthetic near-negative filter routes conservatively
    (the drift class VERDICT r2 flagged against crop.py's hand list)."""
    from interpolate_antialiasing_tpu.ops import filters as F

    for name in ("bilinear", "box", "nearest", "hamming", "triangle"):
        assert F.filter_is_nonnegative(name), name
    for name in ("bicubic", "bicubic075", "lanczos3", "cubic"):
        assert not F.filter_is_nonnegative(name), name

    def tiny_lobe(x, xp):  # max negative excursion -1e-9: must still fail
        ax = xp.abs(x)
        w = xp.where(ax < 1.0, 1.0 - ax, xp.zeros_like(ax))
        return w - xp.where(ax < 2.0, 1e-9, 0.0)

    F.FILTERS["_test_neglobe"] = F._FnFilter("_test_neglobe", 2.0, fn=tiny_lobe)
    try:
        F.filter_is_nonnegative.cache_clear()
        assert not F.filter_is_nonnegative("_test_neglobe")
    finally:
        del F.FILTERS["_test_neglobe"]
        F.filter_is_nonnegative.cache_clear()


def test_area_tables_exact():
    """Area-mode tables implement ATen's adaptive window rule exactly."""
    from interpolate_antialiasing_tpu.ops.weights import (
        compute_tables, dense_matrix, make_axis_spec,
    )

    for insz, outsz in [(10, 4), (7, 3), (438, 196), (13, 17), (5, 5)]:
        spec = make_axis_spec(insz, outsz, "area")
        xmin, size, w = compute_tables(spec, dtype=np.float64)
        for i in range(outsz):
            start = (i * insz) // outsz
            end = -(-((i + 1) * insz) // outsz)
            assert xmin[i] == start and size[i] == end - start, (insz, outsz, i)
            np.testing.assert_allclose(
                w[i, : size[i]], 1.0 / size[i], atol=0
            )
            assert (w[i, size[i]:] == 0).all()
        W = dense_matrix(spec, dtype=np.float64)
        np.testing.assert_allclose(W.sum(axis=1), 1.0, atol=1e-15)


def test_degenerate_axis_sizes_raise():
    """Non-positive in/out sizes raise a clear error at the table
    chokepoint (the reference's upsample_2d_common_check) instead of
    fabricating zeros or crashing inside numpy."""
    from interpolate_antialiasing_tpu.ops.weights import make_axis_spec

    import pytest

    for insz, outsz in [(0, 4), (4, 0), (-1, 4), (4, -3), (0, 0)]:
        with pytest.raises(ValueError, match="must be positive"):
            make_axis_spec(insz, outsz, "bilinear")
        with pytest.raises(ValueError, match="must be positive"):
            make_axis_spec(insz, outsz, "area")
