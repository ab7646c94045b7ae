"""Native (C++) table builder must be bit-identical to the numpy spec."""

import numpy as np
import pytest

from interpolate_antialiasing_tpu.native import compute_tables_native, native_available
from interpolate_antialiasing_tpu.ops.weights import compute_tables, make_axis_spec

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "box", "lanczos3"])
@pytest.mark.parametrize(
    "insz,outsz", [(906, 320), (438, 196), (10, 4), (4, 10), (1, 1), (906, 1200)]
)
@pytest.mark.parametrize("ac", [False, True])
def test_native_matches_numpy(mode, insz, outsz, ac):
    spec = make_axis_spec(insz, outsz, mode, antialias=True, align_corners=ac)
    xm, sz, w = compute_tables(spec, dtype=np.float64)
    res = compute_tables_native(insz, outsz, mode, True, ac)
    assert res is not None
    xm_n, sz_n, w_n = res
    np.testing.assert_array_equal(xm_n, xm)
    np.testing.assert_array_equal(sz_n, sz)
    # numpy normalises with pairwise summation, the C++ loop sequentially:
    # equal to ~1 ulp, not bit-identical, for windows wider than 8 taps.
    np.testing.assert_allclose(w_n, w, rtol=0, atol=1e-14)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_native_non_aa(mode):
    spec = make_axis_spec(50, 80, mode, antialias=False)
    xm, sz, w = compute_tables(spec, dtype=np.float64)
    xm_n, sz_n, w_n = compute_tables_native(50, 80, mode, False, False)
    np.testing.assert_array_equal(xm_n, xm)
    np.testing.assert_allclose(w_n, w, rtol=0, atol=1e-14)
