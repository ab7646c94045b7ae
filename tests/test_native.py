"""Native (C++) table builder must be bit-identical to the numpy spec."""

import numpy as np
import pytest

from interpolate_antialiasing_tpu.native import compute_tables_native, native_available
from interpolate_antialiasing_tpu.ops.weights import compute_tables, make_axis_spec

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain available"
)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic", "box", "lanczos3", "hamming"])
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


def test_profile_binary_selftest(tmp_path):
    """Standalone native profiling binary (reference profiling/main.cpp):
    builds, runs, and its resize matches the numpy oracle bit-for-bit-ish."""
    import shutil
    import subprocess
    from pathlib import Path

    src = Path(__file__).resolve().parent.parent / "csrc"
    cc = shutil.which("c++") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C++ compiler")
    exe = tmp_path / "aa_profile"
    subprocess.run(
        [cc, "-O2", "-o", str(exe), str(src / "profile_main.cpp"),
         str(src / "aa_tables.cpp")],
        check=True, capture_output=True, timeout=180,
    )
    out = subprocess.run([str(exe), "--selftest"], check=True,
                         capture_output=True, text=True, timeout=60).stdout
    mean = float(out.split("mean=")[1].split()[0])

    # same ramp image through the Python oracle
    import numpy as np

    from interpolate_antialiasing_tpu.ops.weights import dense_matrix, make_axis_spec

    C, H, W, OH, OW = 3, 57, 83, 24, 31
    x = (np.arange(C * H * W, dtype=np.int64) * 7919 % 256).astype(np.float64)
    x = x.reshape(C, H, W)
    Wh = dense_matrix(make_axis_spec(H, OH, "bilinear"), dtype=np.float64)
    Ww = dense_matrix(make_axis_spec(W, OW, "bilinear"), dtype=np.float64)
    ref = np.einsum("oi,cij,jk->cok", Wh, x, Ww.T)
    assert abs(mean - ref.mean()) < 1e-9

    # bench mode emits one JSON line (same contract as benchmarks/run_all.py)
    import json

    line = subprocess.run([str(exe), "64", "96", "32", "48", "3"], check=True,
                          capture_output=True, text=True, timeout=60).stdout
    rec = json.loads(line)
    assert rec["out_Mpix_s"] > 0 and rec["ntaps_w"] >= 3
