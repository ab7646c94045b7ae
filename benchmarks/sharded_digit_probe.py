"""On-chip probe: sharded byte-exact local passes, gather vs digit MXU.

The sharded route (parallel/halo.py::resize_sharded_pil_exact) has two
byte-identical local-pass implementations: XLA gather+int32 MAC (default)
and the int8 digit MXU promotion (use_tpu_kernels).  Multi-chip hardware
is not available to this box, but the promotion's KERNELS are exactly
measurable on one chip via the n=1 degenerate tables (halo=0, one shard
owning the whole image) — the number that decides whether the promotion
becomes the TPU default.

Prints one JSON line per measurement (profiler device time).

Run on the real chip:  python benchmarks/sharded_digit_probe.py
"""

from __future__ import annotations

import json

import numpy as np

# runnable as `python benchmarks/<this>.py` without pre-setting the
# repo root on PYTHONPATH (script-dir is on sys.path, cwd is not)
_r = __import__('os').path
__import__('sys').path.insert(0, _r.dirname(_r.dirname(_r.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _int_tables,
        _needs_clip,
        _pass_last_int_banded,
        digit_pass_mid_dynamic,
    )
    from interpolate_antialiasing_tpu.parallel.halo import (
        _digit_halo_tables,
        _int_halo_tables,
    )
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    rng = np.random.default_rng(0)
    # 4K-frame geometry, the sharded route's serving shape class
    H, W, OH, OW = 2160, 3840, 1080, 1920
    B = 8
    mode = "bilinear"

    # ----- H pass: gather+MAC vs digit MXU (n=1 tables) -----
    # the H pass consumes the quantised [B, H, OW] intermediate
    inter = jnp.asarray(rng.integers(0, 256, (B, H, OW), np.uint8))
    _, row_starts, Wsh = _int_halo_tables(H, OH, mode, 1)
    rs_d, wsh_d = jnp.asarray(row_starts[0]), jnp.asarray(Wsh[0])
    _, dstarts, dbands, dct = _digit_halo_tables(H, OH, mode, 1)
    ds_d, db_d, dc_d = (jnp.asarray(dstarts[0]), jnp.asarray(dbands[0]),
                        jnp.asarray(dct[0]))
    clip = _needs_clip(H, OH, mode)

    gather_h = jax.jit(lambda t: jnp.moveaxis(
        _pass_last_int_banded(jnp.moveaxis(t, -2, -1), rs_d, wsh_d), -1, -2))
    digit_h = jax.jit(lambda t: digit_pass_mid_dynamic(
        t, ds_d, db_d, dc_d, OH, clip=clip))

    ref = np.asarray(gather_h(inter))
    got = np.asarray(digit_h(inter))
    exact = bool((ref == got).all())
    for name, f in (("h_gather_mac", gather_h), ("h_digit_mxu", digit_h)):
        sec = device_time_per_call(f, inter, iters=20)
        print(json.dumps({
            "probe": name,
            "workload": f"u8 b{B} {H}x{OW}->{OH}x{OW} H pass",
            "device_ms": round(sec * 1e3, 4) if sec else None,
            "byte_exact_vs_each_other": exact,
        }), flush=True)

    # ----- W pass: gather+MAC vs fused-identity digit kernels -----
    from interpolate_antialiasing_tpu.ops.pil_exact import (
        _resize_pil_exact_streamed,
        pil_exact_streamed_supported,
    )

    x = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    xmin_w, Wb_w = _int_tables(W, OW, mode)
    xw_d, wb_d = jnp.asarray(xmin_w), jnp.asarray(Wb_w)
    gather_w = jax.jit(lambda t: _pass_last_int_banded(t, xw_d, wb_d))
    ok = pil_exact_streamed_supported((B, H, W), H, OW, mode)
    fused_w = jax.jit(lambda t: _resize_pil_exact_streamed(t, H, OW, mode))
    refw = np.asarray(gather_w(x))
    exact_w = bool((np.asarray(fused_w(x)) == refw).all()) if ok else None
    rows = [("w_gather_mac", gather_w, True)]
    if ok:
        rows.append(("w_fused_identity_digit", fused_w, True))
    for name, f, _ in rows:
        sec = device_time_per_call(f, x, iters=20)
        print(json.dumps({
            "probe": name,
            "workload": f"u8 b{B} {H}x{W}->{H}x{OW} W pass",
            "device_ms": round(sec * 1e3, 4) if sec else None,
            "byte_exact_vs_each_other": exact_w,
        }), flush=True)


if __name__ == "__main__":
    main()
