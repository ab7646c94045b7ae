"""On-chip crossover sweep for the per-axis backend router.

``ops/resize.py::_pick_method`` routes a single 1-D pass to dense /
gather / pallas.  Round 2 shipped the thresholds (`in_size >= 512 and
out_size >= 128` -> pallas; dense below ``in*out <= 2^22``) as unbenched
magic — this sweep measures all three backends per (in, out) axis shape
on the real chip so the thresholds can be cited to data (VERDICT round-2
weak item 5).  The per-axis router is what ``resize_nd`` and
mid-pipeline fallbacks hit; the 2-D plane gates carry their own
measurements (docs/BENCHMARKS.md).

Geometry: batch of f32 planes ``[B, R, in_size]`` resized along the last
axis to ``out_size`` (R x B chosen to keep ~32 Mpix of input work per
shape so rates are steady-state).  Prints one JSON row per (shape,
backend): profiler device ms and input-Mpix/s.

Run:  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/router_sweep.py
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# runnable as `python benchmarks/<this>.py` without pre-setting the
# repo root on PYTHONPATH (script-dir is on sys.path, cwd is not)
_r = __import__('os').path
__import__('sys').path.insert(0, _r.dirname(_r.dirname(_r.abspath(__file__))))


# (in_size, out_size): spans the router's decision space — small/large in,
# shrink/grow, both sides of each current threshold (512 in, 128 out,
# 2^22 in*out).
SHAPES = [
    (64, 32),
    (128, 64),
    (256, 128),
    (256, 512),
    (512, 128),
    (512, 256),
    (511, 127),      # just under both pallas gates
    (906, 320),      # headline W axis
    (1024, 256),
    (2048, 512),
    (4096, 1024),    # in*out = 2^22: dense cutoff boundary
    (8192, 1024),    # above the dense cutoff
    (4096, 4096),
    (1024, 2048),    # upsample past the cutoff
]


def run_sweep(target_mpix: float = 32.0):
    import jax
    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.ops.resize_xla import (
        resize_axis_dense,
        resize_axis_gather,
    )
    from interpolate_antialiasing_tpu.ops.pallas_resize import (
        pallas_supported,
        resize_axis_pallas,
    )
    from interpolate_antialiasing_tpu.ops.weights import make_axis_spec
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    rows = []
    for in_size, out_size in SHAPES:
        # keep per-shape input work roughly constant
        nrows = max(256, int(target_mpix * 1e6 / in_size / 8) * 8)
        nrows = min(nrows, 65536)
        spec = make_axis_spec(in_size, out_size, "bilinear", antialias=True)
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((8, nrows // 8, in_size), np.float32)
        )

        backends = {
            "dense": lambda v, s=spec: resize_axis_dense(v, s, -1),
            "gather": lambda v, s=spec: resize_axis_gather(v, s, -1),
        }
        if pallas_supported(x, spec, x.ndim - 1):
            backends["pallas"] = lambda v, s=spec: resize_axis_pallas(
                v, s, x.ndim - 1
            )

        for name, fn in backends.items():
            try:
                dev_s = device_time_per_call(fn, x, iters=30)
            except Exception as e:  # noqa: BLE001 - report and continue
                rows.append({"in": in_size, "out": out_size,
                             "backend": name, "error": str(e)[:120]})
                continue
            if not dev_s:
                rows.append({"in": in_size, "out": out_size,
                             "backend": name, "error": "no device time"})
                continue
            mpix = 8 * (nrows // 8) * in_size / dev_s / 1e6
            rows.append({
                "in": in_size, "out": out_size, "backend": name,
                "rows": 8 * (nrows // 8),
                "ms": round(dev_s * 1e3, 4),
                "in_Mpix_s": round(mpix, 1),
            })
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None, help="also write rows to a JSON file")
    args = p.parse_args()
    rows = run_sweep()
    # winner table for the docs
    by_shape: dict[tuple, dict] = {}
    for r in rows:
        if "ms" in r:
            by_shape.setdefault((r["in"], r["out"]), {})[r["backend"]] = r["ms"]
    for (i, o), d in by_shape.items():
        best = min(d, key=d.get)
        print(json.dumps({"in": i, "out": o, "winner": best, **d}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
