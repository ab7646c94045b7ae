"""On-chip probe: float64 dense vs banded XLA route crossover.

The TPU MXU has no f64 mode, so float64 resizes stay on XLA (emulated
double MACs).  Two formulations exist: the dense ``[out, in]`` matmul
per axis and the tile-compacted banded contraction (k_in-wide windows).
This probe measures both, plus the auto route, across geometries, and
writes ``data/f64_probe.json`` — the artifact behind
``ops/resize._pick_method_f64``'s threshold (docs/BENCHMARKS.md f64
section).  Reference analogue: the per-config result blocks the
reference keeps in README.md:413-425.

Run:  python benchmarks/f64_probe.py [--out data/f64_probe.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

_r = __import__('os').path
sys.path.insert(0, _r.dirname(_r.dirname(_r.abspath(__file__))))

# (batch, H, W, oh, ow) — per-axis table areas (in*out) spanning 1k .. 7M
WORKLOADS = [
    (64, 64, 48, 32, 24),
    (32, 256, 192, 128, 96),
    (16, 438, 906, 196, 320),   # the headline geometry
    (8, 768, 1024, 384, 512),
    (2, 1536, 1024, 700, 500),
    (2, 2160, 3840, 1080, 1920),  # 4K -> HD
]


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="data/f64_probe.json")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    import interpolate_antialiasing_tpu as ia
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    if jax.default_backend() != "tpu":
        print(json.dumps({"skipped": True, "reason": "not on tpu"}))
        return 0

    rng = np.random.default_rng(0)
    rows = []
    for b, H, W, oh, ow in WORKLOADS:
        x = jnp.asarray(rng.random((b, 1, H, W)), jnp.float64)
        row = {
            "batch": b, "in": [H, W], "out": [oh, ow],
            "axis_area_h": H * oh, "axis_area_w": W * ow,
        }
        base = None
        for backend in ("dense", "banded", "auto"):
            f = lambda t, bk=backend: ia.resize(t, (oh, ow), backend=bk)
            sec = device_time_per_call(f, x, iters=args.iters)
            row[f"{backend}_ms"] = round(sec * 1e3, 4)
            if backend == "dense":
                base = np.asarray(f(x))
            else:  # numerics: banded/auto must match dense bit-for-bit
                err = float(np.abs(np.asarray(f(x)) - base).max())
                row[f"{backend}_max_abs_vs_dense"] = err
        row["winner"] = min(("dense", "banded"), key=lambda k: row[f"{k}_ms"])
        row["auto_overhead_vs_best"] = round(
            row["auto_ms"] / min(row["dense_ms"], row["banded_ms"]), 3
        )
        rows.append(row)
        print(json.dumps(row))

    out = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "device": str(jax.devices()[0]),
        "iters": args.iters,
        "timing": "profiler-device-time",
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    # exit nonzero if the auto route leaves >5% on the table anywhere —
    # same discipline as benchmarks/retune.py for the tile models
    bad = [r for r in rows if r["auto_overhead_vs_best"] > 1.05]
    if bad:
        print("AUTO ROUTE MISPICKS:", json.dumps(bad))
        return 1
    print("f64 probe ok:", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
