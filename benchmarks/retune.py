"""Digest tile_h_sweep.py output into measured-best vs model-pick rows.

Usage:  python benchmarks/retune.py sweep.log [...]

Reads the JSON lines the sweep prints (one per forced width), groups by
workload, and prints the measured-fastest width next to the cost model's
own pick (the ``auto(N)`` row) with the slowdown the model's choice pays
if they differ.  This is the mechanical half of re-deriving
``_pick_tile_h`` / ``_pick_tile_w`` constants after a sweep — the
judgment half (adjusting ``ops/mxu_model.py``'s constants so the model
reproduces the measured optimum at every swept geometry, not just one)
stays with the operator.  Exits nonzero if any workload's model pick is
>3% slower than its measured best, so a sweep-then-retune session can't
silently ship a stale model.
"""

from __future__ import annotations

import json
import sys


def main(paths):
    rows = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    by_wl = {}
    for r in rows:
        if "ms" not in r:
            continue
        by_wl.setdefault(r["workload"], []).append(r)
    bad = 0
    for wl, rs in by_wl.items():
        key = "tile_w" if any("tile_w" in r for r in rs) else "tile_h"
        best = min(rs, key=lambda r: r["ms"])
        auto = next((r for r in rs if isinstance(r.get(key), str)), None)
        line = f"{wl}: best {key}={best[key]} @ {best['ms']:.4f} ms"
        if auto is not None:
            pay = (auto["ms"] - best["ms"]) / best["ms"] * 100
            line += f"; model {auto[key]} @ {auto['ms']:.4f} ms ({pay:+.1f}%)"
            if pay > 3.0:
                line += "  <-- RETUNE"
                bad += 1
        print(line)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or ["/tmp/onchip_r3/sweep_full.log"]))
