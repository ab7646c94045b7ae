"""Digest an onchip_r4.sh session directory into one actionable report.

Usage:  python benchmarks/session_digest.py [/tmp/onchip_r4]

Reads the per-step logs the session wrote and prints, in order:
  * retune verdict (model picks vs measured best, the ship/revert call),
  * release-gate verdict + headline + bf16 config-5 rows,
  * roofline rows,
  * epilogue floor brackets (store_only / recombine_only / mxu_min ->
    [floor_lo, floor_hi] vs the production value_inter),
  * sharded gather-vs-digit numbers (the promotion default decision),
  * the driver bench line,
plus the list of repo locations each number feeds (docs/README/data).

Pure log reader — runs anywhere, no jax import.
"""

from __future__ import annotations

import json
import pathlib
import sys


def _rows(path: pathlib.Path):
    if not path.exists():
        return []
    out = []
    for line in path.read_text().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def main(outdir: str = "/tmp/onchip_r4") -> int:
    d = pathlib.Path(outdir)
    if not d.exists():
        print(f"no session dir at {d}")
        return 1

    print(f"== session digest: {d} ==\n")

    retune = d / "retune.log"
    if retune.exists():
        print("-- retune (must show no RETUNE markers) --")
        print(retune.read_text().strip() or "(empty)")
        print()

    gate = _rows(d / "release_gate.log")
    for r in gate:
        if "passed" in r:
            print(f"-- release gate: passed={r['passed']} --")
            h = r.get("headline") or {}
            print(f"  headline: {h.get('device_ms_per_batch')} ms/batch, "
                  f"{h.get('out_mpix_per_s')} Mpix/s")
            b = r.get("bf16_video_config5") or {}
            print(f"  bf16 config5: {b.get('device_ms_per_batch')} ms/batch, "
                  f"{b.get('out_mpix_per_s')} Mpix/s, "
                  f"err={b.get('max_abs_err_vs_f32')}")
            be = r.get("byte_exact_sweep") or {}
            print(f"  byte-exact sweep: {be.get('n_cases')} cases, "
                  f"all_exact={be.get('all_exact')}")
            print()

    roof = _rows(d / "roofline.log")
    if roof:
        print("-- roofline --")
        for r in roof:
            wl = r.get("workload") or r.get("probe")
            if wl:
                keys = [k for k in ("device_ms", "out_mpix_per_s",
                                    "pct_of_ceiling",
                                    "pct_of_bf16_matmul_ceiling") if k in r]
                print(f"  {wl}: " + ", ".join(f"{k}={r[k]}" for k in keys))
        print()

    ep = _rows(d / "epilogue.log")
    for r in ep:
        if r.get("probe") == "components":
            lo = r.get("ideal_overlap_floor_ms")
            hi = r.get("ideal_overlap_floor_hi_ms")
            print("-- epilogue components --")
            for k in ("arith_ms", "value_inter_ms", "split_h_ms",
                      "no_shift_ms", "store_only_ms", "recombine_only_ms",
                      "mxu_min_ms"):
                print(f"  {k}: {r.get(k)}")
            print(f"  dual-issue floor bracket: [{lo}, {hi}] "
                  f"(production = value_inter)")
            print()
        elif r.get("probe") == "overlap":
            print(f"-- epilogue overlap: mxu={r.get('mxu_only_ms')} "
                  f"vpu={r.get('vpu_only_ms')} mix={r.get('interleaved_ms')} "
                  f"sum={r.get('sum_ms')} --\n")

    sd = _rows(d / "sharded_digit.log")
    if sd:
        print("-- sharded route: gather vs digit MXU --")
        for r in sd:
            print(f"  {r.get('probe')}: {r.get('device_ms')} ms "
                  f"(exact={r.get('byte_exact_vs_each_other')})")
        print()

    bench = _rows(d / "bench.log")
    for r in bench:
        if "vs_baseline" in r:
            print(f"-- bench.py: {r.get('value')} Mpix/s "
                  f"({r.get('vs_baseline')}x baseline), "
                  f"skipped={r.get('skipped', False)} --\n")

    print("== where the numbers go ==")
    print("  headline + 4K + config5 -> README.md Performance, "
          "docs/BENCHMARKS.md, docs/STATUS.md header")
    print("  release_gate.json       -> cp into data/ and commit")
    print("  retune verdict          -> validate/revert ops/mxu_model "
          "constants + staged tile picks; flip FLOAT_W_MODEL_DEFAULT only "
          "if the bf16 sweeps validate the model")
    print("  epilogue bracket        -> DESIGN.md 'epilogue floor' section "
          "(measurement replaces the argument)")
    print("  sharded digit rows      -> decide resize_sharded_pil_exact's "
          "TPU default (halo.py) + STATUS.md")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:] or ["/tmp/onchip_r4"]))
