#!/bin/bash
# Round-4 on-chip session (VERDICT r3 asks #1/#4/#5/#7): one command the
# moment the TPU tunnel returns.  Order matters — the sweeps come first so
# retune can validate (or tell us to revert) the staged round-3 tile
# defaults BEFORE the gate/roofline artifacts are recorded with them live.
#
#   bash benchmarks/onchip_r4.sh [outdir]        (default /tmp/onchip_r4)
#
# Every step logs JSON lines; nothing here edits the repo — reading the
# logs, running retune, and committing fresh data/ artifacts stays with
# the operator.
set -u
OUT=${1:-/tmp/onchip_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# benchmark scripts import the package from the repo root; the default
# session PYTHONPATH only carries the TPU plugin site dir
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

step() {
  name=$1; shift
  echo "=== $name: $* (-> $OUT/$name.log)"
  # the full tile sweep (dozens of forced-width compiles on a tunnel
  # that can stall minutes) gets double the budget of the other steps
  t=3000; [ "$name" = sweep_full ] && t=6000
  timeout "$t" "$@" >"$OUT/$name.log" 2>"$OUT/$name.err"
  rc=$?
  tail -3 "$OUT/$name.log"
  echo "=== $name rc=$rc"
  return $rc
}

# 0. is the chip actually there?
if ! timeout 300 python -c "import jax; print(jax.devices())"; then
  echo "TPU backend unavailable — aborting."; exit 1
fi

# 1. tile sweeps (H, digit-W, float-H, float-W) — ground truth for every
#    staged knob
step sweep_full python benchmarks/tile_h_sweep.py

# 2. retune digest: exits nonzero if any model pick is >3% off measured.
#    HARD STOP on failure: the remaining steps record the artifacts the
#    round will commit, and recording them while a staged tile default is
#    measurably stale is exactly what the step ordering exists to prevent.
if ! step retune python benchmarks/retune.py "$OUT/sweep_full.log"; then
  echo "retune flagged a stale model pick (see $OUT/retune.log) —"
  echo "fix ops/mxu_model.py constants or revert the pick, then rerun."
  exit 2
fi

# 3. release gate (byte-exactness x 40 + layouts + headline + bf16
#    config 5) -> artifact in the SESSION dir; copy to data/ only when
#    committing (this script edits nothing in the repo)
step release_gate python benchmarks/release_gate.py --out "$OUT/release_gate.json"

# 4. roofline incl. the new bf16 config-5 audit -> cite in BENCHMARKS.md
step roofline python benchmarks/roofline.py

# 5. bf16 MXU geometry probes (does bf16 quantise K to 128-deep passes
#    like int8? decides the float _pick_tile_w model, ask #5)
step mxu_geometry python benchmarks/mxu_geometry.py

# 6. epilogue probe (overlap + component split for the 0.10 ms gap, ask #4)
step epilogue python benchmarks/epilogue_probe.py

# 6b. sharded-route local kernels, gather vs digit MXU (n=1 tables —
#     decides whether the round-4 promotion becomes the TPU default)
step sharded_digit python benchmarks/sharded_digit_probe.py

# 6c. f64 dense/banded crossover (validates _pick_method_f64's
#     threshold; exits nonzero if the auto route leaves >5% anywhere)
step f64_probe python benchmarks/f64_probe.py --out "$OUT/f64_probe.json"

# 7. router crossover re-check + full workload matrix + driver bench
step router python benchmarks/router_sweep.py
step run_all python benchmarks/run_all.py
step bench python bench.py

echo "Session logs in $OUT — next: cp $OUT/release_gate.json data/,"
echo "update"
echo "docs/BENCHMARKS.md + README.md numbers, commit data/ artifacts."
