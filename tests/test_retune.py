"""benchmarks/retune.py digests sweep logs and must exit nonzero iff a
model pick is >3% slower than the measured best — the on-chip session
(benchmarks/onchip_r4.sh step 2) relies on that exit code to decide
whether staged tile defaults ship or revert, so pin it off-chip."""

import json
import subprocess
import sys
from pathlib import Path

_RETUNE = Path(__file__).resolve().parent.parent / "benchmarks" / "retune.py"


def _run(tmp_path, rows):
    log = tmp_path / "sweep.log"
    log.write_text(
        "# header noise\n"
        + "\n".join(json.dumps(r) for r in rows)
        + "\nnot json {\n"
    )
    return subprocess.run(
        [sys.executable, str(_RETUNE), str(log)],
        capture_output=True,
        text=True,
    )


def test_retune_ok_when_model_matches_best(tmp_path):
    rows = [
        {"workload": "headline", "tile_h": 128, "ms": 0.40},
        {"workload": "headline", "tile_h": 96, "ms": 0.37},
        {"workload": "headline", "tile_h": "auto(96)", "ms": 0.372},
        # W sweep grouped separately, model exactly best
        {"workload": "4k_stream_w", "tile_w": 128, "ms": 1.16},
        {"workload": "4k_stream_w", "tile_w": "auto(120)", "ms": 1.04},
        {"workload": "4k_stream_w", "tile_w": 120, "ms": 1.05},
    ]
    p = _run(tmp_path, rows)
    assert p.returncode == 0, p.stdout + p.stderr
    assert "RETUNE" not in p.stdout


def test_retune_flags_stale_model_pick(tmp_path):
    rows = [
        {"workload": "4k_stream_w", "tile_w": 96, "ms": 1.00},
        {"workload": "4k_stream_w", "tile_w": "auto(120)", "ms": 1.10},
        # an error row (failed forced width) must be ignored, not crash
        {"workload": "4k_stream_w", "tile_w": 64, "error": "RESOURCE_EXHAUSTED"},
    ]
    p = _run(tmp_path, rows)
    assert p.returncode == 1, p.stdout + p.stderr
    assert "RETUNE" in p.stdout


def test_retune_tolerates_model_within_3pct(tmp_path):
    rows = [
        {"workload": "headline", "tile_h": 64, "ms": 1.000},
        {"workload": "headline", "tile_h": "auto(96)", "ms": 1.029},
    ]
    p = _run(tmp_path, rows)
    assert p.returncode == 0, p.stdout + p.stderr
