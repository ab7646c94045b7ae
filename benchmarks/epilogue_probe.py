"""Microbenchmark: where does the digit kernel's epilogue time go?

Round-2's roofline measured the headline int8 digit kernel epilogue-bound
(0.406 ms/batch actual vs 0.237 ms stubbed-epilogue floor).  Round 3's
first attempt — lag-1 software-pipelining the VPU recombine against the
next MXU matmul at the trace level — changed nothing (0.401 ms), so this
probe answers the questions that decide what CAN work:

  1. ``overlap``: inside one Mosaic kernel, does independent VPU
     elementwise work overlap in-flight MXU matmuls at all?  Three
     kernels at matched shapes: matmul-chain only, epilogue-chain only,
     and both interleaved (the VPU work independent of the matmuls).
     ``t_mix ≈ max(t_mxu, t_vpu)`` ⇒ the scheduler dual-issues and the
     fix is restructuring for independence; ``t_mix ≈ t_mxu + t_vpu`` ⇒
     VPU and MXU serialize at op granularity and the only wins are
     fewer VPU ops / elements.
  2. ``components``: the headline-geometry kernel with the epilogue
     progressively stubbed — full / arithmetic-without-clip /
     store-only (int32→int8 convert + store, no recombine) — separating
     recombine arithmetic from the int32→int8 pack+store relayout.

Run on the real chip:  python benchmarks/epilogue_probe.py
Prints one JSON line per measurement (profiler device time, the
methodology docs/STATUS.md prescribes).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

import numpy as np

# runnable as `python benchmarks/epilogue_probe.py` without needing the
# repo root pre-set on PYTHONPATH (script-dir is on sys.path, cwd is not)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _device_ms(fn, iters=50):
    import jax
    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.utils.timing import (
        device_seconds_from_trace,
    )

    @jax.jit
    def run(x):
        def body(i, c):
            y = fn(c)
            s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
            return c.at[(0,) * c.ndim].add(s.astype(c.dtype))

        x = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(x.astype(jnp.float32)) * jnp.float32(1e-30)

    return run


def probe_overlap(reps: int = 16):
    """Matmul-only vs VPU-only vs interleaved-independent, one kernel each.

    Shapes mimic one W-pass tile at headline geometry: [440, 376] int8 @
    [376, 384] int8 -> int32, and a 6-op int32 elementwise chain on an
    INDEPENDENT [440, 384] int32 buffer (so no data dependency blocks
    dual-issue).  Each rep's matmul uses a DISTINCT lhs slice — a
    loop-invariant matmul is CSE'd to one (first probe run measured 8
    GMACs in 5.3 us, i.e. nothing executed).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, K, N = 440, 376, 384
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-127, 128, (reps, M, K), np.int8))
    b = jnp.asarray(rng.integers(-127, 128, (K, N), np.int8))
    e = jnp.asarray(rng.integers(-1000, 1000, (M, N), np.int32))

    def vpu_chain(v):
        # the recombine's op mix: 2 shifts, 3 adds, 1 arithmetic shift
        w = (
            jax.lax.shift_left(v, jnp.int32(16))
            + jax.lax.shift_left(v, jnp.int32(8))
            + v
            + jnp.int32(12345)
        )
        return jax.lax.shift_right_arithmetic(w, jnp.int32(2)) + v

    def kern(a_ref, b_ref, e_ref, o_ref, s_ref, *, do_mxu, do_vpu):
        acc = jnp.zeros((M, N), jnp.int32)
        v = e_ref[...]
        for r in range(reps):
            if do_mxu:
                acc += jax.lax.dot_general(
                    a_ref[r], b_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            if do_vpu:
                v = vpu_chain(v)
        s_ref[...] = acc
        o_ref[...] = v

    def build(do_mxu, do_vpu):
        f = pl.pallas_call(
            functools.partial(kern, do_mxu=do_mxu, do_vpu=do_vpu),
            out_shape=(
                jax.ShapeDtypeStruct((M, N), jnp.int32),
                jax.ShapeDtypeStruct((M, N), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=jax.default_backend() != "tpu",
        )
        return lambda x: f(a, b, x)[1]

    out = {}
    from interpolate_antialiasing_tpu.utils.timing import (
        device_seconds_from_trace,
    )

    for name, mx, vp in (("mxu_only", True, False), ("vpu_only", False, True),
                         ("interleaved", True, True)):
        r = _device_ms(build(mx, vp), iters=20)
        float(r(e))
        dev = device_seconds_from_trace(lambda: float(r(e)))
        out[name + "_ms"] = round(dev * 1e3 / 20, 4) if dev else None
    s = (out.get("mxu_only_ms") or 0) + (out.get("vpu_only_ms") or 0)
    out["sum_ms"] = round(s, 4)
    # the MXU chain at the int8 ceiling (197 TMAC/s) would take
    # reps * M*K*N / 197e12 seconds; report for context
    out["mxu_ceiling_ms"] = round(reps * M * K * N / 197e12 * 1e3, 4)
    return {"probe": "overlap", "reps_per_call": reps, **out}


def probe_components(B: int = 192, iters: int = 30,
                     geom: tuple[int, int, int, int] | None = None):
    """Headline-geometry digit kernel with the epilogue progressively
    stubbed.  Variants share every matmul and store; only the epilogue
    arithmetic differs — byte-exactness is NOT preserved in the stubs
    (perf probe only).  ``B``/``iters``/``geom`` shrink for the --smoke
    trace check of every variant off-chip (interpret mode at headline
    geometry is minutes per variant); measurements use the defaults."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from interpolate_antialiasing_tpu.ops.pil_exact import (
        PRECISION_BITS,
        _digit_tiles,
        _pil_vmem_bytes,
        _PIL_VMEM_BUDGET,
    )

    H, W, OH, OW = geom or (438, 906, 196, 320)
    btw, bandsw, ctw = _digit_tiles(W, OW, "bilinear")
    bth, bandsh, cth = _digit_tiles(H, OH, "bilinear")
    bsz = 1
    for cand in range(8, 0, -1):
        if B % cand == 0 and _pil_vmem_bytes(
            H, W, OH, OW, btw, bth, cand
        ) <= _PIL_VMEM_BUDGET:
            bsz = cand
            break

    def kern(x_ref, bw_ref, bh_ref, cw_ref, ch_ref, o_ref, scratch,
             *, variant):
        for bi in range(bsz):
            xs = jax.lax.bitcast_convert_type(
                x_ref[bi] ^ jnp.uint8(128), jnp.int8
            )
            wtiles = []
            S_shared = None
            for t, s in enumerate(int(v) for v in btw.starts):
                if variant == "recombine_only":
                    # ONE real matmul per pass, reused by every tile's
                    # epilogue: epilogue element count, stores and data
                    # dependencies are unchanged, matmul count collapses —
                    # this is the serial VPU-side time of the kernel.
                    # Together with store_only (all matmuls, no recombine)
                    # it bounds what perfect MXU/VPU dual-issue could
                    # reach: t_ideal = max(store_only, recombine_only).
                    if S_shared is None:
                        S_shared = jax.lax.dot_general(
                            xs[:, :btw.k_in], bw_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                    S = S_shared
                elif variant == "mxu_min":
                    # CSE-proof twin of recombine_only: every tile keeps a
                    # DISTINCT matmul (different weights + window, so no
                    # scheduler can dedupe the downstream epilogues) but
                    # the contraction is truncated to one 128-deep MXU
                    # pass.  Brackets the serial VPU time from above:
                    # mxu_min_ms = full per-tile epilogues + n_tiles
                    # single-pass matmuls.
                    kk = min(128, btw.k_in)
                    S = jax.lax.dot_general(
                        xs[:, s : s + kk], bw_ref[t][:kk],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                else:
                    S = jax.lax.dot_general(
                        xs[:, s : s + btw.k_in], bw_ref[t],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                if variant == "store_only":
                    v = S[:, :128]
                else:  # arith / value_inter (the full clip-free epilogue)
                    ct1 = cw_ref[t] - jnp.int32(128 << PRECISION_BITS)
                    acc = (
                        jax.lax.shift_left(S[:, 256:], jnp.int32(16))
                        + jax.lax.shift_left(S[:, 128:256], jnp.int32(8))
                        + S[:, :128]
                        + ct1[None, :]
                    )
                    v = jax.lax.shift_right_arithmetic(
                        acc, jnp.int32(PRECISION_BITS)
                    )
                if variant in ("value_inter", "split_h"):
                    # the intermediate stays an SSA VALUE — no scratch ref,
                    # so no conservative memory-dependency ordering can
                    # serialize epilogues against matmuls
                    wtiles.append(v.astype(jnp.int8))
                else:
                    scratch[bi, :, t * 128 : (t + 1) * 128] = (
                        v.astype(jnp.int8)
                    )
            if variant == "split_h":
                # one H matmul per (row tile, W-tile column group): each
                # depends on a SINGLE W epilogue, so H(t, j=0) can issue
                # before W tile 2's epilogue completes — finer dataflow
                # for the scheduler, and no lane-concat relayout.
                # NB: first run of this variant measured 0.237 ms — an
                # ARTIFACT: wtiles was only populated on the value_inter
                # branch, so the whole H pass traced away.  Fixed below
                # (wtiles is filled for split_h too).
                for t, s in enumerate(int(v) for v in bth.starts):
                    rows = min(128, OH - t * 128)
                    for j, wt in enumerate(wtiles):
                        S = jax.lax.dot_general(
                            bh_ref[t], wt[s : s + bth.k_in, :],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )  # [3*128, 128]
                        acc = (
                            jax.lax.shift_left(S[256:], jnp.int32(16))
                            + jax.lax.shift_left(S[128:256], jnp.int32(8))
                            + S[:128]
                            + ch_ref[t][:, None]
                        )
                        u = jax.lax.shift_right_arithmetic(
                            acc, jnp.int32(PRECISION_BITS)
                        )
                        lo = j * 128
                        hi = min((j + 1) * 128, OW)
                        if lo >= OW:
                            continue
                        o_ref[bi, t * 128 : t * 128 + rows, lo:hi] = (
                            u[:rows, : hi - lo].astype(jnp.uint8)
                        )
                continue
            if variant == "value_inter":
                inter = jnp.concatenate(wtiles, axis=1)
            S_shared = None
            for t, s in enumerate(int(v) for v in bth.starts):
                win = (
                    inter[s : s + bth.k_in, :]
                    if variant == "value_inter"
                    else scratch[bi, s : s + bth.k_in, :]
                )
                if variant == "recombine_only":
                    if S_shared is None:
                        S_shared = jax.lax.dot_general(
                            bh_ref[0], scratch[bi, : bth.k_in, :],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        )
                    S = S_shared
                elif variant == "mxu_min":
                    kk = min(128, bth.k_in)
                    S = jax.lax.dot_general(
                        bh_ref[t][:kk], scratch[bi, s : s + kk, :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                else:
                    S = jax.lax.dot_general(
                        bh_ref[t], win,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                if variant == "store_only":
                    u = S[:128]
                elif variant == "no_shift":
                    u = S[:128] + S[128:256] + S[256:] + ch_ref[t][:, None]
                else:
                    acc = (
                        jax.lax.shift_left(S[256:], jnp.int32(16))
                        + jax.lax.shift_left(S[128:256], jnp.int32(8))
                        + S[:128]
                        + ch_ref[t][:, None]
                    )
                    u = jax.lax.shift_right_arithmetic(
                        acc, jnp.int32(PRECISION_BITS)
                    )
                rows = min(128, OH - t * 128)
                o_ref[bi, t * 128 : t * 128 + rows, :OW] = (
                    u[:rows, :OW].astype(jnp.uint8)
                )

    def build(variant):
        return pl.pallas_call(
            functools.partial(kern, variant=variant),
            out_shape=jax.ShapeDtypeStruct((B, OH, OW), jnp.uint8),
            grid=(B // bsz,),
            in_specs=[
                pl.BlockSpec((bsz, H, W), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((btw.n_tiles, btw.k_in, 3 * 128),
                             lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bth.n_tiles, bth.k_in, 3 * 128),
                             lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((btw.n_tiles, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bth.n_tiles, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bsz, OH, OW), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bsz, H, btw.out_padded), jnp.int8)
            ],
            interpret=jax.default_backend() != "tpu",
        )

    import jax.numpy as jnp2

    rng = np.random.default_rng(0)
    x = jnp2.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    bw = jnp2.asarray(bandsw)
    bh = jnp2.asarray(bandsh)
    cw = jnp2.asarray(ctw)
    ch = jnp2.asarray(cth)

    out = {"probe": "components", "bsz": bsz}
    from interpolate_antialiasing_tpu.utils.timing import (
        device_seconds_from_trace,
    )

    for variant in ("arith", "value_inter", "split_h", "no_shift",
                    "store_only", "recombine_only", "mxu_min"):
        f = build(variant)
        g = _device_ms(lambda t, f=f: f(t, bw, bh, cw, ch), iters=iters)
        float(g(x))
        dev = device_seconds_from_trace(lambda: float(g(x)))
        out[variant + "_ms"] = round(dev * 1e3 / iters, 4) if dev else None
    # In-principle dual-issue floor: a scheduler that fully hid the VPU
    # recombine under the matmuls could not beat the longer of the two
    # one-sided kernels.  recombine_only is the serial-VPU LOWER bound
    # (its identical per-tile subexpressions are CSE-prone); mxu_min —
    # distinct single-pass matmuls, full epilogues — is the CSE-proof
    # UPPER bracket.  Compare value_inter (production trace) against
    # [floor_lo, floor_hi] when arguing how much gap is closable.
    if out.get("store_only_ms") and out.get("recombine_only_ms"):
        out["ideal_overlap_floor_ms"] = round(
            max(out["store_only_ms"], out["recombine_only_ms"]), 4
        )
    if out.get("store_only_ms") and out.get("mxu_min_ms"):
        out["ideal_overlap_floor_hi_ms"] = round(
            max(out["store_only_ms"], out["mxu_min_ms"]), 4
        )
    return out


def probe_int16(B: int = 192, iters: int = 30,
                geom: tuple[int, int, int, int] | None = None):
    """2-digit s16/s8 weight split at headline geometry: measures the
    MXU/VPU trade DESIGN.md's epilogue-floor section leaves un-shipped.

    The production kernel splits 22-bit Pillow weights into THREE int8
    digits (3x128 result lanes, 2-shift+3-add recombine).  This variant
    splits them into an s16 hi digit (bits 8..21) and a balanced s8 lo
    digit: per tile TWO matmuls (int16 pixels x int16 hi weights; int8
    pixels x int8 lo weights), 2x128 result lanes, and a 1-shift+2-add
    recombine — ~40% fewer VPU epilogue ops and 2/3 the result lanes, at
    the cost of whatever the MXU charges for the s16 operand (it has no
    native s16 mode; Mosaic decomposes — the probe measures the real
    rate, which is the whole question).  Compare its `int16_ms` against
    probe_components' `value_inter_ms`: if smaller on chip, the
    production 2-digit kernel is worth building.  Falls back to a
    structured error row if Mosaic rejects the s16 dot."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from interpolate_antialiasing_tpu.ops.pil_exact import (
        PRECISION_BITS,
        _digit_tiles,
        _pil_vmem_bytes,
        _PIL_VMEM_BUDGET,
    )

    H, W, OH, OW = geom or (438, 906, 196, 320)
    btw, bandsw, ctw = _digit_tiles(W, OW, "bilinear")
    bth, bandsh, cth = _digit_tiles(H, OH, "bilinear")
    bsz = 1
    for cand in range(8, 0, -1):
        if B % cand == 0 and _pil_vmem_bytes(
            H, W, OH, OW, btw, bth, cand
        ) <= _PIL_VMEM_BUDGET:
            bsz = cand
            break

    def two_digit(bands3):
        """[n_tiles, k, 3*128] int8 digit bands -> (hi s16, lo s8) with
        K = hi*256 + lo (balanced lo), laid out [n_tiles, k, 128] each."""
        b = bands3.astype(np.int64)
        n_t, k, _ = b.shape
        K = (b[:, :, 2 * 128:] << 16) + (b[:, :, 128:256] << 8) + b[:, :, :128]
        lo = ((K + 128) % 256) - 128
        hi = (K - lo) >> 8
        assert np.abs(hi).max() < 2 ** 15 and np.abs(lo).max() <= 128
        return hi.astype(np.int16), lo.astype(np.int8)

    hw_hi, hw_lo = two_digit(bandsw)
    hh_hi, hh_lo = two_digit(bandsh)

    def kern(x_ref, bwh_ref, bwl_ref, bhh_ref, bhl_ref, cw_ref, ch_ref,
             o_ref, scratch):
        for bi in range(bsz):
            xs = jax.lax.bitcast_convert_type(
                x_ref[bi] ^ jnp.uint8(128), jnp.int8
            )
            xs16 = xs.astype(jnp.int16)
            for t, s in enumerate(int(v) for v in btw.starts):
                S_hi = jax.lax.dot_general(
                    xs16[:, s : s + btw.k_in], bwh_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                S_lo = jax.lax.dot_general(
                    xs[:, s : s + btw.k_in], bwl_ref[t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                ct1 = cw_ref[t] - jnp.int32(128 << PRECISION_BITS)
                acc = jax.lax.shift_left(S_hi, jnp.int32(8)) + S_lo + ct1[None, :]
                v = jax.lax.shift_right_arithmetic(
                    acc, jnp.int32(PRECISION_BITS)
                )
                scratch[bi, :, t * 128 : (t + 1) * 128] = v.astype(jnp.int8)
            for t, s in enumerate(int(v) for v in bth.starts):
                win = scratch[bi, s : s + bth.k_in, :]
                S_hi = jax.lax.dot_general(
                    bhh_ref[t], win.astype(jnp.int16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                S_lo = jax.lax.dot_general(
                    bhl_ref[t], win,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = (jax.lax.shift_left(S_hi, jnp.int32(8)) + S_lo
                       + ch_ref[t][:, None])
                u = jax.lax.shift_right_arithmetic(
                    acc, jnp.int32(PRECISION_BITS)
                )
                rows = min(128, OH - t * 128)
                o_ref[bi, t * 128 : t * 128 + rows, :OW] = (
                    u[:rows, :OW].astype(jnp.uint8)
                )

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, OH, OW), jnp.uint8),
        grid=(B // bsz,),
        in_specs=[
            pl.BlockSpec((bsz, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btw.n_tiles, btw.k_in, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btw.n_tiles, btw.k_in, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bth.n_tiles, bth.k_in, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bth.n_tiles, bth.k_in, 128), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((btw.n_tiles, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bth.n_tiles, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsz, OH, OW), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bsz, H, btw.out_padded), jnp.int8)],
        interpret=jax.default_backend() != "tpu",
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    args = (jnp.asarray(hw_hi), jnp.asarray(hw_lo), jnp.asarray(hh_hi),
            jnp.asarray(hh_lo), jnp.asarray(ctw), jnp.asarray(cth))
    out = {"probe": "int16_two_digit", "bsz": bsz}
    from interpolate_antialiasing_tpu.utils.timing import (
        device_seconds_from_trace,
    )

    try:
        g = _device_ms(lambda t: f(t, *args), iters=iters)
        float(g(x))
        dev = device_seconds_from_trace(lambda: float(g(x)))
        out["int16_ms"] = round(dev * 1e3 / iters, 4) if dev else None
    except Exception as e:  # e.g. Mosaic rejects the s16 dot
        out["error"] = str(e).splitlines()[0][:160]
    return out


def probe_schedule():
    """Full bit-equivalent kernels at headline geometry, differing only in
    TRACE STRUCTURE, to find how much of the VPU recombine Mosaic's
    scheduler will hide under MXU work:

      * ``inorder``  — per image: W matmuls + epilogues (SSA values),
        lane-concat, H matmuls (the production value_inter structure).
      * ``split_h``  — no concat; one H matmul per (H tile, W tile), each
        depending on a single W epilogue.
      * ``lag1``     — software pipeline: image bi's W matmul SUMS are
        issued, then image bi-1's epilogues + H pass are emitted — so
        VPU recombine of bi-1 has bi's matmuls in flight by construction.
      * ``all_w``    — every image's W pass first, then every image's H
        pass (maximal scheduling window; intermediates all live).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from interpolate_antialiasing_tpu.ops.pil_exact import (
        PRECISION_BITS,
        _digit_tiles,
        _pil_vmem_bytes,
        _PIL_VMEM_BUDGET,
    )

    B, H, W, OH, OW = 192, 438, 906, 196, 320
    btw, bandsw, ctw = _digit_tiles(W, OW, "bilinear")
    bth, bandsh, cth = _digit_tiles(H, OH, "bilinear")
    bsz = 1
    for cand in range(8, 0, -1):
        if B % cand == 0 and _pil_vmem_bytes(
            H, W, OH, OW, btw, bth, cand
        ) <= _PIL_VMEM_BUDGET:
            bsz = cand
            break
    starts_w = tuple(int(v) for v in btw.starts)
    starts_h = tuple(int(v) for v in bth.starts)

    def w_matmuls(x_ref, bw_ref, bi):
        xs = jax.lax.bitcast_convert_type(x_ref[bi] ^ jnp.uint8(128), jnp.int8)
        return [
            jax.lax.dot_general(
                xs[:, s : s + btw.k_in], bw_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            for t, s in enumerate(starts_w)
        ]

    def w_epilogue(S, cw_ref, t):
        ct1 = cw_ref[t] - jnp.int32(128 << PRECISION_BITS)
        acc = (
            jax.lax.shift_left(S[:, 256:], jnp.int32(16))
            + jax.lax.shift_left(S[:, 128:256], jnp.int32(8))
            + S[:, :128]
            + ct1[None, :]
        )
        return jax.lax.shift_right_arithmetic(
            acc, jnp.int32(PRECISION_BITS)
        ).astype(jnp.int8)

    def h_pass_concat(wtiles, bh_ref, ch_ref, o_ref, bi):
        inter = jnp.concatenate(wtiles, axis=1)
        for t, s in enumerate(starts_h):
            S = jax.lax.dot_general(
                bh_ref[t], inter[s : s + bth.k_in, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            acc = (
                jax.lax.shift_left(S[256:], jnp.int32(16))
                + jax.lax.shift_left(S[128:256], jnp.int32(8))
                + S[:128]
                + ch_ref[t][:, None]
            )
            u = jax.lax.shift_right_arithmetic(acc, jnp.int32(PRECISION_BITS))
            rows = min(128, OH - t * 128)
            o_ref[bi, t * 128 : t * 128 + rows, :OW] = (
                u[:rows, :OW].astype(jnp.uint8)
            )

    def h_pass_split(wtiles, bh_ref, ch_ref, o_ref, bi):
        for t, s in enumerate(starts_h):
            rows = min(128, OH - t * 128)
            for j, wt in enumerate(wtiles):
                lo = j * 128
                if lo >= OW:
                    continue
                hi = min(lo + 128, OW)
                S = jax.lax.dot_general(
                    bh_ref[t], wt[s : s + bth.k_in, :],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                acc = (
                    jax.lax.shift_left(S[256:], jnp.int32(16))
                    + jax.lax.shift_left(S[128:256], jnp.int32(8))
                    + S[:128]
                    + ch_ref[t][:, None]
                )
                u = jax.lax.shift_right_arithmetic(
                    acc, jnp.int32(PRECISION_BITS)
                )
                o_ref[bi, t * 128 : t * 128 + rows, lo:hi] = (
                    u[:rows, : hi - lo].astype(jnp.uint8)
                )

    def kern(x_ref, bw_ref, bh_ref, cw_ref, ch_ref, o_ref, *, variant):
        if variant.startswith("wlag"):
            # image-granularity software pipeline with lag L: W(bi) then
            # H(bi-L) — mixes MXU-heavy H matmuls into the W phase where
            # the recombine epilogues need hiding (all_w instead forms
            # two phases, leaving the W phase epilogue-dense)
            L = int(variant.rsplit("_", 1)[1])
            done = []
            for bi in range(bsz):
                Ss = w_matmuls(x_ref, bw_ref, bi)
                done.append(
                    [w_epilogue(S, cw_ref, t) for t, S in enumerate(Ss)]
                )
                if bi >= L:
                    h_pass_concat(done[bi - L], bh_ref, ch_ref, o_ref,
                                  bi - L)
            for bi in range(max(bsz - L, 0), bsz):
                h_pass_concat(done[bi], bh_ref, ch_ref, o_ref, bi)
            return
        if variant == "lag1":
            pend = None
            for bi in range(bsz):
                Ss = w_matmuls(x_ref, bw_ref, bi)
                if pend is not None:
                    pi, pS = pend
                    wt = [w_epilogue(S, cw_ref, t) for t, S in enumerate(pS)]
                    h_pass_concat(wt, bh_ref, ch_ref, o_ref, pi)
                pend = (bi, Ss)
            pi, pS = pend
            wt = [w_epilogue(S, cw_ref, t) for t, S in enumerate(pS)]
            h_pass_concat(wt, bh_ref, ch_ref, o_ref, pi)
            return
        if variant == "all_w":
            per_img = []
            for bi in range(bsz):
                Ss = w_matmuls(x_ref, bw_ref, bi)
                per_img.append(
                    [w_epilogue(S, cw_ref, t) for t, S in enumerate(Ss)]
                )
            for bi in range(bsz):
                h_pass_concat(per_img[bi], bh_ref, ch_ref, o_ref, bi)
            return
        for bi in range(bsz):
            Ss = w_matmuls(x_ref, bw_ref, bi)
            wt = [w_epilogue(S, cw_ref, t) for t, S in enumerate(Ss)]
            if variant == "split_h":
                h_pass_split(wt, bh_ref, ch_ref, o_ref, bi)
            else:
                h_pass_concat(wt, bh_ref, ch_ref, o_ref, bi)

    def build(variant):
        return pl.pallas_call(
            functools.partial(kern, variant=variant),
            out_shape=jax.ShapeDtypeStruct((B, OH, OW), jnp.uint8),
            grid=(B // bsz,),
            in_specs=[
                pl.BlockSpec((bsz, H, W), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((btw.n_tiles, btw.k_in, 3 * 128),
                             lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bth.n_tiles, bth.k_in, 3 * 128),
                             lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((btw.n_tiles, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bth.n_tiles, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bsz, OH, OW), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )

    rng = np.random.default_rng(0)
    import jax.numpy as jnp2

    x = jnp2.asarray(rng.integers(0, 256, (B, H, W), np.uint8))
    bw = jnp2.asarray(bandsw)
    bh = jnp2.asarray(bandsh)
    cw = jnp2.asarray(ctw)
    ch = jnp2.asarray(cth)

    from interpolate_antialiasing_tpu.utils.timing import (
        device_seconds_from_trace,
    )

    out = {"probe": "schedule", "bsz": bsz}
    ref = None
    for variant in ("all_w", "wlag_2", "wlag_4", "wlag_6"):
        f = build(variant)
        y = np.asarray(f(x, bw, bh, cw, ch))
        if ref is None:
            ref = y
        else:
            assert np.array_equal(ref, y), f"{variant} output differs"
        g = _device_ms(lambda t, f=f: f(t, bw, bh, cw, ch), iters=30)
        float(g(x))
        dev = device_seconds_from_trace(lambda: float(g(x)))
        out[variant + "_ms"] = round(dev * 1e3 / 30, 4) if dev else None
        print(json.dumps({variant: out[variant + "_ms"]}), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-overlap", action="store_true")
    p.add_argument("--skip-components", action="store_true")
    p.add_argument("--schedule", action="store_true")
    p.add_argument(
        "--smoke", action="store_true",
        help="tiny-batch single-iteration components run (trace check "
        "for every variant off-chip; timings meaningless)",
    )
    args = p.parse_args()
    if args.smoke:
        # force the CPU backend in-process: the axon TPU plugin ignores
        # JAX_PLATFORMS and hangs backend init when the tunnel is down —
        # the smoke must run chip-less (same mechanism as tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")
        # small downsample with 2 tiles per axis: exercises every
        # per-tile branch (incl. S_shared reuse) at ~1/5 the
        # headline element count
        print(
            json.dumps(
                probe_components(B=2, iters=1, geom=(200, 300, 140, 160))
            ),
            flush=True,
        )
        print(
            json.dumps(probe_int16(B=2, iters=1, geom=(200, 300, 140, 160))),
            flush=True,
        )
        return
    if args.schedule:
        print(json.dumps(probe_schedule()), flush=True)
        return
    if not args.skip_overlap:
        print(json.dumps(probe_overlap()), flush=True)
    if not args.skip_components:
        print(json.dumps(probe_components()), flush=True)
        print(json.dumps(probe_int16()), flush=True)


if __name__ == "__main__":
    main()
