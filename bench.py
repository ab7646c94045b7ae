"""Headline benchmark: batch-64 uint8 906x438 -> 320x196 bilinear AA.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mpix/s", "vs_baseline": N}

value = output megapixels per second per chip on the reference's headline
config (test.py default: 3x438x906 uint8 -> 196x320 bilinear antialias),
run at batch 64 to saturate the chip.  vs_baseline divides by the
reference's best published rate for the same config: 574.9 us/image at 6
CPU threads (BASELINE.md step-2 row) = 62,720 px / 574.9e-6 s
= 109.1 Mpix/s output.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np


REF_MPIX_S = (196 * 320) / 574.9e-6 / 1e6  # 109.1 output Mpix/s

# The tunnelled TPU backend has a recurring failure mode: the tunnel stalls
# or drops and backend init raises "Unable to initialize backend 'axon'"
# (it killed the round-3 driver capture, BENCH_r03.json rc=1).  Probe the
# backend in a SUBPROCESS (a failed in-process init can leave jax's backend
# cache poisoned) with a bounded retry, and on final failure emit ONE
# structured JSON line so the artifact is parseable and distinguishable
# from a library crash.  Mirrors the reference harness's failure-explicit
# env bootstrap (/root/reference/test.py:304-322).
def _env_int(name: str, default: int) -> int:
    try:
        v = int(os.environ.get(name, ""))
        return v if v > 0 else default
    except ValueError:
        return default


_PROBE_ATTEMPTS = _env_int("IA_TPU_BENCH_PROBE_ATTEMPTS", 3)
# first op on the tunnel can take 30s; stalls run longer
_PROBE_TIMEOUT_S = _env_int("IA_TPU_BENCH_PROBE_TIMEOUT_S", 240)
_PROBE_RETRY_DELAY_S = _env_int("IA_TPU_BENCH_PROBE_RETRY_S", 20)


def _probe_backend() -> tuple[bool, str]:
    """Try to initialize the JAX backend in a subprocess, with retries.

    Returns (ok, detail).  detail is the platform string on success, the
    last error line on failure.
    """
    code = "import jax; d = jax.devices(); print('PROBE_OK', d[0].platform)"
    last = "no attempt ran"
    for attempt in range(1, _PROBE_ATTEMPTS + 1):
        try:
            out = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=_PROBE_TIMEOUT_S,
            )
            tail = (out.stdout + out.stderr).strip().splitlines()
            last = tail[-1] if tail else f"rc={out.returncode}, no output"
            for line in tail:
                if line.startswith("PROBE_OK"):
                    return True, line.split(" ", 1)[1]
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {_PROBE_TIMEOUT_S}s"
        sys.stderr.write(f"[bench] backend probe attempt {attempt} failed: {last}\n")
        if attempt < _PROBE_ATTEMPTS:
            time.sleep(_PROBE_RETRY_DELAY_S)
    return False, last


def _emit_skip(reason_detail: str) -> None:
    print(
        json.dumps(
            {
                "metric": "bilinear-AA uint8 906x438->320x196 batch64 output throughput (sustained device rate)",
                "value": None,
                "unit": "Mpix/s",
                "vs_baseline": None,
                "skipped": True,
                "reason": "tpu-unavailable",
                "detail": reason_detail[-500:],
                "attempts": _PROBE_ATTEMPTS,
            }
        )
    )


def main() -> None:
    ok, detail = _probe_backend()
    if not ok:
        _emit_skip(detail)
        return

    import jax
    import jax.numpy as jnp

    import interpolate_antialiasing_tpu as ia
    from interpolate_antialiasing_tpu.utils.imageio import synthetic_image
    from interpolate_antialiasing_tpu.utils.timing import time_jit_loop

    batch = 64
    oh, ow = 196, 320
    img = synthetic_image()  # uint8 CHW 3x438x906
    rng = np.random.default_rng(0)
    xs = np.stack([img] * batch).astype(np.uint8)
    # decorrelate images a little so nothing can constant-fold
    xs ^= rng.integers(0, 2, size=xs.shape, dtype=np.uint8)
    x = jnp.asarray(xs)

    def fn(batch_u8):
        return ia.resize(batch_u8, (oh, ow), method="bilinear")

    # The tunnelled runtime adds a large, VARIABLE host-read latency
    # (~25-30 ms) to every measured loop call.  Two timing methods:
    #   1. preferred: the jax.profiler device timeline — the loop
    #      executable's duration on /device:TPU contains zero host/tunnel
    #      latency and is byte-stable across runs;
    #   2. fallback (profiler unavailable): two-point differencing of the
    #      on-device loop at 10 and 50 iterations, which cancels the fixed
    #      part of the latency but can be skewed when it wanders.
    # Both raw points are reported for transparency either way.
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    lo_iters, hi_iters = 10, 50
    r_lo = time_jit_loop(fn, x, iters=lo_iters, repeats=5)
    r_hi = time_jit_loop(fn, x, iters=hi_iters, repeats=5)
    marginal_s = (hi_iters * r_hi.seconds - lo_iters * r_lo.seconds) / (
        hi_iters - lo_iters
    )
    marginal_s = max(marginal_s, 1e-9)
    dev_s = device_time_per_call(fn, x, iters=hi_iters)
    sustained_s = dev_s if dev_s else marginal_s
    mpix = batch * oh * ow / sustained_s / 1e6

    # informational extra: the round-5 2-digit dial (MaxAbsE <= 1) — the
    # headline metric stays the byte-exact default route
    dial_ms = None
    try:
        from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

        fn2 = lambda t: resize_pil_exact(t, (oh, ow), digits=2)
        d2 = device_time_per_call(fn2, x, iters=hi_iters)
        if d2:
            dial_ms = round(d2 * 1e3, 3)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "bilinear-AA uint8 906x438->320x196 batch64 output throughput (sustained device rate)",
                "value": round(mpix, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix / REF_MPIX_S, 2),
                "ms_per_batch_sustained": round(sustained_s * 1e3, 3),
                "timing_method": "profiler-device-time" if dev_s else "two-point",
                "ms_per_batch_two_point": round(marginal_s * 1e3, 3),
                "ms_per_batch_incl_host_sync": round(r_hi.seconds * 1e3, 3),
                "ms_per_batch_2digit_dial": dial_ms,
                "platform": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
