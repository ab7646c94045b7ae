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
import sys
import time

import numpy as np


REF_MPIX_S = (196 * 320) / 574.9e-6 / 1e6  # 109.1 output Mpix/s


def main() -> None:
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
            }
        )
    )


if __name__ == "__main__":
    main()
