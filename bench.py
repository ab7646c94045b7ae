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

    # iters amortise the one dispatch per loop; repeats take a median across
    # chip-speed fluctuations (the shared dev tunnel varies +-40%)
    res = time_jit_loop(fn, x, iters=20, repeats=5)
    mpix = batch * oh * ow / res.seconds / 1e6

    print(
        json.dumps(
            {
                "metric": "bilinear-AA uint8 906x438->320x196 batch64 output throughput",
                "value": round(mpix, 1),
                "unit": "Mpix/s",
                "vs_baseline": round(mpix / REF_MPIX_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
