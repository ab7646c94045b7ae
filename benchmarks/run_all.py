"""Full benchmark matrix over the BASELINE.json workload configs.

Prints one JSON row per (config, backend).  Run on TPU:

    python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer iters")
    ap.add_argument(
        "--sustained",
        action="store_true",
        help="two-point method: time the on-device loop at two iteration "
        "counts and difference out the tunnel's fixed host-read latency "
        "(same methodology as bench.py; produces the docs/BENCHMARKS.md "
        "'sustained device rates' table)",
    )
    ap.add_argument(
        "--device",
        action="store_true",
        help="profiler device-timeline method (utils.timing."
        "device_time_per_call): zero host/tunnel latency per row; the "
        "most trustworthy numbers on the tunnelled chip (two-point can "
        "be jitter-corrupted)",
    )
    args = ap.parse_args()
    if args.device and args.sustained:
        ap.error("--device and --sustained are mutually exclusive")

    import jax
    import jax.numpy as jnp

    import interpolate_antialiasing_tpu as ia
    from interpolate_antialiasing_tpu.models import (
        ImageNetEvalPipeline,
        VideoDownscaler,
    )
    from interpolate_antialiasing_tpu.utils.timing import (
        device_time_per_call,
        time_jit_loop,
    )

    iters = 5 if args.quick else 10
    rng = np.random.default_rng(0)

    def report(name, fn, x, out_pixels):
        try:
            if args.device:
                sec = device_time_per_call(fn, x, iters=10 if args.quick else 30)
                if sec is None:
                    print(json.dumps({"config": name,
                                      "error": "profiler unavailable"}),
                          flush=True)
                    return
                row = {
                    "config": name,
                    "ms_device": round(sec * 1e3, 3),
                    "out_Mpix_s": round(out_pixels / sec / 1e6, 1),
                }
            elif args.sustained:
                lo, hi = (5, 20) if args.quick else (10, 50)
                r_lo = time_jit_loop(fn, x, iters=lo, repeats=5)
                r_hi = time_jit_loop(fn, x, iters=hi, repeats=5)
                sec = max(
                    (hi * r_hi.seconds - lo * r_lo.seconds) / (hi - lo), 1e-9
                )
                row = {
                    "config": name,
                    "ms_sustained": round(sec * 1e3, 3),
                    "ms_incl_host_sync": round(r_hi.seconds * 1e3, 3),
                    "out_Mpix_s": round(out_pixels / sec / 1e6, 1),
                }
            else:
                r = time_jit_loop(fn, x, iters=iters)
                sec = r.seconds
                row = {
                    "config": name,
                    "ms": round(sec * 1e3, 3),
                    "out_Mpix_s": round(out_pixels / sec / 1e6, 1),
                }
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({"config": name, "error": repr(e)[:120]}), flush=True)

    # 1. headline: batch-64 uint8 906x438 -> 320x196 bilinear AA
    # 'auto' is the shipped default: since round 2b it promotes eligible
    # u8->u8 resizes to the bit-exact int8 digit kernel (MaxAbsE = 0);
    # 'pallas' pins the float split-bf16 pipeline for comparison.
    x = jnp.asarray((rng.random((64, 3, 438, 906)) * 255).astype(np.uint8))
    for backend in ["auto", "pallas", "dense", "gather"]:
        report(
            f"headline-u8-b64[{backend}]",
            lambda t, b=backend: ia.resize(t, (196, 320), backend=b),
            x,
            64 * 196 * 320,
        )

    # 1b. 4K u8 -> HD: the streamed int8 digit route (bit-exact at 4K).
    # out_pixels normalised by the 8 RGB FRAMES (not the 24 planes) so the
    # out_Mpix_s column is directly comparable with the video-4k-bf16 row.
    x4k = jnp.asarray(rng.integers(0, 256, (24, 2160, 3840), dtype=np.uint8))
    report(
        "video-4k-u8-b8[auto=pil-int8-streamed]",
        lambda t: ia.resize(t, (1080, 1920)),
        x4k,
        8 * 1080 * 1920,
    )
    del x4k

    # 2. bicubic, both layouts
    xf = x.astype(jnp.float32)
    report(
        "bicubic-f32-b64[pallas]",
        lambda t: ia.resize(t.astype(jnp.uint8), (196, 320), method="bicubic"),
        xf,
        64 * 196 * 320,
    )
    xh = jnp.transpose(x, (0, 2, 3, 1))
    report(
        "bicubic-u8-NHWC-b64[auto]",
        lambda t: ia.resize(t, (196, 320), method="bicubic", data_format="NHWC"),
        xh,
        64 * 196 * 320,
    )

    # 2b. bit-exact Pillow backend (round-2 digit-split kernel)
    report(
        "pil-exact-u8-b64",
        lambda t: ia.resize(t, (196, 320), backend="pil_exact"),
        x,
        64 * 196 * 320,
    )

    # 2b'. the round-5 2-digit pb=14 dial: MaxAbsE <= 1 at 2/3 the MXU work
    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    report(
        "pil-2digit-u8-b64[digits=2]",
        lambda t: resize_pil_exact(t, (196, 320), digits=2),
        x,
        64 * 196 * 320,
    )

    # 2c. crop ops: traced-box crop_and_resize, batch 64 from the headline res
    b01 = rng.uniform(0.0, 0.35, size=(64, 2)).astype(np.float32)
    b23 = rng.uniform(0.65, 1.0, size=(64, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([b01, b23], axis=1))  # (y0,x0,y1,x1)
    report(
        "crop_and_resize-b64",
        lambda t: ia.crop_and_resize(t, boxes, (224, 224)),
        x,
        64 * 224 * 224,
    )

    # 2d. scale_and_translate (jax.image drop-in, round 5): static affine
    # params ride the banded primitives; jax.image alongside for context
    xs_f = xf[:8]
    st_shape = (8, 3, 320, 196)
    report(
        "scale_and_translate-b8[ia]",
        lambda t: ia.scale_and_translate(
            t, st_shape, (2, 3), (320 / 438, 196 / 906 * 1.02), (2.5, -3.25),
            "cubic"),
        xs_f,
        8 * 320 * 196,
    )
    report(
        "scale_and_translate-b8[jax.image]",
        lambda t: jax.image.scale_and_translate(
            t, st_shape, (2, 3),
            jnp.array([320 / 438, 196 / 906 * 1.02], jnp.float32),
            jnp.array([2.5, -3.25], jnp.float32), "cubic"),
        xs_f,
        8 * 320 * 196,
    )

    # 3. ImageNet eval preprocessing: batch-64 -> 224x224 + normalise
    pipe = ImageNetEvalPipeline(size=(224, 224))
    report("imagenet-eval-b64", pipe, x, 64 * 224 * 224)

    # 3b. train-aug preprocessing: batch-64 RandomResizedCrop -> 224x224
    from interpolate_antialiasing_tpu.models import ImageNetTrainPipeline

    tpipe = ImageNetTrainPipeline(size=(224, 224))
    key = jax.random.PRNGKey(0)
    report("imagenet-train-aug-b64", lambda t: tpipe(key, t), x, 64 * 224 * 224)

    # 4. backward (VJP) workload
    xs = jnp.asarray(rng.random((8, 3, 438, 906)).astype(np.float32))

    def bwd(t, mode="bilinear"):
        f = lambda u: ia.resize_plane(u, (196, 320), 2, 3, mode=mode)
        y, vjp = jax.vjp(f, t)
        return vjp(y)[0]

    report("bilinear-vjp-b8", bwd, xs, 8 * 196 * 320)
    # BASELINE config 4 names bilinear AND bicubic VJPs; the reference left
    # cubic backward as a TODO (test.py:110-116) — here it is measured.
    report("bicubic-vjp-b8", lambda t: bwd(t, "bicubic"), xs, 8 * 196 * 320)

    # 4b. train-step resize backward: resize INSIDE a differentiated loss
    # (the augmentation-in-the-graph workload) — grads flow through the
    # transposed-band adjoint as part of a whole jitted step.
    tgt = jnp.asarray(rng.random((8, 3, 196, 320)).astype(np.float32))

    def train_step_bwd(t):
        def loss(u):
            y = ia.resize_plane(u, (196, 320), 2, 3, mode="bilinear")
            return jnp.mean((y - tgt) ** 2)

        return jax.grad(loss)(t)

    report("train-step-resize-bwd-b8", train_step_bwd, xs, 8 * 196 * 320)

    # 5. video: batch-8 bf16 3840x2160 -> 1920x1080
    xv = jnp.asarray(rng.random((8, 3, 2160, 3840)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    vd = VideoDownscaler(out_hw=(1080, 1920))
    report("video-4k-bf16-b8[pallas]", vd, xv, 8 * 1920 * 1080)
    report(
        "video-4k-f32-b8[jax.image]",
        lambda t: jax.image.resize(
            t.astype(jnp.float32), (8, 3, 1080, 1920), "bilinear", antialias=True
        ).astype(jnp.bfloat16),
        xv,
        8 * 1920 * 1080,
    )


if __name__ == "__main__":
    main()
