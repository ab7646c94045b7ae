"""On-chip sweep of the digit kernels' H-pass tile width (tile_h).

Ground truth for ops/pil_exact._pick_tile_h's MXU cost model: runs the
REAL whole-image and streamed digit kernels at forced tile_h values and
reports profiler device time + byte-exactness vs Pillow.  The isolated
matmul probes (benchmarks/mxu_geometry.py) motivate the knob; this sweep
validates it end to end, where per-tile fixed costs, DMA halo re-reads
(streamed: k_rows tracks tile_h) and epilogue overlap all participate.

Run on the real chip:  python benchmarks/tile_h_sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# runnable as `python benchmarks/<this>.py` without pre-setting the
# repo root on PYTHONPATH (script-dir is on sys.path, cwd is not)
_r = __import__('os').path
__import__('sys').path.insert(0, _r.dirname(_r.dirname(_r.abspath(__file__))))


def _pillow_ref(x, oh, ow):
    from PIL import Image

    return np.stack([
        np.asarray(Image.fromarray(p).resize((ow, oh), Image.BILINEAR))
        for p in x
    ])


def sweep(name, make_call, x, oh, ow, tiles, check_exact=True):
    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.ops import pil_exact as pe
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    ref = _pillow_ref(np.asarray(x), oh, ow) if check_exact else None
    xd = jnp.asarray(x)
    al = 8 if name.startswith("4k") else 1
    seen = set()
    for t in tiles:
        pe._pick_tile_h.cache_clear()
        pe._digit_tiles.cache_clear()
        import os

        if t == 0:
            os.environ.pop("IA_TPU_PIL_TILE_H", None)  # model's own pick
        else:
            os.environ["IA_TPU_PIL_TILE_H"] = str(t)
        # the hardened env knob (mxu_model.env_tile) rounds an illegal
        # forced width DOWN to the route's quantum (32 for streamed, 8
        # for whole-image) — label rows by the width dispatch will
        # actually run, and skip duplicates, so the artifact never
        # records the same measurement under two labels
        eff = pe._pick_tile_h(x.shape[-2], oh, "bilinear", align=al)
        if t and eff in seen:
            continue
        seen.add(eff)
        try:
            f = make_call(oh, ow)
            y = f(xd)
            y.block_until_ready()
            err = (
                int(np.abs(np.asarray(y).astype(int) - ref.astype(int)).max())
                if check_exact else -1
            )
            ms = device_time_per_call(f, xd, iters=8) * 1e3
            print(json.dumps({
                "workload": name, "tile_h": eff if t else f"auto({eff})",
                "ms": round(ms, 4), "max_abs_err": err,
            }), flush=True)
        except Exception as e:  # Mosaic admission / compile failures count
            print(json.dumps({
                "workload": name, "tile_h": eff if t else 0,
                "error": str(e).splitlines()[0][:120],
            }), flush=True)
    import os

    os.environ.pop("IA_TPU_PIL_TILE_H", None)
    pe._pick_tile_h.cache_clear()
    pe._digit_tiles.cache_clear()


def sweep_w(name, make_call, x, oh, ow, tiles, check_exact=True):
    """Forced-width sweep of the streamed kernel's W-pass tile
    (ops/pil_exact._pick_tile_w's ground truth — the W knob trades a
    dropped MXU K pass against garbage lanes in the H contraction, so
    only the end-to-end number decides)."""
    import os

    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.ops import pil_exact as pe
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    ref = _pillow_ref(np.asarray(x), oh, ow) if check_exact else None
    xd = jnp.asarray(x)
    seen = set()
    for t in tiles:
        pe._pick_tile_w.cache_clear()
        pe._digit_tiles.cache_clear()
        if t == 0:
            os.environ.pop("IA_TPU_PIL_TILE_W", None)  # model's own pick
        else:
            os.environ["IA_TPU_PIL_TILE_W"] = str(t)
        bth, _, _ = pe._digit_tiles(
            x.shape[-2], oh, "bilinear", align=8,
            tile=pe._pick_tile_h(x.shape[-2], oh, "bilinear", align=8))
        # effective width after the hardened env clamp (see sweep());
        # W quantum is 8 so today's candidates pass through, but the
        # labels must track dispatch, not the forced value
        eff = pe._pick_tile_w(x.shape[-1], ow, "bilinear",
                              k_rows=bth.k_in, tile_h=bth.tile)
        if t and eff in seen:
            continue
        seen.add(eff)
        try:
            f = make_call(oh, ow)
            y = f(xd)
            y.block_until_ready()
            err = (
                int(np.abs(np.asarray(y).astype(int) - ref.astype(int)).max())
                if check_exact else -1
            )
            ms = device_time_per_call(f, xd, iters=8) * 1e3
            print(json.dumps({
                "workload": name, "tile_w": eff if t else f"auto({eff})",
                "ms": round(ms, 4), "max_abs_err": err,
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "workload": name, "tile_w": eff if t else 0,
                "error": str(e).splitlines()[0][:120],
            }), flush=True)
    os.environ.pop("IA_TPU_PIL_TILE_W", None)
    pe._pick_tile_w.cache_clear()
    pe._digit_tiles.cache_clear()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax

    from interpolate_antialiasing_tpu.ops import pil_exact as pe

    rng = np.random.default_rng(0)

    # headline: batch-64 3x438x906 -> 196x320 == 192 planes (whole-image)
    x = rng.integers(0, 256, (192, 438, 906), dtype=np.uint8)
    tiles = ([0, 128, 112, 56] if args.quick
             else [0, 128, 120, 112, 104, 96, 80, 64, 56, 48, 40, 32])

    def make_whole(oh, ow):
        return jax.jit(
            lambda a: pe._resize_pil_exact_pallas(a, oh, ow, "bilinear"))

    sweep("headline", make_whole, x, 196, 320, tiles)

    # 4K -> HD, b8 RGB frames == 24 planes (streamed)
    x4 = rng.integers(0, 256, (24, 2160, 3840), dtype=np.uint8)

    def make_stream(oh, ow):
        return jax.jit(
            lambda a: pe._resize_pil_exact_streamed(a, oh, ow, "bilinear"))

    sweep("4k_stream", make_stream, x4, 720, 1280,
          [0, 128, 112, 96, 64] if args.quick else tiles,
          check_exact=not args.quick)

    # W-pass tile width (IA_TPU_PIL_TILE_W, ops/pil_exact._pick_tile_w):
    # streamed route only — H tile at the model's own pick throughout
    sweep_w("4k_stream_w", make_stream, x4, 720, 1280,
            [0, 128, 120, 112, 96] if args.quick
            else [0, 128, 120, 112, 104, 96, 88, 80, 72, 64],
            check_exact=not args.quick)

    # float kernels (IA_TPU_FLOAT_TILE_H + weights.pick_tile_h): headline
    # f32 onekernel and 4K bf16 streamed video
    sweep_float(args)


def sweep_float(args):
    import os

    import jax
    import jax.numpy as jnp

    from interpolate_antialiasing_tpu.ops import pallas_resize as pr
    from interpolate_antialiasing_tpu.ops.weights import (
        make_axis_spec,
        pick_tile_h,
    )
    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    rng = np.random.default_rng(1)
    cases = [
        ("float_headline_f32",
         jnp.asarray(rng.standard_normal((192, 438, 906)), jnp.float32),
         (196, 320), "onekernel"),
        ("float_4k_bf16",
         jnp.asarray(rng.standard_normal((24, 2160, 3840)), jnp.bfloat16),
         (720, 1280), "streamed"),
    ]
    tiles = [0, 128, 96, 64, 32] if args.quick else [0, 128, 112, 96, 64, 32]
    for name, x, (oh, ow), kind in cases:
        sh = make_axis_spec(x.shape[-2], oh, "bilinear", True, False, None)
        sw = make_axis_spec(x.shape[-1], ow, "bilinear", True, False, None)
        seen = set()
        for t in tiles:
            if t == 0:
                os.environ.pop("IA_TPU_FLOAT_TILE_H", None)
            else:
                os.environ["IA_TPU_FLOAT_TILE_H"] = str(t)
            pr._tiles_exact_h_cached.cache_clear()
            pr._tiles_stream_cached.cache_clear()
            # effective width after the hardened env clamp (streamed
            # quantum 32 rounds e.g. 112 down to 96): label by what
            # dispatch runs, skip duplicate measurements (see sweep())
            if kind == "onekernel":
                eff = pick_tile_h(sh)
            else:
                eff = pick_tile_h(sh, align=8, cands=(128, 96, 64, 32))
            if t and eff in seen:
                continue
            seen.add(eff)
            try:
                if kind == "onekernel":
                    f = jax.jit(lambda a: pr.resize2d_onekernel(a, sh, sw))
                else:
                    f = jax.jit(lambda a: pr.resize2d_streamed(a, sh, sw))
                f(x).block_until_ready()
                ms = device_time_per_call(f, x, iters=8) * 1e3
                # auto row as a string so retune.py recognises the model row
                print(json.dumps({"workload": name,
                                  "tile_h": eff if t else f"auto({eff})",
                                  "ms": round(ms, 4)}), flush=True)
            except Exception as e:
                print(json.dumps({"workload": name,
                                  "tile_h": eff if t else 0,
                                  "error": str(e).splitlines()[0][:120]}),
                      flush=True)
    os.environ.pop("IA_TPU_FLOAT_TILE_H", None)
    pr._tiles_exact_h_cached.cache_clear()
    pr._tiles_stream_cached.cache_clear()

    # float streamed W-pass tile (IA_TPU_FLOAT_TILE_W): bf16 4K video —
    # decides whether the bf16 MXU has the same ceil(K/128) behaviour the
    # int8 probes measured (if yes, give _tiles_stream_w_cached a model)
    name, x, (oh, ow), _ = cases[1]
    sh = make_axis_spec(x.shape[-2], oh, "bilinear", True, False, None)
    sw = make_axis_spec(x.shape[-1], ow, "bilinear", True, False, None)
    for t in ([0, 120, 112, 96] if args.quick
              else [0, 120, 112, 104, 96, 88, 80, 72, 64]):
        if t == 0:
            os.environ.pop("IA_TPU_FLOAT_TILE_W", None)
        else:
            os.environ["IA_TPU_FLOAT_TILE_W"] = str(t)
        pr._tiles_stream_w_cached.cache_clear()
        try:
            f = jax.jit(lambda a: pr.resize2d_streamed(a, sh, sw))
            f(x).block_until_ready()
            ms = device_time_per_call(f, x, iters=8) * 1e3
            if t == 0:
                # the t=0 row IS the default route, tagged as a string so
                # retune.py treats it as the model row and flags when a
                # forced width beats it >3%.  Compute the default LIVE
                # (128 while mxu_model.FLOAT_W_MODEL_DEFAULT is off, the
                # cost-model pick once it flips) so the label tracks
                # dispatch after the planned flag flip.
                from interpolate_antialiasing_tpu.ops import mxu_model

                auto_w = (pr._pick_tile_w_float(sw, sh)
                          if mxu_model.FLOAT_W_MODEL_DEFAULT else 128)
                label = f"auto({auto_w})"
            else:
                label = t
            print(json.dumps({"workload": name + "_wpass",
                              "tile_w": label,
                              "ms": round(ms, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"workload": name + "_wpass", "tile_w": t,
                              "error": str(e).splitlines()[0][:120]}),
                  flush=True)
    os.environ.pop("IA_TPU_FLOAT_TILE_W", None)
    pr._tiles_stream_w_cached.cache_clear()


if __name__ == "__main__":
    main()
