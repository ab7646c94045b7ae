"""On-chip MXU rate vs matmul geometry — the data behind band K-padding.

The round-3 spot probes found the v5e int8 matmul rate strongly
K-geometry-dependent (K=256: 169 G MACs/ms vs K=258: 117 at the same
M/N), which bounds both digit kernels well below the flat "int8 ceiling"
the round-2 roofline divided by.  This sweep maps the dependence so the
band builders can *choose* their contraction width: K is a free knob —
padding the banded window with zero coefficients changes no output byte,
only the geometry the MXU executes.

Method: one Pallas kernel per shape, operands VMEM-resident, `reps`
matmuls per grid step with a sliding 8-row LHS window (defeats CSE), a
large grid; profiler device time (utils.timing.device_time_per_call).

Run on the real chip:  python benchmarks/mxu_geometry.py [--quick]
Prints one JSON line per shape; the library consumes the conclusion as
the K-alignment constant in ops/weights.banded_tiles_from_matrix
(k_align) — re-derive it here if the hardware generation changes.
"""

from __future__ import annotations

import argparse
import json

import numpy as np

# runnable as `python benchmarks/<this>.py` without pre-setting the
# repo root on PYTHONPATH (script-dir is on sys.path, cwd is not)
_r = __import__('os').path
__import__('sys').path.insert(0, _r.dirname(_r.dirname(_r.abspath(__file__))))


def probe(M, K, N, dtype="int8", steps=1024, reps=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from interpolate_antialiasing_tpu.utils.timing import device_time_per_call

    np_dt = np.int8 if dtype == "int8" else np.float32
    rng = np.random.default_rng(0)
    if dtype == "int8":
        a_host = rng.integers(-100, 100, (M + 64, K), dtype=np.int8)
        b_host = rng.integers(-100, 100, (K, N), dtype=np.int8)
        acc_dt = jnp.int32
    else:
        a_host = rng.standard_normal((M + 64, K)).astype(np_dt)
        b_host = rng.standard_normal((K, N)).astype(np_dt)
        acc_dt = jnp.float32
    abuf, bb = jnp.asarray(a_host), jnp.asarray(b_host)
    if dtype == "bf16":
        abuf, bb = abuf.astype(jnp.bfloat16), bb.astype(jnp.bfloat16)

    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), acc_dt)
        for r in range(reps):
            acc = acc + jax.lax.dot_general(
                a_ref[r * 8 : r * 8 + M, :], b_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=acc_dt,
            )
        o_ref[...] = acc

    f = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), acc_dt),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((M + 64, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(a, b))
    f(abuf, bb).block_until_ready()
    ms = device_time_per_call(lambda a: f(a, bb), abuf, iters=4) * 1e3
    rate = M * N * K * reps * steps / 1e9 / ms
    print(json.dumps({
        "dtype": dtype, "M": M, "K": K, "N": N,
        "g_macs_per_ms": round(rate, 1), "ms": round(ms, 4),
    }), flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    # Real kernel geometries (from _digit_tiles on the shipped workloads):
    #   headline W pass: [438, 365] @ [365, 384]   (per tile, x3 tiles x64)
    #   headline H pass: [384, 287] @ [287, 320]
    #   4K streamed W:   [rows, 400] @ [400, 384]
    #   4K streamed H:   [384, 386] @ [386, OWc]
    print("# K sweep at headline-W geometry (M=438, N=384, int8)", flush=True)
    ks = ([365, 368, 384, 512] if args.quick else
          [320, 352, 360, 365, 368, 376, 384, 392, 416, 448, 512, 640])
    for k in ks:
        probe(438, k, 384)

    print("# K sweep at headline-H geometry (M=384, N=320, int8)", flush=True)
    for k in ([287, 288, 320, 384] if args.quick else
              [256, 280, 287, 288, 296, 320, 352, 384, 512]):
        probe(384, k, 320)

    print("# K sweep at 4K-stream geometries (int8)", flush=True)
    for k in ([400, 416, 512] if args.quick else
              [384, 386, 392, 400, 416, 448, 512]):
        probe(272, k, 384)

    print("# M alignment (K=384, N=384, int8)", flush=True)
    for m in [432, 438, 440, 448, 512]:
        probe(m, 384, 384)

    print("# N alignment (M=438, K=384, int8)", flush=True)
    for n in [128, 192, 256, 320, 384, 512]:
        probe(438, 384, n)

    print("# K-chunk model probes (does time ~ ceil(K/128)?)", flush=True)
    for k in [129, 192, 255, 256, 257, 383, 385]:
        probe(438, k, 384)

    # H-pass candidates: result M = 3*tile_h sublanes (band is LHS), so
    # M is small — does weight-load amortisation favour wider tiles?
    print("# H-pass tile_h candidates (M=3T, N=320, int8)", flush=True)
    for m, k in [(168, 128), (312, 236), (336, 256), (384, 287),
                 (384, 384), (168, 256), (336, 128)]:
        probe(m, k, 320)

    if not args.quick:
        print("# bf16 K sweep (M=432, N=384)", flush=True)
        for k in [287, 288, 320, 365, 368, 384, 512]:
            probe(432, k, 384, dtype="bf16")


if __name__ == "__main__":
    main()
