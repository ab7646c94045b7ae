"""Benchmark timing harness (rebuild of the reference's
torch.utils.benchmark blocked_autorange usage, test.py:163-238).

Two measurement strategies:

  * ``time_jit_loop`` — wraps the candidate in an on-device ``fori_loop``
    with a value dependency between iterations, returning a scalar whose
    host transfer is the synchronisation point.  This is the trustworthy
    number in remote-execution environments (e.g. tunnelled TPUs) where
    ``block_until_ready`` can return before the device finishes; it also
    amortises dispatch overhead like blocked_autorange does.
  * ``time_calls`` — classic per-call wall-clock with a final forced host
    read; includes dispatch overhead (closer to "per-call latency").

The loop dependency must consume the *whole* output (``y.sum()``), scaled
by a tiny non-zero constant — scaling by 0.0 or consuming one element lets
XLA hoist or narrow the computation out of the loop.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["time_jit_loop", "time_calls", "device_time_per_call",
           "device_seconds_from_trace", "BenchResult"]


class BenchResult(dict):
    @property
    def seconds(self) -> float:
        return self["seconds"]

    def mpix_per_s(self, npixels: int) -> float:
        return npixels / self.seconds / 1e6


def time_jit_loop(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    iters: int = 20,
    repeats: int = 3,
) -> BenchResult:
    """Median seconds per call of ``fn`` measured inside one jit."""

    @jax.jit
    def g(x):
        def body(i, carry):
            xc, acc = carry
            y = fn(xc)
            s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
            # One-element in-place update keeps the inter-iteration value
            # dependency (prevents hoisting) without re-writing the whole
            # input each iteration (fori_loop carries alias buffers, so the
            # .at update is in-place, ~free).
            xc = xc.at[(0,) * xc.ndim].add(s.astype(xc.dtype))
            return (xc, acc + s)

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

    float(g(x))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(g(x))  # host read == sync
        times.append((time.perf_counter() - t0) / iters)
    return BenchResult(seconds=float(np.median(times)), iters=iters, repeats=repeats)


def time_calls(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    iters: int = 20,
    repeats: int = 3,
) -> BenchResult:
    """Per-call latency including dispatch: enqueue ``iters`` dependent calls,
    sync once via host read."""
    jfn = jax.jit(fn)
    y = jfn(x)
    float(jnp.sum(y.astype(jnp.float32)) * 1e-30)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _ in range(iters):
            y = jfn(x)
            acc = acc + jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
        float(acc)
        times.append((time.perf_counter() - t0) / iters)
    return BenchResult(seconds=float(np.median(times)), iters=iters, repeats=repeats)


def device_seconds_from_trace(run_once: Callable[[], None]):
    """Run ``run_once()`` under ``jax.profiler.trace`` in a FRESH temp dir
    and return the longest ``/device:TPU`` event's duration in seconds —
    by construction the traced jitted loop executable.

    The single home for the fragile xplane-parsing logic (shared with
    benchmarks/roofline.py).  A per-call ``tempfile.mkdtemp`` avoids the
    clobber race two concurrent benchmark processes would have on a fixed
    trace dir (one process's ``max(durs)`` could come from the other's
    loop).  Returns None when the runtime does not expose the profiler or
    the xplane tooling is unavailable (e.g. CPU CI).
    """
    import glob
    import json as _json
    import shutil
    import tempfile

    trace_dir = tempfile.mkdtemp(prefix="ia_tpu_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            run_once()
        paths = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
        if not paths:
            return None
        from xprof.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "trace_viewer", {})
        tr = _json.loads(data)
        device_pids = {
            e["pid"]
            for e in tr["traceEvents"]
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in e["args"].get("name", "")
        }
        durs = [
            e.get("dur", 0.0)
            for e in tr["traceEvents"]
            if e.get("ph") == "X" and e.get("pid") in device_pids
        ]
        # the loop executable is the longest device event by far
        return (max(durs) / 1e6) if durs else None
    except Exception:
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def device_time_per_call(
    fn: Callable[[jax.Array], jax.Array],
    x: jax.Array,
    iters: int = 50,
):
    """Seconds/call measured on the DEVICE timeline via jax.profiler.

    Runs the same value-dependent on-device loop as :func:`time_jit_loop`
    once under ``jax.profiler.trace`` and returns the loop executable's
    duration on the ``/device:TPU`` lane divided by ``iters`` — a number
    that contains zero host/tunnel latency.  On tunnelled chips this is
    the most trustworthy sustained figure: the two-point method can be
    skewed by several 100% when the host-read latency or chip clock
    wanders between the two measurement points (observed live: a
    two-point read of 0.166 ms against a byte-stable profiler read of
    0.446 ms).  Returns None when the runtime does not expose the
    profiler or the xplane tooling is unavailable (e.g. CPU CI).
    """

    @jax.jit
    def g(x):
        def body(i, carry):
            xc, acc = carry
            y = fn(xc)
            s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
            xc = xc.at[(0,) * xc.ndim].add(s.astype(xc.dtype))
            return (xc, acc + s)

        return jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0)))[1]

    try:
        float(g(x))  # compile + warm outside the trace
    except Exception:
        return None
    dev = device_seconds_from_trace(lambda: float(g(x)))
    return dev / iters if dev else None
