"""x64-compat regressions for the Pallas routes.

Under ``jax_enable_x64=True`` (which a user flips on for float64
gradcheck — a supported workflow, tests/test_grads.py) bare Python ints
inside Pallas metadata lower as i64 and Mosaic refuses to legalize them
on real hardware:

- index-map constants -> ``func.return (i32, i64, i64)`` legalization
  failure (found on-chip, round 4, driving ``resize(uint8)``);
- in-kernel DMA slot literals -> ``tpu.memref_slice`` "operand #1 must
  be ... 32-bit ... but got 'i64'".

Interpret mode (this CI) executes those kernels fine either way, so the
hardware failure can't be reproduced here directly; instead these tests
pin the three invariants that make it impossible:

1. ``pallas_compat.block_spec`` casts every index-map component to i32;
2. every kernel module builds BlockSpecs only through it;
3. the traced kernel jaxprs (what Mosaic lowers) contain no int64 value.

The whole test suite already runs with x64 enabled (tests/conftest.py),
so every traced constant here sees exactly the hazard config.
"""

import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_antialiasing_tpu as ia
from interpolate_antialiasing_tpu.ops.pallas_compat import (
    block_spec,
    i32_index_map,
)

assert jax.config.jax_enable_x64, "suite must run with x64 on (conftest)"


def test_i32_index_map_casts_constants_and_tracers():
    f = i32_index_map(lambda b: (b, 0, 0))

    # trace it the way pallas traces index maps: with int32 grid indices
    out_dtypes = jax.eval_shape(f, jax.ShapeDtypeStruct((), jnp.int32))
    assert all(o.dtype == jnp.int32 for o in out_dtypes), out_dtypes

    # concrete call: Python ints, numpy ints, mixed
    out = f(np.int64(3))
    assert all(jnp.asarray(v).dtype == jnp.int32 for v in out)

    assert i32_index_map(None) is None


def test_block_spec_wraps_and_passes_through():
    from jax.experimental import pallas as pl

    s = block_spec((8, 128), lambda i, j: (i, 0))
    got = jax.eval_shape(
        s.index_map,
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32),
    )
    assert all(o.dtype == jnp.int32 for o in got)
    assert tuple(s.block_shape) == (8, 128)

    anyspec = block_spec(memory_space=pl.ANY)
    assert anyspec.index_map is None


def test_dma_helpers_cast_slot_to_i32():
    """The streamed kernels' double-buffer DMA helpers must cast their
    slot argument to int32: a bare Python ``0`` (the step-0 prologue
    call) lowers as an i64 tpu.memref_slice operand under x64 and fails
    Mosaic verification on hardware ("operand #1 must be ... 32-bit ...
    but got 'i64'", found on-chip round 4).  The indexer lives in eqn
    params, so no jaxpr-level scan can see it — pin the cast in source."""
    ops = Path(ia.__file__).parent / "ops"
    for name in ("pallas_resize.py", "pil_exact.py"):
        src = (ops / name).read_text()
        for m in re.finditer(r"def dma\(slot[^)]*\):\n(\s+)(.*)", src):
            first_line = m.group(2)
            assert "jnp.int32(slot)" in first_line, (
                f"{name}: dma() must open with slot = jnp.int32(slot)"
            )


def test_kernel_modules_only_use_wrapped_blockspec():
    """Source discipline: a raw pl.BlockSpec in a kernel module would
    reintroduce i64 index-map constants under x64 silently (CI cannot
    catch the Mosaic failure)."""
    ops = Path(ia.__file__).parent / "ops"
    for name in ("pallas_resize.py", "pil_exact.py", "crop_pallas.py"):
        src = (ops / name).read_text()
        assert not re.search(r"\bpl\.BlockSpec\(", src), (
            f"{name}: use pallas_compat.block_spec (_bspec), not "
            "pl.BlockSpec — see tests/test_x64_compat.py docstring"
        )


def _pallas_kernel_jaxprs(closed):
    """Yield every pallas_call kernel jaxpr reachable from a closed jaxpr."""
    stack = [closed.jaxpr]
    while stack:
        j = stack.pop()
        for eqn in j.eqns:
            if eqn.primitive.name == "pallas_call":
                yield eqn.params["jaxpr"]
            for v in eqn.params.values():
                if hasattr(v, "eqns"):
                    stack.append(v)
                elif hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                    stack.append(v.jaxpr)


def _assert_no_i64(kjaxpr, label):
    """Flag int64 values Mosaic would have to lower dynamically.

    Static-literal i64 indices (e.g. ``x_ref[bi]`` with a Python int)
    constant-fold to static slices and compile fine — verified on-chip —
    so literals are exempt.  NB the DMA-slot literal hazard
    (``win.at[0]`` -> tpu.memref_slice i64 operand) is NOT visible at
    this level: ref-transform indexers live in eqn *params*, not invars,
    so it is pinned separately by
    test_dma_helpers_cast_slot_to_i32 (source level)."""
    from jax._src.core import Literal

    bad = []
    for eqn in kjaxpr.eqns:
        for var in list(eqn.invars) + list(eqn.outvars):
            aval = getattr(var, "aval", None)
            dt = getattr(aval, "dtype", None)
            if dt is None or dt not in (jnp.int64, jnp.uint64):
                continue
            if isinstance(var, Literal):
                continue
            bad.append((eqn.primitive.name, str(dt)))
    assert not bad, f"{label}: int64 values in kernel jaxpr: {bad[:8]}"


@pytest.mark.parametrize(
    "shape,out",
    [
        ((1, 3, 96, 128), (48, 64)),  # whole-image digit kernel geometry
        ((1, 1, 2160, 3840), (1080, 1920)),  # streamed row-window (4K)
    ],
)
def test_digit_kernel_jaxprs_are_i64_free(shape, out, monkeypatch):
    """What Mosaic lowers (the kernel jaxprs) must not contain int64 —
    the DMA-slot literal regression (pil_exact/pallas_resize dma())
    shows up here as an int64 literal operand."""
    from interpolate_antialiasing_tpu.ops import pil_exact
    from interpolate_antialiasing_tpu.ops.pil_exact import resize_pil_exact

    # force the TPU digit route; pallas stays in interpret mode on CPU
    monkeypatch.setattr(pil_exact, "_use_tpu_kernels", lambda: True)
    x = jnp.zeros(shape, jnp.uint8)
    closed = jax.make_jaxpr(
        lambda a: resize_pil_exact(a, out, "bilinear")
    )(x)
    kernels = list(_pallas_kernel_jaxprs(closed))
    assert kernels, "expected at least one pallas_call in the digit route"
    streamed = shape[-2] > 1024
    if streamed:  # the 4K case must scan the DMA'd streamed kernel
        assert any(
            any("dma" in e.primitive.name for e in k.eqns) for k in kernels
        ), "expected the streamed (DMA) kernel in the 4K route"
    for k in kernels:
        _assert_no_i64(k, f"pil_exact {shape}->{out}")


def test_float_streamed_kernel_jaxpr_is_i64_free():
    from interpolate_antialiasing_tpu.ops.pallas_resize import (
        resize2d_streamed,
    )

    from interpolate_antialiasing_tpu.ops.weights import make_axis_spec

    shape, out = (1, 1, 512, 640), (128, 160)
    spec_h = make_axis_spec(shape[-2], out[0], "bilinear")
    spec_w = make_axis_spec(shape[-1], out[1], "bilinear")
    x = jnp.zeros(shape, jnp.float32)
    closed = jax.make_jaxpr(
        lambda a: resize2d_streamed(a, spec_h, spec_w)
    )(x)
    kernels = list(_pallas_kernel_jaxprs(closed))
    assert kernels
    for k in kernels:
        _assert_no_i64(k, "resize2d_streamed")
