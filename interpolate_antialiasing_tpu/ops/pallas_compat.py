"""x64-proof BlockSpec construction for every Pallas call in the library.

Under ``jax_enable_x64=True`` a bare Python ``0`` returned from a
BlockSpec ``index_map`` lowers as an i64 constant, and Mosaic refuses to
legalize the index-map's ``func.return`` with mixed ``(i32, i64, i64)``
operands ("failed to legalize operation 'func.return'").  A user only
has to flip x64 on — e.g. for float64 gradcheck, which this library
explicitly supports — and every uint8/float Pallas route would crash at
compile time on real hardware (found driving ``resize(uint8)`` on-chip
with x64 enabled, round 4; interpret mode does not catch it, so CI
can't).

``block_spec`` is a drop-in ``pl.BlockSpec`` replacement that casts every
index-map component to int32 at trace time.  int32 is always sufficient:
index-map outputs are *block* indices, bounded by array_dim/block_dim,
and no supported workload approaches 2**31 blocks along any dimension.

The reference never meets this class of bug (C++ kernels own their index
types end to end — int64_t everywhere, /root/reference/step_zero/
aa_interpolation_impl.h:828-837); in JAX the index dtype is ambient
config, so the library must pin it itself.
"""

from __future__ import annotations

__all__ = ["block_spec", "i32_index_map"]


def i32_index_map(f):
    """Wrap an index_map so every returned component is int32.

    Handles Python ints (the hazard), numpy ints, and traced grid/scalar
    values alike; preserves ``None`` (no index map).
    """
    if f is None:
        return None

    def wrapped(*args):
        import jax.numpy as jnp

        out = f(*args)
        if not isinstance(out, tuple):
            out = (out,)
        return tuple(jnp.int32(v) for v in out)

    return wrapped


def block_spec(block_shape=None, index_map=None, *, memory_space=None):
    """``pl.BlockSpec`` with an x64-safe (int32) index map.

    Mirrors the ``BlockSpec(shape, lambda ...)`` call shape used across
    the kernel modules, including the memory-space-only form
    ``block_spec(memory_space=pl.ANY)``.
    """
    from jax.experimental import pallas as pl

    kwargs = {}
    if memory_space is not None:
        kwargs["memory_space"] = memory_space
    if block_shape is None and index_map is None:
        return pl.BlockSpec(**kwargs)
    return pl.BlockSpec(block_shape, i32_index_map(index_map), **kwargs)
