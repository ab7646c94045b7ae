"""Mesh/batch sharding for resize workloads (SURVEY §2.5).

The reference is single-process CPU with OpenMP-only parallelism; the
TPU-native scaling story is:

  * **data parallel** — resize is elementwise per image, so batch sharding
    over the mesh is exact and collective-free (jit + NamedSharding inserts
    nothing but the initial scatter);
  * **spatial parallel** — for images too large for one chip, split H
    across devices with halo exchange (see halo.py), the analogue of
    sequence parallelism for this workload.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "data_parallel_resize"]


def make_mesh(
    shape: Sequence[int] | None = None, axis_names: Sequence[str] = ("data",)
) -> Mesh:
    """Create a device mesh; default: all devices on one 'data' axis."""
    devs = jax.devices()
    if shape is None:
        shape = (len(devs),)
    need = int(np.prod(shape))
    if len(devs) < need:
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {need} devices, have {len(devs)}"
        )
    arr = np.asarray(devs[:need]).reshape(shape)
    return Mesh(arr, axis_names)


def shard_batch(x: jax.Array, mesh: Mesh, axis: str = "data") -> jax.Array:
    """Place ``x`` with its leading (batch) dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def data_parallel_resize(
    x: jax.Array,
    size,
    mesh: Mesh | None = None,
    axis: str = "data",
    **kw,
):
    """Batch-sharded resize: jit with sharded in/out over the mesh.

    Each device resizes its local shard; no cross-device communication is
    required (XLA inserts none — test_parallel compiles the module over an
    8-device mesh and asserts the HLO text contains no all-reduce /
    all-gather / reduce-scatter / collective-permute / all-to-all, plus
    checks the output sharding).
    """
    mesh = mesh or make_mesh()
    spec = P(axis, *([None] * (x.ndim - 1)))
    sh = NamedSharding(mesh, spec)
    xs = jax.device_put(x, sh)
    f = _dp_resize_jit(sh, tuple(int(v) for v in size),
                       tuple(sorted(kw.items())))
    return f(xs)


import functools


@functools.lru_cache(maxsize=64)
def _dp_resize_jit(sh, size, kw_items):
    # jit caches by function identity: building a fresh lambda per call
    # would recompile every time, so the jitted executable is cached here
    # keyed on (sharding, size, kwargs).
    from ..ops.resize import resize

    kw = dict(kw_items)
    return jax.jit(
        lambda t: resize(t, size, **kw), in_shardings=sh, out_shardings=sh
    )
