"""Spatially-sharded resize with ICI halo exchange (shard_map + ppermute).

The analogue of sequence/context parallelism for this workload (SURVEY §2.5,
§5 "long-context"): when one image's H axis is sharded across devices, each
device needs ``halo`` neighbouring input rows to produce its local output
rows — ``halo`` is derived exactly from the weight tables (window extents),
the reference's ``interp_size = ceil(support*scale)*2+1`` reasoning
(step_two_dot_two/aa_interpolation_impl.h:208-210).

Communication is two neighbour ``ppermute`` shifts (rides the ICI ring),
not an all-gather: bytes moved per device are ``halo * W`` instead of
``H * W``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.weights import compute_tables, make_axis_spec

__all__ = ["halo_resize_h", "plan_halo"]


@functools.cache
def plan_halo(in_size: int, out_size: int, mode: str, antialias: bool, n_shards: int):
    """Static plan: halo row count + per-shard local weight matrices.

    Returns ``(halo, Wl)`` with ``Wl[d] in [out_local, in_local + 2*halo]``
    mapping the extended local rows (wrap-around halo rows carry zero
    weight at the global edges, so ring garbage never contributes).
    """
    if in_size % n_shards or out_size % n_shards:
        raise ValueError(
            f"H sizes must divide the mesh axis: {in_size}->{out_size} over {n_shards}"
        )
    spec = make_axis_spec(in_size, out_size, mode, antialias)
    xmin, size, w = compute_tables(spec, dtype=np.float64)
    hl, ol = in_size // n_shards, out_size // n_shards
    halo = 0
    for d in range(n_shards):
        o0, o1 = d * ol, (d + 1) * ol
        lo = int(xmin[o0])
        hi = int(xmin[o1 - 1] + size[o1 - 1])
        halo = max(halo, d * hl - lo, hi - (d + 1) * hl)
    halo = max(halo, 0)
    if halo > hl:
        raise ValueError(
            f"halo ({halo} rows) exceeds the local shard height ({hl}): the "
            f"one-hop neighbour exchange cannot serve it — use fewer shards "
            f"or a smaller filter (mode={mode!r}, {in_size}->{out_size} over "
            f"{n_shards})"
        )

    Wl = np.zeros((n_shards, ol, hl + 2 * halo), dtype=np.float64)
    for d in range(n_shards):
        base = d * hl - halo  # global row index of extended-local row 0
        for o in range(d * ol, (d + 1) * ol):
            for j in range(int(size[o])):
                col = int(xmin[o]) + j - base
                assert 0 <= col < hl + 2 * halo, "halo underestimated"
                Wl[d, o - d * ol, col] = w[o, j]
    Wl.setflags(write=False)  # cached: callers must not mutate
    return halo, Wl


def halo_resize_h(
    x: jax.Array,
    out_h: int,
    mesh: Mesh,
    axis: str = "sp",
    mode: str = "bilinear",
    antialias: bool = True,
    h_axis: int = -2,
) -> jax.Array:
    """Resize the (sharded) ``h_axis`` of ``x`` to ``out_h``.

    ``x`` is expected sharded along ``h_axis`` over mesh axis ``axis``;
    output has the same sharding.  Only the H pass happens here — combine
    with a local W pass for full 2-D resize of giant images.
    """
    h_axis = h_axis % x.ndim
    in_size = x.shape[h_axis]
    n = mesh.shape[axis]
    halo, Wl_np = plan_halo(in_size, out_h, mode, antialias, n)
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    Wl = jnp.asarray(Wl_np, dtype=cdtype)

    pspec = P(*[axis if i == h_axis else None for i in range(x.ndim)])

    def local(xl):
        d = jax.lax.axis_index(axis)
        if halo > 0:
            # rows just above my block live at the bottom of the previous
            # shard: shift them "down" the ring; and vice versa below.
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            top = jax.lax.ppermute(
                jax.lax.slice_in_dim(xl, xl.shape[h_axis] - halo, None, axis=h_axis),
                axis,
                perm=fwd,
            )
            bot = jax.lax.ppermute(
                jax.lax.slice_in_dim(xl, 0, halo, axis=h_axis), axis, perm=bwd
            )
            ext = jnp.concatenate([top, xl, bot], axis=h_axis)
        else:
            ext = xl
        Wd = Wl[d]  # [ol, hl + 2*halo]
        ext = jnp.moveaxis(ext.astype(cdtype), h_axis, -1)
        y = jnp.einsum(
            "...h,oh->...o", ext, Wd, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.moveaxis(y, -1, h_axis)

    f = jax.shard_map(local, mesh=mesh, in_specs=pspec, out_specs=pspec)
    return f(x)
