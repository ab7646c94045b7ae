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

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.weights import _round_up, compute_tables, make_axis_spec

__all__ = ["halo_resize_h", "plan_halo", "plan_halo_banded", "resize_sharded"]


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


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Static plan for a sharded H pass with uniform per-shard band geometry.

    ``starts[d, t]`` / ``bands[d, t, k, u]`` give shard ``d``'s banded tiles
    in the *extended-local* frame (``ext_pad`` rows = local block + halos,
    padded to the 8-row DMA alignment); ``Wl[d]`` is the dense equivalent
    for the einsum fallback.  All shards share (k_in, n_tiles), so under
    ``shard_map`` every device runs the identical Pallas program selecting
    its values with ``lax.axis_index``.
    """

    halo: int
    hl: int  # local input rows per shard (ceil)
    ol: int  # local output rows per shard (ceil)
    ext: int  # hl + 2*halo
    ext_pad: int
    k_in: int
    n_tiles: int
    starts: np.ndarray  # [n_shards, n_tiles] int32, multiples of 8
    bands: np.ndarray  # [n_shards, n_tiles, k_in, 128] float32
    Wl: np.ndarray  # [n_shards, ol, ext_pad] float64 (dense fallback)


@functools.cache
def plan_halo_banded(
    in_size: int,
    out_size: int,
    mode: str,
    antialias: bool,
    n_shards: int,
    tile: int = 128,
    align: int = 8,
) -> HaloPlan:
    """Banded v2 of :func:`plan_halo`: non-divisible sizes allowed (shards
    use ceil-sized blocks; the caller pads the global H to ``n*hl`` rows and
    slices the output back to ``out_size``), and the weights come as
    tile-compacted bands with shard-uniform geometry for the Pallas pass.
    """
    spec = make_axis_spec(in_size, out_size, mode, antialias)
    xmin, size, w = compute_tables(spec, dtype=np.float64)
    n = n_shards
    hl = -(-in_size // n)
    ol = -(-out_size // n)
    halo = 0
    for d in range(n):
        o0, o1 = d * ol, min((d + 1) * ol, out_size)
        if o0 >= o1:
            continue
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
    ext = hl + 2 * halo
    ext_pad = _round_up(ext, align)
    n_tiles = -(-ol // tile)

    # Per-(shard, tile) window bounds in the extended-local frame, then a
    # single k_in wide enough for every tile of every shard.
    los = np.zeros((n, n_tiles), dtype=np.int64)
    his = np.ones((n, n_tiles), dtype=np.int64)
    for d in range(n):
        base = d * hl - halo  # global row of extended-local row 0
        for t in range(n_tiles):
            o0 = d * ol + t * tile
            o1 = min(o0 + tile, min((d + 1) * ol, out_size))
            if o0 >= o1:
                los[d, t], his[d, t] = 0, 1
                continue
            los[d, t] = (int(xmin[o0]) - base) // align * align
            his[d, t] = int(xmin[o1 - 1] + size[o1 - 1]) - base
    k_in = min(_round_up(int((his - los).max()), align), ext_pad)

    starts = np.zeros((n, n_tiles), dtype=np.int32)
    bands = np.zeros((n, n_tiles, k_in, tile), dtype=np.float64)
    Wl = np.zeros((n, ol, ext_pad), dtype=np.float64)
    for d in range(n):
        base = d * hl - halo
        for t in range(n_tiles):
            s = max(0, min(int(los[d, t]), ext_pad - k_in))
            starts[d, t] = s
            o0 = d * ol + t * tile
            o1 = min(o0 + tile, min((d + 1) * ol, out_size))
            for o in range(o0, o1):
                for j in range(int(size[o])):
                    col = int(xmin[o]) + j - base
                    assert 0 <= col < ext, "halo underestimated"
                    assert 0 <= col - s < k_in, "window underestimated"
                    bands[d, t, col - s, o - o0] = w[o, j]
                    Wl[d, o - d * ol, col] = w[o, j]
    for a in (starts, bands, Wl):
        a.setflags(write=False)
    return HaloPlan(
        halo=halo, hl=hl, ol=ol, ext=ext, ext_pad=ext_pad, k_in=k_in,
        n_tiles=n_tiles, starts=starts, bands=bands.astype(np.float32), Wl=Wl,
    )


# The shard-local banded H contraction as a registered JAX primitive (the
# ops/primitive.py pattern): the op is LINEAR in the image rows, so forward
# mode (jax.jvp) is the op applied to the tangent and reverse mode is the
# exact transposed local contraction ``WdT @ g`` — shard-local, no
# communication (the ring-exchange transpose is handled by ppermute's own
# rules outside).  Round 2 used jax.custom_vjp here, which made the sharded
# path reverse-only and returned int32 zeros as the cotangent of the integer
# ``starts`` operand (two round-2 advisor findings); the primitive gives
# fwd+rev on the explicit shard_map path and never fabricates cotangents.
# Unlike ops/primitive.py's specs-as-static-params, the operands here are
# TRACED (each device selects its shard's starts/bands via lax.axis_index),
# so they are primitive operands, not params.
from jax import core as _core
from jax.extend.core import Primitive as _Primitive
from jax.interpreters import ad as _ad, mlir as _mlir

halo_local_contract_p = _Primitive("aa_halo_local_contract")


def _halo_contract_impl(ext3, starts_d, bands_d, WdT, *, out_size):
    from ..ops.pallas_resize import banded_pass_mid_dynamic

    return banded_pass_mid_dynamic(ext3, starts_d, bands_d, out_size=out_size)


def _halo_contract_abstract(ext3, starts_d, bands_d, WdT, *, out_size):
    return _core.ShapedArray(
        (ext3.shape[0], out_size, ext3.shape[2]), ext3.dtype
    )


def _halo_contract_jvp(primals, tangents, *, out_size):
    ext3, starts_d, bands_d, WdT = primals
    t_ext, _t_starts, t_bands, t_WdT = tangents
    y = halo_local_contract_p.bind(
        ext3, starts_d, bands_d, WdT, out_size=out_size
    )
    # The resampling weights are host-built constants; silently returning a
    # zero weight gradient would be a trap if they ever became learnable
    # (round-2 advisor finding) — fail loudly instead.
    if not isinstance(t_bands, _ad.Zero) or not isinstance(t_WdT, _ad.Zero):
        raise TypeError(
            "halo_local_contract: the weight operands (bands/WdT) are "
            "host-built constants and are not differentiable"
        )
    if isinstance(t_ext, _ad.Zero):
        t_y = _ad.Zero.from_primal_value(y)
    else:
        t_y = halo_local_contract_p.bind(
            t_ext, starts_d, bands_d, WdT, out_size=out_size
        )
    return y, t_y


def _halo_contract_transpose(ct, ext3, starts_d, bands_d, WdT, *, out_size):
    assert _ad.is_undefined_primal(ext3), (
        "halo_local_contract is linear in ext3 only"
    )
    if isinstance(ct, _ad.Zero):
        return None, None, None, None
    # d_ext[b, h, w] = sum_o WdT[h, o] ct[b, o, w] — exact transposed band
    d_ext = jnp.einsum(
        "ho,bow->bhw", WdT, ct, precision=jax.lax.Precision.HIGHEST
    ).astype(ct.dtype)
    return d_ext, None, None, None


halo_local_contract_p.def_impl(_halo_contract_impl)
halo_local_contract_p.def_abstract_eval(_halo_contract_abstract)
_ad.primitive_jvps[halo_local_contract_p] = _halo_contract_jvp
_ad.primitive_transposes[halo_local_contract_p] = _halo_contract_transpose
_mlir.register_lowering(
    halo_local_contract_p,
    _mlir.lower_fun(_halo_contract_impl, multiple_results=False),
)


def _local_contract_pallas(ext3, out_size, starts_d, bands_d, WdT):
    """Differentiable shard-local banded H contraction (see primitive above);
    forward runs the Pallas mid-axis banded pass with runtime starts/band
    values — every device runs one program, its shard's values selected by
    ``lax.axis_index``."""
    return halo_local_contract_p.bind(
        ext3, starts_d, bands_d, WdT, out_size=out_size
    )


def _ring_halo_extend(xl, halo: int, n: int, axis: str, h_axis: int):
    """Two-``ppermute`` ring halo exchange along ``h_axis``: prepend the
    previous shard's last ``halo`` rows and append the next shard's first
    ``halo`` rows.  Rows just above my block live at the bottom of the
    previous shard (shift them "down" the ring), and vice versa below.
    The wrap-around rows the first/last shard receive are garbage by
    construction — the consuming contraction MUST give them zero weight
    (both the float plan and the integer tables do)."""
    if halo <= 0:
        return xl
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
    return jnp.concatenate([top, xl, bot], axis=h_axis)


def _halo_local_h(xl, plan: HaloPlan, n: int, axis: str, h_axis: int,
                  starts_all, bands_all, Wl, use_pallas: bool):
    """Shard-local body: ring halo exchange + banded/dense local H pass.
    ``xl`` is one shard's block with ``plan.hl`` rows along ``h_axis``."""
    ext = _ring_halo_extend(xl, plan.halo, n, axis, h_axis)
    d = jax.lax.axis_index(axis)
    if use_pallas:
        pad = [(0, 0)] * ext.ndim
        pad[h_axis] = (0, plan.ext_pad - ext.shape[h_axis])
        ext = jnp.pad(ext, pad)
        lead = ext.shape[:h_axis]
        trail = ext.shape[h_axis + 1 :]
        B = int(np.prod(lead)) if lead else 1
        Wt = int(np.prod(trail)) if trail else 1
        y3 = _local_contract_pallas(
            ext.reshape(B, plan.ext_pad, Wt),
            plan.ol,
            starts_all[d],
            bands_all[d],
            jnp.swapaxes(Wl[d], 0, 1).astype(jnp.float32),
        )
        return y3.reshape(*lead, plan.ol, *trail)
    Wd = Wl[d]  # [ol, ext_pad]
    pad = [(0, 0)] * ext.ndim
    pad[h_axis] = (0, plan.ext_pad - ext.shape[h_axis])
    ext = jnp.moveaxis(jnp.pad(ext, pad), h_axis, -1)
    y = jnp.einsum("...h,oh->...o", ext, Wd, precision=jax.lax.Precision.HIGHEST)
    return jnp.moveaxis(y, -1, h_axis)


def _halo_pallas_supported(plan: HaloPlan, cdtype) -> bool:
    """VMEM admission for the banded Pallas local pass (mirrors every other
    *_supported gate): banded_pass_mid_dynamic floors its column tile at
    128 lanes, so the per-step footprint is the full extended-local row
    block x 128 lanes (double-buffered) plus the resident band."""
    from ..ops.pallas_resize import _VMEM_BUDGET

    in_pad = max(_round_up(plan.ext_pad, 8), plan.k_in)
    band_bytes = plan.n_tiles * plan.k_in * 128 * 4
    itemsize = jnp.dtype(cdtype).itemsize
    return (
        2 * in_pad * 128 * itemsize + band_bytes + 2 * 128 * 128 * 4
        <= _VMEM_BUDGET
    )


def _use_pallas_default(cdtype, h_axis, ndim, plan: HaloPlan) -> bool:
    return (
        jax.default_backend() == "tpu"
        and cdtype in (jnp.float32, jnp.bfloat16)
        and h_axis < ndim - 1  # needs a trailing (lane) dim
        and _halo_pallas_supported(plan, cdtype)
    )


def halo_resize_h(
    x: jax.Array,
    out_h: int,
    mesh: Mesh,
    axis: str = "sp",
    mode: str = "bilinear",
    antialias: bool = True,
    h_axis: int = -2,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Resize the (sharded) ``h_axis`` of ``x`` to ``out_h``.

    ``x`` is expected sharded along ``h_axis`` over mesh axis ``axis``;
    output has the same sharding.  Sizes need NOT divide the mesh axis:
    shards use ceil-sized blocks (the global H is zero-padded to ``n*hl``
    rows — pad rows carry zero weight — and the output is sliced back).
    The local contraction runs as banded Pallas tiles on TPU (shard-uniform
    geometry, per-shard values selected by ``lax.axis_index``) or a dense
    einsum elsewhere.  Only the H pass happens here — see
    :func:`resize_sharded` for the full 2-D pipeline.
    """
    h_axis = h_axis % x.ndim
    in_size = x.shape[h_axis]
    n = mesh.shape[axis]
    plan = plan_halo_banded(in_size, out_h, mode, antialias, n)
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    if use_pallas is None:
        use_pallas = _use_pallas_default(cdtype, h_axis, x.ndim, plan)

    xc = x.astype(cdtype)
    pad_rows = n * plan.hl - in_size
    if pad_rows:
        pad = [(0, 0)] * x.ndim
        pad[h_axis] = (0, pad_rows)
        xc = jnp.pad(xc, pad)
    starts_all = jnp.asarray(plan.starts)
    bands_all = jnp.asarray(plan.bands, dtype=jnp.float32)
    Wl = jnp.asarray(plan.Wl, dtype=cdtype)
    pspec = P(*[axis if i == h_axis else None for i in range(x.ndim)])

    local = functools.partial(
        _halo_local_h, plan=plan, n=n, axis=axis, h_axis=h_axis,
        starts_all=starts_all, bands_all=bands_all, Wl=Wl,
        use_pallas=use_pallas,
    )
    # check_vma=False: pallas_call cannot declare varying-across-mesh axes
    f = jax.shard_map(local, mesh=mesh, in_specs=pspec, out_specs=pspec,
                      check_vma=False)
    y = f(xc)
    if n * plan.ol != out_h:
        y = jax.lax.slice_in_dim(y, 0, out_h, axis=h_axis)
    return y


def resize_sharded(
    x: jax.Array,
    size,
    mesh: Mesh,
    axis: str = "sp",
    mode: str = "bilinear",
    antialias: bool = True,
    data_format: str | None = None,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Full separable 2-D resize of an image whose H axis is sharded over
    ``mesh[axis]`` — for giant images that do not fit (or should not sit on)
    one device.

    One ``shard_map``: the W pass runs fully locally (the W axis is
    unsharded), then the H pass does the two-``ppermute`` halo exchange and
    the banded local contraction.  Sizes need not divide the mesh axis.
    uint8 inputs are resampled in float32 and rounded back PIL-style.

    Differentiable for float inputs — BOTH modes: the W pass is the
    registered per-axis primitive and the local H contraction is the
    registered ``halo_local_contract_p`` primitive (linear jvp + exact
    transposed-band adjoint), so ``jax.jvp`` and ``jax.grad`` through the
    whole shard_map chain equal the unsharded derivatives
    (check_grads fwd+rev over the 8-device virtual mesh in
    tests/test_parallel.py).
    """
    from ..ops.resize import _axes_for

    oh, ow = int(size[0]), int(size[1])
    h_axis, w_axis = _axes_for(x, data_format)
    h_axis, w_axis = h_axis % x.ndim, w_axis % x.ndim
    in_h = x.shape[h_axis]
    n = mesh.shape[axis]
    plan = plan_halo_banded(in_h, oh, mode, antialias, n)
    spec_w = make_axis_spec(x.shape[w_axis], ow, mode, antialias)
    in_dtype = x.dtype
    cdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    if use_pallas is None:
        use_pallas = _use_pallas_default(cdtype, h_axis, x.ndim, plan)

    xc = x.astype(cdtype)
    pad_rows = n * plan.hl - in_h
    if pad_rows:
        pad = [(0, 0)] * x.ndim
        pad[h_axis] = (0, pad_rows)
        xc = jnp.pad(xc, pad)
    starts_all = jnp.asarray(plan.starts)
    bands_all = jnp.asarray(plan.bands, dtype=jnp.float32)
    Wl = jnp.asarray(plan.Wl, dtype=cdtype)
    pspec = P(*[axis if i == h_axis else None for i in range(x.ndim)])

    def local(xl):
        # W pass, fully local: the registered per-axis primitive, so the
        # pass is differentiable (fwd+rev) on every backend route.
        from ..ops.resize import _apply_axis_diff

        yl = _apply_axis_diff(xl, spec_w, w_axis, "auto")
        return _halo_local_h(
            yl, plan=plan, n=n, axis=axis, h_axis=h_axis,
            starts_all=starts_all, bands_all=bands_all, Wl=Wl,
            use_pallas=use_pallas,
        )

    f = jax.shard_map(local, mesh=mesh, in_specs=pspec, out_specs=pspec,
                      check_vma=False)
    y = f(xc)
    if n * plan.ol != oh:
        y = jax.lax.slice_in_dim(y, 0, oh, axis=h_axis)
    if in_dtype == jnp.uint8:
        y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0).astype(jnp.uint8)
    return y


@functools.cache
def _int_halo_tables(in_h: int, oh: int, mode: str, n: int):
    """Per-shard banded integer vertical tables on the halo plan's
    extended-local frame: ``(plan, starts[n, ol] int32,
    Wsh[n, ol, ntaps] int32)``.

    Built from :func:`pil_exact._int_tables` (the exact
    normalize_coeffs_8bpc integers in banded form) shifted into each
    shard's frame — valid because the integer weights' support is never
    wider than the float support they quantise (zeros round to zero), so
    the float-derived halo bound covers them.  Ceil-padding rows beyond
    ``oh`` keep start 0 and all-zero weights; wrap-around halo rows are
    reachable only through zero weights.  Size tracks the filter
    support, never the image — a 100k-row image costs kilobytes of
    tables, not a dense [oh, in_h] matrix."""
    from ..ops.pil_exact import _int_tables

    plan = plan_halo_banded(in_h, oh, mode, True, n)
    xmin, Wb = _int_tables(in_h, oh, mode)
    ntaps = Wb.shape[1]
    starts = np.zeros((n, plan.ol), np.int32)
    Wsh = np.zeros((n, plan.ol, ntaps), np.int32)
    for d in range(n):
        base = d * plan.hl - plan.halo
        o0, o1 = d * plan.ol, min((d + 1) * plan.ol, oh)
        for o in range(o0, o1):
            # the plan's halo bound is derived from these same xmin
            # windows, so every start lands inside the extended block
            s = int(xmin[o]) - base
            assert 0 <= s < plan.ext, "halo bound violated for int weights"
            starts[d, o - o0] = s
            Wsh[d, o - o0] = Wb[o]
    for a in (starts, Wsh):
        a.setflags(write=False)
    return plan, starts, Wsh


def resize_sharded_pil_exact(
    x: jax.Array,
    size,
    mesh: Mesh,
    axis: str = "sp",
    mode: str = "bilinear",
    data_format: str | None = None,
    use_tpu_kernels: bool | None = None,
) -> jax.Array:
    """Byte-exact (``PIL.Image.resize`` equality) 2-D resize of a uint8
    image whose H axis is sharded over ``mesh[axis]`` — the sharded twin
    of ``backend="pil_exact"`` for giant images that live on several
    devices.

    :func:`resize_sharded` resamples uint8 in float32 and re-rounds
    (MaxAbsE <= 1); this route instead reproduces Pillow's arithmetic
    exactly: the W pass runs shard-locally in Pillow's int32 fixed point
    and quantises to the uint8 lattice — the very intermediate
    ImagingResample materialises between its horizontal and vertical
    passes — those quantised rows make the two-``ppermute`` halo
    exchange (uint8 on the wire, a quarter of the float halo bytes), and
    the H pass contracts each shard's extended window against its slice
    of the banded integer vertical tables.  Every step equals Pillow's,
    so the sharded result is byte-identical to single-device
    ``resize_pil_exact`` (pinned in tests/test_parallel_extra.py over
    the 8-device virtual mesh, divisible and ceil-padded sizes).

    Both passes are banded (windows gathered per output index, table
    size tracks the filter support) so the giant images this route
    exists for never materialise a dense [out, in] matrix on host or
    device.

    Two byte-identical execution paths, like the single-device backend:

    * **XLA gather+MAC** (default): int32 windows contraction — correct
      and portable.
    * **int8 digit MXU kernels** (the TPU default since the round-4
      on-chip probe; ``use_tpu_kernels`` / env
      ``IA_TPU_SHARDED_PIL_PALLAS=1|0`` override): the W pass runs the
      EXISTING fused digit kernels as a (hl, W) -> (hl, OW) resize — the
      derived vertical tables for out==in quantise to the exact identity
      for every Pillow filter (all of them are 1 at integer positions
      and 0 at other integers), so the fused kernel's second pass is a
      byte-exact no-op re-quantisation — and the H pass runs
      ``pil_exact.digit_pass_mid_dynamic`` with per-shard digit tables
      (``_digit_halo_tables``) selected by ``lax.axis_index``.
      Measured on chip 2026-08-19 (benchmarks/sharded_digit_probe.py,
      n=1 tables, byte-equality asserted between routes): H pass 0.289
      vs 0.431 ms gather (1.49x), W pass via the identity-table fused
      kernel 0.427 vs 1.421 ms gather (3.33x) — so on TPU the promotion
      is on by default; non-TPU backends keep the gather route.

    Reference analogue: none — the reference is single-process
    (test.py); this is TPU-native surplus on top of §2.5's
    spatial-parallel row.
    """
    import os

    from ..ops.pil_exact import (
        _int_tables,
        _needs_clip,
        _pass_last_int_banded,
        _resize_pil_exact_pallas,
        _resize_pil_exact_streamed,
        digit_pass_mid_dynamic,
        pil_exact_pallas_supported,
        pil_exact_streamed_supported,
    )
    from ..ops.resize import _axes_for

    if x.dtype != jnp.uint8:
        raise TypeError(f"pil_exact sharded path is uint8-only, got {x.dtype}")
    oh, ow = int(size[0]), int(size[1])
    h_axis, w_axis = _axes_for(x, data_format)
    h_axis, w_axis = h_axis % x.ndim, w_axis % x.ndim
    in_h = x.shape[h_axis]
    n = mesh.shape[axis]
    plan, starts_h, Wsh = _int_halo_tables(in_h, oh, mode, n)
    xmin_w, Wb_w = _int_tables(x.shape[w_axis], ow, mode)
    xmin_w_dev, wb_w_dev = jnp.asarray(xmin_w), jnp.asarray(Wb_w)
    starts_dev, wsh_dev = jnp.asarray(starts_h), jnp.asarray(Wsh)

    if use_tpu_kernels is None:
        env = os.environ.get("IA_TPU_SHARDED_PIL_PALLAS")
        if env in ("0", "1"):
            use_tpu_kernels = env == "1"
        else:
            # TPU default ON since the round-4 on-chip probe (docstring);
            # CPU/interpret keeps gather (digit kernels would run the
            # slow interpret path for no gain).
            use_tpu_kernels = jax.default_backend() == "tpu"
    # digit promotion needs the image axes trailing ([..., H, W]); other
    # layouts keep the (byte-identical) gather route
    promote = bool(use_tpu_kernels) and (h_axis, w_axis) == (
        x.ndim - 2, x.ndim - 1
    )
    w_fn = dig_tabs = None
    if promote:
        lead = int(np.prod(x.shape[:-2])) if x.ndim > 2 else 1
        wshape = (lead, plan.hl, x.shape[w_axis])
        if pil_exact_pallas_supported(wshape, plan.hl, ow, mode):
            w_fn = _resize_pil_exact_pallas
        elif pil_exact_streamed_supported(wshape, plan.hl, ow, mode):
            w_fn = _resize_pil_exact_streamed
        _, dstarts, dbands, dct = _digit_halo_tables(in_h, oh, mode, n)
        dig_tabs = (jnp.asarray(dstarts), jnp.asarray(dbands),
                    jnp.asarray(dct))
        clip_h = _needs_clip(in_h, oh, mode)

    xp = x
    pad_rows = n * plan.hl - in_h
    if pad_rows:
        pad = [(0, 0)] * x.ndim
        pad[h_axis] = (0, pad_rows)
        xp = jnp.pad(xp, pad)
    pspec = P(*[axis if i == h_axis else None for i in range(x.ndim)])

    def local(xl):
        # W pass, fully local and exact: either the fused digit kernels
        # with the identity vertical table (promoted) or int32 gather MAC
        if w_fn is not None:
            x3 = xl.reshape(-1, plan.hl, xl.shape[-1])
            yw = w_fn(x3, plan.hl, ow, mode).reshape(*xl.shape[:-1], ow)
        else:
            yw = _pass_last_int_banded(
                jnp.moveaxis(xl, w_axis, -1), xmin_w_dev, wb_w_dev
            )
            yw = jnp.moveaxis(yw, -1, w_axis)
        ext = _ring_halo_extend(yw, plan.halo, n, axis, h_axis)
        d = jax.lax.axis_index(axis)
        if dig_tabs is not None:
            dstarts, dbands, dct = dig_tabs
            ext3 = ext.reshape(-1, ext.shape[h_axis], ow)
            y3 = digit_pass_mid_dynamic(
                ext3, dstarts[d], dbands[d], dct[d], plan.ol, clip=clip_h
            )
            return y3.reshape(*ext.shape[:-2], plan.ol, ow)
        y = _pass_last_int_banded(
            jnp.moveaxis(ext, h_axis, -1), starts_dev[d], wsh_dev[d]
        )
        return jnp.moveaxis(y, -1, h_axis)

    f = jax.shard_map(local, mesh=mesh, in_specs=pspec, out_specs=pspec,
                      check_vma=False)
    y = f(xp)
    if n * plan.ol != oh:
        y = jax.lax.slice_in_dim(y, 0, oh, axis=h_axis)
    return y


@functools.cache
def _digit_halo_tables(in_h: int, oh: int, mode: str, n: int):
    """Per-shard tile-compacted int8 digit tables for the sharded
    byte-exact H pass: ``(plan, starts[n, n_tiles] int32 8-aligned,
    bands[n, n_tiles, k_in, 3*128] int8, ct[n, n_tiles, 128] int32)``.

    The digit twin of :func:`_int_halo_tables`, laid out exactly like
    ops/pil_exact._digit_tiles' H bands (digit planes [d0|d1|d2] along
    result sublanes, ``ct = 128*colsum + 2^(PB-1)``) but with SHARD-
    UNIFORM geometry (one (n_tiles, k_in) across shards) so a single
    shard_map program can select its shard's values by ``lax.axis_index``
    and feed them to pil_exact.digit_pass_mid_dynamic as traced
    operands."""
    from ..ops.pil_exact import PRECISION_BITS, _split_digits

    plan, row_starts, Wsh = _int_halo_tables(in_h, oh, mode, n)
    ntaps = Wsh.shape[2]
    tile = 128
    n_tiles = -(-plan.ol // tile)
    ext_pad = _round_up(plan.ext, 8)
    los = np.zeros((n, n_tiles), np.int64)
    k_in = 8
    for d in range(n):
        for t in range(n_tiles):
            o0, o1 = t * tile, min((t + 1) * tile, plan.ol)
            nz = Wsh[d, o0:o1].any(axis=1)
            if not nz.any():  # pad rows only (beyond oh)
                continue
            rs = row_starts[d, o0:o1][nz].astype(np.int64)
            last = ntaps - 1 - np.argmax(
                Wsh[d, o0:o1][nz, ::-1] != 0, axis=1
            )
            los[d, t] = (int(rs.min()) // 8) * 8
            k_in = max(k_in, int((rs + last).max()) + 1 - int(los[d, t]))
    k_in = min(_round_up(k_in, 8), ext_pad)
    starts = np.minimum(los, max(ext_pad - k_in, 0)).astype(np.int32)

    Kb = np.zeros((n, n_tiles, k_in, tile), np.int32)
    ct = np.zeros((n, n_tiles, tile), np.int64)
    for d in range(n):
        for t in range(n_tiles):
            s = int(starts[d, t])
            o0, o1 = t * tile, min((t + 1) * tile, plan.ol)
            for o in range(o0, o1):
                r0 = int(row_starts[d, o]) - s
                w = Wsh[d, o]
                for j in np.nonzero(w)[0]:
                    assert 0 <= r0 + j < k_in, "digit window underestimated"
                    Kb[d, t, r0 + int(j), o - o0] = int(w[j])
                ct[d, t, o - o0] = 128 * int(w.sum())
    ct += 1 << (PRECISION_BITS - 1)
    assert np.abs(ct).max() < 2**31
    D = _split_digits(Kb)  # [3, n, n_tiles, k_in, 128] int8
    bands = np.concatenate([D[0], D[1], D[2]], axis=-1)
    ct = ct.astype(np.int32)
    for a in (starts, bands, ct):
        a.setflags(write=False)
    return plan, starts, bands, ct
