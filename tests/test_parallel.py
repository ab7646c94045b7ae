"""Sharding tests on the 8-device virtual CPU mesh (SURVEY §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import interpolate_antialiasing_tpu as ia
from interpolate_antialiasing_tpu.parallel import (
    data_parallel_resize,
    halo_resize_h,
    make_mesh,
    plan_halo,
    shard_batch,
)


def test_eight_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_matches_local(test_image):
    x = jnp.asarray(
        np.stack([np.asarray(test_image, np.float32) + i for i in range(8)])
    )
    mesh = make_mesh()
    y = data_parallel_resize(x, (96, 120), mesh=mesh)
    y_ref = ia.resize(x, (96, 120))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-4)
    # output stays batch-sharded
    assert y.sharding.spec == P("data", None, None, None)


def test_data_parallel_is_collective_free(test_image):
    """Pin sharding.py's 'XLA inserts no collectives' claim in the compiled
    HLO itself: the batch-sharded resize module must contain no
    all-reduce / all-gather / reduce-scatter / collective-permute /
    all-to-all (output-sharding checks alone wouldn't catch XLA
    round-tripping through a gather)."""
    from jax.sharding import NamedSharding

    mesh = make_mesh()
    sh = NamedSharding(mesh, P("data", None, None, None))
    x = jnp.asarray(
        np.stack([np.asarray(test_image, np.float32)] * 8)
    )

    f = jax.jit(lambda t: ia.resize(t, (96, 120)), in_shardings=sh,
                out_shardings=sh)
    hlo = f.lower(x).compile().as_text()
    for coll in ("all-reduce", "all-gather", "reduce-scatter",
                 "collective-permute", "all-to-all"):
        assert coll not in hlo, f"collective {coll} in DP resize HLO"


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("in_h,out_h", [(64, 32), (32, 64), (128, 48)])
def test_halo_resize_matches_local(rng, mode, in_h, out_h):
    mesh = make_mesh((8,), ("sp",))
    x = jnp.asarray(rng.random((2, 3, in_h, 40)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "sp", None)))
    y = halo_resize_h(xs, out_h, mesh, mode=mode)
    from interpolate_antialiasing_tpu.ops.weights import make_axis_spec
    from interpolate_antialiasing_tpu.ops.resize_xla import resize_axis_dense

    ref = resize_axis_dense(x, make_axis_spec(in_h, out_h, mode), 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_halo_plan_static():
    halo, Wl = plan_halo(64, 32, "bilinear", True, 8)
    # scale 2, support 2 => windows span 5 rows; local blocks of 8 input
    # rows need at most a few neighbour rows.
    assert 0 < halo <= 4
    assert Wl.shape == (8, 4, 8 + 2 * halo)
    np.testing.assert_allclose(Wl.sum(axis=2), 1.0, atol=1e-12)


def test_full_2d_sharded_pipeline(rng):
    """W pass local + H pass halo-sharded == unsharded 2-D resize."""
    mesh = make_mesh((8,), ("sp",))
    x = jnp.asarray(rng.random((1, 3, 64, 96)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "sp", None)))

    @jax.jit
    def sharded(t):
        t = ia.resize_plane(t, (64, 48), 2, 3, mode="bilinear", backend="dense")
        # ^ W axis only (H unchanged) — stays local per shard
        return halo_resize_h(t, 32, mesh, mode="bilinear")

    y = sharded(xs)
    ref = ia.resize_plane(x, (32, 48), 2, 3, mode="bilinear", backend="dense")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_train_pipeline_batch_sharded(rng):
    """DP preprocessing at scale: the full train-aug pipeline under jit with
    a batch-sharded input keeps the output batch-sharded and matches the
    unsharded run exactly (per-image RNG derives from the key, not the
    device placement)."""
    from interpolate_antialiasing_tpu.models import ImageNetTrainPipeline

    mesh = make_mesh()
    pipe = ImageNetTrainPipeline(size=(16, 16))
    x = jnp.asarray((np.stack([
        (rng.random((3, 40, 56)) * 255) for _ in range(8)
    ])).astype(np.uint8))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    key = jax.random.PRNGKey(3)

    f = jax.jit(pipe, in_shardings=(None, NamedSharding(mesh, P("data"))),
                out_shardings=NamedSharding(mesh, P("data")))
    ys = f(key, xs)
    assert ys.sharding.spec[0] == "data"  # batch axis stays sharded
    y_ref = jax.jit(pipe)(key, x)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
@pytest.mark.parametrize("in_h,out_h", [(67, 29), (50, 111), (129, 40)])
def test_halo_resize_non_divisible(rng, mode, in_h, out_h):
    """v2: sizes need not divide the mesh axis (ceil blocks + zero-weight
    pad rows + output slice).  NamedSharding itself cannot express an
    uneven split, so the caller passes the logical array and the internal
    pad + shard_map distributes it."""
    mesh = make_mesh((8,), ("sp",))
    x = jnp.asarray(rng.random((2, 3, in_h, 40)).astype(np.float32))
    y = halo_resize_h(x, out_h, mesh, mode=mode)
    from interpolate_antialiasing_tpu.ops.weights import make_axis_spec
    from interpolate_antialiasing_tpu.ops.resize_xla import resize_axis_dense

    ref = resize_axis_dense(x, make_axis_spec(in_h, out_h, mode), 2)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_halo_resize_banded_pallas_matches_dense(rng):
    """The banded Pallas local pass (interpret mode on CPU) must agree with
    the dense einsum formulation."""
    mesh = make_mesh((8,), ("sp",))
    x = jnp.asarray(rng.random((1, 2, 48, 40)).astype(np.float32))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None, "sp", None)))
    yb = halo_resize_h(xs, 24, mesh, mode="bicubic", use_pallas=True)
    yd = halo_resize_h(xs, 24, mesh, mode="bicubic", use_pallas=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yd), atol=1e-5)


@pytest.mark.parametrize("in_hw,ohw", [((67, 53), (29, 31)), ((64, 96), (32, 48))])
def test_resize_sharded_full_2d(rng, in_hw, ohw):
    """resize_sharded == unsharded resize_plane (W local + halo H pass)."""
    from interpolate_antialiasing_tpu.parallel import resize_sharded

    mesh = make_mesh((8,), ("sp",))
    x = jnp.asarray(rng.random((1, 3, *in_hw)).astype(np.float32))
    if in_hw[0] % 8 == 0:
        x = jax.device_put(x, NamedSharding(mesh, P(None, None, "sp", None)))
    y = resize_sharded(x, ohw, mesh)
    ref = ia.resize_plane(x, ohw, 2, 3, mode="bilinear", backend="dense")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_resize_sharded_uint8(rng):
    from interpolate_antialiasing_tpu.parallel import resize_sharded

    mesh = make_mesh((8,), ("sp",))
    x = jnp.asarray((rng.random((3, 66, 50)) * 255).astype(np.uint8))
    y = resize_sharded(x, (30, 26), mesh, data_format="CHW")
    ref = ia.resize(x, (30, 26), backend="dense")
    d = np.abs(np.asarray(y).astype(int) - np.asarray(ref).astype(int)).max()
    # <=1: per-shard accumulation order can flip a 0.5 rounding boundary
    assert y.dtype == jnp.uint8 and d <= 1, d


def test_plan_halo_banded_geometry():
    plan = ia.parallel.plan_halo_banded(67, 29, "bilinear", True, 8) \
        if hasattr(ia, "parallel") else None
    from interpolate_antialiasing_tpu.parallel import plan_halo_banded

    plan = plan_halo_banded(67, 29, "bilinear", True, 8)
    assert plan.hl == 9 and plan.ol == 4
    assert (plan.starts % 8 == 0).all()
    assert plan.bands.shape == (8, plan.n_tiles, plan.k_in, 128)
    # every real output row's weights sum to 1
    sums = plan.Wl.sum(axis=2)  # [8, ol]
    flat = sums.reshape(-1)[:29]
    np.testing.assert_allclose(flat, 1.0, atol=1e-12)


# ---------------------------------------------------------------------------
# Round 2b: gradients through the explicit shard_map path
# ---------------------------------------------------------------------------


def _sharded_loss(v, mesh, use_pallas):
    from interpolate_antialiasing_tpu.parallel import resize_sharded

    y = resize_sharded(v, (40, 48), mesh, mode="bicubic",
                       use_pallas=use_pallas)
    return jnp.sum(jnp.sin(y))


@pytest.mark.parametrize("use_pallas", [False, True])
def test_resize_sharded_grad_matches_unsharded(rng, use_pallas):
    """jax.grad through resize_sharded (ppermute ring + local passes) must
    equal the gradient of the unsharded op.  The Pallas local contraction
    carries a custom VJP (exact transposed band, shard-local); the ring
    exchange and pad/slice transpose via standard rules.  Round 2 had no
    gradient on this path at all (STATUS limitation, now lifted)."""
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    x = jnp.asarray(rng.random((2, 64, 96)).astype(np.float32))

    def loss_ref(v):
        y = ia.resize_plane(v, (40, 48), 1, 2, mode="bicubic", backend="xla")
        return jnp.sum(jnp.sin(y))

    g_ref = jax.grad(loss_ref)(x)
    g = jax.grad(lambda v: _sharded_loss(v, mesh, use_pallas))(x)
    tol = 1e-5 if use_pallas else 1e-6
    assert float(jnp.max(jnp.abs(g - g_ref))) <= tol


def test_halo_resize_h_adjoint_identity(rng):
    """<W x, y> == <x, W^T y> through halo_resize_h's full shard_map chain
    (pad + ppermute exchange + local contraction + slice), both routes."""
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    x = jnp.asarray(rng.random((3, 56, 64)).astype(np.float32))
    y = jnp.asarray(rng.random((3, 24, 64)).astype(np.float32))
    for up in (False, True):
        f = lambda v: halo_resize_h(v, 24, mesh, mode="bilinear",
                                    use_pallas=up)
        fx, vjp = jax.vjp(f, x)
        (xt,) = vjp(y)
        lhs = float(jnp.vdot(fx, y))
        rhs = float(jnp.vdot(x, xt))
        assert abs(lhs - rhs) <= 1e-3 * max(1.0, abs(lhs)), (up, lhs, rhs)


def test_resize_sharded_check_grads_fwd_rev(rng):
    """check_grads fwd+rev through resize_sharded's full shard_map chain —
    the local contraction is a registered primitive now (round 3), so
    forward-mode jax.jvp works on the explicit sharded path too (round 2's
    custom_vjp made it reverse-only; STATUS limitation lifted)."""
    from jax.test_util import check_grads

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    x = jnp.asarray(rng.random((2, 48, 40)).astype(np.float64))

    def f(v):
        from interpolate_antialiasing_tpu.parallel import resize_sharded

        return resize_sharded(v, (24, 20), mesh, mode="bicubic",
                              use_pallas=False)

    check_grads(f, (x,), order=2, modes=["fwd", "rev"], atol=1e-6, rtol=1e-6)


def test_resize_sharded_jvp_pallas_matches_dense(rng):
    """Forward-mode jvp through the banded Pallas local pass equals the
    dense route's jvp (the Pallas pass computes in f32, so finite
    differences are compared against the dense formulation instead)."""
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("sp",))
    x = jnp.asarray(rng.random((2, 48, 40)).astype(np.float32))
    v = jnp.asarray(rng.random((2, 48, 40)).astype(np.float32))

    def f(up):
        from interpolate_antialiasing_tpu.parallel import resize_sharded

        return lambda t: resize_sharded(t, (24, 20), mesh, mode="bicubic",
                                        use_pallas=up)

    yp, tp = jax.jvp(f(True), (x,), (v,))
    yd, td = jax.jvp(f(False), (x,), (v,))
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yd), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(td), atol=1e-5)


def test_halo_weight_operands_not_differentiable(rng):
    """Differentiating w.r.t. the halo weight operands raises instead of
    silently returning zeros (round-2 advisor finding)."""
    from interpolate_antialiasing_tpu.parallel.halo import (
        halo_local_contract_p,
    )

    ext3 = jnp.asarray(rng.random((1, 16, 8)).astype(np.float32))
    starts = jnp.zeros((2,), jnp.int32)
    bands = jnp.asarray(rng.random((2, 16, 128)).astype(np.float32))
    WdT = jnp.asarray(rng.random((16, 8)).astype(np.float32))

    def wrt_bands(b):
        return halo_local_contract_p.bind(ext3, starts, b, WdT,
                                          out_size=8).sum()

    with pytest.raises(TypeError, match="not differentiable"):
        jax.grad(wrt_bands)(bands)
