"""Gradient tests (rebuild of reference test.py:387-401 gradcheck).

The reference runs torch gradcheck against an inconsistent non-AA backward
(SURVEY §2.3); here the custom VJP is the exact adjoint, so finite-difference
checks pass for every mode, both directions, and both spatial axes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

import interpolate_antialiasing_tpu as ia

MODES = ["bilinear", "bicubic", "box"]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("ohw", [(11, 13), (29, 31), (13, 29)])
def test_check_grads_f64(mode, ohw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 2, 19, 23)))  # float64 under x64
    f = lambda t: ia.resize_plane(t, ohw, 2, 3, mode=mode)
    check_grads(f, (x,), order=2, modes=["fwd", "rev"], atol=1e-6, rtol=1e-6)


def test_vjp_is_transpose():
    """<W x, y> == <x, W^T y> to float64 precision."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 1, 17, 19)))
    y = jnp.asarray(rng.random((1, 1, 9, 11)))
    f = lambda t: ia.resize_plane(t, (9, 11), 2, 3, mode="bicubic")
    out, vjp = jax.vjp(f, x)
    (gx,) = vjp(y)
    lhs = float(jnp.vdot(out, y))
    rhs = float(jnp.vdot(x, gx))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def test_backward_shims_match_autodiff():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 3, 19, 23), dtype=np.float64))
    g = jnp.asarray(rng.random((2, 3, 9, 11), dtype=np.float64))
    for mode, shim in [
        ("bilinear", ia.linear_backward),
        ("nearest", ia.nearest_backward),
        ("bicubic", ia.cubic_backward),
    ]:
        f = lambda t: ia.resize_plane(t, (9, 11), 2, 3, mode=mode)
        gx = jax.vjp(f, x)[1](g)[0]
        gx2 = shim(g, (9, 11), x.shape)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), atol=1e-12)


def test_grad_through_uint8_free_path():
    """resize() on float input is differentiable end to end."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 3, 16, 16), dtype=np.float64))
    loss = lambda t: jnp.sum(ia.resize(t, (8, 8)) ** 2)
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert float(jnp.max(jnp.abs(g))) > 0


def test_jit_grad_composition():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 2, 20, 24), dtype=np.float64))
    f = jax.jit(jax.grad(lambda t: jnp.sum(ia.resize_plane(t, (10, 12), 2, 3))))
    g = f(x)
    # grad of sum == column sums of W_h ⊗ W_w: each input pixel's total
    # contribution; verify against explicit dense computation.
    from interpolate_antialiasing_tpu.ops.weights import dense_matrix, make_axis_spec

    Wh = dense_matrix(make_axis_spec(20, 10, "bilinear"), dtype=np.float64)
    Ww = dense_matrix(make_axis_spec(24, 12, "bilinear"), dtype=np.float64)
    expected = np.outer(Wh.sum(axis=0), Ww.sum(axis=0))
    np.testing.assert_allclose(np.asarray(g[0, 0]), expected, atol=1e-10)


def test_vmap_and_second_order(rng):
    """Transform coverage: vmap, reverse-over-reverse, AND forward mode all
    compose — the pass is a registered linear primitive with jvp, transpose
    and batching rules (round 1's custom_vjp blocked jvp)."""
    x = jnp.asarray(rng.random((4, 3, 32, 48)).astype(np.float32))
    f = lambda img: ia.resize_plane(img, (16, 24), 1, 2)
    yv = jax.vmap(f)(x)
    yd = ia.resize_plane(x, (16, 24), 2, 3)
    np.testing.assert_allclose(np.asarray(yv), np.asarray(yd), atol=1e-5)

    g = lambda t: (ia.resize_plane(t, (16, 24), 2, 3) ** 2).sum()
    hvp = jax.grad(lambda t: (jax.grad(g)(t) * t).sum())(x)
    assert hvp.shape == x.shape and bool(jnp.isfinite(hvp).all())

    # Linear op: jvp(tangent) == f(tangent); also check vmap-of-jvp.
    y, tang = jax.jvp(f, (x[0],), (x[0],))
    np.testing.assert_allclose(np.asarray(y), np.asarray(tang), atol=1e-6)
    yb, tb = jax.jvp(jax.vmap(f), (x,), (x,))
    np.testing.assert_allclose(np.asarray(yb), np.asarray(tb), atol=1e-6)


def test_resize_nd_grad_all_backends(rng):
    """resize_nd must be differentiable regardless of backend routing
    (regression: per-axis pallas passes had no transpose rule)."""
    x = jnp.asarray(rng.random((2, 24, 28, 32)).astype(np.float32))
    ref = None
    for backend in ["xla", "pallas", "dense", "gather"]:
        g = jax.grad(
            lambda t: (ia.resize_nd(t, (12, 14, 16), (-3, -2, -1),
                                    backend=backend) ** 2).sum()
        )(x)
        assert g.shape == x.shape and bool(jnp.isfinite(g).all()), backend
        if ref is None:
            ref = np.asarray(g)
        else:
            np.testing.assert_allclose(np.asarray(g), ref, atol=5e-3)


def test_resize_nd_jvp_all_backends(rng):
    """Forward-mode works for resize_nd on EVERY backend route (round 1 was
    XLA-only: pallas routes went through a jvp-less custom_vjp wrapper)."""
    x = jnp.asarray(rng.random((2, 10, 12)).astype(np.float32))
    for backend in ["xla", "pallas", "dense", "gather", "banded", "auto"]:
        f = lambda t: ia.resize_nd(t, (5, 6), (-2, -1), backend=backend)
        y, tang = jax.jvp(f, (x,), (x,))
        np.testing.assert_allclose(np.asarray(y), np.asarray(tang), atol=1e-5,
                                   err_msg=backend)


def test_jvp_jit_grad_jvp_compositions(rng):
    """Deep transform nests over the plane primitive: jit∘jvp, grad∘jvp,
    jvp∘grad, and linearize all agree with the linear-operator identities."""
    x = jnp.asarray(rng.random((1, 2, 18, 20)).astype(np.float32))
    f = lambda t: ia.resize_plane(t, (9, 10), 2, 3, mode="bicubic")

    y, t1 = jax.jit(lambda a, b: jax.jvp(f, (a,), (b,)))(x, 2.0 * x)
    np.testing.assert_allclose(np.asarray(t1), 2 * np.asarray(y), atol=1e-5)

    # d/dx <f(x), f(x)> via jvp-of-grad must equal 2 * f^T f applied twice.
    g = jax.grad(lambda t: (f(t) ** 2).sum())
    _, hv = jax.jvp(g, (x,), (x,))  # Hessian-vector product: 2 W^T W x
    y2, lin = jax.linearize(g, x)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(lin(x)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hv), np.asarray(y2), atol=1e-4)
