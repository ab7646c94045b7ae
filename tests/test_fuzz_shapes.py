"""Cross-backend fuzz over odd/degenerate shapes (CPU; Pallas = interpret).

All float backends must agree with the dense oracle for every shape the
public API accepts — including 1-pixel axes, extreme aspect ratios, and
identity sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import interpolate_antialiasing_tpu as ia


def _cases():
    rng = np.random.default_rng(99)
    shapes = [
        (1, 1, 1, 1), (1, 1, 1, 7), (1, 1, 7, 1), (1, 3, 2, 2),
        (2, 1, 5, 9), (1, 2, 129, 257), (3, 1, 131, 3),
    ]
    outs = [(1, 1), (1, 5), (5, 1), (3, 3), (17, 129), (130, 2)]
    for i in range(18):
        shp = shapes[i % len(shapes)]
        out = outs[(i * 7 + 3) % len(outs)]
        mode = ["bilinear", "bicubic", "box", "lanczos3"][i % 4]
        yield shp, out, mode


@pytest.mark.parametrize("shape,out,mode", list(_cases()))
def test_backends_agree_on_odd_shapes(rng, shape, out, mode):
    x = jnp.asarray((rng.random(shape) * 255).astype(np.float32))
    ref = ia.resize(x, out, method=mode, backend="dense")
    assert ref.shape == (*shape[:2], *out)
    assert bool(jnp.isfinite(ref).all())
    for backend in ["gather", "banded", "pallas"]:
        y = ia.resize(x, out, method=mode, backend=backend)
        err = float(jnp.max(jnp.abs(y - ref)))
        assert err < 1e-2 * 255, (backend, err)


@pytest.mark.parametrize("mode", ["bilinear", "bicubic"])
def test_uint8_odd_shapes(rng, mode):
    for shape, out in [((1, 3, 1, 50), (1, 25)), ((2, 1, 3, 3), (9, 9)),
                       ((1, 1, 255, 1), (1, 1))]:
        x = jnp.asarray((rng.random(shape) * 255).astype(np.uint8))
        y = ia.resize(x, out, method=mode)
        assert y.shape == (*shape[:2], *out) and y.dtype == jnp.uint8
