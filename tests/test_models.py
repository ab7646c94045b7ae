"""Model/pipeline tests, incl. the sharded training step on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from interpolate_antialiasing_tpu.models import (
    ImageNetEvalPipeline,
    Trainer,
    VideoDownscaler,
    aa_pyramid,
    make_train_step,
    init_params,
)


def test_imagenet_pipeline(rng):
    x = jnp.asarray((rng.random((4, 3, 100, 150)) * 255).astype(np.uint8))
    pipe = ImageNetEvalPipeline(size=(32, 32))
    y = pipe(x)
    assert y.shape == (4, 3, 32, 32)
    assert y.dtype == jnp.float32
    # normalised output roughly centered
    assert abs(float(jnp.mean(y))) < 3.0


def test_video_downscaler(rng):
    x = jnp.asarray(rng.random((2, 3, 64, 96)).astype(np.float32)).astype(jnp.bfloat16)
    y = VideoDownscaler(out_hw=(32, 48))(x)
    assert y.shape == (2, 3, 32, 48) and y.dtype == jnp.bfloat16


def test_pyramid(rng):
    x = jnp.asarray(rng.random((1, 3, 64, 96)).astype(np.float32))
    levels = aa_pyramid(x, 4)
    assert [l.shape[-2:] for l in levels] == [(64, 96), (32, 48), (16, 24), (8, 12)]


def test_train_step_single(rng):
    tr = Trainer(resize_to=(16, 16))
    imgs = jnp.asarray(rng.random((8, 3, 40, 56)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=8))
    l0 = float(tr.step(imgs, labels))
    for _ in range(5):
        l = float(tr.step(imgs, labels))
    assert l < l0  # learns on a fixed batch


def test_train_step_sharded(rng):
    devs = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devs, ("data", "sp"))
    step = make_train_step(mesh, resize_to=(16, 16))
    params = init_params(jax.random.PRNGKey(0))
    mom = jax.tree.map(jnp.zeros_like, params)
    imgs = jnp.asarray(rng.random((8, 3, 40, 56)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=8))
    p1, m1, loss = step(params, mom, imgs, labels)
    assert np.isfinite(float(loss))
    # sharded step == unsharded step
    step_ref = make_train_step(None, resize_to=(16, 16))
    p2, m2, loss2 = step_ref(params, mom, imgs, labels)
    np.testing.assert_allclose(float(loss), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_resize_mixed_batch(rng):
    from interpolate_antialiasing_tpu.models import ShapeBucketResizer

    images = [
        (rng.random((3, 40 + 7 * i, 60 + 5 * (i % 3))) * 255).astype(np.uint8)
        for i in range(6)
    ]
    r = ShapeBucketResizer((32, 32))
    y = r(images)
    assert y.shape == (6, 3, 32, 32) and y.dtype == jnp.uint8
    # bucketed result == resizing each image individually
    import interpolate_antialiasing_tpu as ia

    for i, im in enumerate(images):
        yi = ia.resize(jnp.asarray(im), (32, 32))
        np.testing.assert_array_equal(np.asarray(y[i]), np.asarray(yi))
    assert r.shapes_compiled == len({im.shape for im in images})


def test_shape_bucket_warmup(rng):
    """warmup() precompiles per-shape executables at startup: new shapes
    count once, repeats and already-seen shapes are free, and warmed
    output still matches the per-image resize."""
    from interpolate_antialiasing_tpu.models import ShapeBucketResizer

    r = ShapeBucketResizer((24, 24))
    n = r.warmup([(3, 40, 60), (3, 47, 65), (3, 40, 60)])
    assert n == 2 and r.shapes_compiled == 2
    assert r.warmup([(3, 40, 60)]) == 0  # already warm
    im = (rng.random((3, 47, 65)) * 255).astype(np.uint8)
    y = r([im])
    import interpolate_antialiasing_tpu as ia

    np.testing.assert_array_equal(
        np.asarray(y[0]), np.asarray(ia.resize(jnp.asarray(im), (24, 24)))
    )


def test_flax_module(rng):
    pytest.importorskip("flax")
    from interpolate_antialiasing_tpu.models import AAResize

    m = AAResize(out_hw=(16, 16))
    x = jnp.asarray(rng.random((2, 3, 33, 47)).astype(np.float32))
    y = m.apply({}, x)
    assert y.shape == (2, 3, 16, 16)
    g = jax.grad(lambda t: float(0) + (m.apply({}, t) ** 2).sum())(x)
    assert g.shape == x.shape


def test_imagenet_train_pipeline(rng):
    from interpolate_antialiasing_tpu.models import ImageNetTrainPipeline

    pipe = ImageNetTrainPipeline(size=(32, 32))
    x = jnp.asarray((rng.random((4, 3, 80, 100)) * 255).astype(np.uint8))
    f = jax.jit(pipe)
    y = f(jax.random.PRNGKey(0), x)
    assert y.shape == (4, 3, 32, 32) and y.dtype == jnp.float32
    y2 = f(jax.random.PRNGKey(1), x)
    assert float(jnp.max(jnp.abs(y - y2))) > 1e-3  # augmentation varies
    assert f._cache_size() == 1  # keys/boxes traced, single compile
    assert bool(jnp.isfinite(y).all())


def test_imagenet_pipeline_matches_torchvision_pil(rng, monkeypatch):
    """Round 2b: the eval pipeline's default resize_domain='uint8' computes
    exactly what torchvision's PIL-backend eval stack does — PIL resize in
    uint8, then ToTensor + Normalize.  With the bit-exact kernel route
    forced (as on TPU), the pipeline equals the PIL+numpy reference to
    float rounding."""
    from PIL import Image

    from interpolate_antialiasing_tpu.models.preprocess import (
        _IMAGENET_MEAN,
        _IMAGENET_STD,
    )
    from interpolate_antialiasing_tpu.ops import pil_exact as pe
    from interpolate_antialiasing_tpu.ops import resize as resize_mod

    monkeypatch.setattr(resize_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(pe, "_use_tpu_kernels", lambda: True)
    x = (rng.random((2, 3, 100, 150)) * 255).astype(np.uint8)
    y = np.asarray(ImageNetEvalPipeline(size=(64, 96))(jnp.asarray(x)))
    refs = []
    for img in x:
        im = Image.fromarray(img.transpose(1, 2, 0))
        r = np.asarray(im.resize((96, 64), Image.BILINEAR)).transpose(2, 0, 1)
        refs.append(r)
    ref = np.stack(refs).astype(np.float32) / 255.0
    mean = np.asarray(_IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(_IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)
    ref = (ref - mean) / std
    np.testing.assert_allclose(y, ref, atol=1e-6)


def test_imagenet_pipeline_short_side_center_crop(rng, monkeypatch):
    """short_side=256 reproduces the CANONICAL torchvision eval transform
    (Resize(256) + CenterCrop(224) + ToTensor + Normalize) byte-for-byte
    pre-normalisation, with the bit-exact kernel route forced as on TPU."""
    from PIL import Image

    from interpolate_antialiasing_tpu.models.preprocess import (
        _IMAGENET_MEAN,
        _IMAGENET_STD,
    )
    from interpolate_antialiasing_tpu.ops import pil_exact as pe
    from interpolate_antialiasing_tpu.ops import resize as resize_mod

    monkeypatch.setattr(resize_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(pe, "_use_tpu_kernels", lambda: True)
    # 300x350 input: the long side is 256*350/300 = 298.67 — torchvision
    # TRUNCATES to 298 (a round() would give 299); crop 225x225 so the
    # vertical margin is 31 — torchvision uses int(round(15.5)) = 16
    # (a floor would give 15).  Both roundings are distinguishable here.
    x = (rng.random((2, 3, 300, 350)) * 255).astype(np.uint8)
    pipe = ImageNetEvalPipeline(size=(225, 225), short_side=256)
    y = np.asarray(pipe(jnp.asarray(x)))
    refs = []
    for img in x:
        im = Image.fromarray(img.transpose(1, 2, 0))
        rh, rw = 256, int(256 * 350 / 300)
        assert rw == 298
        im = im.resize((rw, rh), Image.BILINEAR)
        top = int(round((rh - 225) / 2.0))
        left = int(round((rw - 225) / 2.0))
        assert top == 16  # not the floor 15
        im = im.crop((left, top, left + 225, top + 225))
        refs.append(np.asarray(im).transpose(2, 0, 1))
    ref = np.stack(refs).astype(np.float32) / 255.0
    mean = np.asarray(_IMAGENET_MEAN, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(_IMAGENET_STD, np.float32).reshape(1, 3, 1, 1)
    np.testing.assert_allclose(y, (ref - mean) / std, atol=1e-6)


def test_short_side_oversized_crop_raises(rng):
    pipe = ImageNetEvalPipeline(size=(256, 256), short_side=224)
    x = jnp.asarray((rng.random((1, 3, 224, 300)) * 255).astype(np.uint8))
    with pytest.raises(ValueError, match="CenterCrop"):
        pipe(x)
