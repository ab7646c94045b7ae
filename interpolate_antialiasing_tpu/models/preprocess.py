"""Image preprocessing pipelines built on the AA resize op.

These cover the BASELINE.json workload configs:
  * uint8 batched ImageNet-eval preprocessing (batch-N arbitrary -> 224x224
    bilinear AA, fused dtype cast + normalisation)
  * bf16 video downscale (3840x2160 -> 1920x1080 sustained throughput)
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.resize import resize, resize_plane

__all__ = ["ImageNetEvalPipeline", "ImageNetTrainPipeline", "VideoDownscaler",
           "imagenet_eval_preprocess"]

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class ImageNetEvalPipeline:
    """uint8 NCHW batch -> normalised float NCHW at ``size``.

    Mirrors torchvision eval preprocessing (Resize with antialias=True —
    the capability the reference prototype became) with the cast, scale,
    and normalisation fused into one jitted graph.

    ``resize_domain="uint8"`` (default) resizes the uint8 image first and
    normalises the quantised result — exactly what torchvision's
    PIL-backend transform stack computes (PIL resize -> ToTensor ->
    Normalize), and on TPU the resize runs the bit-exact int8 digit
    kernel, so the pipeline's pixels match the canonical torchvision eval
    pipeline byte-for-byte before normalisation.  ``"float32"`` resizes
    in float (the round-1 behaviour): fractionally more precise than the
    standard pipeline, but not equal to it.
    """

    size: tuple[int, int] = (224, 224)
    method: str = "bilinear"
    antialias: bool = True
    dtype: jnp.dtype = jnp.float32
    mean: Sequence[float] = _IMAGENET_MEAN
    std: Sequence[float] = _IMAGENET_STD
    resize_domain: str = "uint8"
    # canonical torchvision eval is Resize(short_side) + CenterCrop(size);
    # set short_side=256 for that. None resizes directly to ``size``
    # (torchvision Resize((h, w))). Input shapes are static under jit, so
    # the aspect-preserving intermediate shape is static too.
    short_side: int | None = None

    def _resize(self, x, hw):
        if self.resize_domain == "uint8" and x.dtype == jnp.uint8:
            return resize(x, hw, method=self.method, antialias=self.antialias)
        return resize_plane(
            x.astype(jnp.float32), hw, h_axis=-2, w_axis=-1,
            mode=self.method, antialias=self.antialias,
        )

    def __call__(self, batch_u8: jax.Array) -> jax.Array:
        if self.short_side is not None:
            H, W = batch_u8.shape[-2], batch_u8.shape[-1]
            s = self.short_side
            # torchvision Resize(int): short side -> s, long side TRUNCATED
            # (_compute_resized_output_size uses int(size * long / short))
            if H <= W:
                rh, rw = s, max(1, int(s * W / H))
            else:
                rh, rw = max(1, int(s * H / W)), s
            oh, ow = self.size
            if oh > rh or ow > rw:
                raise ValueError(
                    f"CenterCrop {self.size} exceeds the resized image "
                    f"({rh}, {rw}); torchvision would zero-pad here — pick "
                    "a smaller crop or larger short_side"
                )
            y = self._resize(batch_u8, (rh, rw))
            # torchvision center_crop: int(round(d / 2.0)) — Python
            # round-half-to-even, NOT floor
            top = int(round((rh - oh) / 2.0))
            left = int(round((rw - ow) / 2.0))
            y = y[..., top : top + oh, left : left + ow]
        else:
            y = self._resize(batch_u8, self.size)
        y = y.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        mean = jnp.asarray(self.mean, jnp.float32).reshape(1, -1, 1, 1)
        std = jnp.asarray(self.std, jnp.float32).reshape(1, -1, 1, 1)
        return ((y - mean) / std).astype(self.dtype)


def imagenet_eval_preprocess(batch_u8: jax.Array, size=(224, 224)) -> jax.Array:
    return ImageNetEvalPipeline(size=size)(batch_u8)


@dataclasses.dataclass(frozen=True)
class VideoDownscaler:
    """bf16 frame downscaler: [N, C, H, W] -> [N, C, oh, ow].

    Uses float32 weight tables with bf16 inputs; contraction accumulates in
    float32 on the MXU (preferred_element_type), then casts back to bf16.
    """

    out_hw: tuple[int, int] = (1080, 1920)
    method: str = "bilinear"
    backend: str | None = "pallas"  # fused 2-pass kernels; None = auto

    def __call__(self, frames: jax.Array) -> jax.Array:
        y = resize_plane(
            frames.astype(jnp.bfloat16),
            self.out_hw,
            h_axis=-2,
            w_axis=-1,
            mode=self.method,
            backend=self.backend,
        )
        return y.astype(jnp.bfloat16)


@dataclasses.dataclass(frozen=True)
class ImageNetTrainPipeline:
    """uint8 NCHW batch -> augmented normalised float NCHW at ``size``.

    Train-time counterpart of :class:`ImageNetEvalPipeline`: antialiased
    RandomResizedCrop + random horizontal flip + normalise, all inside one
    jitted graph (crop boxes are traced, so one compile serves every step).
    """

    size: tuple[int, int] = (224, 224)
    method: str = "bilinear"
    scale: tuple[float, float] = (0.08, 1.0)
    ratio: tuple[float, float] = (0.75, 4.0 / 3.0)
    flip_prob: float = 0.5
    dtype: jnp.dtype = jnp.float32
    mean: Sequence[float] = _IMAGENET_MEAN
    std: Sequence[float] = _IMAGENET_STD

    def __call__(self, key: jax.Array, batch_u8: jax.Array) -> jax.Array:
        from ..ops.crop import random_resized_crop

        k_crop, k_flip = jax.random.split(key)
        # Keep uint8 through the crop: crop_and_resize's uint8 path runs
        # the dominant contraction as 2-digit int8 MXU matmuls (round 5)
        # and quantises back to u8 — the same thing torchvision's
        # PIL-backend RandomResizedCrop produces.  The random horizontal
        # flip folds INTO the crop's W weight matrix (reversed rows) —
        # identical output, no extra image pass.
        flip = jax.random.bernoulli(
            k_flip, self.flip_prob, (batch_u8.shape[0],)
        )
        y = random_resized_crop(
            k_crop, batch_u8, self.size, scale=self.scale, ratio=self.ratio,
            method=self.method, flip=flip,
        )
        y = y.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        mean = jnp.asarray(self.mean, jnp.float32).reshape(1, -1, 1, 1)
        std = jnp.asarray(self.std, jnp.float32).reshape(1, -1, 1, 1)
        return ((y - mean) / std).astype(self.dtype)
