"""Mixed-size batch resizing for serving/preprocessing.

The BASELINE workload "batch-64 arbitrary-size -> 224x224" has images of
*different* sizes per batch.  XLA kernels are shape-specialised, so the
production-serving strategy is shape bucketing: group images by (H, W),
run one fused resize per distinct shape (compiled once, cached across
batches), and reassemble in input order.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize

__all__ = ["resize_mixed_batch", "ShapeBucketResizer"]


def resize_mixed_batch(
    images: Sequence[np.ndarray],
    size: tuple[int, int],
    method: str = "bilinear",
    antialias: bool = True,
    data_format: str = "CHW",
    **kw,
) -> jax.Array:
    """Resize a list of differently-sized images to one shape.

    Returns a stacked ``[N, ...]`` array in the input order.  Images with
    equal shapes are batched into a single device call.
    """
    if len(images) == 0:
        raise ValueError("resize_mixed_batch: need at least one image")
    buckets: dict[tuple, list[int]] = defaultdict(list)
    for i, im in enumerate(images):
        buckets[tuple(im.shape)].append(i)

    n = len(images)
    out = [None] * n
    for shape, idxs in buckets.items():
        batch = jnp.asarray(np.stack([np.asarray(images[i]) for i in idxs]))
        fmt = {"CHW": "NCHW", "HWC": "NHWC"}.get(data_format, data_format)
        y = resize(batch, size, method=method, antialias=antialias,
                   data_format=fmt, **kw)
        for k, i in enumerate(idxs):
            out[i] = y[k]
    return jnp.stack(out)


class ShapeBucketResizer:
    """Stateful wrapper that keeps per-shape jitted resizers warm.

    Intended for serving loops: the first batch containing a new image
    shape pays one compile; subsequent batches reuse the cached
    executable (JAX's jit cache keyed on shape).
    """

    def __init__(self, size: tuple[int, int], method: str = "bilinear",
                 antialias: bool = True, data_format: str = "CHW", **kw):
        self.size = tuple(size)
        self.method = method
        self.antialias = antialias
        self.data_format = data_format
        self.kw = kw
        self._seen_shapes: set[tuple] = set()

    def __call__(self, images: Sequence[np.ndarray]) -> jax.Array:
        for im in images:
            self._seen_shapes.add(tuple(im.shape))
        return resize_mixed_batch(
            images, self.size, self.method, self.antialias, self.data_format,
            **self.kw,
        )

    @property
    def shapes_compiled(self) -> int:
        return len(self._seen_shapes)

    def warmup(self, shapes: Sequence[tuple], dtype=np.uint8) -> int:
        """Precompile the resize executable for each input shape.

        Serving startup hook: every resize kernel is shape-specialised
        (XLA norm), so the first batch containing a new shape pays a
        compile.  Feed the expected shape set here (e.g. the bucket list
        from yesterday's traffic) and no production batch pays it.
        Returns the number of NEW shapes compiled; combine with
        ``IA_TPU_COMPILE_CACHE`` to persist across processes.
        """
        new = 0
        for shp in shapes:
            shp = tuple(int(s) for s in shp)
            if shp in self._seen_shapes:
                continue
            self([np.zeros(shp, dtype)])
            new += 1
        return new
