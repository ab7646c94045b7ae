"""Antialiased image pyramids (mip chains) built from the resize op."""

from __future__ import annotations

import jax

from ..ops.resize import resize_plane

__all__ = ["aa_pyramid"]


def aa_pyramid(
    x: jax.Array,
    levels: int,
    mode: str = "bilinear",
    factor: int = 2,
    h_axis: int = -2,
    w_axis: int = -1,
) -> list[jax.Array]:
    """Return ``[x, down(x), down(down(x)), ...]`` with ``levels`` entries.

    Each level is an antialiased ``1/factor`` downsample of the previous —
    the iterated form of the workload the reference optimises.
    """
    out = [x]
    for _ in range(levels - 1):
        h = max(1, out[-1].shape[h_axis] // factor)
        w = max(1, out[-1].shape[w_axis] // factor)
        out.append(
            resize_plane(out[-1], (h, w), h_axis=h_axis, w_axis=w_axis, mode=mode)
        )
    return out
