"""Optional flax.linen wrapper (ecosystem parity with the reference's
``ProtoDownsample(nn.Module)``, test.py:149-157)."""

from __future__ import annotations

try:
    import flax.linen as nn

    _HAVE_FLAX = True
except Exception:  # pragma: no cover
    _HAVE_FLAX = False

from ..ops.resize import resize_plane

__all__ = ["AAResize"]

if _HAVE_FLAX:

    class AAResize(nn.Module):
        """Antialiased resize as a flax module (no parameters; the custom
        VJP makes it differentiable inside larger models)."""

        out_hw: tuple[int, int]
        method: str = "bilinear"
        antialias: bool = True
        data_format: str = "NCHW"

        @nn.compact
        def __call__(self, x):
            from ..ops.resize import _axes_for

            h_axis, w_axis = _axes_for(x, self.data_format)
            return resize_plane(
                x, self.out_hw, h_axis % x.ndim, w_axis % x.ndim,
                mode=self.method, antialias=self.antialias,
            )

else:  # pragma: no cover

    class AAResize:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise ImportError("flax is not available")
