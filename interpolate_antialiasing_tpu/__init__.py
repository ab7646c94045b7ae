"""interpolate_antialiasing_tpu — TPU-native antialiased image resize.

A from-scratch JAX/Pallas rebuild of the capabilities of the
``interpolate-antialiasing`` reference (PIL-parity antialiased separable
resize): each 1-D pass is a banded weight-matrix contraction executed on the
TPU MXU, with weight tables built by the PIL ``ImagingResample`` algorithm,
an exact transposed-band custom VJP, and pjit batch sharding.

Public surface:
  resize, interpolate           — user-facing ops (any layout/dtype)
  linear_forward, cubic_forward, nearest_forward, linear_backward, ...
                                — 1:1 shims for the reference's pybind API
  ops.weights                   — weight-table builders (PIL algorithm)
  parallel                      — mesh sharding helpers
  models                        — preprocessing pipelines built on resize
"""

import os as _os

if _os.environ.get("IA_TPU_COMPILE_CACHE"):
    # Opt-in persistent XLA compilation cache (kernels are shape-specialised,
    # so cross-process caching helps); some remote-compile runtimes mishandle
    # it, so it is not enabled by default.
    from .config import enable_compilation_cache as _ecc

    try:
        _ecc()
    except Exception:
        pass

from .ops.resize import resize, interpolate, resize_plane, resize_nd, image_resize
from .ops.scale_translate import scale_and_translate
from .ops.crop import crop_and_resize, random_resized_crop
from .ops.pil_exact import reduce_pil_exact, resize_pil_exact
from .ops.api import (
    linear_forward,
    nearest_forward,
    cubic_forward,
    linear_backward,
    nearest_backward,
    cubic_backward,
)
from .ops.weights import make_axis_spec, compute_tables, dense_matrix
from .config import ResizeOptions

__version__ = "0.1.0"

__all__ = [
    "resize",
    "interpolate",
    "resize_plane",
    "resize_nd",
    "image_resize",
    "scale_and_translate",
    "crop_and_resize",
    "random_resized_crop",
    "reduce_pil_exact",
    "resize_pil_exact",
    "linear_forward",
    "nearest_forward",
    "cubic_forward",
    "linear_backward",
    "nearest_backward",
    "cubic_backward",
    "make_axis_spec",
    "compute_tables",
    "dense_matrix",
    "ResizeOptions",
    "__version__",
]
