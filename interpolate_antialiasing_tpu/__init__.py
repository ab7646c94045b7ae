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

if _os.environ.get("IA_TPU_NO_COMPILE_CACHE", "0") in ("0", "", "false"):
    # Persistent XLA compilation cache on by default: kernels here are
    # shape-specialised (one compile per (in, out, mode, dtype) combo), so
    # caching across processes is a large win — especially on remote-compile
    # runtimes.  Opt out with IA_TPU_NO_COMPILE_CACHE=1.
    from .config import enable_compilation_cache as _ecc

    try:
        _ecc()
    except Exception:
        pass

from .ops.resize import resize, interpolate, resize_plane, resize_nd
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
