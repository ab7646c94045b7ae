"""Library configuration and debug flags.

Replaces the reference's preprocessor feature flags (USE_SEPARABLE_KERNEL,
USE_BOUNDS_METHOD, VERBOSE, ... — SURVEY §5 "Config/flag system") with a small
dataclass + environment overrides.
"""

from __future__ import annotations

import dataclasses
import os

__all__ = ["ResizeOptions", "debug_enabled", "default_backend",
           "default_precision"]


def debug_enabled() -> bool:
    """IA_TPU_DEBUG=1 prints which kernel variant fired and table stats —
    the rebuild of the reference's VERBOSE/TI_SHOW_STRIDES tracing."""
    return os.environ.get("IA_TPU_DEBUG", "0") not in ("0", "", "false")


def default_backend() -> str:
    """Override backend selection globally (auto|xla|pallas)."""
    return os.environ.get("IA_TPU_BACKEND", "auto")


_PRECISIONS = ("split", "bf16", "f32")


def default_precision() -> str:
    """Pallas-kernel MXU precision dial (IA_TPU_PRECISION env):

      * ``split`` (default) — 1-3 bf16 passes with exact-operand skipping;
        Pillow MaxAbsE stays 1.
      * ``bf16``  — single bf16 pass, ~1.25x faster, MaxAbsE 2.
      * ``f32``   — Mosaic HIGHEST (~6 passes), ~1.5x slower, diagnostics.

    Measured same-session on the batch-256 headline: 5.1 / 4.1 / 7.8 ms
    (docs/STATUS.md).  The env var is read when a kernel is TRACED: set it
    before the first call of a jitted function — already-compiled
    executables do not retrace on env changes.  The rebuild of the
    reference's ``--flags avx`` compile-speed presets (test.py:315-320).
    """
    v = os.environ.get("IA_TPU_PRECISION", "split")  # read at TRACE time
    if v not in _PRECISIONS:
        raise ValueError(f"IA_TPU_PRECISION={v!r}; expected one of {_PRECISIONS}")
    return v


def default_pil_digits() -> int:
    """uint8 digit-kernel accuracy/speed dial (IA_TPU_PIL_DIGITS env):

      * ``3`` (default) — Pillow's pb=22 grid, byte-identical output.
      * ``2`` — pb=14 two-digit grid: 2/3 the MXU work, MaxAbsE <= 1 vs
        Pillow (admission-gated on tap count; wider windows silently run
        exact).  Round-5 on-chip: headline 0.261 -> 0.188 ms/b64 (1.39x),
        4K streamed 1.105 -> 0.861 ms (1.28x).

    Applies to the u8->u8 'auto' promotion and backend='pil_exact'
    (``resize_pil_exact(digits=...)`` overrides per call).  Like
    IA_TPU_PRECISION, read at TRACE time.  Byte-exactness study:
    benchmarks/digit2_study.py / data/digit2_study.json.
    """
    v = os.environ.get("IA_TPU_PIL_DIGITS", "3")
    if v not in ("2", "3"):
        raise ValueError(f"IA_TPU_PIL_DIGITS={v!r}; expected 2 or 3")
    return int(v)


@dataclasses.dataclass(frozen=True)
class ResizeOptions:
    """Static knobs for one resize call (part of the jit cache key).

    Pass as ``resize(x, size, options=ResizeOptions(...))`` — a bundled
    alternative to the individual keyword arguments (the rebuild of the
    reference's compile-flag presets, test.py:315-320).
    """

    method: str = "bilinear"
    antialias: bool = True
    align_corners: bool = False
    # None defers to the IA_TPU_BACKEND env override / "auto"
    backend: str | None = None
    data_format: str | None = None  # NCHW | NHWC | ... (None = infer)
    output_dtype: object = None


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (the rebuild analogue of
    the reference's torch_extensions build cache, SURVEY §5 checkpoint/
    resume).  Safe to call multiple times."""
    import jax

    cache_dir = path or os.environ.get(
        "IA_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/ia_tpu/xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
