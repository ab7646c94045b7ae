import numpy as np, jax, jax.numpy as jnp
from interpolate_antialiasing_tpu.ops.weights import make_axis_spec, dense_matrix
from interpolate_antialiasing_tpu.ops.pallas_resize import (
    resize2d_streamed, resize2d_streamed_supported)

rng = np.random.default_rng(0)
cases = [
    (2, 2160, 3840, 1080, 1920, "bilinear", "bf16"),
    (1, 2160, 3840, 1080, 1920, "bicubic", np.uint8),
    (1, 440, 906, 196, 320, "bilinear", np.float32),  # H%8==0 variant of headline
    (1, 256, 512, 700, 300, "bilinear", np.float32),  # upsample H
]
for (B, H, W, OH, OW, mode, dt) in cases:
    npdt = np.float32 if dt == "bf16" else dt
    x = (rng.random((B, H, W)) * 255).astype(npdt)
    sh = make_axis_spec(H, OH, mode, True, False)
    sw = make_axis_spec(W, OW, mode, True, False)
    xj = jnp.asarray(x).astype(jnp.bfloat16) if dt == "bf16" else jnp.asarray(x)
    kw = dict(inter_dtype=jnp.bfloat16) if dt == "bf16" else {}
    if not resize2d_streamed_supported(xj, sh, sw, **kw):
        print(f"{mode} {H}x{W}->{OH}x{OW} {dt}: UNSUPPORTED"); continue
    y = np.asarray(resize2d_streamed(xj, sh, sw,
                                     out_dtype=np.uint8 if dt == np.uint8 else None,
                                     **kw)).astype(np.float64)
    Wh = dense_matrix(sh, dtype=np.float64)
    Ww = dense_matrix(sw, dtype=np.float64)
    ref = np.einsum("oi,bij,jk->bok", Wh, x.astype(np.float64), Ww.T)
    if dt == "bf16":
        x = np.asarray(xj.astype(jnp.float32))
        Wh = dense_matrix(sh, dtype=np.float64); Ww = dense_matrix(sw, dtype=np.float64)
        ref = np.einsum("oi,bij,jk->bok", Wh, x.astype(np.float64), Ww.T)
        err = np.abs(y - ref).max()
        print(f"{mode} {H}x{W}->{OH}x{OW} bf16: maxerr={err}")
        continue
    if dt == np.uint8:
        ref = np.clip(np.floor(ref + 0.5), 0, 255).astype(np.uint8)
        err = np.abs(y.astype(int) - ref.astype(int)).max()
    else:
        err = np.abs(y - ref).max()
    print(f"{mode} {H}x{W}->{OH}x{OW} {dt.__name__}: maxerr={err}")
