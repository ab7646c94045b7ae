"""Regenerate the analysis artifacts in data/analysis/ (CPU-only).

This is the rebuild of the reference's ``notebooks/`` directory — the one
reference component round 1 had no counterpart for. The reference kept
three exploratory notebooks (cited per figure below); a notebook does not
version or re-verify itself, so here the same investigations are a script
whose outputs are committed PNGs embedded in docs/ANALYSIS.md and whose
numbers are printed as JSON for eyeball-free diffing.

  1. Problem statement (reference notebooks/analysis.ipynb cells 0-19,
     README.md:5-15): classic non-antialiased downsampling vs Pillow —
     MAE ~6-13, MaxAbsE > 100, visible moire.
  2. Solution diff (analysis.ipynb cells 21-31): this library's AA output
     vs Pillow — MaxAbsE <= 1 everywhere, and backend="pil_exact" == 0.
  3. Weight-table exploration (gradcheck.ipynb cells 6-11, which derived
     the 2-tap non-AA weights by hand): the banded AA weight matrix, its
     band structure, and edge-row renormalisation.
  4. Gradient exploration (gradcheck.ipynb cells 0-4): adjoint identity
     <Wx, y> = <x, W^T y> and jvp/vjp agreement, printed to full precision.

Run: python benchmarks/make_analysis.py  (writes data/analysis/*.png)
"""

from __future__ import annotations

import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, ".")

OUT = pathlib.Path(__file__).resolve().parent.parent / "data" / "analysis"

# single-hue sequential ramp (light -> dark) for magnitude heatmaps;
# one accent for single-series line marks; text stays in neutral ink
SEQ_CMAP = "Blues"
ACCENT = "#3b6ecc"
INK = "#333333"


def _style(ax):
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    ax.tick_params(colors=INK, labelsize=8)
    ax.xaxis.label.set_color(INK)
    ax.yaxis.label.set_color(INK)
    ax.title.set_color(INK)


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    import interpolate_antialiasing_tpu as ia
    from interpolate_antialiasing_tpu.utils.imageio import synthetic_image

    OUT.mkdir(parents=True, exist_ok=True)
    metrics = {}

    img = synthetic_image()  # uint8 CHW 3x438x906 (reference data/test.png shape)
    pil = Image.fromarray(np.asarray(img).transpose(1, 2, 0))
    oh, ow = 196, 320
    ref = np.asarray(pil.resize((ow, oh), Image.BILINEAR)).transpose(2, 0, 1)

    x = jnp.asarray(img)
    y_aa = np.asarray(ia.resize(x, (oh, ow), method="bilinear"))
    # the classic 2-tap path (== torch interpolate, parity pinned by
    # tests/test_torch_parity.py to <= 5e-5)
    y_cl = np.asarray(ia.resize(x, (oh, ow), method="bilinear", antialias=False))
    y_px = np.asarray(ia.resize(x, (oh, ow), backend="pil_exact"))

    def errs(a, b):
        d = np.abs(a.astype(np.float64) - b.astype(np.float64))
        return float(d.mean()), float(d.max())

    metrics["nonaa_vs_pil"] = dict(zip(("mae", "maxabse"), errs(y_cl, ref)))
    metrics["aa_vs_pil"] = dict(zip(("mae", "maxabse"), errs(y_aa, ref)))
    metrics["pil_exact_vs_pil"] = dict(zip(("mae", "maxabse"), errs(y_px, ref)))

    # -- figure 1: problem statement, side-by-side crop (analysis.ipynb c9/c29)
    p1, p2 = 40, 130
    fig, axes = plt.subplots(1, 3, figsize=(10.5, 3.6))
    for ax, im, title in zip(
        axes,
        (ref, y_cl, y_aa),
        ("Pillow (ground truth)", "non-AA classic (= torch default)", "this library, AA"),
    ):
        ax.imshow(im.transpose(1, 2, 0)[p1:p2, p1:p2], interpolation="none")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.suptitle(
        "906x438 -> 320x196 bilinear: crop [40:130, 40:130]", fontsize=10, color=INK
    )
    fig.tight_layout()
    fig.savefig(OUT / "problem_statement_crops.png", dpi=110)
    plt.close(fig)

    # -- figure 2: per-pixel max-channel abs diff heatmaps (analysis.ipynb c30-31)
    d_cl = np.abs(y_cl.astype(float) - ref.astype(float)).max(axis=0)
    d_aa = np.abs(y_aa.astype(float) - ref.astype(float)).max(axis=0)
    fig, axes = plt.subplots(1, 2, figsize=(10.5, 3.4))
    for ax, d, title in zip(
        axes,
        (d_cl, d_aa),
        (
            f"non-AA vs Pillow (MaxAbsE={d_cl.max():.0f})",
            f"AA vs Pillow (MaxAbsE={d_aa.max():.0f}) — same color scale",
        ),
    ):
        m = ax.imshow(d, cmap=SEQ_CMAP, vmin=0, vmax=d_cl.max(), interpolation="none")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
        fig.colorbar(m, ax=ax, shrink=0.85)
    fig.tight_layout()
    fig.savefig(OUT / "diff_heatmaps.png", dpi=110)
    plt.close(fig)

    # -- figure 3: aliasing demo on a zone plate (the moire pattern the
    # AA filter exists to remove; no reference counterpart — TPU-era bonus)
    n = 512
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64)
    r2 = (xx - n / 2) ** 2 + (yy - n / 2) ** 2
    zone = (127.5 * (1 + np.cos(np.pi * r2 / n))).astype(np.uint8)[None]
    z = jnp.asarray(zone)
    z_aa = np.asarray(ia.resize(z, (128, 128), method="bilinear"))[0]
    z_cl = np.asarray(ia.resize(z, (128, 128), method="bilinear", antialias=False))[0]
    fig, axes = plt.subplots(1, 3, figsize=(10.5, 3.6))
    for ax, im, title in zip(
        axes,
        (zone[0], z_cl, z_aa),
        ("zone plate 512x512", "-> 128x128, antialias=False (moire)", "-> 128x128, AA"),
    ):
        ax.imshow(im, cmap="gray", interpolation="none")
        ax.set_title(title, fontsize=9, pad=8)
        ax.axis("off")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    fig.savefig(OUT / "zoneplate_aliasing.png", dpi=110)
    plt.close(fig)

    # -- figure 4: the banded weight matrix (gradcheck.ipynb derived these
    # weights by hand for the 2-tap case; here is the full AA band)
    from interpolate_antialiasing_tpu.ops.weights import (
        compute_tables,
        dense_matrix,
        make_axis_spec,
    )

    spec = make_axis_spec(96, 32, "bilinear", True)
    W = dense_matrix(spec, dtype=np.float64)
    fig, axes = plt.subplots(1, 2, figsize=(10.5, 3.8))
    m = axes[0].imshow(W, cmap=SEQ_CMAP, aspect="auto", interpolation="none")
    axes[0].set_title("dense W [32, 96], bilinear 96->32 (band moves with xmin)", fontsize=9)
    axes[0].set_xlabel("input index")
    axes[0].set_ylabel("output index")
    fig.colorbar(m, ax=axes[0], shrink=0.85)
    xmin, sizes, wts = compute_tables(spec)
    for o in (0, 16, 31):
        row = np.asarray(W[o])
        axes[1].plot(row, lw=2, color=ACCENT, alpha=1.0 if o == 0 else 0.55)
        nz = np.nonzero(row)[0]
        axes[1].annotate(
            f"row {o}: {int(sizes[o])} taps, sum={row.sum():.3f}",
            (nz.mean(), row.max()),
            textcoords="offset points",
            xytext=(0, 6),
            ha="center",
            fontsize=8,
            color=INK,
        )
    axes[1].set_title("weight rows (edge row 0 renormalised over fewer taps)", fontsize=9)
    axes[1].set_xlabel("input index")
    _style(axes[0])
    _style(axes[1])
    fig.tight_layout()
    fig.savefig(OUT / "band_structure.png", dpi=110)
    plt.close(fig)

    # -- gradient exploration (gradcheck.ipynb cells 0-4, done correctly:
    # the adjoint of the banded matmul, not the reference's 2-tap backward)
    key = jax.random.PRNGKey(0)
    xg = jax.random.normal(key, (96,), jnp.float32)
    yg = jax.random.normal(jax.random.PRNGKey(1), (32,), jnp.float32)
    Wx = W @ np.asarray(xg, np.float64)
    Wty = W.T @ np.asarray(yg, np.float64)
    lhs = float(Wx @ np.asarray(yg, np.float64))
    rhs = float(np.asarray(xg, np.float64) @ Wty)
    f = lambda t: ia.resize_plane(t[None, None], (32, 96), 2, 3)[0, 0]
    x2 = jax.random.normal(key, (96, 96), jnp.float32)
    t2 = jax.random.normal(jax.random.PRNGKey(2), (96, 96), jnp.float32)
    _, jvp_out = jax.jvp(f, (x2,), (t2,))
    _, vjp_fn = jax.vjp(f, x2)
    ct = jax.random.normal(jax.random.PRNGKey(3), (32, 96), jnp.float32)
    metrics["adjoint_identity"] = {
        "Wx_dot_y": lhs,
        "x_dot_Wty": rhs,
        "rel_err": abs(lhs - rhs) / abs(lhs),
    }
    metrics["fwd_rev_consistency"] = {
        "jvp_dot_ct": float(jnp.vdot(jvp_out, ct)),
        "tangent_dot_vjp": float(jnp.vdot(t2, vjp_fn(ct)[0])),
    }

    (OUT / "metrics.json").write_text(json.dumps(metrics, indent=2) + "\n")
    print(json.dumps(metrics, indent=2))
    print(f"wrote {sorted(p.name for p in OUT.iterdir())} to {OUT}")


if __name__ == "__main__":
    main()
