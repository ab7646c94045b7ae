"""A small trainable model whose input stage is the differentiable AA resize.

This exists to exercise (and dry-run) the full training path — forward,
custom-VJP backward of the resize, optimiser update — under multi-chip
sharding: batch data-parallel plus a spatial (H) sharding constraint on the
resize intermediate, compiled with jit over a Mesh so XLA inserts the
collectives (grad all-reduce, halo exchanges for the spatially-sharded
contraction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.resize import resize_plane

__all__ = ["init_params", "forward", "loss_fn", "make_train_step", "Trainer"]


def init_params(key: jax.Array, num_classes: int = 10, width: int = 16) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    scale = 0.1
    return {
        "conv1": jax.random.normal(k1, (width, 3, 3, 3), jnp.float32) * scale,
        "conv2": jax.random.normal(k2, (2 * width, width, 3, 3), jnp.float32) * scale,
        "head": jax.random.normal(k3, (2 * width, num_classes), jnp.float32) * scale,
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def forward(
    params: dict,
    images: jax.Array,
    resize_to: tuple[int, int] = (64, 64),
    spatial_axis: str | None = None,
    mesh: Mesh | None = None,
) -> jax.Array:
    """images: float NCHW any size -> logits.  The first stage is the
    antialiased resize (differentiable custom VJP)."""
    x = resize_plane(images, resize_to, h_axis=2, w_axis=3, mode="bilinear")
    if spatial_axis is not None and mesh is not None:
        x = jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(None, None, spatial_axis, None))
        )
    x = jax.nn.relu(_conv(x, params["conv1"]))
    x = jax.nn.relu(_conv(x, params["conv2"]))
    x = x.mean(axis=(2, 3))  # [N, C]
    return x @ params["head"] + params["bias"]


def loss_fn(params, images, labels, resize_to=(64, 64), spatial_axis=None, mesh=None):
    logits = forward(params, images, resize_to, spatial_axis, mesh)
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def make_train_step(
    mesh: Mesh | None = None,
    data_axis: str = "data",
    spatial_axis: str | None = "sp",
    resize_to: tuple[int, int] = (64, 64),
    lr: float = 1e-2,
):
    """Build a jitted SGD train step.

    With a mesh: images are sharded ``P(data, None, sp, None)`` (batch DP ×
    spatial SP), params replicated; XLA partitions the resize contraction
    along the sharded H axis and all-reduces gradients.
    """

    def step(params, opt_m, images, labels):
        l, grads = jax.value_and_grad(loss_fn)(
            params, images, labels, resize_to, spatial_axis if mesh else None, mesh
        )
        new_m = jax.tree.map(lambda m, g: 0.9 * m + g, opt_m, grads)
        new_p = jax.tree.map(lambda p, m: p - lr * m, params, new_m)
        return new_p, new_m, l

    if mesh is None:
        return jax.jit(step)

    img_sh = NamedSharding(
        mesh, P(data_axis, None, spatial_axis, None) if spatial_axis
        else P(data_axis, None, None, None)
    )
    lbl_sh = NamedSharding(mesh, P(data_axis))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(rep, rep, img_sh, lbl_sh),
        out_shardings=(rep, rep, rep),
    )


class Trainer:
    """Minimal training loop wrapper used by benchmarks and the dry run."""

    def __init__(self, mesh=None, resize_to=(64, 64), num_classes=10, seed=0,
                 data_axis="data", spatial_axis="sp"):
        self.mesh = mesh
        self.resize_to = resize_to
        self.params = init_params(jax.random.PRNGKey(seed), num_classes)
        self.momentum = jax.tree.map(jnp.zeros_like, self.params)
        # only request the spatial axis if the mesh actually has it, so a
        # plain data-parallel mesh (make_mesh() default) works out of the box
        if mesh is not None and spatial_axis not in mesh.shape:
            spatial_axis = None
        self.step_fn = make_train_step(
            mesh, data_axis=data_axis, spatial_axis=spatial_axis,
            resize_to=resize_to,
        )

    def step(self, images, labels):
        self.params, self.momentum, loss = self.step_fn(
            self.params, self.momentum, images, labels
        )
        return loss
