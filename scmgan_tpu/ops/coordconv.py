"""CoordConv: conv with x/y coordinate channels appended.

Library-parity component (reference coordconv.py:5-15 — imported by the
reference's models.py/visualize.py but unused by the model classes).
NHWC variant; the coordinate planes broadcast for free and XLA folds the
concat into the conv's im2col.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scmgan_tpu.ops.conv import conv2d, conv2d_init  # noqa: F401


def coord_channels(batch: int, height: int, width: int, dtype=jnp.float32):
    """[-1, 1) coordinate planes, matching torch.arange(-1, 1, 2/n)."""
    xs = jnp.arange(-1.0, 1.0, 2.0 / width, dtype=dtype)[:width]
    ys = jnp.arange(-1.0, 1.0, 2.0 / height, dtype=dtype)[:height]
    cx = jnp.broadcast_to(xs[None, None, :, None], (batch, height, width, 1))
    cy = jnp.broadcast_to(ys[None, :, None, None], (batch, height, width, 1))
    return cx, cy


def coordconv2d_init(key, in_ch: int, out_ch: int, ksize: int = 3, dtype=jnp.float32):
    return conv2d_init(key, in_ch + 2, out_ch, ksize, dtype)


def coordconv2d(params: dict, x: jax.Array, **kw) -> jax.Array:
    b, h, w, _ = x.shape
    cx, cy = coord_channels(b, h, w, x.dtype)
    return conv2d(params, jnp.concatenate([x, cx, cy], axis=-1), **kw)
