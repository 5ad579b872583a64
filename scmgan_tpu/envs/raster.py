"""Branchless rasterization helpers shared by the synthetic environments.

The reference draws with numpy slice assignment (e.g. ``draw_rect``,
envs/betterpong.py:106-112).  On TPU, dynamic slice bounds would force
data-dependent shapes, so rectangles are drawn as iota-mask comparisons —
fully vectorized, fusable, and differentiable-free.

Pixel-exact parity with the reference's draw_rect: left = max(cx-w, 0),
right = min(cx+w, W-1), rows/cols painted on the half-open ranges
[top, bottom) x [left, right).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rect_mask(height: int, width: int, cx, cy, half_w, half_h) -> jax.Array:
    """(H, W) float mask of the reference's draw_rect rectangle."""
    left = jnp.maximum(cx - half_w, 0)
    right = jnp.minimum(cx + half_w, width - 1)
    top = jnp.maximum(cy - half_h, 0)
    bottom = jnp.minimum(cy + half_h, height - 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return (
        (rows >= top) & (rows < bottom) & (cols >= left) & (cols < right)
    ).astype(jnp.float32)


def paint(frame: jax.Array, channel: int, mask: jax.Array) -> jax.Array:
    """Set ``frame[..., channel]`` to 1 where mask is set (NHWC frame)."""
    return frame.at[:, :, channel].max(mask)


def np_slice_mask(n: int, start, stop) -> jax.Array:
    """1-D mask replicating numpy slice semantics ``arr[start:stop]``
    including negative-index wraparound (a negative start one past the left
    edge yields an *empty* slice in numpy, e.g. ``arr[-1:1]`` — several
    reference envs rely on this to make ball tails vanish at edges, e.g.
    envs/superpong.py's tail draw)."""
    start = jnp.where(start < 0, start + n, start)
    stop = jnp.where(stop < 0, stop + n, stop)
    start = jnp.clip(start, 0, n)
    stop = jnp.clip(stop, 0, n)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    return (idx >= start) & (idx < stop)


def slice_rect_mask(height: int, width: int, y0, y1, x0, x1) -> jax.Array:
    """(H, W) float mask of ``pixels[y0:y1, x0:x1] = 1`` with exact numpy
    slice semantics on both axes."""
    rows = np_slice_mask(height, y0, y1)
    cols = np_slice_mask(width, x0, x1)
    return (rows[:, None] & cols[None, :]).astype(jnp.float32)
