"""Box-world family: boxes, multibox, rotating_boxes — pure-JAX equivalents
of reference envs/boxes.py, envs/multibox.py, envs/rotating_boxes.py.

Single-channel 64x64 frames.  boxes: one agent-movable box with toroidal
wraparound and per-sample random size.  multibox: a red controllable box +
a blue static box (reference has no get_trajectories for it — offline
dataset only; here it gets the full trajectory API for free).
rotating_boxes: a square that spins autonomously while the agent translates
it (the reference adds integer "degrees" directly to radian offsets,
envs/rotating_boxes.py:55-58 — quirk preserved).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.envs.base import EnvSpec, register
from scmgan_tpu.envs.raster import slice_rect_mask

G = 64


def _move_xy(x, y, action):
    """reference boxes action map (envs/boxes.py:24-32): 0/1 move x, 2/3
    move y."""
    dx = jnp.where(action == 0, -3, jnp.where(action == 1, 3, 0))
    dy = jnp.where(action == 2, -3, jnp.where(action == 3, 3, 0))
    return x + dx, y + dy


# --------------------------------------------------------------------------
# boxes
# --------------------------------------------------------------------------

class BoxState(NamedTuple):
    width: jax.Array    # float
    height: jax.Array   # int
    x: jax.Array
    y: jax.Array


def boxes_reset(key):
    ks = jax.random.split(key, 4)
    return BoxState(
        width=jax.random.uniform(ks[0], (), minval=5.0, maxval=10.0),
        height=jax.random.randint(ks[1], (), 5, 10),
        x=jax.random.randint(ks[2], (), 4, G - 4),
        y=jax.random.randint(ks[3], (), 4, G - 4),
    )


def boxes_step(state, action, key):
    x, y = _move_xy(state.x, state.y, action)
    return (
        BoxState(state.width, state.height, x % G, y % G),
        jnp.zeros((1,), jnp.float32),
        jnp.bool_(False),
    )


def _boxes_frame(width, height, x, y):
    # build_state (envs/boxes.py:57-68): int truncation, clip to [0, 63],
    # half-open slice fill.
    y0 = jnp.clip(jnp.int32(y - height), 0, G - 1)
    y1 = jnp.clip(jnp.int32(y + height), 0, G - 1)
    x0 = jnp.clip(jnp.int32(x - width), 0, G - 1)
    x1 = jnp.clip(jnp.int32(x + width), 0, G - 1)
    return slice_rect_mask(G, G, y0, y1, x0, x1)[:, :, None]


def boxes_render(s: BoxState):
    return _boxes_frame(s.width, s.height, s.x, s.y)


def _boxes_simulator(factor_batch):
    factors = jnp.asarray(np.asarray(factor_batch), jnp.float32)

    def one(z):
        # generate_image_continuous (envs/boxes.py:50-55)
        return _boxes_frame(jnp.int32(z[0] * 5) + 5, jnp.int32(z[1] * 5) + 5,
                            jnp.int32(z[2] * G), jnp.int32(z[3] * G))

    return np.asarray(jax.vmap(one)(factors))


@register("boxes")
def make_boxes() -> EnvSpec:
    return EnvSpec(
        name="boxes", num_actions=4, num_rewards=1, channels=1,
        height=G, width=G, reset=boxes_reset, step=boxes_step,
        render=boxes_render, true_latent_dim=4, simulator=_boxes_simulator,
    )


# --------------------------------------------------------------------------
# multibox
# --------------------------------------------------------------------------

class MultiboxState(NamedTuple):
    red_x: jax.Array
    red_y: jax.Array
    red_r: jax.Array
    blue_x: jax.Array
    blue_y: jax.Array
    blue_r: jax.Array


def multibox_reset(key):
    ks = jax.random.split(key, 6)
    return MultiboxState(
        red_x=jax.random.randint(ks[0], (), 10, 50),
        red_y=jax.random.randint(ks[1], (), 10, 50),
        red_r=jax.random.randint(ks[2], (), 5, 8),
        blue_x=jax.random.randint(ks[3], (), 10, 50),
        blue_y=jax.random.randint(ks[4], (), 10, 50),
        blue_r=jax.random.randint(ks[5], (), 2, 4),
    )


def multibox_step(state, action, key):
    x, y = _move_xy(state.red_x, state.red_y, action)
    return (
        state._replace(red_x=x, red_y=y),
        jnp.zeros((1,), jnp.float32),
        jnp.bool_(False),
    )


def multibox_render(s: MultiboxState):
    frame = slice_rect_mask(G, G, s.red_y - s.red_r, s.red_y + s.red_r,
                            s.red_x - s.red_r, s.red_x + s.red_r)
    frame = jnp.maximum(frame, slice_rect_mask(
        G, G, s.blue_y - s.blue_r, s.blue_y + s.blue_r,
        s.blue_x - s.blue_r, s.blue_x + s.blue_r))
    return frame[:, :, None]


@register("multibox")
def make_multibox() -> EnvSpec:
    return EnvSpec(
        name="multibox", num_actions=4, num_rewards=1, channels=1,
        height=G, width=G, reset=multibox_reset, step=multibox_step,
        render=multibox_render,
    )


# --------------------------------------------------------------------------
# rotating_boxes
# --------------------------------------------------------------------------

class RotBoxState(NamedTuple):
    width: jax.Array
    x: jax.Array
    y: jax.Array
    rotation: jax.Array  # int "degrees" fed into radian math (ref quirk)


def rotbox_reset(key):
    ks = jax.random.split(key, 3)
    return RotBoxState(
        width=jax.random.uniform(ks[0], (), minval=5.0, maxval=10.0),
        x=jax.random.randint(ks[1], (), 20, 46),
        y=jax.random.randint(ks[2], (), 20, 46),
        rotation=jax.random.randint(jax.random.fold_in(key, 3), (), 0, 90),
    )


def rotbox_step(state, action, key):
    x, y = _move_xy(state.x, state.y, action)
    return (
        RotBoxState(state.width, x, y, state.rotation + 3),
        jnp.zeros((1,), jnp.float32),
        jnp.bool_(False),
    )


def _rotbox_frame(width, x, y, rotation):
    """Filled rotated square via half-plane intersection (the reference uses
    skimage.draw.polygon on the 4 corners, envs/rotating_boxes.py:52-61;
    half-plane fill of the same convex quad differs only on boundary
    pixels).  Corners at polar angles rotation + (2k+1)pi/4, radius=width."""
    rot = rotation.astype(jnp.float32)
    angles = rot + jnp.array(
        [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4], jnp.float32)
    cy = y.astype(jnp.float32) + width * jnp.sin(angles)
    cx = x.astype(jnp.float32) + width * jnp.cos(angles)
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1).astype(jnp.float32)
    inside = jnp.ones((G, G), bool)
    for k in range(4):
        ax, ay = cx[k], cy[k]
        bx, by = cx[(k + 1) % 4], cy[(k + 1) % 4]
        cross = (bx - ax) * (rows - ay) - (by - ay) * (cols - ax)
        inside &= cross >= 0
    return inside.astype(jnp.float32)[:, :, None]


def rotbox_render(s: RotBoxState):
    return _rotbox_frame(s.width, s.x, s.y, s.rotation)


def _rotbox_simulator(factor_batch):
    factors = jnp.asarray(np.asarray(factor_batch), jnp.float32)

    def one(z):
        # generate_image_continuous (envs/rotating_boxes.py:43-49)
        return _rotbox_frame(jnp.float32(jnp.int32(z[0] * 15) + 5),
                             jnp.int32(z[2] * 26) + 20,
                             jnp.int32(z[3] * 26) + 20,
                             jnp.int32(z[4] * 90))

    return np.asarray(jax.vmap(one)(factors))


@register("rotating_boxes")
def make_rotating_boxes() -> EnvSpec:
    return EnvSpec(
        name="rotating_boxes", num_actions=4, num_rewards=1, channels=1,
        height=G, width=G, reset=rotbox_reset, step=rotbox_step,
        render=rotbox_render, true_latent_dim=5, simulator=_rotbox_simulator,
    )
