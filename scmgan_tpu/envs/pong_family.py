"""The pong family: minipong, mediumpong, staticpong, superpong, hardpong,
realpong — pure-JAX equivalents of the reference's synthetic pong variants
(reference envs/minipong.py, mediumpong.py, staticpong.py, superpong.py,
hardpong.py, realpong.py), with the same integer dynamics, rendering quirks
(including intentional "bugs" the models were trained against), and Higgins
``simulator`` functions where the reference has them.

All share: 64x64x3 frames, 4 actions (0/1 move right paddle, 2/3 move left
paddle), random policy trajectories.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.envs.base import EnvSpec, register
from scmgan_tpu.envs.raster import rect_mask, slice_rect_mask

G = 64
CHANNELS = 3


def _paddle_dy(action):
    """actions 0/1 -> right paddle -3/+3, 2/3 -> left paddle -3/+3."""
    d_right = jnp.where(action == 0, -3, jnp.where(action == 1, 3, 0))
    d_left = jnp.where(action == 2, -3, jnp.where(action == 3, 3, 0))
    return d_left, d_right


def _zero_reward():
    return jnp.zeros((1,), jnp.float32)


# ==========================================================================
# minipong (reference envs/minipong.py) — no velocity, wraparound positions,
# white paddles/ball, ball_x += 3 mod 64, zero reward.
# ==========================================================================

class MinipongState(NamedTuple):
    left_y: jax.Array
    right_y: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array


def _minipong_render(left_y, right_y, ball_x, ball_y):
    # build_state (envs/minipong.py:52-73): positions clipped into
    # [paddle_height, G - paddle_height], all channels painted white.
    ph, pw, bs = 4, 1, 2
    left_x, right_x = 4, G - 4
    ly = jnp.clip(left_y, ph, G - ph)
    ry = jnp.clip(right_y, ph, G - ph)
    bx = jnp.clip(ball_x, ph, G - ph)
    by = jnp.clip(ball_y, ph, G - ph)
    m = slice_rect_mask(G, G, ly - ph, ly + ph, left_x - pw, left_x + pw)
    m = jnp.maximum(m, slice_rect_mask(G, G, ry - ph, ry + ph,
                                       right_x - pw, right_x + pw))
    m = jnp.maximum(m, slice_rect_mask(G, G, by - bs, by + bs,
                                       bx - bs, bx + bs))
    return jnp.repeat(m[:, :, None], CHANNELS, axis=2)


def minipong_reset(key):
    ks = jax.random.split(key, 4)
    return MinipongState(*(jax.random.randint(k, (), 0, G) for k in ks))


def minipong_step(state, action, key):
    d_left, d_right = _paddle_dy(action)
    return (
        MinipongState(
            left_y=(state.left_y + d_left) % G,
            right_y=(state.right_y + d_right) % G,
            ball_x=(state.ball_x + 3) % G,
            ball_y=state.ball_y,
        ),
        _zero_reward(),
        jnp.bool_(False),
    )


def minipong_render(s: MinipongState):
    return _minipong_render(s.left_y, s.right_y, s.ball_x, s.ball_y)


def _make_np_simulator(render_from_factors):
    def simulator(factor_batch):
        factors = jnp.asarray(np.asarray(factor_batch), jnp.float32)
        return np.asarray(jax.vmap(render_from_factors)(factors))
    return simulator


def _minipong_factors(z):
    # generate_image_continuous (envs/minipong.py:91-97)
    return _minipong_render(*(jnp.int32(z[i] * G) for i in range(4)))


@register("minipong")
def make_minipong() -> EnvSpec:
    return EnvSpec(
        name="minipong", num_actions=4, num_rewards=1, channels=CHANNELS,
        height=G, width=G, reset=minipong_reset, step=minipong_step,
        render=minipong_render, true_latent_dim=4,
        simulator=_make_np_simulator(_minipong_factors),
    )


# ==========================================================================
# mediumpong (reference envs/mediumpong.py) — x-velocity ball bouncing at
# walls; velocity hidden from the render (forced to -1 before drawing the
# tail, envs/mediumpong.py:70 — replicated).
# ==========================================================================

class MediumpongState(NamedTuple):
    left_y: jax.Array
    right_y: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array
    vel: jax.Array


def _mediumpong_render(left_y, right_y, ball_x, ball_y):
    ph, pw, bs = 4, 1, 2
    left_x, right_x = 4, G - 4
    ly = jnp.clip(left_y, ph, G - ph)
    ry = jnp.clip(right_y, ph, G - ph)
    bx = jnp.clip(ball_x, bs, G - bs)
    by = jnp.clip(ball_y, bs, G - bs)
    frame = jnp.zeros((G, G, CHANNELS), jnp.float32)
    frame = frame.at[:, :, 2].max(
        slice_rect_mask(G, G, ly - ph, ly + ph, left_x - pw, left_x + pw))
    frame = frame.at[:, :, 0].max(
        slice_rect_mask(G, G, ry - ph, ry + ph, right_x - pw, right_x + pw))
    # velocity forced to -1 at render time -> color (0, 1, .5), right tail
    # (envs/mediumpong.py:70-95)
    body = slice_rect_mask(G, G, by - bs, by + bs, bx - bs, bx + bs)
    tail = slice_rect_mask(G, G, by - 1, by + 1, bx - bs, bx + bs + 3)
    ball = jnp.maximum(body, tail)
    for idx, c in enumerate((0.0, 1.0, 0.5)):
        frame = frame.at[:, :, idx].max(ball * c)
    return frame


def mediumpong_reset(key):
    ks = jax.random.split(key, 5)
    return MediumpongState(
        left_y=jax.random.randint(ks[0], (), 0, G),
        right_y=jax.random.randint(ks[1], (), 0, G),
        ball_x=jax.random.randint(ks[2], (), 0, G),
        ball_y=jax.random.randint(ks[3], (), 0, G),
        vel=jnp.where(jax.random.bernoulli(ks[4]), 2, -2).astype(jnp.int32),
    )


def mediumpong_step(state, action, key):
    d_left, d_right = _paddle_dy(action)
    ball_x = state.ball_x + state.vel
    vel = jnp.where(
        ((ball_x >= G - 5) & (state.vel > 0)) | ((ball_x <= 5) & (state.vel < 0)),
        -state.vel, state.vel)
    return (
        MediumpongState(
            left_y=state.left_y + d_left,
            right_y=state.right_y + d_right,
            ball_x=ball_x, ball_y=state.ball_y, vel=vel,
        ),
        _zero_reward(),
        jnp.bool_(False),
    )


def mediumpong_render(s: MediumpongState):
    return _mediumpong_render(s.left_y, s.right_y, s.ball_x, s.ball_y)


def _mediumpong_factors(z):
    return _mediumpong_render(*(jnp.int32(z[i] * G) for i in range(4)))


@register("mediumpong")
def make_mediumpong() -> EnvSpec:
    return EnvSpec(
        name="mediumpong", num_actions=4, num_rewards=1, channels=CHANNELS,
        height=G, width=G, reset=mediumpong_reset, step=mediumpong_step,
        render=mediumpong_render, true_latent_dim=4,
        simulator=_make_np_simulator(_mediumpong_factors),
    )


# ==========================================================================
# staticpong (reference envs/staticpong.py) — mediumpong dynamics but the
# renderer HACK-overrides every position to constants on a 0.5 background
# (envs/staticpong.py:62-70): the frame is a constant test pattern.
# ==========================================================================

def _staticpong_render(*_ignored):
    ph, pw, bs = 4, 3, 4
    left_x, right_x = 15, G - 15
    ly, ry, bx, by = 20, 30, 30, 40
    frame = jnp.full((G, G, CHANNELS), 0.5, jnp.float32)
    frame = frame.at[ly - ph: ly + ph, left_x - pw: left_x + pw, 2].set(1.0)
    frame = frame.at[ry - ph: ry + ph, right_x - pw: right_x + pw, 0].set(1.0)
    # velocity +1 -> color (.5, 1, 0), left tail (staticpong build_state)
    for idx, c in enumerate((0.5, 1.0, 0.0)):
        frame = frame.at[by - bs: by + bs, bx - bs: bx + bs, idx].set(c)
        frame = frame.at[by - 1: by + 1, bx - bs - 3: bx + bs, idx].set(c)
    return frame


def staticpong_render(s: MediumpongState):
    return _staticpong_render()


@register("staticpong")
def make_staticpong() -> EnvSpec:
    return EnvSpec(
        name="staticpong", num_actions=4, num_rewards=1, channels=CHANNELS,
        height=G, width=G, reset=mediumpong_reset, step=mediumpong_step,
        render=staticpong_render, true_latent_dim=4,
        simulator=_make_np_simulator(lambda z: _staticpong_render()),
    )


# ==========================================================================
# superpong (reference envs/superpong.py) — x/y velocity with wall and
# paddle-conditional bounces; green ball with a direction tail.
# ==========================================================================

class VelState(NamedTuple):
    left_y: jax.Array
    right_y: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array
    vel_x: jax.Array
    vel_y: jax.Array


def _vel_reset(key, margin=4, x_margin=5):
    ks = jax.random.split(key, 6)
    return VelState(
        left_y=jax.random.randint(ks[0], (), margin, G - margin),
        right_y=jax.random.randint(ks[1], (), margin, G - margin),
        ball_x=jax.random.randint(ks[2], (), x_margin, G - x_margin),
        ball_y=jax.random.randint(ks[3], (), margin, G - margin),
        vel_x=jnp.where(jax.random.bernoulli(ks[4]), 2, -2).astype(jnp.int32),
        vel_y=jnp.where(jax.random.bernoulli(ks[5]), 2, -2).astype(jnp.int32),
    )


def _green_tail_render(left_y, right_y, ball_x, ball_y, vel_x, vel_y):
    """superpong/hardpong build_state: blue/red paddles + green ball with a
    tail at (ball - velocity) (envs/superpong.py:78-103)."""
    ph, pw, bs = 4, 1, 2
    left_x, right_x = 4, G - 4
    ly = jnp.clip(left_y, ph, G - ph)
    ry = jnp.clip(right_y, ph, G - ph)
    bx = jnp.clip(ball_x, bs, G - bs)
    by = jnp.clip(ball_y, bs, G - bs)
    frame = jnp.zeros((G, G, CHANNELS), jnp.float32)
    frame = frame.at[:, :, 2].max(
        slice_rect_mask(G, G, ly - ph, ly + ph, left_x - pw, left_x + pw))
    frame = frame.at[:, :, 0].max(
        slice_rect_mask(G, G, ry - ph, ry + ph, right_x - pw, right_x + pw))
    body = slice_rect_mask(G, G, by - bs, by + bs, bx - bs, bx + bs)
    tail_x, tail_y, ts = bx - vel_x, by - vel_y, bs - 1
    tail = slice_rect_mask(G, G, tail_y - 1, tail_y + 1,
                           tail_x - ts, tail_x + ts)
    frame = frame.at[:, :, 1].max(jnp.maximum(body, tail))
    return frame


def superpong_step(state, action, key):
    ph = 4
    d_left, d_right = _paddle_dy(action)
    left_y = state.left_y + d_left
    right_y = state.right_y + d_right
    ball_x = state.ball_x + state.vel_x
    ball_y = state.ball_y + state.vel_y
    vx, vy = state.vel_x, state.vel_y
    # Sequential if-chain (envs/superpong.py:57-66): each flip re-tests the
    # *updated* velocity, so the flips must be applied in order, not XORed.
    vx = jnp.where((ball_x >= G - 3) & (vx > 0), -vx, vx)   # wall right
    vx = jnp.where((ball_x <= 3) & (vx < 0), -vx, vx)       # wall left
    vx = jnp.where((ball_x >= G - 5) & (vx > 0)             # right paddle
                   & (right_y - ph <= ball_y) & (ball_y <= right_y + ph),
                   -vx, vx)
    vx = jnp.where((ball_x <= 5) & (vx < 0)                 # left paddle
                   & (left_y - ph <= ball_y) & (ball_y <= left_y + ph),
                   -vx, vx)
    vy = jnp.where(((ball_y >= G - 1) & (vy > 0)) | ((ball_y <= 1) & (vy < 0)),
                   -vy, vy)
    return (
        VelState(left_y, right_y, ball_x, ball_y, vx, vy),
        _zero_reward(),
        jnp.bool_(False),
    )


def superpong_render(s: VelState):
    return _green_tail_render(s.left_y, s.right_y, s.ball_x, s.ball_y,
                              s.vel_x, s.vel_y)


def _superpong_factors(z):
    v = jnp.int32(2)
    return _green_tail_render(
        jnp.int32(z[0] * G), jnp.int32(z[1] * G),
        jnp.int32(z[2] * G), jnp.int32(z[3] * G), v, v)


@register("superpong")
def make_superpong() -> EnvSpec:
    return EnvSpec(
        name="superpong", num_actions=4, num_rewards=1, channels=CHANNELS,
        height=G, width=G, reset=_vel_reset, step=superpong_step,
        render=superpong_render, true_latent_dim=4,
        simulator=_make_np_simulator(_superpong_factors),
    )


# ==========================================================================
# hardpong (reference envs/hardpong.py) — superpong with clamped paddles and
# paddle bounce at 8 / G-8, wall bounce at 2 / G-2.
# ==========================================================================

def hardpong_step(state, action, key):
    ph = 4
    d_left, d_right = _paddle_dy(action)
    left_y = jnp.clip(state.left_y + d_left, 0, G)
    right_y = jnp.clip(state.right_y + d_right, 0, G)
    ball_x = state.ball_x + state.vel_x
    ball_y = state.ball_y + state.vel_y
    vx, vy = state.vel_x, state.vel_y
    # Sequential if-chain (envs/hardpong.py:59-68), order preserved.
    vx = jnp.where((ball_x >= G - 8) & (vx > 0)             # right paddle
                   & (right_y - ph <= ball_y) & (ball_y <= right_y + ph),
                   -vx, vx)
    vx = jnp.where((ball_x <= 8) & (vx < 0)                 # left paddle
                   & (left_y - ph <= ball_y) & (ball_y <= left_y + ph),
                   -vx, vx)
    vx = jnp.where((ball_x >= G - 2) & (vx > 0), -vx, vx)   # wall right
    vx = jnp.where((ball_x <= 2) & (vx < 0), -vx, vx)       # wall left
    vy = jnp.where(((ball_y >= G - 2) & (vy > 0)) | ((ball_y <= 2) & (vy < 0)),
                   -vy, vy)
    return (
        VelState(left_y, right_y, ball_x, ball_y, vx, vy),
        _zero_reward(),
        jnp.bool_(False),
    )


@register("hardpong")
def make_hardpong() -> EnvSpec:
    return EnvSpec(
        name="hardpong", num_actions=4, num_rewards=1, channels=CHANNELS,
        height=G, width=G, reset=_vel_reset, step=hardpong_step,
        render=superpong_render, true_latent_dim=4,
        simulator=_make_np_simulator(_superpong_factors),
    )


# ==========================================================================
# realpong (reference envs/realpong.py) — betterpong's predecessor: episode
# ENDS on a score; ball drawn with a direction tail via draw_rect.
# ==========================================================================

def realpong_reset(key):
    ks = jax.random.split(key, 6)
    vels = jnp.array([-3, -2, 2, 3], jnp.int32)
    return VelState(
        left_y=jax.random.randint(ks[0], (), 4, G - 4),
        right_y=jax.random.randint(ks[1], (), 4, G - 4),
        ball_x=jax.random.randint(ks[2], (), 5, G - 5),
        ball_y=jax.random.randint(ks[3], (), 4, G - 4),
        vel_x=vels[jax.random.randint(ks[4], (), 0, 4)],
        vel_y=vels[jax.random.randint(ks[5], (), 0, 4)],
    )


def realpong_step(state, action, key):
    pw, ph, br = 1, 4, 2
    mx = 5
    d_left, d_right = _paddle_dy(action)
    right_y = jnp.clip(state.right_y + d_right, 0, G)
    left_y = jnp.clip(state.left_y + d_left, 0, G)
    ball_x = state.ball_x + state.vel_x
    ball_y = state.ball_y + state.vel_y
    vx, vy = state.vel_x, state.vel_y
    bounce_right = G - mx - br - pw
    bounce_left = mx + br + pw
    # one-sided bounce windows (envs/realpong.py:56-66)
    hit_right = ((ball_x <= bounce_right + br) & (vx > 0)
                 & (right_y - ph <= ball_y) & (ball_y <= right_y + ph))
    hit_left = ((bounce_left - br <= ball_x) & (vx < 0)
                & (left_y - ph <= ball_y) & (ball_y <= left_y + ph))
    vx = jnp.where(hit_right | hit_left, -vx, vx)
    vy = jnp.where(((ball_y >= G - 2) & (vy > 0)) | ((ball_y <= 2) & (vy < 0)),
                   -vy, vy)
    blue_scores = (ball_x >= G) & (vx > 0)
    red_scores = (ball_x <= 0) & (vx < 0)
    reward = jnp.where(blue_scores, 1.0, jnp.where(red_scores, -1.0, 0.0))
    done = blue_scores | red_scores
    return (
        VelState(left_y, right_y, ball_x, ball_y, vx, vy),
        reward[None].astype(jnp.float32),
        done,
    )


def realpong_render(s: VelState):
    pw, ph, br = 1, 4, 2
    mx = 5
    frame = jnp.zeros((G, G, CHANNELS), jnp.float32)
    frame = frame.at[:, :, 2].max(rect_mask(G, G, mx, s.left_y, pw, ph))
    frame = frame.at[:, :, 0].max(rect_mask(G, G, G - mx, s.right_y, pw, ph))
    tail_x = jnp.clip(s.ball_x - s.vel_x, 0, G - 1)
    tail_y = jnp.clip(s.ball_y - s.vel_y, 0, G - 1)
    ball = jnp.maximum(
        rect_mask(G, G, s.ball_x, s.ball_y, br, br),
        rect_mask(G, G, tail_x, tail_y, br - 1, br - 1))
    return frame.at[:, :, 1].max(ball)


@register("realpong")
def make_realpong() -> EnvSpec:
    return EnvSpec(
        name="realpong", num_actions=4, num_rewards=1, channels=CHANNELS,
        height=G, width=G, reset=realpong_reset, step=realpong_step,
        render=realpong_render,
    )
