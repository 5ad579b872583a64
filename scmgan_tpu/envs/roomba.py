"""Roomba: a robot pushes a ball; +1 reward on push contact
(pure-JAX equivalent of reference envs/roomba1.py:18-87).

4 actions move the robot left/right/up/down at speed 3; when the robot is
in contact with the ball along the movement axis it shoves the ball ahead
of itself and earns +1.  The robot is clamped to the court; the ball is
NOT (reference behavior preserved — it can be pushed off-screen).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scmgan_tpu.envs.base import EnvSpec, register
from scmgan_tpu.envs.raster import rect_mask

G = 64
BALL_RADIUS = 3
ROBOT_RADIUS = 4
MARGIN_Y = 4
MARGIN_X = 5
SPEED = 3
RADIUS = BALL_RADIUS + ROBOT_RADIUS


class State(NamedTuple):
    robot_x: jax.Array
    robot_y: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array


def reset(key):
    ks = jax.random.split(key, 4)
    return State(
        robot_x=jax.random.randint(ks[0], (), MARGIN_X, G - MARGIN_X),
        robot_y=jax.random.randint(ks[1], (), MARGIN_Y, G - MARGIN_Y),
        ball_x=jax.random.randint(ks[2], (), 32 - 10, 32 + 10),
        ball_y=jax.random.randint(ks[3], (), 32 - 10, 32 + 10),
    )


def step(state, action, key):
    rx, ry = state.robot_x, state.robot_y
    bx, by = state.ball_x, state.ball_y

    y_contact = (by - RADIUS < ry) & (ry < by + RADIUS)
    x_contact = (bx - RADIUS < rx) & (rx < bx + RADIUS)

    # push left (a=0): robot between ball and ball+radius+speed
    push_l = (action == 0) & y_contact & (bx <= rx) & (rx <= bx + RADIUS + SPEED)
    # push right (a=1)
    push_r = (action == 1) & y_contact & (bx - RADIUS - SPEED <= rx) & (rx <= bx)
    # push up (a=2)
    push_u = (action == 2) & x_contact & (by <= ry) & (ry <= by + RADIUS + SPEED)
    # push down (a=3)
    push_d = (action == 3) & x_contact & (by - RADIUS - SPEED <= ry) & (ry <= by)

    bx = jnp.where(push_l, rx - SPEED - RADIUS,
                   jnp.where(push_r, rx + SPEED + RADIUS, bx))
    by = jnp.where(push_u, ry - SPEED - RADIUS,
                   jnp.where(push_d, ry + SPEED + RADIUS, by))

    dx = jnp.where(action == 0, -SPEED, jnp.where(action == 1, SPEED, 0))
    dy = jnp.where(action == 2, -SPEED, jnp.where(action == 3, SPEED, 0))
    rx = jnp.clip(rx + dx, MARGIN_X, G - MARGIN_X)
    ry = jnp.clip(ry + dy, MARGIN_Y, G - MARGIN_Y)

    reward = (push_l | push_r | push_u | push_d).astype(jnp.float32)
    return State(rx, ry, bx, by), reward[None], jnp.bool_(False)


def render(state: State):
    frame = jnp.zeros((G, G, 3), jnp.float32)
    frame = frame.at[:, :, 2].max(
        rect_mask(G, G, state.robot_x, state.robot_y, ROBOT_RADIUS, ROBOT_RADIUS))
    frame = frame.at[:, :, 0].max(
        rect_mask(G, G, state.ball_x, state.ball_y, BALL_RADIUS, BALL_RADIUS))
    return frame


@register("roomba")
@register("roomba1")
def make_spec() -> EnvSpec:
    return EnvSpec(
        name="roomba", num_actions=4, num_rewards=1, channels=3,
        height=G, width=G, reset=reset, step=step, render=render,
    )
