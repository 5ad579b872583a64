"""GridWorld: a ball moved by 4 actions on a 16x16 court.

Pure-JAX port-equivalent of reference envs/gridworld.py:17-97 — +-1 reward
when the ball reaches the right/left wall, no terminal state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.envs.base import EnvSpec, register
from scmgan_tpu.envs.raster import rect_mask

CHANNELS = 3
GAME_SIZE = 16
BALL_RADIUS = 2
NUM_ACTIONS = 4
NUM_REWARDS = 1
MARGIN_X = 2
MARGIN_Y = 2


class State(NamedTuple):
    ball_x: jax.Array  # int32
    ball_y: jax.Array  # int32


def reset(key: jax.Array) -> State:
    kx, ky = jax.random.split(key)
    return State(
        ball_x=jax.random.randint(kx, (), MARGIN_X, GAME_SIZE - MARGIN_X),
        ball_y=jax.random.randint(ky, (), MARGIN_Y, GAME_SIZE - MARGIN_Y),
    )


def step(state: State, action: jax.Array, key: jax.Array):
    # Actions: 0 up, 1 down, 2 left, 3 right (reference envs/gridworld.py:29-42).
    dy = jnp.where(action == 0, -3, jnp.where(action == 1, 3, 0))
    dx = jnp.where(action == 2, -3, jnp.where(action == 3, 3, 0))
    ball_y = jnp.clip(state.ball_y + dy, MARGIN_Y, GAME_SIZE - MARGIN_Y)
    ball_x = jnp.clip(state.ball_x + dx, 0, GAME_SIZE)
    reward = jnp.where(
        ball_x >= GAME_SIZE, 1.0, jnp.where(ball_x <= 0, -1.0, 0.0)
    )
    return State(ball_x, ball_y), reward[None].astype(jnp.float32), jnp.bool_(False)


def render(state: State) -> jax.Array:
    frame = jnp.zeros((GAME_SIZE, GAME_SIZE, CHANNELS), jnp.float32)
    ball = rect_mask(GAME_SIZE, GAME_SIZE, state.ball_x, state.ball_y,
                     BALL_RADIUS, BALL_RADIUS)
    return frame.at[:, :, 1].set(ball)


TRUE_LATENT_DIM = 2  # ball_x, ball_y

_SIM_CORE = None


def simulator(factor_batch) -> "jnp.ndarray":
    """Factors (B, 2) in [0,1] -> rendered frames, for the Higgins metric.

    The reference defines Higgins simulators only for envs with compact
    factor renders (betterpong.py:140-172, boxes.py:50-55); gridworld's
    full state IS two factors (ball x/y over the ``reset`` ranges,
    gridworld.py:31-36 here), so the extension is exact.  Jitted and
    cached at module level like the pong simulator (betterpong.py:130)
    to stay under XLA:CPU's per-process program budget."""
    factors = jnp.asarray(np.asarray(factor_batch), jnp.float32)

    def one(z):
        return render(State(
            ball_x=jnp.int32(z[0] * (GAME_SIZE - 2 * MARGIN_X) + MARGIN_X
                             + 0.5),
            ball_y=jnp.int32(z[1] * (GAME_SIZE - 2 * MARGIN_Y) + MARGIN_Y
                             + 0.5),
        ))

    global _SIM_CORE
    if _SIM_CORE is None:
        _SIM_CORE = jax.jit(jax.vmap(one))
    return np.asarray(_SIM_CORE(factors))


@register("gridworld")
def make_spec() -> EnvSpec:
    return EnvSpec(
        name="gridworld",
        num_actions=NUM_ACTIONS,
        num_rewards=NUM_REWARDS,
        channels=CHANNELS,
        height=GAME_SIZE,
        width=GAME_SIZE,
        reset=reset,
        step=step,
        render=render,
        true_latent_dim=TRUE_LATENT_DIM,
        simulator=simulator,
    )
