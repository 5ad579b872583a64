"""BetterPong — the "pong" datasource: two controllable paddles, bouncing
ball, +-1 reward on scoring, no terminal state.

Pure-JAX equivalent of reference envs/betterpong.py:23-112 with the same
integer dynamics, rendering, and 6 true generative factors
(TRUE_LATENT_DIM, envs/betterpong.py:15).  Includes the ``simulator``
used by the Higgins disentanglement metric (envs/betterpong.py:140-172).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.envs.base import EnvSpec, register
from scmgan_tpu.envs.raster import rect_mask

CHANNELS = 3
GAME_SIZE = 64
PADDLE_WIDTH = 1
PADDLE_HEIGHT = 8
BALL_RADIUS = 2
NUM_ACTIONS = 4
TRUE_LATENT_DIM = 6
NUM_REWARDS = 1
MARGIN_Y = 4
MARGIN_X = 5

_VELOCITIES = jnp.array([-3, -2, 2, 3], jnp.int32)


class State(NamedTuple):
    left_y: jax.Array
    right_y: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array
    vel_x: jax.Array
    vel_y: jax.Array


def reset(key: jax.Array) -> State:
    ks = jax.random.split(key, 6)
    return State(
        left_y=jax.random.randint(ks[0], (), MARGIN_Y, GAME_SIZE - MARGIN_Y),
        right_y=jax.random.randint(ks[1], (), MARGIN_Y, GAME_SIZE - MARGIN_Y),
        ball_x=jax.random.randint(ks[2], (), MARGIN_X, GAME_SIZE - MARGIN_X),
        ball_y=jax.random.randint(ks[3], (), MARGIN_Y, GAME_SIZE - MARGIN_Y),
        vel_x=_VELOCITIES[jax.random.randint(ks[4], (), 0, 4)],
        vel_y=_VELOCITIES[jax.random.randint(ks[5], (), 0, 4)],
    )


def step(state: State, action: jax.Array, key: jax.Array):
    # Paddles (reference envs/betterpong.py:39-52): 0/1 move right paddle,
    # 2/3 move left paddle.
    right_y = state.right_y + jnp.where(
        action == 0, -3, jnp.where(action == 1, 3, 0)
    )
    right_y = jnp.clip(right_y, 0, GAME_SIZE)
    left_y = state.left_y + jnp.where(
        action == 2, -3, jnp.where(action == 3, 3, 0)
    )
    left_y = jnp.clip(left_y, 0, GAME_SIZE)

    ball_x = state.ball_x + state.vel_x
    ball_y = state.ball_y + state.vel_y
    vel_x, vel_y = state.vel_x, state.vel_y

    # Paddle bounces (envs/betterpong.py:58-68).
    bounce_right = GAME_SIZE - MARGIN_X - BALL_RADIUS - PADDLE_WIDTH
    bounce_left = MARGIN_X + BALL_RADIUS + PADDLE_WIDTH
    hit_right = (
        (bounce_right <= ball_x) & (ball_x <= bounce_right + BALL_RADIUS)
        & (vel_x > 0)
        & (right_y - PADDLE_HEIGHT <= ball_y)
        & (ball_y <= right_y + PADDLE_HEIGHT)
    )
    hit_left = (
        (bounce_left - BALL_RADIUS <= ball_x) & (ball_x <= bounce_left)
        & (vel_x < 0)
        & (left_y - PADDLE_HEIGHT <= ball_y)
        & (ball_y <= left_y + PADDLE_HEIGHT)
    )
    vel_x = jnp.where(hit_right | hit_left, -vel_x, vel_x)

    # Wall bounces (envs/betterpong.py:70-74).
    vel_y = jnp.where(
        ((ball_y >= GAME_SIZE - 2) & (vel_y > 0))
        | ((ball_y <= 2) & (vel_y < 0)),
        -vel_y,
        vel_y,
    )

    # Scoring (envs/betterpong.py:76-87): ball leaves the court -> +-1 and
    # the ball reflects back; the episode never terminates.
    blue_scores = (ball_x >= GAME_SIZE) & (vel_x > 0)
    red_scores = (ball_x <= 0) & (vel_x < 0)
    reward = jnp.where(blue_scores, 1.0, jnp.where(red_scores, -1.0, 0.0))
    vel_x = jnp.where(blue_scores | red_scores, -vel_x, vel_x)

    new_state = State(left_y, right_y, ball_x, ball_y, vel_x, vel_y)
    return new_state, reward[None].astype(jnp.float32), jnp.bool_(False)


def render(state: State) -> jax.Array:
    # Blue paddle left, red paddle right, green ball
    # (reference envs/betterpong.py:94-103; channels: 0=red, 1=green, 2=blue).
    frame = jnp.zeros((GAME_SIZE, GAME_SIZE, CHANNELS), jnp.float32)
    frame = frame.at[:, :, 2].set(
        rect_mask(GAME_SIZE, GAME_SIZE, MARGIN_X, state.left_y,
                  PADDLE_WIDTH, PADDLE_HEIGHT))
    frame = frame.at[:, :, 0].set(
        rect_mask(GAME_SIZE, GAME_SIZE, GAME_SIZE - MARGIN_X, state.right_y,
                  PADDLE_WIDTH, PADDLE_HEIGHT))
    frame = frame.at[:, :, 1].set(
        rect_mask(GAME_SIZE, GAME_SIZE, state.ball_x, state.ball_y,
                  BALL_RADIUS, BALL_RADIUS))
    return frame


def _rescale(z, lo, hi):
    # reference envs/betterpong.py:175-176
    return jnp.int32(z * (hi - lo) + lo + 0.5)


_SIM_CORE = None


def simulator(factor_batch: np.ndarray) -> np.ndarray:
    """Factors (B, 6) in [0,1] -> 3 stacked frames per sample, for the
    Higgins metric (reference envs/betterpong.py:140-172: the env is seeded
    from the factors, then stepped 3 times under random actions).

    Replicates the reference's quirk of seeding both ball velocities from
    the left_y factor (envs/betterpong.py:164-165).

    The batched core is jitted and cached at module level: un-jitted,
    every call re-compiles the internal ``lax.scan`` — a sweep making
    ~10^3 simulator calls exhausts XLA:CPU's JIT code memory
    ("LLVM compilation error: Cannot allocate memory", the same
    many-programs limit behind scripts/repro_xla_crash.py).
    """
    factors = jnp.asarray(factor_batch, jnp.float32)

    def one(key, z):
        state = State(
            left_y=_rescale(z[0], 0, GAME_SIZE),
            right_y=_rescale(z[1], 0, GAME_SIZE),
            ball_x=_rescale(z[2], MARGIN_X, GAME_SIZE - MARGIN_X),
            ball_y=_rescale(z[3], MARGIN_Y, GAME_SIZE - MARGIN_Y),
            vel_x=_rescale(z[0], 0, GAME_SIZE),
            vel_y=_rescale(z[0], 0, GAME_SIZE),
        )

        def body(carry, step_key):
            state = carry
            frame = render(state)
            ka, ks = jax.random.split(step_key)
            action = jax.random.randint(ka, (), 0, NUM_ACTIONS)
            state, _, _ = step(state, action, ks)
            return state, frame

        _, frames = jax.lax.scan(body, state, jax.random.split(key, 3))
        return frames  # (3, H, W, C)

    global _SIM_CORE
    if _SIM_CORE is None:
        _SIM_CORE = jax.jit(jax.vmap(one))
    keys = jax.random.split(jax.random.PRNGKey(0), factors.shape[0])
    return np.asarray(_SIM_CORE(keys, factors))


@register("pong")
@register("betterpong")
def make_spec() -> EnvSpec:
    return EnvSpec(
        name="pong",
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
