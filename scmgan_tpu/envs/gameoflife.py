"""Conway's Game of Life on a 64x64 torus — a zero-player, zero-reward env.

The reference steps it with scipy ``convolve2d(boundary='wrap')``
(envs/gameoflife.py:29-42).  Here the neighbor count is one wrap-padded XLA
conv, so stepping compiles onto the device alongside everything else.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from scmgan_tpu.envs.base import EnvSpec, register

CHANNELS = 1
GAME_SIZE = 64
NUM_ACTIONS = 1
NUM_REWARDS = 1

_KERNEL = jnp.ones((3, 3, 1, 1), jnp.float32).at[1, 1, 0, 0].set(0.0)


class State(NamedTuple):
    grid: jax.Array  # (H, W) bool


def reset(key: jax.Array, p: float = 0.5) -> State:
    # reference envs/gameoflife.py:23-25: random((H,W)) > p
    return State(grid=jax.random.uniform(key, (GAME_SIZE, GAME_SIZE)) > p)


def step(state: State, action: jax.Array, key: jax.Array):
    g = state.grid.astype(jnp.float32)
    padded = jnp.pad(g, 1, mode="wrap")[None, :, :, None]
    nbrs = lax.conv_general_dilated(
        padded, _KERNEL, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    alive = (nbrs == 3) | (state.grid & (nbrs == 2))
    return (
        State(grid=alive),
        jnp.zeros((NUM_REWARDS,), jnp.float32),
        jnp.bool_(False),
    )


def render(state: State) -> jax.Array:
    return state.grid.astype(jnp.float32)[:, :, None]


@register("gameoflife")
def make_spec() -> EnvSpec:
    return EnvSpec(
        name="gameoflife",
        num_actions=NUM_ACTIONS,
        num_rewards=NUM_REWARDS,
        channels=CHANNELS,
        height=GAME_SIZE,
        width=GAME_SIZE,
        reset=reset,
        step=step,
        render=render,
    )
