"""Environment protocol and on-device trajectory collection.

The reference's environments are stateful Python classes stepped by a
4-worker thread pool (reference multi_env.py:8-39) and exposed through a
module-level ``get_trajectories`` (e.g. reference envs/betterpong.py:116-137).
Here every synthetic environment is a triple of *pure functions*

    reset(key)                  -> state
    step(state, action, key)    -> (state, reward_vec, done)
    render(state)               -> obs (H, W, C) float

over a NamedTuple state, so batched rollouts are a single compiled
``vmap(scan(step))`` program that never leaves the device — the TPU-native
replacement for the reference's thread pool.

Trajectory semantics mirror the reference (envs/betterpong.py:116-137 and
multi_env.py:26-39): environments start from a fresh reset, an initial
random action is drawn, and each of T steps records (post-step obs, reward,
done, action-taken), auto-resetting any env whose episode ended.

Divergence note: for scalar-reward synthetic envs the reference's
``get_trajectories`` stacks rewards with shape (1, T, B) due to a
list-wrapping bug (envs/betterpong.py:123,134 — `rewards = [rewards]` then
swapaxes), which silently broadcasts inside the train loss.  We return the
intended (B, T, num_rewards).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class EnvSpec:
    """A pure-functional environment definition."""

    name: str
    num_actions: int
    num_rewards: int
    channels: int
    height: int
    width: int
    reset: Callable[[jax.Array], Any]
    step: Callable[[Any, jax.Array, jax.Array], tuple]
    render: Callable[[Any], jax.Array]
    true_latent_dim: Optional[int] = None
    # factors (B, true_latent_dim) in [0,1] -> frames for the Higgins metric
    # (reference envs/betterpong.py:140-172).
    simulator: Optional[Callable[[np.ndarray], np.ndarray]] = None

    @property
    def obs_shape(self):
        return (self.height, self.width, self.channels)


_REGISTRY: Dict[str, Callable[[], EnvSpec]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


_SPEC_CACHE: Dict[str, EnvSpec] = {}


def get_env(name: str) -> EnvSpec:
    """Registry lookup (replaces the reference's if/elif chain,
    datasource.py:8-26).  Specs are cached so the same object (and therefore
    the same jit cache entry for `rollout`) is reused across calls."""
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown environment {name!r}. Available: {sorted(_REGISTRY)}"
        )
    if name not in _SPEC_CACHE:
        _SPEC_CACHE[name] = _REGISTRY[name]()
    return _SPEC_CACHE[name]


def available_envs():
    return sorted(_REGISTRY)


# --------------------------------------------------------------------------
# On-device rollout
# --------------------------------------------------------------------------

def _policy_actions(spec: EnvSpec, key, batch, policy: str):
    if policy == "repeat":
        return jnp.arange(batch, dtype=jnp.int32) % spec.num_actions
    return jax.random.randint(key, (batch,), 0, spec.num_actions)


@partial(jax.jit, static_argnames=("spec", "batch_size", "timesteps", "policy"))
def rollout(
    spec: EnvSpec,
    key: jax.Array,
    batch_size: int,
    timesteps: int,
    policy: str = "random",
):
    """Collect a trajectory batch fully on-device.

    Returns (obs, rewards, dones, actions) with shapes
    (B, T, H, W, C) float32, (B, T, R) float32, (B, T) bool, (B, T) int32.
    """
    k_reset, k_act0, k_scan = jax.random.split(key, 3)
    states = jax.vmap(spec.reset)(jax.random.split(k_reset, batch_size))
    actions0 = _policy_actions(spec, k_act0, batch_size, policy)

    def scan_step(carry, step_key):
        states, actions = carry
        k_step, k_reset, k_act = jax.random.split(step_key, 3)
        step_keys = jax.random.split(k_step, batch_size)
        states, rewards, dones = jax.vmap(spec.step)(states, actions, step_keys)
        obs = jax.vmap(spec.render)(states)
        # Auto-reset finished episodes (reference multi_env.py:30-34).
        fresh = jax.vmap(spec.reset)(jax.random.split(k_reset, batch_size))
        states = jax.tree.map(
            lambda new, f: jnp.where(
                dones.reshape((-1,) + (1,) * (new.ndim - 1)), f, new
            ),
            states,
            fresh,
        )
        next_actions = _policy_actions(spec, k_act, batch_size, policy)
        # Emit NEXT_ACTIONS, not the action just applied: the reference's
        # collection loop records, at index t, the action chosen AFTER
        # seeing state t — i.e. obs[t+1] = step(obs[t], actions[t])
        # (reference envs/gridworld.py:77-92: step(actions) then reassign
        # actions then append).  Emitting the just-applied action instead
        # shifts the whole dataset by one: every training/eval consumer
        # indexes the reference way (transition(z_t, act[t]) -> obs[t+1]),
        # so the transition would be conditioned on the action that
        # produced its INPUT — an uninformative signal under a random
        # collection policy, which silently trains an action-independent
        # model (tests/test_envs.py::test_rollout_action_alignment).
        return (states, next_actions), (obs, rewards, dones, next_actions)

    (_, _), (obs, rewards, dones, actions) = jax.lax.scan(
        scan_step, (states, actions0), jax.random.split(k_scan, timesteps)
    )
    # time-major -> batch-major
    swap = lambda x: jnp.swapaxes(x, 0, 1)
    return swap(obs), swap(rewards), swap(dones), swap(actions)


# --------------------------------------------------------------------------
# Stateful host-side wrapper (for the interactive play loop / UI)
# --------------------------------------------------------------------------

class HostEnv:
    """Minimal gym-like adapter over a pure EnvSpec, for code that steps one
    environment interactively (the MPC play loop, reference main.py:327-400,
    and the game-player UI)."""

    def __init__(self, spec: EnvSpec, seed: int = 0):
        self.spec = spec
        self._key = jax.random.PRNGKey(seed)
        self._step = jax.jit(spec.step)
        self._reset = jax.jit(spec.reset)
        self._render = jax.jit(spec.render)
        self.state = None

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def reset(self):
        self.state = self._reset(self._next_key())
        return np.asarray(self._render(self.state))

    def step(self, action: int):
        self.state, reward, done = self._step(
            self.state, jnp.int32(action), self._next_key()
        )
        obs = np.asarray(self._render(self.state))
        reward = np.asarray(reward)
        info = {f"reward_{i}": float(r) for i, r in enumerate(reward)}
        r_scalar = float(reward.sum())
        if done:
            self.state = self._reset(self._next_key())
        return obs, r_scalar, bool(done), info
