"""Datasource facade: the uniform trajectory-batch API.

Mirrors the reference's ``allocate_datasource`` registry and its Datasource
adapters exposing the four channel-count attributes
(``binary_input_channels`` / ``scalar_output_channels`` /
``conv_input_channels`` / ``conv_output_channels``) plus
``get_trajectories`` / ``make_env`` / ``convert_frame``
(reference datasource.py:8-121).

Two surfaces:
  * ``collect(...)``     — device-native NHWC jnp arrays, stays on-TPU;
                           what the trainer consumes.
  * ``get_trajectories`` — reference-compatible numpy in NCHW
                           (B, T, C, H, W), for parity tooling and tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from scmgan_tpu.envs.base import EnvSpec, HostEnv, get_env, rollout


class Datasource:
    """Adapter over an EnvSpec (or a host-process env module)."""

    def __init__(self, spec: EnvSpec, seed: int = 0):
        self.spec = spec
        self._key = jax.random.PRNGKey(seed)
        self.binary_input_channels = spec.num_actions
        self.scalar_output_channels = spec.num_rewards
        self.conv_input_channels = spec.channels
        self.conv_output_channels = spec.channels

    # -- RNG ---------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- device-native -----------------------------------------------------
    def collect(self, batch_size: int, timesteps: int, policy: str = "random",
                key: Optional[jax.Array] = None, training: bool = True):
        """(obs NHWC f32, rewards (B,T,R), dones (B,T), actions (B,T)) on
        device.  ``training`` selects the train/test replay split for
        host-process envs (reference main.py:791); synthetic on-device envs
        generate fresh trajectories either way, like the reference's
        (envs/betterpong.py:115-116)."""
        if key is None:
            key = self._next_key()
        return rollout(self.spec, key, batch_size, timesteps, policy)

    # -- reference-compatible ----------------------------------------------
    def get_trajectories(self, batch_size: int = 32, timesteps: int = 10,
                         policy: str = "random", random_start: bool = False,
                         training: bool = True):
        """Reference contract (e.g. envs/betterpong.py:116-137):
        states (B,T,C,H,W), rewards (B,T,R), dones (B,T), actions (B,T),
        as numpy.  ``random_start``/``training`` are accepted for parity;
        synthetic envs ignore them like the reference does
        (envs/betterpong.py:115-116)."""
        obs, rewards, dones, actions = self.collect(batch_size, timesteps, policy)
        states = np.asarray(obs).transpose(0, 1, 4, 2, 3)
        return (
            states,
            np.asarray(rewards),
            np.asarray(dones),
            np.asarray(actions),
        )

    def make_env(self, *args, **kwargs) -> HostEnv:
        # Fresh episode randomness per env instance (a fixed seed would
        # make every MPC playthrough identical).
        seed = int(jax.random.randint(self._next_key(), (), 0, 2 ** 31 - 1))
        return HostEnv(self.spec, seed=seed)

    def convert_frame(self, state):
        """(network_state, human_state) passthrough (reference
        datasource.py:33-35).  HostEnv renders NHWC already."""
        return state, state


def allocate_datasource(name: str, seed: int = 0) -> Datasource:
    """String -> Datasource (reference datasource.py:8-26)."""
    # Host-process environments (ALE / SC2 / generic gym) route through
    # envs.host.  "gym:<EnvName>" reaches any pixel gym/gymnasium env.
    if (name.startswith("sc2_") or name.startswith("gym:")
            or name in ("atari", "centipede")):
        from scmgan_tpu.envs.host import allocate_host_datasource

        return allocate_host_datasource(name, seed=seed)
    return Datasource(get_env(name), seed=seed)
