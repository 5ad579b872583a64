"""Environment zoo.  Importing this package registers all built-in envs."""

from scmgan_tpu.envs.base import (  # noqa: F401
    EnvSpec,
    HostEnv,
    available_envs,
    get_env,
    register,
    rollout,
)

# Importing registers each env with the registry.
from scmgan_tpu.envs import betterpong  # noqa: F401
from scmgan_tpu.envs import boxes  # noqa: F401
from scmgan_tpu.envs import gameoflife  # noqa: F401
from scmgan_tpu.envs import gridworld  # noqa: F401
from scmgan_tpu.envs import minipacman  # noqa: F401
from scmgan_tpu.envs import pong_family  # noqa: F401
from scmgan_tpu.envs import roomba  # noqa: F401
