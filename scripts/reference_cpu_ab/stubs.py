"""Import-time stubs that let the UNMODIFIED reference code at
/root/reference run on this CPU-only image.

The reference hard-requires a CUDA device (`.cuda()` in every model
constructor, reference models.py:57,137,175,206,233,268 and throughout
main.py) plus four packages absent here: ``imutil`` (image/video IO),
``logutil`` (TimeSeries/TensorBoard), legacy ``gym`` (only
gym.spaces.discrete.Discrete), and ``gym_minipacman``.  Nothing under
/root/reference is modified; everything is sys.modules injection and
attribute patching from the outside.
"""

import sys
import types

import numpy as np


def install_module_stubs():
    # ---- imutil ------------------------------------------------------
    imutil = types.ModuleType("imutil")

    def show(*a, **k):
        return None

    class Video:
        def __init__(self, *a, **k):
            pass

        def write_frame(self, *a, **k):
            pass

        def finish(self):
            pass

    imutil.show = show
    imutil.Video = Video
    imutil.VideoMaker = Video
    sys.modules.setdefault("imutil", imutil)

    # ---- logutil -----------------------------------------------------
    logutil = types.ModuleType("logutil")

    class TimeSeries:
        def __init__(self, *a, **k):
            self.series = {}

        def collect(self, name, value):
            try:
                value = float(value)
            except Exception:
                return
            self.series.setdefault(name, []).append(value)

        def print_every(self, *a, **k):
            pass

        def __str__(self):
            lines = [
                f"{name}: mean {np.mean(vals):.6f} (n={len(vals)})"
                for name, vals in sorted(self.series.items())
            ]
            return "\n".join(lines)

    def sparkline(vals, length=80):
        return " ".join(f"{v:.3g}" for v in list(vals)[:8]) + " ..."

    logutil.TimeSeries = TimeSeries
    logutil.sparkline = sparkline
    sys.modules.setdefault("logutil", logutil)

    # ---- legacy gym (only Discrete is touched on the gridworld path) --
    if "gym" not in sys.modules:
        try:
            import gym  # noqa: F401
        except ImportError:
            gym = types.ModuleType("gym")
            spaces = types.ModuleType("gym.spaces")
            discrete = types.ModuleType("gym.spaces.discrete")

            class Discrete:
                def __init__(self, n):
                    self.n = n

                def sample(self):
                    return np.random.randint(self.n)

            discrete.Discrete = Discrete
            spaces.discrete = discrete
            gym.spaces = spaces
            sys.modules["gym"] = gym
            sys.modules["gym.spaces"] = spaces
            sys.modules["gym.spaces.discrete"] = discrete

    # ---- gym_minipacman (imported at reference envs/minipacman.py:29;
    # never exercised on the gridworld path) ---------------------------
    if "gym_minipacman" not in sys.modules:
        pkg = types.ModuleType("gym_minipacman")
        envs_mod = types.ModuleType("gym_minipacman.envs")
        env_mod = types.ModuleType("gym_minipacman.envs.minipacman_env")

        class MiniPacman:  # pragma: no cover - placeholder only
            def __init__(self, *a, **k):
                raise RuntimeError("gym_minipacman is stubbed on this image")

        env_mod.MiniPacman = MiniPacman
        env_mod.ALE = object
        envs_mod.minipacman_env = env_mod
        pkg.envs = envs_mod
        sys.modules["gym_minipacman"] = pkg
        sys.modules["gym_minipacman.envs"] = envs_mod
        sys.modules["gym_minipacman.envs.minipacman_env"] = env_mod


def patch_torch_cpu():
    """Make every `.cuda()` call a no-op so the reference runs on CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def patch_legacy_circular_padding(module):
    """Replicate the old-torch circular-padding behavior the reference
    depends on.

    The reference's Transition convs declare ``padding=2,
    padding_mode='circular'`` (reference models.py:51-56).  In the torch
    era the reference ran on, circular padding was applied as
    ((p+1)//2, p//2) per side — i.e. padding=2 effectively padded 1+1
    and produced SAME-size outputs, which the U-net skip concats
    require.  torch >= 1.5 honors the full 2+2, growing every map by 2px
    and breaking the concats.  This resets each circular conv's
    precomputed pad tuple to the legacy (1,1,1,1).  (Our JAX transition
    uses explicit circular pad 1 for the same reason —
    scmgan_tpu/models/world_model.py.)
    """
    import torch

    for m in module.modules():
        if (isinstance(m, torch.nn.Conv2d)
                and m.padding_mode == "circular"
                and tuple(m.padding) == (2, 2)):
            m._reversed_padding_repeated_twice = [1, 1, 1, 1]
