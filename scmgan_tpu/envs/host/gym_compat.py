"""gym / gymnasium compatibility shim.

The reference drives the legacy ``gym`` API everywhere: ``reset() -> obs``
and ``step(a) -> (obs, reward, done, info)`` (reference envs/gym_make.py:15-63,
envs/atari.py:40-66).  Modern images ship ``gymnasium`` instead, whose API
returns ``reset() -> (obs, info)`` and a 5-tuple
``(obs, reward, terminated, truncated, info)``.  This module exposes one
factory that yields legacy-API envs from whichever backend exists, so every
host adapter (atari, gym_make, the generic pixel datasource) stays written
against the reference's convention.
"""

from __future__ import annotations


class LegacyEnv:
    """Wrap a gymnasium env behind the legacy 4-tuple gym API."""

    def __init__(self, env):
        self._env = env

    def reset(self, **kwargs):
        out = self._env.reset(**kwargs)
        if isinstance(out, tuple):  # gymnasium: (obs, info)
            return out[0]
        return out

    def step(self, action):
        out = self._env.step(action)
        if len(out) == 5:  # gymnasium: terminated/truncated split
            obs, reward, terminated, truncated, info = out
            return obs, reward, bool(terminated or truncated), info
        return out

    def __getattr__(self, name):
        return getattr(self._env, name)


class _LegacyGymModule:
    """Module-like facade: ``.make(...)`` always returns a legacy-API env."""

    def __init__(self, backend, needs_compat: bool):
        self._backend = backend
        self.needs_compat = needs_compat
        self.backend_name = backend.__name__

    def make(self, name: str, **kwargs):
        env = self._backend.make(name, **kwargs)
        return LegacyEnv(env) if self.needs_compat else env

    def __getattr__(self, name):
        return getattr(self._backend, name)


def import_gym() -> _LegacyGymModule:
    """Return a gym-like module, preferring legacy ``gym``, falling back to
    ``gymnasium`` wrapped behind the legacy API.  Raises ImportError when
    neither backend exists."""
    try:
        import gym

        return _LegacyGymModule(gym, needs_compat=False)
    except Exception:
        pass
    try:
        import gymnasium

        return _LegacyGymModule(gymnasium, needs_compat=True)
    except Exception as e:
        raise ImportError(
            f"neither gym nor gymnasium is available in this image ({e!r})"
        ) from e
