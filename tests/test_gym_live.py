"""LIVE emulator validation of the host-env pipeline.

Every other host adapter (ALE, SC2) is gated on emulators absent from this
image; gymnasium IS present, so these tests drive the full reference
architecture — external emulator process -> actor thread -> replay buffer
-> stitcher -> device batch -> train step (reference envs/minipacman.py:50-164
pattern) — against a real game backend end-to-end.
"""

import numpy as np
import pytest

try:
    from scmgan_tpu.envs.host.gym_compat import import_gym

    _GYM = import_gym()
except ImportError:  # pragma: no cover - image without any gym backend
    _GYM = None

pytestmark = pytest.mark.skipif(_GYM is None, reason="no gym/gymnasium")


def _carracing_available():
    try:
        env = _GYM.make("CarRacing-v3", continuous=False)
        env.close()
        return True
    except Exception:
        return False


def test_legacy_compat_wrapper_cartpole():
    """reset() -> obs and step() -> 4-tuple, whatever the backend API."""
    env = _GYM.make("CartPole-v1")
    obs = env.reset()
    assert isinstance(obs, np.ndarray) and obs.shape == (4,)
    out = env.step(0)
    assert len(out) == 4
    obs, reward, done, info = out
    assert isinstance(done, bool) and isinstance(info, dict)
    env.close()


def test_non_pixel_env_rejected():
    """Vector-observation envs fail fast with a diagnosis, not a shape
    error deep in the encoder."""
    from scmgan_tpu.envs.host.gym_pixel import GymPixelDatasource

    with pytest.raises(ValueError, match="pixel"):
        GymPixelDatasource("CartPole-v1", seed=0)


@pytest.fixture(scope="module")
def carracing_ds():
    if not _carracing_available():
        pytest.skip("CarRacing-v3 unavailable (Box2D missing?)")
    from scmgan_tpu.envs.host.gym_pixel import GymPixelDatasource

    ds = GymPixelDatasource("CarRacing-v3", seed=0,
                            max_trajectory_len=24, capacity=8,
                            min_buffer_len=1)
    yield ds
    # stop the actor thread before pygame is torn down at interpreter
    # exit (otherwise the thread dies rendering and spams a traceback)
    ds.close()


def test_live_pixel_datasource_contract(carracing_ds):
    ds = carracing_ds
    assert ds.binary_input_channels == 5  # CarRacing discrete actions
    assert ds.scalar_output_channels == 2
    assert ds.conv_input_channels == 3
    spec = ds.spec
    assert spec.name == "gym:CarRacing-v3"
    assert (spec.height, spec.width) == (64, 64)

    obs, rewards, dones, actions = ds.collect(2, 8)
    assert obs.shape == (2, 8, 64, 64, 3)
    assert rewards.shape == (2, 8, 2)
    assert dones.shape == (2, 8)
    assert actions.shape == (2, 8)
    o = np.asarray(obs)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    assert o.std() > 0.01  # real rendered frames, not zeros
    a = np.asarray(actions)
    assert a.min() >= 0 and a.max() < 5

    # reference get_trajectories contract: NCHW numpy
    states, rew, dn, act = ds.get_trajectories(2, 6)
    assert states.shape == (2, 6, 3, 64, 64)


def test_live_train_step_on_emulator_frames(carracing_ds):
    """One real fwd+bwd train step on frames played by the live emulator:
    the exact path a reference user takes for a new gym game."""
    import jax
    import jax.numpy as jnp

    from scmgan_tpu.config import Config
    from scmgan_tpu.train.trainer import init_train_state, make_train_step

    ds = carracing_ds
    cfg = Config(env="gym:CarRacing-v3", latent_dim=4, batch_size=2,
                 train_iters=10, horizon_min=3, horizon_max=3)
    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    batch = ds.collect(cfg.batch_size, 3)
    step = make_train_step(cfg, horizon=3)
    state2, metrics = step(state, batch, key, jnp.float32(0.5),
                           jnp.float32(0.0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == int(cfg.start_iter) + 1
