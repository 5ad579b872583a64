"""Wider env-zoo tests: every registered synthetic env satisfies the
rollout contract; env-specific dynamics checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.envs import available_envs, get_env, rollout

ALL_SYNTH = [
    "pong", "gridworld", "gameoflife", "minipong", "mediumpong",
    "staticpong", "superpong", "hardpong", "realpong", "boxes",
    "multibox", "rotating_boxes", "roomba", "minipacman",
]


@pytest.mark.parametrize("name", ALL_SYNTH)
def test_env_contract(name, key):
    spec = get_env(name)
    obs, rewards, dones, actions = rollout(spec, key, 2, 4)
    assert obs.shape == (2, 4, spec.height, spec.width, spec.channels)
    assert rewards.shape == (2, 4, spec.num_rewards)
    assert dones.shape == (2, 4)
    assert float(obs.min()) >= 0.0 and float(obs.max()) <= 1.0
    assert np.isfinite(np.asarray(obs)).all()


@pytest.mark.parametrize("name", ["minipong", "mediumpong", "superpong",
                                  "boxes", "rotating_boxes", "gridworld",
                                  "minipacman"])
def test_higgins_simulator(name):
    spec = get_env(name)
    if spec.simulator is None:
        pytest.skip("no simulator")
    factors = np.random.default_rng(0).uniform(
        size=(3, spec.true_latent_dim))
    frames = spec.simulator(factors)
    assert frames.shape[0] == 3
    assert np.isfinite(frames).all()


def test_gridworld_simulator_factors():
    """Each factor drives its own image axis, deterministically."""
    from scmgan_tpu.envs import gridworld as gw

    base = np.full((1, 2), 0.5)
    f_lo, f_hi = base.copy(), base.copy()
    f_lo[0, 0], f_hi[0, 0] = 0.1, 0.9
    lo, hi = gw.simulator(f_lo)[0], gw.simulator(f_hi)[0]
    # factor 0 is ball_x -> the green mass's x-centroid moves right
    xs = np.arange(gw.GAME_SIZE)[None, :]
    cx = lambda img: (img[:, :, 1] * xs).sum() / img[:, :, 1].sum()
    assert cx(hi) > cx(lo) + 4
    # determinism
    assert np.array_equal(gw.simulator(base), gw.simulator(base))


def test_minipacman_simulator_factors():
    from scmgan_tpu.envs import minipacman as mp

    base = np.full((1, 5), 0.4)
    # pacman factors move the yellow (R+G, no B) sprite; positions snap to
    # corridor cells (never onto a wall)
    f2 = base.copy()
    f2[0, 0], f2[0, 1] = 0.9, 0.9
    a, b = mp.simulator(base)[0], mp.simulator(f2)[0]
    pac_a = (a[:, :, 0] >= 1.0) & (a[:, :, 1] >= 1.0)
    pac_b = (b[:, :, 0] >= 1.0) & (b[:, :, 1] >= 1.0)
    assert pac_a.any() and pac_b.any()
    assert not np.array_equal(pac_a, pac_b)
    walls = np.repeat(np.repeat(np.asarray(mp.WALLS), mp.SCALE, 0),
                      mp.SCALE, 1)
    assert not (pac_a & walls).any() and not (pac_b & walls).any()
    # factor 4 (power) flips the varied ghost's color red -> blue
    f3 = base.copy()
    f3[0, 4] = 0.9
    c = mp.simulator(f3)[0]
    assert (c[:, :, 2] >= 1.0).sum() > (a[:, :, 2] >= 1.0).sum()


def test_minipong_wraps(key):
    from scmgan_tpu.envs import pong_family as pf

    s = pf.MinipongState(jnp.int32(1), jnp.int32(1), jnp.int32(62),
                         jnp.int32(30))
    s2, _, _ = pf.minipong_step(s, jnp.int32(0), key)
    assert int(s2.ball_x) == (62 + 3) % 64
    # paddle wraps mod 64
    assert int(s2.right_y) == (1 - 3) % 64


def test_staticpong_constant_frame(key):
    spec = get_env("staticpong")
    obs, *_ = rollout(spec, key, 2, 3)
    f = np.asarray(obs)
    # every frame identical (render HACK, envs/staticpong.py:64-70)
    assert np.all(f == f[0:1, 0:1])
    assert f.min() == 0.5 or (f == 0.5).any()


def test_realpong_terminates_on_score(key):
    from scmgan_tpu.envs import pong_family as pf

    s = pf.VelState(jnp.int32(0), jnp.int32(0), jnp.int32(63), jnp.int32(32),
                    jnp.int32(3), jnp.int32(2))
    s2, r, done = pf.realpong_step(s, jnp.int32(0), key)
    assert bool(done)
    assert float(r[0]) == 1.0


def test_roomba_push_rewards(key):
    from scmgan_tpu.envs import roomba

    # robot just right of ball, pushing left (action 0)
    s = roomba.State(robot_x=jnp.int32(36), robot_y=jnp.int32(32),
                     ball_x=jnp.int32(30), ball_y=jnp.int32(32))
    s2, r, _ = roomba.step(s, jnp.int32(0), key)
    assert float(r[0]) == 1.0
    assert int(s2.ball_x) < 30  # ball shoved left


def test_boxes_toroidal_wrap(key):
    from scmgan_tpu.envs import boxes as bx

    s = bx.BoxState(jnp.float32(6.0), jnp.int32(6), jnp.int32(1), jnp.int32(30))
    s2, _, _ = bx.boxes_step(s, jnp.int32(0), key)  # x -= 3 -> wraps
    assert int(s2.x) == (1 - 3) % 64


def test_minipacman_eats_food_and_terminates(key):
    from scmgan_tpu.envs import minipacman as mp

    s = mp.reset(key)
    # place pacman next to a food cell and walk onto it
    target = None
    food = np.asarray(s.food)
    r, c = int(s.pac_r), int(s.pac_c)
    total_before = food.sum()
    # walk right until food eaten (bounded loop)
    got = 0.0
    for i in range(6):
        s, rew, done = mp.step(s, jnp.int32(1), jax.random.fold_in(key, i))
        got += float(rew[0])
    assert got >= 1.0
    assert np.asarray(s.food).sum() < total_before


def test_minipacman_death_is_negative_reward(key):
    from scmgan_tpu.envs import minipacman as mp

    s = mp.reset(key)
    # teleport a ghost onto pacman's cell with no power
    s = s._replace(ghost_r=s.ghost_r.at[0].set(s.pac_r),
                   ghost_c=s.ghost_c.at[0].set(s.pac_c),
                   power=jnp.int32(0))
    s2, rew, done = mp.step(s, jnp.int32(0), key)
    assert bool(done)
    assert float(rew[1]) == -1.0


def test_minipacman_render_shape(key):
    from scmgan_tpu.envs import minipacman as mp

    s = mp.reset(key)
    f = mp.render(s)
    assert f.shape == (64, 64, 3)
    # walls visible in blue channel
    assert float(f[:, :, 2].max()) >= 0.5


def test_registry_complete():
    names = available_envs()
    for n in ALL_SYNTH:
        assert n in names, f"{n} missing from registry"
