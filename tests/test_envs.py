"""Environment zoo tests: shapes, contracts, determinism, dynamics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.data import allocate_datasource
from scmgan_tpu.envs import available_envs, get_env, rollout
from scmgan_tpu.envs import betterpong, gridworld


SYNTH_ENVS = ["pong", "gridworld", "gameoflife"]


@pytest.mark.parametrize("name", SYNTH_ENVS)
def test_rollout_contract(name, key):
    spec = get_env(name)
    obs, rewards, dones, actions = rollout(spec, key, 4, 6)
    assert obs.shape == (4, 6, spec.height, spec.width, spec.channels)
    assert rewards.shape == (4, 6, spec.num_rewards)
    assert dones.shape == (4, 6)
    assert actions.shape == (4, 6)
    assert obs.dtype == jnp.float32
    assert float(obs.min()) >= 0.0 and float(obs.max()) <= 1.0
    assert int(actions.max()) < spec.num_actions


@pytest.mark.parametrize("name", SYNTH_ENVS)
def test_rollout_deterministic_under_key(name, key):
    spec = get_env(name)
    a = rollout(spec, key, 2, 5)
    b = rollout(spec, key, 2, 5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_datasource_reference_contract(key):
    ds = allocate_datasource("pong")
    states, rewards, dones, actions = ds.get_trajectories(3, 7)
    # reference layout: (B, T, C, H, W) (SURVEY §2.4)
    assert states.shape == (3, 7, 3, 64, 64)
    assert rewards.shape == (3, 7, 1)
    assert ds.binary_input_channels == 4
    assert ds.scalar_output_channels == 1
    assert ds.conv_input_channels == 3
    assert ds.conv_output_channels == 3


def test_gridworld_reward_at_walls(key):
    # Push right repeatedly -> +1 reward when the ball hits the right wall
    state = gridworld.State(ball_x=jnp.int32(14), ball_y=jnp.int32(8))
    total = 0.0
    for _ in range(3):
        state, r, d = gridworld.step(state, jnp.int32(3), key)
        total += float(r[0])
    assert total >= 1.0


def test_betterpong_ball_bounces_off_walls(key):
    state = betterpong.State(
        left_y=jnp.int32(32), right_y=jnp.int32(32),
        ball_x=jnp.int32(32), ball_y=jnp.int32(62),
        vel_x=jnp.int32(2), vel_y=jnp.int32(3),
    )
    state, _, _ = betterpong.step(state, jnp.int32(0), key)
    assert int(state.vel_y) == -3


def test_betterpong_scoring_reflects_and_rewards(key):
    state = betterpong.State(
        left_y=jnp.int32(0), right_y=jnp.int32(0),
        ball_x=jnp.int32(63), ball_y=jnp.int32(32),
        vel_x=jnp.int32(3), vel_y=jnp.int32(2),
    )
    state, r, done = betterpong.step(state, jnp.int32(0), key)
    assert float(r[0]) == 1.0
    assert int(state.vel_x) == -3
    assert not bool(done)


def test_betterpong_render_matches_reference_rasterizer(key):
    """Pixel-exact check of the iota rasterizer against the reference's
    numpy draw_rect semantics (envs/betterpong.py:94-112)."""
    state = betterpong.State(
        left_y=jnp.int32(10), right_y=jnp.int32(50),
        ball_x=jnp.int32(30), ball_y=jnp.int32(20),
        vel_x=jnp.int32(2), vel_y=jnp.int32(2),
    )
    frame = np.asarray(betterpong.render(state))  # (H, W, C)

    def draw_rect(pixels, cx, cy, w, h, color):
        left, right = max(cx - w, 0), min(cx + w, 63)
        top, bottom = max(cy - h, 0), min(cy + h, 63)
        pixels[color, top:bottom, left:right] = 1

    ref = np.zeros((3, 64, 64))
    draw_rect(ref, 5, 10, 1, 8, color=2)
    draw_rect(ref, 59, 50, 1, 8, color=0)
    draw_rect(ref, 30, 20, 2, 2, color=1)
    np.testing.assert_array_equal(frame.transpose(2, 0, 1), ref)


def test_gameoflife_blinker_oscillates(key):
    from scmgan_tpu.envs import gameoflife

    grid = jnp.zeros((64, 64), bool).at[10, 10:13].set(True)
    state = gameoflife.State(grid=grid)
    state, _, _ = gameoflife.step(state, jnp.int32(0), key)
    got = np.asarray(state.grid)
    expect = np.zeros((64, 64), bool)
    expect[9:12, 11] = True
    np.testing.assert_array_equal(got, expect)
    # period 2
    state, _, _ = gameoflife.step(state, jnp.int32(0), key)
    np.testing.assert_array_equal(np.asarray(state.grid), np.asarray(grid))


def test_gameoflife_wraps_toroidally(key):
    from scmgan_tpu.envs import gameoflife

    # blinker crossing the boundary: cells in last and first columns
    grid = jnp.zeros((64, 64), bool).at[10, jnp.array([63, 0, 1])].set(True)
    state = gameoflife.State(grid=grid)
    state, _, _ = gameoflife.step(state, jnp.int32(0), key)
    got = np.asarray(state.grid)
    assert got[9, 0] and got[10, 0] and got[11, 0]


def test_host_env_wrapper(key):
    spec = get_env("gridworld")
    from scmgan_tpu.envs import HostEnv

    env = HostEnv(spec)
    obs = env.reset()
    assert obs.shape == (16, 16, 3)
    obs, r, done, info = env.step(1)
    assert obs.shape == (16, 16, 3)
    assert isinstance(r, float)


def test_registry_lists_envs():
    names = available_envs()
    for expected in ["pong", "gridworld", "gameoflife"]:
        assert expected in names


def test_pong_simulator_for_higgins():
    spec = get_env("pong")
    factors = np.random.default_rng(0).uniform(size=(4, spec.true_latent_dim))
    frames = spec.simulator(factors)
    assert frames.shape == (4, 3, 64, 64, 3)


def test_rollout_action_alignment(key):
    """actions[t] must be the action applied AT obs[t] that produces
    obs[t+1] — the reference's recording convention (envs/gridworld.py:
    77-92: step, reassign actions, append).  A probe env encodes its
    scalar state into every pixel, so the emitted arrays expose the
    convention exactly: obs[t+1] - obs[t] == actions[t] + 1."""
    from scmgan_tpu.envs.base import EnvSpec

    def reset(k):
        return jnp.float32(0.0)

    def step(state, action, k):
        new = state + action.astype(jnp.float32) + 1.0
        return new, jnp.zeros((1,), jnp.float32) + new, jnp.bool_(False)

    def render(state):
        return jnp.full((4, 4, 1), state, jnp.float32)

    spec = EnvSpec(name="probe", num_actions=3, num_rewards=1, channels=1,
                   height=4, width=4, reset=reset, step=step, render=render)
    obs, rewards, dones, actions = rollout(spec, key, 2, 8)
    obs, rewards, actions = (np.asarray(x) for x in (obs, rewards, actions))
    for b in range(2):
        for t in range(7):
            assert obs[b, t + 1, 0, 0, 0] - obs[b, t, 0, 0, 0] == (
                actions[b, t] + 1), (b, t)
        # rewards[t] is the reward received ENTERING obs[t] (unchanged)
        np.testing.assert_allclose(rewards[b, :, 0], obs[b, :, 0, 0, 0])


def test_gridworld_rollout_actions_explain_ball_motion(key):
    """End-to-end alignment check on a real env: each frame delta must be
    consistent with the recorded action at the SAME index (up to wall
    clipping), never require the previous one."""
    spec = get_env("gridworld")
    obs, _, _, actions = rollout(spec, key, 4, 12)
    obs, actions = np.asarray(obs), np.asarray(actions)

    def center(frame):
        ys, xs = np.nonzero(frame[:, :, 1])
        if len(xs) == 0:
            return None
        return xs.mean(), ys.mean()

    checked = 0
    for b in range(4):
        for t in range(11):
            p0, p1 = center(obs[b, t]), center(obs[b, t + 1])
            if p0 is None or p1 is None:
                continue
            dx, dy = p1[0] - p0[0], p1[1] - p0[1]
            a = int(actions[b, t])
            edx = {2: -3.0, 3: 3.0}.get(a, 0.0)
            edy = {0: -3.0, 1: 3.0}.get(a, 0.0)
            # clipping at walls can shrink the step but never flips sign
            assert (edx == 0 and abs(dx) < 1e-6) or (
                edx != 0 and (dx == 0 or np.sign(dx) == np.sign(edx))), (
                b, t, a, dx)
            assert (edy == 0 and abs(dy) < 1e-6) or (
                edy != 0 and (dy == 0 or np.sign(dy) == np.sign(edy))), (
                b, t, a, dy)
            checked += 1
    assert checked > 20
