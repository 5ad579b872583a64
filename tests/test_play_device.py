"""On-device whole-episode MPC play vs the host play loop.

agent/play_device.py compiles the entire episode protocol into one
program; this pins it against agent/play.py (the reference-protocol host
loop, main.py:327-400) on gridworld: same weights, same env PRNG chain
(HostEnv seeded with the episode seed), stall kick disabled (the two
loops draw kick randomness from different generators).  Dynamics are
deterministic given the key chain, so the trajectories — and therefore
the cumulative rewards and step counts — must match exactly.
"""

import numpy as np
import pytest

import jax

from scmgan_tpu.agent.play import play
from scmgan_tpu.agent.play_device import play_on_device
from scmgan_tpu.data import allocate_datasource
from scmgan_tpu.envs.base import HostEnv
from scmgan_tpu.models import init_world_model

MAX_STEPS, LOOKAHEAD, DEPTH = 12, 1, 3


@pytest.fixture(scope="module")
def setup():
    ds = allocate_datasource("gridworld")
    wm = init_world_model(
        jax.random.PRNGKey(3), 16, ds.binary_input_channels,
        ds.scalar_output_channels, ds.conv_input_channels,
        ds.conv_output_channels, img_size=ds.spec.height)
    return ds, wm


def test_device_play_matches_host_loop(setup, tmp_path):
    ds, wm = setup
    host_rewards, host_steps = [], []
    for s in (0, 1):
        r, t = play(wm, ds, max_steps=MAX_STEPS, rollout_depth=DEPTH,
                    lookahead=LOOKAHEAD, out_dir=str(tmp_path),
                    verbose=False, seed=s, stall_patience=0,
                    env=HostEnv(ds.spec, seed=s), write_video=False)
        host_rewards.append(r)
        host_steps.append(t)

    dev_rewards, dev_steps = play_on_device(
        wm, ds, episodes=2, max_steps=MAX_STEPS, rollout_depth=DEPTH,
        lookahead=LOOKAHEAD, stall_patience=0, seed0=0,
        verbose=False)

    np.testing.assert_allclose(dev_rewards, host_rewards, atol=1e-5)
    assert dev_steps == host_steps


def test_device_play_is_deterministic_and_writes_scores(setup, tmp_path):
    ds, wm = setup
    r1, t1 = play_on_device(wm, ds, episodes=2, max_steps=MAX_STEPS,
                            rollout_depth=DEPTH, lookahead=LOOKAHEAD,
                            seed0=5, out_dir=str(tmp_path), verbose=False)
    r2, t2 = play_on_device(wm, ds, episodes=2, max_steps=MAX_STEPS,
                            rollout_depth=DEPTH, lookahead=LOOKAHEAD,
                            seed0=5, verbose=False)
    assert r1 == r2 and t1 == t2
    # gridworld never terminates -> host loop exits at t = max_steps + 1
    assert all(t == MAX_STEPS + 1 for t in t1)
    scores = sorted(tmp_path.glob("evaluation_metrics_*.txt"))
    assert len(scores) == 2
    assert "cumulative reward" in scores[0].read_text()


def test_episode_chunk_budget(setup, monkeypatch):
    """The lane-step budget (measured 64x64 worker-fault boundary,
    docs/play64_crash_matrix.json) maps to per-program episode chunks:
    64x64 ref recipe -> 2 episodes/program, depth 20/30 -> 1, and small
    16x16 envs stay effectively unchunked."""
    from scmgan_tpu.agent.play_device import _episode_chunk, fits_on_device
    from scmgan_tpu.envs import get_env

    pong = get_env("pong")          # 64x64, A=4
    assert _episode_chunk(pong, 4, 2, 12, "noop", 1) == 2
    assert _episode_chunk(pong, 4, 2, 20, "noop", 1) == 1
    assert _episode_chunk(pong, 4, 2, 30, "noop", 1) == 1
    # lookahead 3 exceeds even a single episode -> host fallback signal
    assert not fits_on_device(pong, 4, lookahead=3, rollout_depth=12)
    # 64x64 greedy tails: conservative xA multiplier -> host fallback
    assert not fits_on_device(pong, 4, lookahead=2, rollout_depth=20,
                              rollout_policy="greedy")
    # within budget -> device
    assert fits_on_device(pong, 4, lookahead=2, rollout_depth=30)

    grid = get_env("gridworld")     # 16x16-class env
    assert _episode_chunk(grid, grid.num_actions, 2, 12, "noop", 1) >= 10
    assert fits_on_device(grid, grid.num_actions, lookahead=2,
                          rollout_depth=12, rollout_policy="greedy")

    # env knob override
    monkeypatch.setenv("SCMGAN_PLAY_LANE_BUDGET", "1")
    assert _episode_chunk(pong, 4, 2, 12, "noop", 1) == 1
