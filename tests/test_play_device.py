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
