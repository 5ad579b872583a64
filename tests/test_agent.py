"""MPC planner + play-loop tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.agent.mpc import _action_table, make_planner, rollout_reward_table
from scmgan_tpu.agent.play import play
from scmgan_tpu.data import allocate_datasource
from scmgan_tpu.models import init_world_model


@pytest.fixture(scope="module")
def setup():
    ds = allocate_datasource("gridworld")
    wm = init_world_model(
        jax.random.PRNGKey(0), 8, ds.binary_input_channels,
        ds.scalar_output_channels, ds.conv_input_channels,
        ds.conv_output_channels, img_size=16)
    return ds, wm


def test_action_table_structure():
    # A=3, lookahead=2, depth=5: width 27, plans of length 6
    table = np.asarray(_action_table(3, 2, 5, "noop", None))
    assert table.shape == (27, 6)
    # exhaustive enumeration of the first 3 slots
    prefixes = {tuple(row[:3]) for row in table}
    assert len(prefixes) == 27
    # noop tail (action 0, reference main.py:467-469)
    assert (table[:, 3:] == 0).all()
    # first-action blocks are contiguous for the per-a max reshape
    assert (table[:9, 0] == 0).all() and (table[9:18, 0] == 1).all()


def test_action_table_random_policy(key):
    table = np.asarray(_action_table(4, 2, 12, "random", key))
    assert table.shape == (64, 13)
    assert table[:, 3:].max() > 0  # random tail actually random


def test_rollout_reward_table_shapes(setup, key):
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    scores = rollout_reward_table(
        wm, z, ds.binary_input_channels, lookahead=2, rollout_depth=4)
    assert scores.shape == (ds.binary_input_channels,)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_rollout_samples_monte_carlo(setup, key):
    """K>1 averages the tail over sampled-latent rollouts: finite scores,
    reproducible under the same key, different under a different key, and
    guarded against invalid combinations."""
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    a = rollout_reward_table(wm, z, 4, rollout_depth=4, key=k1,
                             rollout_samples=4)
    assert a.shape == (4,) and np.all(np.isfinite(np.asarray(a)))
    b = rollout_reward_table(wm, z, 4, rollout_depth=4, key=k1,
                             rollout_samples=4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = rollout_reward_table(wm, z, 4, rollout_depth=4, key=k2,
                             rollout_samples=4)
    assert not np.array_equal(np.asarray(a), np.asarray(c))

    with pytest.raises(ValueError, match="PRNG key"):
        rollout_reward_table(wm, z, 4, rollout_depth=4, rollout_samples=2)
    with pytest.raises(ValueError, match="exact stochastic"):
        rollout_reward_table(wm, z, 4, rollout_depth=4, key=k1,
                             rollout_samples=2, use_int8=True)


def test_rollout_samples_shares_head(setup, key):
    """With zero tail (rollout_depth == lookahead) the sampled path must
    equal the deterministic path exactly — the enumerated head is shared
    and sampling only touches the tail."""
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    det = rollout_reward_table(wm, z, 4, lookahead=2, rollout_depth=2)
    mc = rollout_reward_table(wm, z, 4, lookahead=2, rollout_depth=2,
                              key=key, rollout_samples=3)
    np.testing.assert_allclose(np.asarray(det), np.asarray(mc), rtol=1e-6)


def test_rollout_reward_deterministic(setup, key):
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = rollout_reward_table(wm, z, 4, rollout_depth=3)
    b = rollout_reward_table(wm, z, 4, rollout_depth=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_planner_returns_valid_action(setup, key):
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    plan = make_planner(wm, ds.binary_input_channels, rollout_depth=3)
    action, scores = plan(z)
    assert 0 <= action < ds.binary_input_channels
    assert int(jnp.argmax(scores)) == action


def test_play_episode_writes_artifacts(setup, tmp_path):
    ds, wm = setup
    reward, steps = play(
        wm, ds, max_steps=5, rollout_depth=2, out_dir=str(tmp_path),
        verbose=False)
    assert steps >= 5
    metrics_files = [f for f in os.listdir(tmp_path)
                     if f.startswith("evaluation_metrics_")]
    assert len(metrics_files) == 1
    text = (tmp_path / metrics_files[0]).read_text()
    assert "cumulative reward" in text
    videos = [f for f in os.listdir(tmp_path)
              if f.startswith("SimpleRolloutAgent-")]
    assert len(videos) >= 1


def test_rollout_reward_int8_mode(setup, key):
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    scores = rollout_reward_table(
        wm, z, ds.binary_input_channels, lookahead=2, rollout_depth=3,
        use_int8=True)
    assert scores.shape == (ds.binary_input_channels,)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_play_episode_int8_planner(setup, tmp_path):
    """--mpc-int8 end to end: play() with the calibrated whole-beam int8
    planner (the CLI's quantized path) writes the same artifacts."""
    ds, wm = setup
    reward, steps = play(
        wm, ds, max_steps=3, rollout_depth=2, out_dir=str(tmp_path),
        use_int8=True, verbose=False)
    assert steps >= 3
    assert any(f.startswith("evaluation_metrics_")
               for f in os.listdir(tmp_path))


def test_greedy_tail_policy(setup, key):
    """The compiled 1-step-greedy tail: finite (A,) scores, deterministic,
    and >= the noop tail's score for every first action (greedy picks the
    per-step argmax of the same weighted reward the noop tail would get,
    noop being one of its candidates — on a deterministic carry its
    running score dominates stepwise)."""
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    greedy = rollout_reward_table(wm, z, 4, lookahead=1, rollout_depth=4,
                                  rollout_policy="greedy")
    assert greedy.shape == (4,)
    assert np.all(np.isfinite(np.asarray(greedy)))
    again = rollout_reward_table(wm, z, 4, lookahead=1, rollout_depth=4,
                                 rollout_policy="greedy")
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(again))


def test_greedy_tail_composes_with_sampling(setup, key):
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    scores = rollout_reward_table(wm, z, 4, lookahead=1, rollout_depth=3,
                                  rollout_policy="greedy", key=key,
                                  rollout_samples=3)
    assert scores.shape == (4,)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_oracle_prefers_true_reward_action():
    """Beam-oracle control on gridworld: next to the right wall, stepping
    right yields the true +1 — the oracle must rank action 3 (right)
    strictly first, because it plans with the real dynamics."""
    from scmgan_tpu.agent.oracle import oracle_rollout_scores
    from scmgan_tpu.envs.base import get_env

    spec = get_env("gridworld")
    state = spec.reset(jax.random.PRNGKey(0))
    # place the ball one step from the right wall (x >= GAME_SIZE scores)
    state = state._replace(
        ball_x=jnp.asarray(14, state.ball_x.dtype),
        ball_y=jnp.asarray(8, state.ball_y.dtype))
    scores = np.asarray(oracle_rollout_scores(
        spec, state, spec.num_actions, lookahead=1, rollout_depth=3))
    assert scores.argmax() == 3, scores
    assert scores[3] > scores[2]


def test_play_oracle_episode():
    from scmgan_tpu.agent.oracle import play_oracle
    from scmgan_tpu.envs.base import get_env

    spec = get_env("gridworld")
    reward, steps = play_oracle(spec, max_steps=8, lookahead=1,
                                rollout_depth=3, seed=0)
    assert steps >= 8
    assert np.isfinite(reward)


def test_stall_breaker_takes_random_action(setup, tmp_path, monkeypatch):
    """Force the planner to always pick an action that cannot change the
    gridworld frame (pushing into a wall); the stall breaker must fire and
    the episode must visit more than one distinct frame."""
    import importlib

    # the agent package re-exports play(), shadowing the submodule name
    play_mod = importlib.import_module("scmgan_tpu.agent.play")

    ds, wm = setup
    # Always "prefer" action 2 (left): from the left wall the frame is
    # bit-identical forever without the anti-stall kick.
    monkeypatch.setattr(
        play_mod, "rollout_reward_table",
        lambda *a, **k: jnp.asarray([0.0, 0.0, 1.0, 0.0]))
    reward, steps = play(wm, ds, max_steps=12, rollout_depth=2,
                         out_dir=str(tmp_path), verbose=False, seed=0,
                         stall_patience=3)
    assert steps >= 12


def test_prefix_shared_beam_is_bit_identical(setup, key):
    """The prefix-shared enumerated head (default) must reproduce the
    full-width beam's scores exactly — beams sharing an action prefix are
    identical until their plans diverge, so sharing is pure dedup."""
    ds, wm = setup
    z = (jax.random.uniform(key, (1, 16, 16, 8)) > 0.5).astype(jnp.float32)
    for lookahead in (1, 2):
        shared = rollout_reward_table(
            wm, z, 4, lookahead=lookahead, rollout_depth=4)
        full = rollout_reward_table(
            wm, z, 4, lookahead=lookahead, rollout_depth=4,
            share_prefix=False)
        assert jnp.array_equal(shared, full), (lookahead, shared, full)
