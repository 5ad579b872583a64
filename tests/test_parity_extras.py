"""Tests for parity extras: planning visualization, trajectory video,
host-env preprocessing, cov, the SCM-extraction examples."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_generate_trajectory_video(setup, tmp_path):
    from scmgan_tpu.analysis.visualize import generate_trajectory_video

    ds, _ = setup
    path = generate_trajectory_video(ds, out_dir=str(tmp_path), timesteps=6)
    assert os.path.exists(path)


def test_generate_planning_visualization(setup, tmp_path):
    from scmgan_tpu.analysis.video import Video
    from scmgan_tpu.analysis.visualize import generate_planning_visualization

    ds, wm = setup
    z = (jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 8)) > 0.5
         ).astype(jnp.float32)
    vid = Video(str(tmp_path / "plan.mp4"), framerate=5)
    generate_planning_visualization(
        wm, z, ds.binary_input_channels, vid, lookahead=2, rollout_depth=3)
    path = vid.finish()
    assert os.path.exists(path)


def test_gym_make_preprocessing_shapes():
    from scmgan_tpu.envs.host.atari import (
        block_reduce_max,
        convert_breakout,
        convert_pong,
    )

    frames = np.random.default_rng(0).integers(
        0, 255, size=(3, 210, 160, 3)).astype(np.float32)
    pong = convert_pong(frames)
    assert pong.shape == (3, 40, 40)
    assert set(np.unique(pong)) <= {0.0, 1.0}
    brk = convert_breakout(frames)
    assert brk.shape == (3, 80, 80)
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    np.testing.assert_array_equal(block_reduce_max(x, 2),
                                  [[5, 7], [13, 15]])


def test_centipede_heuristic_policy():
    from scmgan_tpu.envs.host.centipede import HeuristicPolicy

    policy = HeuristicPolicy(shoot_prob=0.7, seed=0)
    actions = [policy() for _ in range(500)]
    fire_frac = sum(a == HeuristicPolicy.FIRE for a in actions) / 500
    assert 0.6 < fire_frac < 0.85


def test_cov_matches_numpy(key):
    from scmgan_tpu.utils.stats import cov

    x = np.random.default_rng(0).normal(size=(50, 4))
    ours = np.asarray(cov(jnp.asarray(x)))
    theirs = np.cov(x, rowvar=False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_simple_boxes_example_components():
    import examples.simple_boxes as sb

    rng = np.random.default_rng(0)
    before, actions, after = sb.sample_transition_batch(rng, 4)
    assert before.shape == (4, 32, 32, 1)
    assert actions.shape == (4, 2)
    params = sb.init_params(jax.random.PRNGKey(0), 4)
    z = sb.encode(params["enc"], before)
    assert z.shape == (4, 4)
    recon = sb.decode(params["dec"], z)
    assert recon.shape == (4, 32, 32, 1)
    z2 = sb.transition(params["trans"], z, actions)
    assert z2.shape == (4, 4)
    scm = sb.causal_graph_from_weights(params["trans"])
    assert scm.shape == (6, 4)  # (latent+actions, latent)
    assert scm.max() <= 1.0


def test_advanced_boxes_env_shrinks_width():
    import examples.advanced_boxes as ab

    rng = np.random.default_rng(0)
    before, actions, after = ab.sample_transition_batch(rng, 8)
    assert before.shape == (8, 32, 32, 1)
    assert actions.shape == (8, 4)
    # autonomous width shrink: 'after' boxes never wider than 'before'
    assert float(after.sum()) < float(before.sum())


def test_quantized_weight_roundtrip(key):
    from scmgan_tpu.ops.pallas.quantized_transition import _quantize_weight

    w = jax.random.normal(key, (3, 3, 16, 32)) * 0.1
    q, scale = _quantize_weight(w)
    assert q.dtype == jnp.int8
    assert q.shape == (9, 16, 32)
    assert scale.shape == (1, 32)
    recon = q.reshape(-1, 32).astype(np.float32) * scale
    np.testing.assert_allclose(
        recon, np.asarray(w.reshape(-1, 32)), atol=float(scale.max()))
