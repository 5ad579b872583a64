"""Evaluation/analysis tests: MSE protocol artifacts, visualization
rollouts, video writer fallbacks."""

import json
import os

import jax
import numpy as np
import pytest

from scmgan_tpu.analysis.mse import measure_prediction_mse
from scmgan_tpu.analysis.video import Video, to_uint8, resize_nearest
from scmgan_tpu.analysis.visualize import (
    factor_grid,
    format_reward_vector,
    reward_overlay,
    visualize_forward_simulation,
    visualize_reconstruction,
)
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


def test_measure_prediction_mse_artifacts(setup, tmp_path):
    ds, wm = setup
    out = measure_prediction_mse(
        wm, ds, train_iter=7, timesteps=12, batch_size=8,
        out_dir=str(tmp_path), make_plots=True)
    assert out is not None
    mse, mse_std, rew, rew_std = out
    # free-run covers t = 2..T-1 (reference main.py:808)
    assert len(mse) == 10
    assert len(mse) == len(mse_std) == len(rew) == len(rew_std)
    assert all(np.isfinite(mse))
    # artifact names match the reference scheme (main.py:858-880)
    assert (tmp_path / "mse_pixel_iter_000007.json").exists()
    assert (tmp_path / "mse_stddev_pixel_iter_000007.json").exists()
    assert (tmp_path / "mse_reward_iter_000007.json").exists()
    assert (tmp_path / "mse_pixel_iter_000007.png").exists()
    loaded = json.loads((tmp_path / "mse_pixel_iter_000007.json").read_text())
    np.testing.assert_allclose(loaded, mse)


def test_latent_collapse_warning(setup, tmp_path, capsys):
    """A transition that maps everything to the same constant latent must
    trip the collapse warning (the failure mode is otherwise silent: the
    MSE curve just goes flat — gridworld@10k post-mortem); a healthy
    random-init model must not."""
    import jax.numpy as jnp

    ds, wm = setup
    collapse_fn = lambda z, a: jnp.zeros_like(z)
    measure_prediction_mse(wm, ds, train_iter=2, timesteps=8, batch_size=4,
                           out_dir=str(tmp_path), make_plots=False,
                           transition_fn=collapse_fn)
    assert "latent collapse" in capsys.readouterr().out

    measure_prediction_mse(wm, ds, train_iter=2, timesteps=8, batch_size=4,
                           out_dir=str(tmp_path), make_plots=False)
    assert "latent collapse" not in capsys.readouterr().out


def test_mse_shell_script_extraction_contract(setup, tmp_path):
    """The metric shell scripts read MSE@H as line H+1 of the pretty-printed
    JSON (scripts/print_metrics_minipacman.sh:8-16) — the file must be a
    one-value-per-line indented JSON list."""
    ds, wm = setup
    measure_prediction_mse(wm, ds, train_iter=1, timesteps=8, batch_size=4,
                           out_dir=str(tmp_path), make_plots=False)
    lines = (tmp_path / "mse_pixel_iter_000001.json").read_text().splitlines()
    assert lines[0].strip() == "["
    float(lines[3].strip().rstrip(","))  # H=3 extraction works


def test_visualize_reconstruction(setup, tmp_path):
    ds, wm = setup
    written = visualize_reconstruction(
        wm, ds, train_iter=3, timesteps=12, offsets=(1,),
        out_dir=str(tmp_path))
    assert len(written) == 2
    for path in written:
        assert os.path.exists(path)


def test_visualize_forward_simulation(setup, tmp_path):
    ds, wm = setup
    path = visualize_forward_simulation(
        wm, ds, train_iter=3, timesteps=10, out_dir=str(tmp_path))
    assert os.path.exists(path)


def test_video_writer_fallback(tmp_path):
    vid = Video(str(tmp_path / "clip.mp4"), framerate=5)
    for i in range(3):
        vid.write_frame(np.full((8, 8, 3), i / 3.0), resize_to=(32, 32))
    path = vid.finish()
    assert os.path.exists(path)


def test_to_uint8_handles_gray_and_rgb():
    assert to_uint8(np.zeros((4, 4))).shape == (4, 4, 3)
    assert to_uint8(np.ones((4, 4, 1))).max() == 255
    assert to_uint8(np.ones((4, 4, 3))).shape == (4, 4, 3)


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    big = resize_nearest(img, (8, 8))
    assert big.shape == (8, 8, 1)
    assert big[0, 0, 0] == img[0, 0, 0]


def test_factor_grid_tiles_latents():
    z = np.random.rand(16, 16, 8).astype(np.float32)
    grid = factor_grid(z)
    assert grid.ndim == 2
    assert grid.shape[0] >= 16 * 2  # at least 3x3-ish tiling of 8 maps


def test_reward_overlay_adds_channels():
    rgb = np.zeros((16, 16, 3), np.float32)
    rmap = np.zeros((6, 6, 2), np.float32)
    rmap[2, 2, 0] = 1.0   # positive -> blue
    rmap[3, 3, 1] = -1.0  # negative -> red
    out = reward_overlay(rgb, rmap)
    assert out[:, :, 2].max() == 1.0
    assert out[:, :, 0].max() == 1.0


def test_format_reward_vector():
    assert format_reward_vector(np.array([1.0, -0.5])) == "1.00 -0.50"
