"""Checkpoint/resume tests: five-component layout, exact round-trip, and
model-only (reference-style) loading."""

import os

import jax
import numpy as np
import pytest

from scmgan_tpu.config import Config
from scmgan_tpu.data import allocate_datasource
from scmgan_tpu.train import checkpoint as ckpt
from scmgan_tpu.train.trainer import init_train_state


@pytest.fixture(scope="module")
def state():
    cfg = Config(env="gridworld", latent_dim=8, batch_size=4)
    ds = allocate_datasource(cfg.env)
    return init_train_state(cfg, ds.spec, jax.random.PRNGKey(0))


def test_five_component_file_layout(state, tmp_path):
    ckpt.save_model(str(tmp_path), state.params)
    files = set(os.listdir(tmp_path))
    # layout parity with the reference's five .pth files (main.py:136-141)
    assert files == {
        "model-encoder.npz", "model-decoder.npz", "model-transition.npz",
        "model-reward_predictor.npz", "model-discriminator.npz",
    }


def test_model_roundtrip_exact(state, tmp_path):
    ckpt.save_model(str(tmp_path), state.params)
    loaded = ckpt.load_model(str(tmp_path), state.params)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_state_roundtrip_includes_optimizer(state, tmp_path):
    ckpt.save_train_state(str(tmp_path), state)
    loaded = ckpt.load_train_state(str(tmp_path), state)
    assert int(loaded.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(loaded.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_missing_dir_raises(state, tmp_path):
    with pytest.raises((ValueError, FileNotFoundError)):
        ckpt.load_model(str(tmp_path / "empty"), state.params)


def test_load_model_only_checkpoint_gets_fresh_optimizer(state, tmp_path):
    ckpt.save_model(str(tmp_path), state.params)  # no opt_state.npz
    loaded = ckpt.load_train_state(str(tmp_path), state)
    assert int(loaded.step) == int(state.step)
    np.testing.assert_array_equal(
        np.asarray(loaded.params.encoder["conv1"]["w"]),
        np.asarray(state.params.encoder["conv1"]["w"]))


def test_shape_mismatch_rejected(state, tmp_path):
    ckpt.save_model(str(tmp_path), state.params)
    cfg2 = Config(env="gridworld", latent_dim=4, batch_size=4)
    ds = allocate_datasource(cfg2.env)
    other = init_train_state(cfg2, ds.spec, jax.random.PRNGKey(1))
    with pytest.raises(ValueError):
        ckpt.load_model(str(tmp_path), other.params)
