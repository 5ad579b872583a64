"""Import+eval parity: the reference's checkpoint format, loaded through
train/torch_import, must reproduce the reference's evaluation protocol
bit-for-bit (up to float tolerance) under THIS repo's eval code.

This is the glue test behind docs/reference_ab.md: a torch replica of the
reference's free-run MSE measurement (reference main.py:784-835 — encode
frames 0..2, advance once with action[1], then per step: done-mask, decode
+ sigmoid, masked/rescaled pixel-MSE mean and ddof-1 std, reward-sum MSE,
hard-threshold transition) is run on reference-format .pth files, and
analysis/mse._free_run_stats must match every per-horizon number at
rtol <= 1e-3.  Where test_torch_parity.py pins each net's forward, this
pins the composed eval pipeline: one flipped threshold bit or a wrong
mask/rescale would blow the comparison apart within a step or two.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from scmgan_tpu.analysis.mse import _free_run_stats
from scmgan_tpu.train import torch_import

from test_torch_parity import (
    _nchw,
    _plain_dict,
    _sn_dict,
    _torch_conv,
)

F = torch.nn.functional

LATENT, COLOR, ACTIONS, REWARDS, SIZE = 8, 3, 4, 2, 16


def _full_state_dicts():
    enc = {}
    enc.update(_sn_dict("conv1", 32, COLOR * 3, seed=10))
    enc.update(_sn_dict("conv2", 32, 32, seed=20))
    enc.update(_sn_dict("conv3", 32, 32, seed=30))
    enc.update(_plain_dict("conv4", LATENT, 32, seed=40))

    trans = {}
    trans.update(_sn_dict("conv1", 32, LATENT + ACTIONS, seed=1))
    trans.update(_sn_dict("conv2", 32, 32, seed=2))
    trans.update(_sn_dict("conv3", 32, 32, seed=3))
    trans.update(_sn_dict("conv4", 32, 32, seed=4))
    trans.update(_sn_dict("conv5", 32, 64, seed=5))
    trans.update(_plain_dict("conv6", LATENT, 64, seed=6))

    dec = {}
    dec.update(_plain_dict("conv1", LATENT * 4, LATENT, seed=7,
                           transpose=True))
    dec.update(_plain_dict("conv2", LATENT * COLOR, LATENT * 4, seed=8,
                           transpose=True))

    rp = {}
    rp.update(_plain_dict("conv1", 32, LATENT, seed=9))
    rp.update(_plain_dict("conv2", REWARDS * 3, 32, seed=11))

    disc = {}
    disc.update(_sn_dict("conv1", 32, 3, seed=12))
    disc.update(_sn_dict("conv2", 32, 32, seed=13))
    disc.update(_plain_dict("conv3", 32, 32, seed=14))
    g = torch.Generator().manual_seed(15)
    disc["fc1.weight"] = torch.randn(1, 32 * 7 * 7, generator=g) * 0.01
    disc["fc1.bias"] = torch.randn(1, generator=g) * 0.01
    return enc, trans, dec, rp, disc


def _torch_encode(sd, frames_nchw):
    """reference models.py:139-157 (frames already stacked to 3C chans)."""
    x = F.leaky_relu(_torch_conv(sd, "conv1", frames_nchw, spectral=True))
    x = F.leaky_relu(_torch_conv(sd, "conv2", x, spectral=True))
    x = F.leaky_relu(_torch_conv(sd, "conv3", x, spectral=True))
    return torch.sigmoid(_torch_conv(sd, "conv4", x))


def _torch_transition(sd, z, a_oh):
    """reference models.py:59-113, eval-mode hard threshold."""
    b = z.shape[0]
    at = a_oh.unsqueeze(-1).unsqueeze(-1).repeat(1, 1, SIZE, SIZE)
    x = torch.cat([z, at], dim=1)
    x = F.leaky_relu(_torch_conv(sd, "conv1", x, spectral=True,
                                 circular=True))
    skip1 = x
    x = F.leaky_relu(_torch_conv(sd, "conv2", x, spectral=True,
                                 circular=True))
    skip2 = x
    x = F.leaky_relu(_torch_conv(sd, "conv3", x, spectral=True,
                                 circular=True))
    x = F.leaky_relu(_torch_conv(sd, "conv4", x, spectral=True,
                                 circular=True))
    x = torch.cat([x, skip2], dim=1)
    x = F.leaky_relu(_torch_conv(sd, "conv5", x, spectral=True,
                                 circular=True))
    x = torch.cat([x, skip1], dim=1)
    x = _torch_conv(sd, "conv6", x, circular=True)
    return (torch.sigmoid(x) > 0.5).float()


def _torch_decode(sd, z):
    """reference models.py:270-287."""
    x = F.leaky_relu(F.conv_transpose2d(z, sd["conv1.weight"],
                                        sd["conv1.bias"], stride=1,
                                        padding=1))
    x = F.conv_transpose2d(x, sd["conv2.weight"], sd["conv2.bias"],
                           stride=1, padding=1)
    b = z.shape[0]
    return x.reshape(b, LATENT, COLOR, SIZE, SIZE).sum(dim=1)


def _torch_reward(sd, z):
    """reference models.py:235-250."""
    x = F.leaky_relu(F.conv2d(z, sd["conv1.weight"], sd["conv1.bias"]))
    x = F.conv2d(x, sd["conv2.weight"], sd["conv2.bias"], stride=2)
    b, c, h, w = x.shape
    x = x.reshape(b, 3, c // 3, h, w)
    x = torch.softmax(x, dim=1)
    x = x[:, 0] - x[:, 2]
    return x.sum(-1).sum(-1)


def test_import_plus_eval_protocol_parity(tmp_path):
    enc, trans, dec, rp, disc = _full_state_dicts()
    for name, sd in [("encoder", enc), ("transition", trans),
                     ("decoder", dec), ("reward_predictor", rp),
                     ("discriminator", disc)]:
        torch.save(sd, tmp_path / f"model-{name}.pth")
    wm = torch_import.load_reference_checkpoint(str(tmp_path))

    B, T = 4, 12
    rng = np.random.default_rng(7)
    obs = rng.uniform(size=(B, T, SIZE, SIZE, COLOR)).astype(np.float32)
    rewards = rng.normal(size=(B, T, REWARDS)).astype(np.float32)
    dones = np.zeros((B, T), np.float32)
    dones[0, 6] = 1.0   # one trajectory ends mid-run: exercises masking
    dones[1, 9] = 1.0   # and the batch/n_active rescale quirk
    actions = rng.integers(0, ACTIONS, size=(B, T)).astype(np.int32)

    # ---- torch replica of reference main.py:784-835 ----
    frames = torch.from_numpy(
        obs[:, :3].transpose(0, 1, 4, 2, 3).reshape(B, 3 * COLOR, SIZE,
                                                    SIZE))
    z = _torch_encode(enc, frames)
    a_oh = torch.from_numpy(np.eye(ACTIONS, dtype=np.float32)[actions])
    z = _torch_transition(trans, z, a_oh[:, 1])
    active = torch.ones(B)
    exp_mse, exp_std, exp_rmse, exp_rstd = [], [], [], []
    for t in range(2, T):
        active = active * (1.0 - torch.from_numpy(dones[:, t]))
        n_active = max(float(active.sum()), 1.0)
        predicted = torch.sigmoid(_torch_decode(dec, z))
        expected_f = _nchw(jnp.asarray(obs[:, t]))
        diffs = active * ((expected_f - predicted) ** 2).mean(dim=(1, 2, 3))
        exp_mse.append(float(diffs.mean()) * B / n_active)
        exp_std.append(float(diffs.std()) * B / n_active)  # torch ddof=1
        r_exp = torch.from_numpy(rewards[:, t]).sum(dim=-1)
        r_pred = _torch_reward(rp, z).sum(dim=-1)
        r_diffs = active * (r_exp - r_pred) ** 2
        exp_rmse.append(float(r_diffs.mean()) * B / n_active)
        exp_rstd.append(float(r_diffs.std()) * B / n_active)
        z = _torch_transition(trans, z, a_oh[:, t])

    # ---- this repo's eval on the imported weights ----
    batch = (jnp.asarray(obs), jnp.asarray(rewards), jnp.asarray(dones),
             jnp.asarray(actions))
    mse_m, mse_s, rew_m, rew_s, n_act, _ = (
        np.asarray(x) for x in _free_run_stats(wm, batch, ACTIONS))

    np.testing.assert_allclose(mse_m, exp_mse, rtol=1e-3)
    np.testing.assert_allclose(mse_s, exp_std, rtol=1e-3)
    np.testing.assert_allclose(rew_m, exp_rmse, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(rew_s, exp_rstd, rtol=1e-3, atol=1e-5)
    # masking bookkeeping: 4 alive until t=6, then 3, then 2 after t=9
    assert n_act[0] == 4 and n_act[-1] == 2
