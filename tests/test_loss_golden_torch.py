"""Golden-value test: the full training objective vs a torch replica.

Replicates the reference's inner training loop (reference main.py:155-298:
encode -> roll horizon steps -> masked reward MSE + masked pixel BCE, with
optional truncated BPTT) in torch on the SAME weights (via the .pth
importer path) and the SAME trajectory batch, and checks
``world_model_loss`` produces the same total loss.

Stochasticity note: the reference samples Bernoulli latents during
training; RNG cannot match across frameworks, so both sides run the
transition in threshold mode here (the straight-through sampler is
covered by its own unit tests).  This pins the *loss arithmetic*: BCE
means, done-masking, reward coefficients, theta scheduling, truncation.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import scmgan_tpu.models.world_model as wm_mod
from scmgan_tpu.models.world_model import WorldModel
from scmgan_tpu.train import torch_import
from scmgan_tpu.train.losses import LossConfig, world_model_loss
from tests.test_torch_parity import (
    _plain_dict,
    _sn_dict,
    _sn_effective_weight,
    _torch_conv,
)

F = torch.nn.functional

LATENT, ACTIONS, COLOR, REWARDS = 8, 4, 3, 2
B, T, HW = 3, 6, 16


def _make_state_dicts():
    enc, trans, dec, rp = {}, {}, {}, {}
    enc.update(_sn_dict("conv1", 32, COLOR * 3, seed=100))
    enc.update(_sn_dict("conv2", 32, 32, seed=101))
    enc.update(_sn_dict("conv3", 32, 32, seed=102))
    enc.update(_plain_dict("conv4", LATENT, 32, seed=103))
    for i in range(1, 6):
        cin = LATENT + ACTIONS if i == 1 else (64 if i == 5 else 32)
        trans.update(_sn_dict(f"conv{i}", 32, cin, seed=110 + i))
    trans.update(_plain_dict("conv6", LATENT, 64, seed=116))
    dec.update(_plain_dict("conv1", LATENT * 4, LATENT, seed=120,
                           transpose=True))
    dec.update(_plain_dict("conv2", LATENT * COLOR, LATENT * 4, seed=121,
                           transpose=True))
    rp.update(_plain_dict("conv1", 32, LATENT, seed=122))
    rp.update(_plain_dict("conv2", REWARDS * 3, 32, seed=123))
    return enc, trans, dec, rp


def _torch_encoder(enc, frames):          # frames (B, 3, C, H, W)
    b = frames.shape[0]
    x = frames.reshape(b, 3 * COLOR, HW, HW)
    x = F.leaky_relu(_torch_conv(enc, "conv1", x, spectral=True))
    x = F.leaky_relu(_torch_conv(enc, "conv2", x, spectral=True))
    x = F.leaky_relu(_torch_conv(enc, "conv3", x, spectral=True))
    return torch.sigmoid(_torch_conv(enc, "conv4", x))


def _torch_transition(trans, z, a_oh):    # threshold mode
    at = a_oh.unsqueeze(-1).unsqueeze(-1).repeat(1, 1, HW, HW)
    x = torch.cat([z, at], dim=1)
    x = F.leaky_relu(_torch_conv(trans, "conv1", x, spectral=True,
                                 circular=True))
    skip1 = x
    x = F.leaky_relu(_torch_conv(trans, "conv2", x, spectral=True,
                                 circular=True))
    skip2 = x
    x = F.leaky_relu(_torch_conv(trans, "conv3", x, spectral=True,
                                 circular=True))
    x = F.leaky_relu(_torch_conv(trans, "conv4", x, spectral=True,
                                 circular=True))
    x = torch.cat([x, skip2], dim=1)
    x = F.leaky_relu(_torch_conv(trans, "conv5", x, spectral=True,
                                 circular=True))
    x = torch.cat([x, skip1], dim=1)
    x = _torch_conv(trans, "conv6", x, circular=True)
    return (torch.sigmoid(x) > 0.5).float()


def _torch_decoder(dec, z):
    x = F.leaky_relu(F.conv_transpose2d(z, dec["conv1.weight"],
                                        dec["conv1.bias"], stride=1,
                                        padding=1))
    x = F.conv_transpose2d(x, dec["conv2.weight"], dec["conv2.bias"],
                           stride=1, padding=1)
    b = z.shape[0]
    return x.reshape(b, LATENT, COLOR, HW, HW).sum(dim=1)


def _torch_reward(rp, z):
    x = F.leaky_relu(F.conv2d(z, rp["conv1.weight"], rp["conv1.bias"]))
    x = F.conv2d(x, rp["conv2.weight"], rp["conv2.bias"], stride=2)
    b, c, h, w = x.shape
    x = torch.softmax(x.reshape(b, 3, c // 3, h, w), dim=1)
    return (x[:, 0] - x[:, 2]).sum(-1).sum(-1)


def _reference_train_loss(enc, trans, dec, rp, states, rewards, dones,
                          actions, horizon, theta, reward_coef,
                          truncate=False):
    """The reference train() inner loop (main.py:155-298) in torch."""
    z = _torch_encoder(enc, states[:, 0:3])
    active = torch.ones(states.shape[0])
    loss = torch.zeros(())
    for t in range(1, horizon - 1):
        active = active * (1 - dones[:, t])
        expected_r = _torch_reward(rp, z)
        rd = torch.mean(torch.mean(
            (expected_r - rewards[:, t]) ** 2, dim=1) * active)
        loss = loss + theta * reward_coef * rd
        predicted = torch.sigmoid(_torch_decoder(dec, z))
        bce = F.binary_cross_entropy(predicted, states[:, t],
                                     reduction="none")
        rec = bce.mean(-1).mean(-1).mean(-1)
        loss = loss + torch.mean(rec * active)
        if truncate and t > 1:
            z = z.detach()
        a_oh = torch.eye(ACTIONS)[actions[:, t]]
        z = _torch_transition(trans, z, a_oh)
    return float(loss)


@pytest.mark.parametrize("truncate", [False, True])
def test_full_loss_matches_reference_replica(monkeypatch, truncate):
    enc, trans, dec, rp = _make_state_dicts()
    params = WorldModel(
        encoder=torch_import.import_encoder(enc),
        decoder=torch_import.import_decoder(dec),
        transition=torch_import.import_transition(trans),
        reward_predictor=torch_import.import_reward_predictor(rp),
        discriminator={},
    )
    rng = np.random.default_rng(0)
    states = rng.random((B, T, COLOR, HW, HW)).astype(np.float32)
    rewards = rng.normal(size=(B, T, REWARDS)).astype(np.float32)
    dones = (rng.random((B, T)) < 0.15).astype(np.float32)
    acts = rng.integers(0, ACTIONS, size=(B, T))
    horizon, theta, reward_coef = T, 0.7, 1e-3

    expected = _reference_train_loss(
        enc, trans, dec, rp,
        torch.from_numpy(states), torch.from_numpy(rewards),
        torch.from_numpy(dones), torch.from_numpy(acts),
        horizon, theta, reward_coef, truncate=truncate)

    # threshold mode on our side too (RNG can't match across frameworks)
    monkeypatch.setattr(wm_mod, "st_bernoulli",
                        lambda key, p: wm_mod.hard_threshold(p))
    obs = jnp.asarray(states.transpose(0, 1, 3, 4, 2))   # -> NHWC
    batch = (obs, jnp.asarray(rewards), jnp.asarray(dones),
             jnp.asarray(acts))
    cfg = LossConfig(horizon=horizon, reward_coef=reward_coef,
                     truncate_bptt=truncate)
    loss, _ = world_model_loss(params, batch, jax.random.PRNGKey(0),
                               jnp.float32(theta), jnp.float32(0.0), cfg)
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)
