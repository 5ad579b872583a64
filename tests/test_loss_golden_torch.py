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
                          truncate=False, latent_overshooting=False,
                          td_lambda=0.9, latent_td=False, td_steps=3,
                          cf_shuffle_idx=None, cf_control_perm=None,
                          cf_horizon=1, cf_lambda=1e-2):
    """The reference train() inner loop (main.py:155-298) in torch.

    ``latent_overshooting`` replicates main.py:217-234 exactly: fresh
    encoding at t, advance every kept slot with onehot(actions[:, t-1])
    (one step stale — the reference's arithmetic, not a typo here),
    pairs t_a in [2, t-2] each weighted td_lambda once against the
    detached fresh target, masked by the step-t active mask, and the
    total scaled by theta (main.py:234).

    ``latent_td`` replicates OUR documented TD(lambda) wiring (the
    reference parses the flags and ships td_latent_state_loss,
    main.py:37-39,302-303, but never calls it): a (td_steps+2)-slot
    window of the same overshooting machinery with lambda^age weights,
    pairs age in [1, td_steps].

    ``cf_shuffle_idx`` = (idx_a, idx_b) int arrays (B,) replicates
    main.py:242-262 with those fixed swap indices;
    ``cf_control_perm`` (B,) replicates main.py:268-283 with that fixed
    batch permutation.  Both compare against z at the END of the main
    rollout and roll z_orig forward cf_horizon-1 steps.
    """
    z = _torch_encoder(enc, states[:, 0:3])
    z_orig = z.clone()
    active = torch.ones(states.shape[0])
    loss = torch.zeros(())
    lo_loss = torch.zeros(())
    lo_z_set = {}
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
        if latent_overshooting:
            # main.py:217-230 verbatim structure
            lo_z_set[t] = _torch_encoder(enc, states[:, t - 1:t + 2])
            a_lo = torch.eye(ACTIONS)[actions[:, t - 1]]
            for t_left in range(1, t):
                lo_z_set[t_left] = _torch_transition(trans,
                                                     lo_z_set[t_left], a_lo)
            for t_a in range(2, t - 1):
                lsl = ((lo_z_set[t].detach() - lo_z_set[t_a]) ** 2
                       ).mean(-1).mean(-1).mean(-1)
                lo_loss = lo_loss + td_lambda * torch.mean(lsl * active)
        if latent_td:
            window = td_steps + 2
            a_lo = torch.eye(ACTIONS)[actions[:, t - 1]]
            for t_left in sorted(lo_z_set):
                lo_z_set[t_left] = _torch_transition(trans,
                                                     lo_z_set[t_left], a_lo)
            lo_z_set[t] = _torch_encoder(enc, states[:, t - 1:t + 2])
            lo_z_set.pop(t - window, None)   # slot (t mod s) reuse drops t-s
            for t_a in range(max(1, t - td_steps), t):
                if t_a not in lo_z_set:
                    continue
                lsl = ((lo_z_set[t].detach() - lo_z_set[t_a]) ** 2
                       ).mean(-1).mean(-1).mean(-1)
                lo_loss = lo_loss + (td_lambda ** (t - t_a)) * torch.mean(
                    lsl * active)
    if latent_overshooting or latent_td:
        loss = loss + theta * lo_loss
    if cf_shuffle_idx is not None:
        # main.py:242-262 with fixed swap indices
        idx_a, idx_b = cf_shuffle_idx
        bsz = z.shape[0]
        z_cf_b = z_orig.clone()
        unswapped = torch.ones((bsz, LATENT))
        for i in range(bsz):
            unswapped[i, idx_a[i]] = 0
            unswapped[i, idx_b[i]] = 0
            tmp = z_cf_b[i, idx_a[i]].clone()
            z_cf_b[i, idx_a[i]] = z_cf_b[i, idx_b[i]]
            z_cf_b[i, idx_b[i]] = tmp
        for t in range(1, cf_horizon):
            a_oh = torch.eye(ACTIONS)[actions[:, t]]
            z_cf_b = _torch_transition(trans, z_cf_b, a_oh)
        cf = torch.abs(z - z_cf_b).mean(-1).mean(-1) * unswapped
        loss = loss + cf_lambda * torch.mean(cf.mean(-1) * active)
    if cf_control_perm is not None:
        # main.py:268-283 with a fixed batch permutation
        cf_actions = actions[torch.as_tensor(cf_control_perm)]
        z_cf_b = z_orig
        for t in range(1, cf_horizon):
            a_oh = torch.eye(ACTIONS)[cf_actions[:, t]]
            z_cf_b = _torch_transition(trans, z_cf_b, a_oh)
        eps = 1e-3
        cf = -torch.log(torch.abs(z - z_cf_b).mean(-1).mean(-1).mean(-1)
                        + eps)
        loss = loss + cf_lambda * torch.mean(cf * active)
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


def _setup_golden(monkeypatch, seed=0):
    """(params, torch state dicts, batch arrays) on identical weights, with
    the transition thresholded on both sides (RNG can't match)."""
    enc, trans, dec, rp = _make_state_dicts()
    params = WorldModel(
        encoder=torch_import.import_encoder(enc),
        decoder=torch_import.import_decoder(dec),
        transition=torch_import.import_transition(trans),
        reward_predictor=torch_import.import_reward_predictor(rp),
        discriminator={},
    )
    rng = np.random.default_rng(seed)
    states = rng.random((B, T, COLOR, HW, HW)).astype(np.float32)
    rewards = rng.normal(size=(B, T, REWARDS)).astype(np.float32)
    dones = (rng.random((B, T)) < 0.15).astype(np.float32)
    acts = rng.integers(0, ACTIONS, size=(B, T))
    monkeypatch.setattr(wm_mod, "st_bernoulli",
                        lambda key, p: wm_mod.hard_threshold(p))
    obs = jnp.asarray(states.transpose(0, 1, 3, 4, 2))
    batch = (obs, jnp.asarray(rewards), jnp.asarray(dones),
             jnp.asarray(acts))
    torch_batch = (torch.from_numpy(states), torch.from_numpy(rewards),
                   torch.from_numpy(dones), torch.from_numpy(acts))
    return params, (enc, trans, dec, rp), batch, torch_batch


def test_latent_overshooting_matches_reference_replica(monkeypatch):
    """Pins the LO pair window [2, t-2], the stale actions[:, t-1]
    advance, the once-per-pair td_lambda weight, and the theta scaling
    (reference main.py:217-234)."""
    params, sd, batch, tb = _setup_golden(monkeypatch)
    horizon, theta, reward_coef, lam = T, 0.7, 1e-3, 0.9
    expected = _reference_train_loss(
        *sd, *tb, horizon, theta, reward_coef,
        latent_overshooting=True, td_lambda=lam)
    cfg = LossConfig(horizon=horizon, reward_coef=reward_coef,
                     latent_overshooting=True, td_lambda=lam)
    loss, metrics = world_model_loss(params, batch, jax.random.PRNGKey(0),
                                     jnp.float32(theta), jnp.float32(0.0),
                                     cfg)
    assert float(metrics["lo_loss"]) > 0  # the branch actually fired
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


def test_latent_td_matches_independent_replica(monkeypatch):
    """The reference parses --latent-td but never wires it
    (main.py:37-39,302-303); OUR wiring (windowed overshooting, lambda^age,
    ages [1, td_steps]) is pinned here against an independent torch
    implementation of the documented semantics."""
    params, sd, batch, tb = _setup_golden(monkeypatch)
    horizon, theta, reward_coef, lam, steps = T, 0.7, 1e-3, 0.8, 2
    expected = _reference_train_loss(
        *sd, *tb, horizon, theta, reward_coef,
        latent_td=True, td_lambda=lam, td_steps=steps)
    cfg = LossConfig(horizon=horizon, reward_coef=reward_coef,
                     latent_td=True, td_lambda=lam, td_steps=steps)
    loss, metrics = world_model_loss(params, batch, jax.random.PRNGKey(0),
                                     jnp.float32(theta), jnp.float32(0.0),
                                     cfg)
    assert float(metrics["lo_loss"]) > 0
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


@pytest.mark.parametrize("cf_horizon", [1, 3])
def test_cf_shuffle_matches_reference_replica(monkeypatch, cf_horizon):
    """Pins the factor-swap CF loss (main.py:242-262): swap on z_orig,
    roll cf_horizon-1 steps with the REAL actions, L1 drift of unswapped
    dims vs z_final, active-masked, CF_REGULARIZATION_LAMBDA-scaled.
    The random swap is fixed to identical indices on both sides."""
    import scmgan_tpu.train.losses as losses_mod

    params, sd, batch, tb = _setup_golden(monkeypatch)
    horizon, theta, reward_coef, cf_lambda = T, 0.7, 1e-3, 1e-2
    rng = np.random.default_rng(7)
    idx_a = rng.integers(0, LATENT, size=(B,))
    idx_b = rng.integers(0, LATENT, size=(B,))

    def fixed_swap(key, z, latent_dim):
        bsz = z.shape[0]
        base = jnp.broadcast_to(jnp.arange(latent_dim), (bsz, latent_dim))
        perm = base.at[jnp.arange(bsz), idx_a].set(jnp.asarray(idx_b))
        perm = perm.at[jnp.arange(bsz), idx_b].set(jnp.asarray(idx_a))
        z_sw = jnp.take_along_axis(z, perm[:, None, None, :], axis=-1)
        unsw = jnp.ones((bsz, latent_dim), jnp.float32)
        unsw = unsw.at[jnp.arange(bsz), jnp.asarray(idx_a)].set(0.0)
        unsw = unsw.at[jnp.arange(bsz), jnp.asarray(idx_b)].set(0.0)
        return z_sw, unsw

    monkeypatch.setattr(losses_mod, "_swap_two_factors", fixed_swap)
    expected = _reference_train_loss(
        *sd, *tb, horizon, theta, reward_coef,
        cf_shuffle_idx=(idx_a, idx_b), cf_horizon=cf_horizon,
        cf_lambda=cf_lambda)
    cfg = LossConfig(horizon=horizon, reward_coef=reward_coef,
                     enable_cf_shuffle=True,
                     counterfactual_horizon=cf_horizon,
                     cf_lambda=cf_lambda)
    loss, metrics = world_model_loss(params, batch, jax.random.PRNGKey(0),
                                     jnp.float32(theta), jnp.float32(1.0),
                                     cfg)
    assert "cf_disentanglement_loss" in metrics
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


@pytest.mark.parametrize("cf_horizon", [1, 3])
def test_cf_control_matches_reference_replica(monkeypatch, cf_horizon):
    """Pins the action-control CF loss (main.py:268-283): roll z_orig
    with batch-shuffled actions, -log(L1 divergence + 1e-3) vs z_final,
    active-masked.  The batch permutation is fixed on both sides."""
    params, sd, batch, tb = _setup_golden(monkeypatch)
    horizon, theta, reward_coef, cf_lambda = T, 0.7, 1e-3, 1e-2
    fixed_perm = np.random.default_rng(11).permutation(B)
    monkeypatch.setattr(
        jax.random, "permutation",
        lambda key, n: jnp.asarray(fixed_perm, jnp.int32))
    expected = _reference_train_loss(
        *sd, *tb, horizon, theta, reward_coef,
        cf_control_perm=fixed_perm, cf_horizon=cf_horizon,
        cf_lambda=cf_lambda)
    cfg = LossConfig(horizon=horizon, reward_coef=reward_coef,
                     enable_cf_control=True,
                     counterfactual_horizon=cf_horizon,
                     cf_lambda=cf_lambda)
    loss, metrics = world_model_loss(params, batch, jax.random.PRNGKey(0),
                                     jnp.float32(theta), jnp.float32(1.0),
                                     cfg)
    assert "cf_control_loss" in metrics
    np.testing.assert_allclose(float(loss), expected, rtol=2e-4)


def test_cf_gating_zeroes_cf_terms(monkeypatch):
    """cf_active=0 (iterations where train_iter % CF_REGULARIZATION_RATE
    != 0, main.py:242,268) must reduce the loss to the plain objective."""
    params, sd, batch, tb = _setup_golden(monkeypatch)
    horizon, theta, reward_coef = T, 0.7, 1e-3
    plain = _reference_train_loss(*sd, *tb, horizon, theta, reward_coef)
    cfg = LossConfig(horizon=horizon, reward_coef=reward_coef,
                     enable_cf_shuffle=True, enable_cf_control=True)
    loss, _ = world_model_loss(params, batch, jax.random.PRNGKey(0),
                               jnp.float32(theta), jnp.float32(0.0), cfg)
    np.testing.assert_allclose(float(loss), plain, rtol=2e-4)
