"""Loss-function tests: golden values, masking, gradient structure, and
every optional objective branch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.envs import get_env, rollout
from scmgan_tpu.models import init_world_model
from scmgan_tpu.train.losses import (
    LossConfig,
    bce_from_logits,
    decoder_pixel_loss,
    latent_state_loss,
    world_model_loss,
    _swap_two_factors,
)

B, T = 3, 8
LATENT = 8


@pytest.fixture(scope="module")
def setup():
    spec = get_env("gridworld")
    key = jax.random.PRNGKey(0)
    batch = rollout(spec, key, B, T)
    wm = init_world_model(
        jax.random.PRNGKey(1), LATENT, spec.num_actions, spec.num_rewards,
        spec.channels, spec.channels, img_size=spec.height,
    )
    return spec, wm, batch


def _loss(wm, batch, cfg, key=None, theta=0.5, cf_active=1.0):
    if key is None:
        key = jax.random.PRNGKey(2)
    return world_model_loss(
        wm, batch, key, jnp.float32(theta), jnp.float32(cf_active), cfg
    )


def test_bce_matches_reference_formula(key):
    logits = jax.random.normal(key, (100,))
    targets = jax.random.uniform(key, (100,))
    p = jax.nn.sigmoid(logits)
    expected = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    np.testing.assert_allclose(
        np.asarray(bce_from_logits(logits, targets)), np.asarray(expected),
        rtol=1e-4, atol=1e-5,
    )


def test_latent_state_loss_golden():
    t = jnp.ones((2, 4, 4, 3))
    p = jnp.zeros((2, 4, 4, 3))
    np.testing.assert_allclose(np.asarray(latent_state_loss(t, p)), [1.0, 1.0])


def test_decoder_pixel_loss_shape(key):
    logits = jax.random.normal(key, (5, 16, 16, 3))
    targets = jax.random.uniform(key, (5, 16, 16, 3))
    assert decoder_pixel_loss(logits, targets).shape == (5,)


def test_base_loss_finite_and_has_grads(setup):
    spec, wm, batch = setup
    cfg = LossConfig(horizon=T)
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: _loss(p, batch, cfg), has_aux=True
    )(wm)
    assert np.isfinite(float(loss))
    assert "reconstruction_loss" in metrics and "reward_loss" in metrics
    for name in ["encoder", "decoder", "transition", "reward_predictor"]:
        g = getattr(grads, name)
        total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
        assert total > 0, f"no gradient reached {name}"
    # the discriminator takes part in no loss (reference main.py:106-298)
    g_disc = sum(
        float(jnp.abs(l).sum()) for l in jax.tree.leaves(grads.discriminator)
    )
    assert g_disc == 0.0


def test_truncate_bptt_cuts_transition_gradients(setup):
    """With truncation, the encoder still gets gradient (from t=1 losses)
    but far less than full BPTT, because later steps stop at their own z."""
    spec, wm, batch = setup
    full_cfg = LossConfig(horizon=T, truncate_bptt=False)
    trunc_cfg = LossConfig(horizon=T, truncate_bptt=True)
    g_full = jax.grad(lambda p: _loss(p, batch, full_cfg)[0])(wm)
    g_trunc = jax.grad(lambda p: _loss(p, batch, trunc_cfg)[0])(wm)
    n_full = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g_full.transition))
    n_trunc = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g_trunc.transition))
    assert n_full > 0 and n_trunc > 0
    assert n_full != n_trunc


def test_latent_overshooting_branch(setup):
    spec, wm, batch = setup
    cfg = LossConfig(horizon=T, latent_overshooting=True)
    loss, metrics = _loss(wm, batch, cfg)
    assert np.isfinite(float(loss))
    assert "lo_loss" in metrics
    assert float(metrics["lo_loss"]) >= 0


def test_latent_td_branch(setup):
    spec, wm, batch = setup
    cfg = LossConfig(horizon=T, latent_td=True, td_steps=2)
    loss, metrics = _loss(wm, batch, cfg)
    assert np.isfinite(float(loss))
    assert "lo_loss" in metrics


def test_cf_disentanglement_branch(setup):
    spec, wm, batch = setup
    cfg = LossConfig(horizon=T, enable_cf_shuffle=True, counterfactual_horizon=2)
    loss, metrics = _loss(wm, batch, cfg)
    assert np.isfinite(float(loss))
    assert "cf_disentanglement_loss" in metrics
    # gated off on non-CF iterations
    loss_off, _ = _loss(wm, batch, cfg, cf_active=0.0)
    base, _ = _loss(wm, batch, LossConfig(horizon=T))
    np.testing.assert_allclose(float(loss_off), float(base), rtol=1e-5)


def test_cf_control_branch(setup):
    spec, wm, batch = setup
    cfg = LossConfig(horizon=T, enable_cf_control=True, counterfactual_horizon=2)
    loss, metrics = _loss(wm, batch, cfg)
    assert np.isfinite(float(loss))
    assert "cf_control_loss" in metrics


def test_swap_two_factors_swaps_and_maps(key):
    z = jnp.tile(
        jnp.arange(6, dtype=jnp.float32)[None, None, None, :], (4, 2, 2, 1)
    )
    z_swapped, unswapped = _swap_two_factors(key, z, 6)
    assert z_swapped.shape == z.shape
    assert unswapped.shape == (4, 6)
    for i in range(4):
        swapped_idx = np.where(np.asarray(unswapped[i]) == 0)[0]
        assert len(swapped_idx) in (1, 2)  # 1 when idx_a == idx_b
        # unswapped channels keep their values
        for c in range(6):
            if c not in swapped_idx:
                assert float(z_swapped[i, 0, 0, c]) == float(c)


def test_done_masking_zeroes_finished_trajectories(setup):
    """After a done, subsequent timesteps contribute no loss."""
    spec, wm, batch = setup
    obs, rewards, dones, actions = batch
    dones_all = jnp.ones_like(dones)  # everything done from t=1
    cfg = LossConfig(horizon=T)
    loss_masked, m = _loss(wm, (obs, rewards, dones_all, actions), cfg)
    assert float(m["reconstruction_loss"]) == 0.0
    assert float(m["reward_loss"]) == 0.0


def test_reward_coef_and_theta_scale_reward_term(setup):
    spec, wm, batch = setup
    m_lo = _loss(wm, batch, LossConfig(horizon=T, reward_coef=1e-3), theta=0.1)[1]
    m_hi = _loss(wm, batch, LossConfig(horizon=T, reward_coef=1e-3), theta=1.0)[1]
    # raw metric identical; only the weighting into total loss changes
    np.testing.assert_allclose(
        float(m_lo["reward_loss"]), float(m_hi["reward_loss"]), rtol=1e-4
    )


def test_l1_coefficients_move_the_loss(setup):
    """VERDICT r1 #3: nonzero --activation-l1-coef / --transition-l1-coef
    must actually change the objective (both were dead flags in round 1)."""
    spec, wm, batch = setup
    base, _ = _loss(wm, batch, LossConfig(horizon=T))
    act, _ = _loss(wm, batch, LossConfig(horizon=T, activation_l1_coef=0.5))
    trans, _ = _loss(wm, batch, LossConfig(horizon=T, transition_l1_coef=0.5))
    # latents are sigmoid/Bernoulli outputs, so the L1 terms are positive
    assert float(act) > float(base)
    assert float(trans) > float(base)


def test_l1_coefficients_reach_loss_config_from_config():
    """Config -> trainer.loss_config() forwarding (dead in round 1)."""
    from scmgan_tpu.config import Config
    from scmgan_tpu.train.trainer import loss_config

    cfg = Config(activation_l1_coef=0.25, transition_l1_coef=0.125,
                 deterministic_transition=True)
    lcfg = loss_config(cfg, horizon=5)
    assert lcfg.activation_l1_coef == 0.25
    assert lcfg.transition_l1_coef == 0.125
    assert lcfg.deterministic_transition is True
    # reference behavior: L1 disabled by default (main.py:199-213)
    default = loss_config(Config(), horizon=5)
    assert default.activation_l1_coef == 0.0
    assert default.transition_l1_coef == 0.0


def test_deterministic_transition_latents_are_continuous(setup):
    """The deterministic ablation axis keeps raw sigmoid latents at train
    time (no Bernoulli sampling, no threshold)."""
    from scmgan_tpu.models.world_model import transition

    spec, wm, batch = setup
    obs = batch[0]
    from scmgan_tpu.models import encode

    z = encode(wm.encoder, obs[:, :3])
    a = jax.nn.one_hot(batch[3][:, 1], spec.num_actions, dtype=obs.dtype)
    k = jax.random.PRNGKey(3)
    z_det = np.asarray(transition(wm.transition, z, a, k, train=True,
                                  deterministic=True))
    z_sto = np.asarray(transition(wm.transition, z, a, k, train=True))
    # stochastic/eval paths emit exact {0,1}; deterministic keeps interior
    assert np.all(np.isin(z_sto, [0.0, 1.0]))
    assert ((z_det > 0.0) & (z_det < 1.0)).any()
    # and the loss runs under the flag
    loss, _ = _loss(wm, batch, LossConfig(horizon=T,
                                          deterministic_transition=True))
    assert np.isfinite(float(loss))


def test_cf_both_losses_use_clean_z_orig(setup):
    """DIVERGENCES #18 golden case: with BOTH CF losses enabled, the
    CF-control rollout starts from the clean z_orig.  The reference's
    in-place swap aliases z_orig (main.py:247-253), which would make the
    control term differ; at counterfactual_horizon=1 the control term is a
    pure function of (z_final, z_orig), so it must be identical whether or
    not the shuffle loss also ran."""
    spec, wm, batch = setup
    both = LossConfig(horizon=T, enable_cf_shuffle=True,
                      enable_cf_control=True, counterfactual_horizon=1)
    only_ctrl = LossConfig(horizon=T, enable_cf_control=True,
                           counterfactual_horizon=1)
    key = jax.random.PRNGKey(7)
    _, m_both = _loss(wm, batch, both, key=key)
    _, m_ctrl = _loss(wm, batch, only_ctrl, key=key)
    np.testing.assert_allclose(
        np.asarray(m_both["cf_control_loss"]),
        np.asarray(m_ctrl["cf_control_loss"]), rtol=1e-6)


def test_scan_unroll_is_numerics_identical(setup):
    """`scan_unroll` only changes XLA's loop flattening — the loss (every
    objective enabled) must be bit-identical to the scan=1 program."""
    spec, wm, batch = setup
    kw = dict(horizon=T, latent_overshooting=True, enable_cf_shuffle=True,
              enable_cf_control=True)
    l1, m1 = _loss(wm, batch, LossConfig(scan_unroll=1, **kw))
    l2, m2 = _loss(wm, batch, LossConfig(scan_unroll=T, **kw))
    assert float(l1) == float(l2)
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k
