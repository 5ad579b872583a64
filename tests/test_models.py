"""Model-family tests: shapes, stochasticity, gradients, decoder factors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.models import (
    WorldModel,
    decode,
    discriminate,
    encode,
    init_world_model,
    predict_reward,
    transition,
)

LATENT = 16
B, H, W, C, A, R = 2, 64, 64, 3, 4, 2


@pytest.fixture(scope="module")
def wm():
    return init_world_model(jax.random.PRNGKey(0), LATENT, A, R, C, C)


@pytest.fixture(scope="module")
def frames():
    return jax.random.uniform(jax.random.PRNGKey(1), (B, 3, H, W, C))


def test_encoder_output_shape_and_range(wm, frames):
    z = encode(wm.encoder, frames)
    assert z.shape == (B, H, W, LATENT)
    assert float(z.min()) >= 0.0 and float(z.max()) <= 1.0  # sigmoid head


def test_transition_train_is_binary_sample(wm, frames, key):
    z = encode(wm.encoder, frames)
    a = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A)
    z2 = transition(wm.transition, z, a, key, train=True)
    assert z2.shape == z.shape
    vals = np.unique(np.asarray(z2))
    assert set(vals) <= {0.0, 1.0}


def test_transition_eval_is_deterministic_threshold(wm, frames):
    z = encode(wm.encoder, frames)
    a = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A)
    z2 = transition(wm.transition, z, a, train=False)
    z3 = transition(wm.transition, z, a, train=False)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(z3))
    assert set(np.unique(np.asarray(z2))) <= {0.0, 1.0}


def test_transition_return_all_exposes_activations(wm, frames, key):
    z = encode(wm.encoder, frames)
    a = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A)
    outs = transition(wm.transition, z, a, key, train=True, return_all=True)
    assert len(outs) == 6  # skip1, skip2, out3, out4, out5, z (models.py:117-118)
    assert outs[0].shape == (B, H, W, 128)
    assert outs[-1].shape == z.shape


def test_transition_gradient_flows_through_st_sampler(wm, frames, key):
    """Straight-through estimator: encoder receives gradient through the
    sampled binary latents."""
    a = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A)

    def loss(enc_params):
        z = encode(enc_params, frames)
        z2 = transition(wm.transition, z, a, key, train=True)
        return jnp.sum(z2)

    g = jax.grad(loss)(wm.encoder)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert total > 0


def test_decoder_shapes_and_factor_layers(wm, frames):
    z = encode(wm.encoder, frames)
    out = decode(wm.decoder, z)
    assert out.shape == (B, H, W, C)
    out2, layers = decode(wm.decoder, z, visualize=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)
    assert layers.shape == (LATENT, H, W, C)
    # factor layers sum to the composite (models.py:280-287)
    np.testing.assert_allclose(
        np.asarray(layers.sum(axis=0)), np.asarray(out[0]), rtol=1e-4, atol=1e-4
    )


def test_reward_predictor_shapes_and_bounds(wm, frames):
    z = encode(wm.encoder, frames)
    r = predict_reward(wm.reward_predictor, z)
    assert r.shape == (B, R)
    r2, rmap = predict_reward(wm.reward_predictor, z, visualize=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r2), rtol=1e-5)
    # signed per-pixel map in [-1, 1]; spatial dims follow the two VALID convs
    assert rmap.shape[0] == B and rmap.shape[-1] == R
    assert float(rmap.min()) >= -1.0 and float(rmap.max()) <= 1.0
    np.testing.assert_allclose(
        np.asarray(rmap.sum(axis=(1, 2))), np.asarray(r), rtol=1e-4, atol=1e-4
    )


def test_discriminator_scalar_output(wm, key):
    x = jax.random.uniform(key, (B, 64, 64, 3))
    d = discriminate(wm.discriminator, x)
    assert d.shape == (B, 1)


def test_worldmodel_is_five_component_bundle(wm):
    assert set(wm._fields) == {
        "encoder", "decoder", "transition", "reward_predictor", "discriminator"
    }


def test_models_work_at_gridworld_resolution(key):
    wm16 = init_world_model(key, LATENT, 4, 1, 3, 3, img_size=16)
    frames = jax.random.uniform(key, (B, 3, 16, 16, 3))
    z = encode(wm16.encoder, frames)
    assert z.shape == (B, 16, 16, LATENT)
    a = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 4)
    z2 = transition(wm16.transition, z, a, key, train=True)
    assert z2.shape == z.shape
    assert decode(wm16.decoder, z2).shape == (B, 16, 16, 3)
    assert predict_reward(wm16.reward_predictor, z2).shape == (B, 1)
