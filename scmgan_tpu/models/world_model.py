"""The world model: Encoder, Transition, Decoder, RewardPredictor,
Discriminator — functional, NHWC, spectral-norm state explicit.

Architecture parity with the reference (reference models.py):
  * Encoder       — 3 stacked frames flattened on channels, 4 same-size 3x3
                    convs (first three spectral-normalized), sigmoid -> a
                    *spatial* latent map (B, H, W, latent).  models.py:123-157.
                    (The reference constructs a BatchNorm it never calls,
                    models.py:130,139-157 — we replicate the behavior, i.e.
                    no BN.)
  * Transition    — latent map + action one-hot broadcast to every pixel,
                    6-layer U-Net-ish conv stack with skips (1->6, 2->5),
                    circular padding, SN on conv1-5, sigmoid, then
                    straight-through Bernoulli (train) / >0.5 (eval).
                    models.py:43-119.
  * Decoder       — two stride-1 transposed convs; output reshaped to
                    (..., latent, color) and summed over the latent axis so
                    each latent factor decodes an additive image layer;
                    returns logits.  models.py:253-291.
  * RewardPredictor — 2 valid convs -> per-pixel 3-way (+1/0/-1) softmax per
                    reward channel, signed map summed over pixels.
                    models.py:226-250.
  * Discriminator — 3 strided convs + linear over NOISE_DIM-channel noise
                    maps; constructed/checkpointed but never trained by the
                    reference main loop (main.py:76,89,140) — included for
                    checkpoint-layout parity.  models.py:195-223.

All forwards are pure; stochastic sampling takes an explicit PRNG key.
Layout is NHWC: channels (128 wide in the trunk) ride the TPU lane
dimension, so every conv maps straight onto the MXU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scmgan_tpu.ops.conv import (
    conv2d,
    conv2d_init,
    conv_transpose2d,
    conv_transpose2d_init,
    leaky_relu,
    linear,
    linear_init,
)
from scmgan_tpu.ops.spectral_norm import sn_init, sn_weight
from scmgan_tpu.ops.stochastic import hard_threshold, st_bernoulli

NOISE_DIM = 3
ENCODER_INPUT_FRAMES = 3


class WorldModel(NamedTuple):
    """Bundle of the five networks' param trees (the reference checkpoints
    exactly these five components, main.py:136-141)."""

    encoder: dict
    decoder: dict
    transition: dict
    reward_predictor: dict
    discriminator: dict


def _sn_conv_init(key, in_ch, out_ch, ksize=3, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    p = conv2d_init(k1, in_ch, out_ch, ksize, dtype)
    p["sn"] = sn_init(k2, p["w"])
    return p


def _sn_conv(params, x, **kw):
    return conv2d(params, x, w=sn_weight(params), **kw)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def init_encoder(key, latent_dim: int, color_channels: int, hidden: int = 128,
                 dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    in_ch = color_channels * ENCODER_INPUT_FRAMES
    return {
        "conv1": _sn_conv_init(ks[0], in_ch, hidden, 3, dtype),
        "conv2": _sn_conv_init(ks[1], hidden, hidden, 3, dtype),
        "conv3": _sn_conv_init(ks[2], hidden, hidden, 3, dtype),
        "conv4": conv2d_init(ks[3], hidden, latent_dim, 3, dtype),
    }


def encode(params: dict, frames: jax.Array) -> jax.Array:
    """frames: (B, F=3, H, W, C) -> latent map (B, H, W, latent).

    Frame stacking flattens frames onto channels frame-major, matching the
    reference's (B, F*C, H, W) view (models.py:142-143).
    """
    b, f, h, w, c = frames.shape
    x = jnp.transpose(frames, (0, 2, 3, 1, 4)).reshape(b, h, w, f * c)
    x = leaky_relu(_sn_conv(params["conv1"], x))
    x = leaky_relu(_sn_conv(params["conv2"], x))
    x = leaky_relu(_sn_conv(params["conv3"], x))
    x = conv2d(params["conv4"], x)
    return jax.nn.sigmoid(x)


def decode_fused(params: dict, z: jax.Array) -> jax.Array:
    """`decode` with the per-factor sum folded into conv2's weights.

    The additive decoding (models.py:279-287) ends in a sum over the latent
    axis of conv2's (latent*color)-channel output; since the conv is linear
    in its weights, summing the kernel's output channels over latent groups
    first is exact and cuts conv2's FLOPs by `latent`x — the serving-path
    decoder (used by bench.py free-runs and MPC video rollouts, where the
    per-factor layers aren't needed).
    """
    latent_dim = z.shape[-1]
    color = params["conv2"]["w"].shape[-1] // latent_dim
    w2 = params["conv2"]["w"]
    kh, kw, cin, _ = w2.shape
    w2s = jnp.sum(w2.reshape(kh, kw, cin, latent_dim, color), axis=3)
    b2s = jnp.sum(params["conv2"]["b"].reshape(latent_dim, color), axis=0)
    x = leaky_relu(conv_transpose2d(params["conv1"], z))
    return conv_transpose2d({"w": w2s, "b": b2s}, x)


# --------------------------------------------------------------------------
# Transition
# --------------------------------------------------------------------------

def init_transition(key, latent_dim: int, num_actions: int, hidden: int = 128,
                    dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "conv1": _sn_conv_init(ks[0], latent_dim + num_actions, hidden, 3, dtype),
        "conv2": _sn_conv_init(ks[1], hidden, hidden, 3, dtype),
        "conv3": _sn_conv_init(ks[2], hidden, hidden, 3, dtype),
        "conv4": _sn_conv_init(ks[3], hidden, hidden, 3, dtype),
        "conv5": _sn_conv_init(ks[4], hidden + hidden, hidden, 3, dtype),
        "conv6": conv2d_init(ks[5], hidden + hidden, latent_dim, 3, dtype),
    }


def transition(
    params: dict,
    z: jax.Array,
    action_onehot: jax.Array,
    key: Optional[jax.Array] = None,
    *,
    train: bool = True,
    return_all: bool = False,
    deterministic: bool = False,
):
    """One latent dynamics step.

    z: (B, H, W, latent); action_onehot: (B, A) broadcast to every pixel
    (reference models.py:69-73).  When ``train`` and a key is given the
    sigmoid output is straight-through-Bernoulli sampled; otherwise hard
    thresholded at 0.5 (models.py:107-113).  ``deterministic`` keeps the
    raw sigmoid probabilities at train time (no sampling) — the
    deterministic-model ablation axis
    (reference scripts/generate_mse_plot_deterministic.py:41-67).

    This is the single hottest function — called O(horizon) times per train
    step and O(A^(lookahead+1) * depth) times per MPC step (SURVEY §3.4).
    The whole body is elementwise + six 3x3 convs; under jit XLA fuses the
    pad/concat/leaky-relu chains into the convs.
    """
    b, h, w, _ = z.shape
    a_map = jnp.broadcast_to(
        action_onehot[:, None, None, :].astype(z.dtype),
        (b, h, w, action_onehot.shape[-1]),
    )
    x = jnp.concatenate([z, a_map], axis=-1)

    x = leaky_relu(_sn_conv(params["conv1"], x, circular=True))
    skip1 = x
    x = leaky_relu(_sn_conv(params["conv2"], x, circular=True))
    skip2 = x
    x = leaky_relu(_sn_conv(params["conv3"], x, circular=True))
    out3 = x
    x = leaky_relu(_sn_conv(params["conv4"], x, circular=True))
    out4 = x
    x = jnp.concatenate([x, skip2], axis=-1)
    x = leaky_relu(_sn_conv(params["conv5"], x, circular=True))
    out5 = x
    x = jnp.concatenate([x, skip1], axis=-1)
    x = conv2d(params["conv6"], x, circular=True)
    x = jax.nn.sigmoid(x)

    if train and deterministic:
        pass  # deterministic sigmoid latents
    elif train and key is not None:
        x = st_bernoulli(key, x)
    else:
        x = hard_threshold(x)

    if return_all:
        return skip1, skip2, out3, out4, out5, x
    return x


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def init_decoder(key, latent_dim: int, color_channels: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv_transpose2d_init(k1, latent_dim, latent_dim * 4, 3, dtype),
        "conv2": conv_transpose2d_init(
            k2, latent_dim * 4, latent_dim * color_channels, 3, dtype
        ),
    }


def decode(params: dict, z: jax.Array, visualize: bool = False):
    """z: (B, H, W, latent) -> pixel logits (B, H, W, color).

    Per-factor additive decoding: conv to latent*color channels, reshape to
    (..., latent, color), sum over the latent axis (reference
    models.py:279-287).  ``visualize`` additionally returns the first
    sample's per-factor layers (latent, H, W, color) (models.py:284-290).
    """
    latent_dim = z.shape[-1]
    color = params["conv2"]["w"].shape[-1] // latent_dim
    x = leaky_relu(conv_transpose2d(params["conv1"], z))
    x = conv_transpose2d(params["conv2"], x)
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, latent_dim, color)
    out = jnp.sum(x, axis=3)
    if visualize:
        layers = jnp.transpose(x[0], (2, 0, 1, 3))  # (latent, H, W, color)
        return out, layers
    return out


# --------------------------------------------------------------------------
# RewardPredictor
# --------------------------------------------------------------------------

def init_reward_predictor(key, latent_dim: int, num_rewards: int,
                          dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv2d_init(k1, latent_dim, 32, 3, dtype),
        "conv2": conv2d_init(k2, 32, num_rewards * 3, 3, dtype),
    }


def predict_reward(params: dict, z: jax.Array, visualize: bool = False):
    """z: (B, H, W, latent) -> reward vector (B, num_rewards).

    Each pixel is classified 3 ways (+1 / 0 / -1) per reward channel; the
    signed map (p[+1] - p[-1]) is summed over pixels (reference
    models.py:235-250).  Conv1 is VALID, conv2 is VALID stride 2, matching
    the reference's padding=0 convs.
    """
    num_rewards = params["conv2"]["w"].shape[-1] // 3
    x = leaky_relu(conv2d(params["conv1"], z, padding="VALID"))
    x = conv2d(params["conv2"], x, stride=2, padding="VALID")
    b, h, w, _ = x.shape
    # channel dim splits 3-major: (3, num_rewards), reference models.py:243.
    x = x.reshape(b, h, w, 3, num_rewards)
    x = jax.nn.softmax(x, axis=3)
    signed = x[:, :, :, 0, :] - x[:, :, :, 2, :]
    total = jnp.sum(signed, axis=(1, 2))
    if visualize:
        return total, signed  # signed: (B, h, w, num_rewards) spatial map
    return total


# --------------------------------------------------------------------------
# Discriminator
# --------------------------------------------------------------------------

def init_discriminator(key, img_size=64, dtype=jnp.float32) -> dict:
    """``img_size``: int (square) or (height, width) — centipede frames are
    96x64, so fc1 must be sized from both spatial dims."""
    ks = jax.random.split(key, 4)
    h, w = (img_size, img_size) if isinstance(img_size, int) else img_size
    # Spatial sizes after three stride-2 VALID 3x3 convs from 64: 31, 15, 7.
    for _ in range(3):
        h = (h - 3) // 2 + 1
        w = (w - 3) // 2 + 1
    return {
        "conv1": _sn_conv_init(ks[0], NOISE_DIM, 32, 3, dtype),
        "conv2": _sn_conv_init(ks[1], 32, 32, 3, dtype),
        "conv3": conv2d_init(ks[2], 32, 32, 3, dtype),
        "fc1": linear_init(ks[3], 32 * h * w, 1, dtype),
    }


def discriminate(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, H, W, NOISE_DIM) noise map -> (B, 1) scalar logit
    (reference models.py:208-223)."""
    x = leaky_relu(_sn_conv(params["conv1"], x, stride=2, padding="VALID"))
    x = leaky_relu(_sn_conv(params["conv2"], x, stride=2, padding="VALID"))
    x = leaky_relu(conv2d(params["conv3"], x, stride=2, padding="VALID"))
    x = x.reshape(x.shape[0], -1)
    return leaky_relu(linear(params["fc1"], x))


# --------------------------------------------------------------------------
# Bundle
# --------------------------------------------------------------------------

def init_world_model(
    key: jax.Array,
    latent_dim: int,
    num_actions: int,
    num_rewards: int,
    input_channels: int,
    output_channels: int,
    hidden: int = 128,
    img_size=64,  # int (square) or (height, width)
    dtype=jnp.float32,
) -> WorldModel:
    ks = jax.random.split(key, 5)
    return WorldModel(
        encoder=init_encoder(ks[0], latent_dim, input_channels, hidden, dtype),
        decoder=init_decoder(ks[1], latent_dim, output_channels, dtype),
        transition=init_transition(ks[2], latent_dim, num_actions, hidden, dtype),
        reward_predictor=init_reward_predictor(ks[3], latent_dim, num_rewards, dtype),
        discriminator=init_discriminator(ks[4], img_size, dtype),
    )
