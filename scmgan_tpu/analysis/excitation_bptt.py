"""Excitation-BPTT "causal backtrack" visualization.

Protocol parity with the reference (reference excitation_bptt.py:6-53):
roll the transition forward (action 1 once, then action 3) until a step
whose expected |reward| exceeds a threshold; backprop the *localized*
reward (the single largest-|value| cell of the reward map) through the
latent rollout; use each step's |dL/dz| as a mask over the latents and
decode the masked latents into a reversed "what caused this reward" video.

TPU-native: the reference accumulates ``retain_grad`` tensors in a Python
list and calls ``backward``; here the whole rollout is differentiated with
one ``jax.grad`` over an unrolled latent chain — per-step gradients fall
out of the same VJP.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.analysis.video import Video
from scmgan_tpu.models.world_model import (
    WorldModel,
    decode,
    predict_reward,
    transition,
)


def visualize_bptt(params: WorldModel, z0, num_actions: int,
                   steps: int = 30, reward_threshold: float = 0.8,
                   out_dir: str = ".", filename: Optional[str] = None,
                   seed: int = 0, policy: str = "reference"):
    """z0: (1, H, W, L) initial latent.  Returns the video path (or None if
    no step's reward ever crossed the threshold).

    ``policy``: "reference" replays the reference's fixed roll (action 1
    at t=0 then action 3 forever, excitation_bptt.py:14); "random" draws
    a deterministic per-step random action instead — an extension for
    envs (e.g. pong) where the fixed hold-still roll never reaches a
    predicted scoring event at any horizon, so the reference protocol
    cannot produce an artifact at all.

    Gradient note: the reference's eval-mode transition discretizes with a
    hard (x > 0.5) threshold whose gradient is zero, so a naive backprop
    yields empty masks.  The rollout here uses train-mode straight-through
    Bernoulli sampling with *fixed per-step keys* — deterministic replay
    with a usable gradient path (the ST estimator's raison d'etre,
    models.py:30-40).
    """
    base_key = jax.random.PRNGKey(seed)
    action_key = jax.random.PRNGKey(seed ^ 0x5EED)

    def step_key(t):
        return jax.random.fold_in(base_key, t)

    def action_at(t):
        if policy == "random":
            a = jax.random.randint(jax.random.fold_in(action_key, t),
                                   (), 0, num_actions)
        else:
            # reference policy: action 1 at t=0, then action 3
            # (excitation_bptt.py:14)
            a = jnp.where(t == 0, 1, 3) % num_actions
        return jax.nn.one_hot(a, num_actions, dtype=z0.dtype)[None]

    # Forward roll (eval mode), recording per-step latents and rewards.
    zs, rewards, rmaps = [], [], []
    z = z0
    for t in range(steps):
        z = transition(params.transition, z, action_at(t), step_key(t),
                       train=True)
        r, rmap = predict_reward(params.reward_predictor, z, visualize=True)
        zs.append(z)
        rewards.append(r)
        rmaps.append(rmap)
        if abs(float(jnp.sum(r))) > reward_threshold:
            break
    else:
        print("No large expected reward found; skipping excitation BPTT")
        return None

    t_hit = len(zs) - 1
    print("Expected reward of {:.2f} at time t+{}".format(
        float(jnp.sum(rewards[t_hit])), t_hit))

    # Localized reward: only the largest-|value| cell of the reward map
    # (excitation_bptt.py:35).
    def chain_from(z_t, t_start):
        z = z_t
        for t in range(t_start, t_hit + 1):
            z = transition(params.transition, z, action_at(t), step_key(t),
                           train=True)
        _, rmap = predict_reward(params.reward_predictor, z, visualize=True)
        mask = jax.lax.stop_gradient(
            (jnp.abs(rmap) == jnp.max(jnp.abs(rmap))).astype(rmap.dtype))
        return jnp.sum(rmap * mask)

    grads = [jax.grad(chain_from)(zs[t], t + 1) for t in range(t_hit + 1)]

    if filename is None:
        filename = f"excitation_bptt_{int(time.time())}.mp4"
    vid = Video(os.path.join(out_dir, filename), framerate=10)
    # forward frames
    for t in range(t_hit + 1):
        frame = jax.nn.sigmoid(decode(params.decoder, zs[t]))[0]
        vid.write_frame(np.asarray(frame), resize_to=(512, 512))
    # causal backtrack: reversed masked decodes (excitation_bptt.py:46-52)
    r_total = float(jnp.sum(rewards[t_hit]))
    for t in range(t_hit, -1, -1):
        g = grads[t]
        mask = jnp.abs(g) / (1e-3 + jnp.max(jnp.abs(g)))
        img = decode(params.decoder, zs[t] * mask)[0]
        img = jnp.sum(img, axis=-1)
        for _ in range(4):
            vid.write_frame(np.asarray(jnp.clip(img, 0, 1)),
                            resize_to=(512, 512),
                            caption=f"Causal Backtrack, R={r_total:.2f}")
    return vid.finish()
