"""Evaluation visualizations: reconstruction videos, forward-simulation
videos, and the compositing helpers.

Content parity with the reference's visualize_reconstruction
(main.py:589-643) and visualize_forward_simulation /
simulate_trajectory_from_actions (main.py:698-775): ground truth next to
free-run predictions, per-pixel reward overlays (blue positive / red
negative), and the per-factor latent map grid.

TPU-native: the reference runs one encoder+transition chain per video frame
in a Python loop; here every frame's window is a *batch element*, so one
vmapped program computes all frames of a video at once, and the rollout
offsets are a tiny scan.  The host only composites numpy panels and
encodes video.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.analysis.video import Video, to_uint8, resize_nearest
from scmgan_tpu.models.world_model import (
    WorldModel,
    decode,
    encode,
    predict_reward,
    transition,
)


def format_reward_vector(reward) -> str:
    return " ".join("{:.2f}".format(float(r)) for r in np.asarray(reward).ravel())


def factor_grid(z: np.ndarray, pad: int = 2) -> np.ndarray:
    """(H, W, L) latent map -> tiled grayscale grid image (H', W')."""
    h, w, latent = z.shape
    cols = int(np.ceil(np.sqrt(latent)))
    rows = int(np.ceil(latent / cols))
    grid = np.zeros((rows * (h + pad), cols * (w + pad)), np.float32)
    for i in range(latent):
        r, c = divmod(i, cols)
        grid[r * (h + pad): r * (h + pad) + h,
             c * (w + pad): c * (w + pad) + w] = z[:, :, i]
    return grid


def reward_overlay(rgb: np.ndarray, reward_map: np.ndarray) -> np.ndarray:
    """Overlay positive reward in blue, negative in red, on an (H, W, 3)
    image (reference composite_rgb_reward_factor_image, main.py:663-678).
    reward_map: (h, w, R) signed."""
    h, w = rgb.shape[:2]
    signed = np.asarray(reward_map).sum(axis=-1)
    pos = np.clip(signed, 0, 1)
    neg = np.clip(-signed, 0, 1)
    up = resize_nearest(pos[:, :, None], (h, w))[:, :, 0]
    un = resize_nearest(neg[:, :, None], (h, w))[:, :, 0]
    out = rgb.astype(np.float32).copy()
    out[:, :, 2] = np.clip(out[:, :, 2] + up, 0, 1)
    out[:, :, 0] = np.clip(out[:, :, 0] + un, 0, 1)
    return out


def _hstack_panels(*panels, height: int = 256) -> np.ndarray:
    resized = []
    for p in panels:
        img = to_uint8(p)
        scale = height / img.shape[0]
        tw = max(1, int(img.shape[1] * scale))
        resized.append(resize_nearest(img, (height, tw)))
    return np.concatenate(resized, axis=1)


# --------------------------------------------------------------------------
# reconstruction videos (offsets {1, 3})
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_actions", "offset"))
def _reconstruction_rollout(params: WorldModel, obs, actions, num_actions: int,
                            offset: int):
    """All video frames at once: window t in [3, T-offset) becomes a batch
    element.  Returns (pred logits, reward vec, reward map) per window."""
    t_total = obs.shape[1]
    actions_oh = jax.nn.one_hot(actions, num_actions, dtype=obs.dtype)
    ts = jnp.arange(3, t_total - offset)

    def one_window(t):
        # encode frames t-2..t -> state t-1, advance with action t-1
        # (reference main.py:606-613), then `offset` more steps.
        frames = jax.lax.dynamic_slice_in_dim(obs[0], t - 2, 3, axis=0)[None]
        z = encode(params.encoder, frames)
        z = transition(params.transition, z, actions_oh[:1, t - 1], train=False)
        for i in range(offset):
            a = jax.lax.dynamic_slice_in_dim(actions_oh[0], t + i, 1, axis=0)
            z = transition(params.transition, z, a, train=False)
        logits = decode(params.decoder, z)
        r, rmap = predict_reward(params.reward_predictor, z, visualize=True)
        return logits[0], r[0], rmap[0], z[0]

    return jax.vmap(one_window)(ts)


def visualize_reconstruction(params: WorldModel, datasource, train_iter: int = 0,
                             timesteps: int = 45, offsets=(1, 3),
                             out_dir: str = ".", key: Optional[jax.Array] = None):
    """Prediction + reward videos for each offset (reference main.py:589-643;
    artifact names prediction_{offset:02d}_iter_{iter:06d} and
    reward_prediction_{offset:02d}_iter_{iter:06d})."""
    import os

    obs, rewards, dones, actions = datasource.collect(1, timesteps, key=key)
    num_actions = datasource.binary_input_channels
    written = []
    for offset in offsets:
        logits, rvecs, rmaps, zs = _reconstruction_rollout(
            params, obs, actions, num_actions, offset)
        preds = np.asarray(jax.nn.sigmoid(logits))
        obs_np = np.asarray(obs[0])
        vid_rgb = Video(os.path.join(
            out_dir, f"prediction_{offset:02d}_iter_{train_iter:06d}.mp4"),
            framerate=3)
        vid_reward = Video(os.path.join(
            out_dir, f"reward_prediction_{offset:02d}_iter_{train_iter:06d}.mp4"),
            framerate=3)
        for i in range(preds.shape[0]):
            t = 3 + i
            actual = obs_np[t + offset]
            vid_rgb.write_frame(_hstack_panels(actual, preds[i]))
            overlay = reward_overlay(preds[i], np.asarray(rmaps[i]))
            factors = factor_grid(np.asarray(zs[i]))
            vid_reward.write_frame(_hstack_panels(overlay, factors))
        written.append(vid_rgb.finish())
        written.append(vid_reward.finish())
    print(f"Finished generating forward-prediction videos: {written}")
    return written


# --------------------------------------------------------------------------
# planning visualization + raw trajectory video (reference main.py:403-444)
# --------------------------------------------------------------------------

def generate_trajectory_video(datasource, out_dir: str = ".",
                              filename: str = "example_trajectory.mp4",
                              timesteps: int = 60):
    """Raw datasource rollout video (reference generate_trajectory_video,
    main.py:403-411)."""
    import os

    obs, *_ = datasource.collect(1, timesteps)
    vid = Video(os.path.join(out_dir, filename), framerate=10)
    for frame in np.asarray(obs[0]):
        vid.write_frame(frame, resize_to=(256, 256))
    return vid.finish()


@partial(jax.jit, static_argnames=("num_actions", "rollout_depth"))
def _planning_rollout(params: WorldModel, z, actions, num_actions: int,
                      rollout_depth: int):
    """Beam of futures for the planning video: all rollouts advance in one
    batched scan (reference loops python-side, main.py:414-444)."""
    width = actions.shape[0]
    z_beam = jnp.broadcast_to(z, (width,) + z.shape[1:])

    def step(carry, a_t):
        z_beam, cum = carry
        a_oh = jax.nn.one_hot(a_t, num_actions, dtype=z_beam.dtype)
        z_beam = transition(params.transition, z_beam, a_oh, train=False)
        frames = jax.nn.sigmoid(decode(params.decoder, z_beam))
        r = predict_reward(params.reward_predictor, z_beam)
        cum = cum + r
        return (z_beam, cum), (frames, cum)

    num_rewards = params.reward_predictor["conv2"]["w"].shape[-1] // 3
    cum0 = jnp.zeros((width, num_rewards), jnp.float32)
    (_, cum), (frames, cums) = jax.lax.scan(
        step, (z_beam, cum0), jnp.swapaxes(actions, 0, 1))
    return frames, cums, cum


def generate_planning_visualization(params: WorldModel, z, num_actions: int,
                                    vid: Video, lookahead: int = 3,
                                    rollout_depth: int = 20,
                                    caption_title: str = "Neural Simulation",
                                    actions_list=None,
                                    key: Optional[jax.Array] = None):
    """Video of a beam of simulated futures with reward-masked frames
    (reference generate_planning_visualization, main.py:414-444):
    num_actions^lookahead rollouts; each frame dimmed when its rollout's
    cumulative reward dips below the mask threshold; frames then replayed
    in reverse."""
    rollout_width = num_actions ** lookahead
    if actions_list is not None:
        actions = jnp.tile(jnp.asarray(actions_list, jnp.int32)[None, :],
                           (rollout_width, 1))
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        actions = jax.random.randint(
            key, (rollout_width, rollout_depth), 0, num_actions)
    frames, cums, final_cum = _planning_rollout(
        params, z, actions, num_actions, rollout_depth)
    frames = np.asarray(frames)   # (T, width, H, W, C)
    cums = np.asarray(cums)       # (T, width, R)
    collected = []
    for t in range(frames.shape[0]):
        # mask: rewards[:,1]-rewards[:,0] heuristic of the reference
        # collapses to the summed signed reward when R < 2.
        r = cums[t]
        score = (r[:, 1] - r[:, 0]) if r.shape[1] >= 2 else r[:, 0]
        mask = np.clip(score + 1.0, 0.0, 1.0)[:, None, None, None]
        best = float(np.max(score))
        img = (frames[t] * mask).mean(axis=0)
        caption = f"{caption_title} t+{t} R={best:.2f}"
        vid.write_frame(img, resize_to=(512, 512), caption=caption)
        collected.append(img)
    for img in collected[::-1]:
        vid.write_frame(img, resize_to=(512, 512), caption=caption_title)
    final = np.asarray(final_cum)
    score = (final[:, 1] - final[:, 0]) if final.shape[1] >= 2 else final[:, 0]
    print("Simulation {} reward: {:.2f}".format(
        int(np.argmax(score)), float(np.max(score))))


# --------------------------------------------------------------------------
# forward simulation video
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("num_actions",))
def _simulation_rollout(params: WorldModel, obs, actions, num_actions: int):
    """Free-run from t=2 replaying the real action sequence
    (reference main.py:706-716, 726-767); returns per-step decoded frames,
    reward vectors, reward maps, and latent maps."""
    t_total = obs.shape[1]
    actions_oh = jax.nn.one_hot(actions, num_actions, dtype=obs.dtype)
    z = encode(params.encoder, obs[:, :3])
    z = transition(params.transition, z, actions_oh[:, 1], train=False)

    def step(z, t):
        logits = decode(params.decoder, z)
        r, rmap = predict_reward(params.reward_predictor, z, visualize=True)
        a = jax.lax.dynamic_index_in_dim(
            jnp.swapaxes(actions_oh, 0, 1), t, axis=0, keepdims=False)
        z_next = transition(params.transition, z, a, train=False)
        return z_next, (logits[0], r[0], rmap[0], z[0])

    ts = jnp.arange(2, t_total - 1)
    _, outs = jax.lax.scan(step, z, ts)
    return outs


def visualize_forward_simulation(params: WorldModel, datasource,
                                 train_iter: int = 0, timesteps: int = 60,
                                 out_dir: str = ".",
                                 key: Optional[jax.Array] = None):
    """simulation_ftr_iter_{iter:06d} video: ground truth | predicted with
    reward overlay | factor grid, plus true-vs-estimated cumulative reward
    (reference main.py:698-775)."""
    import os
    import time

    start = time.time()
    obs, rewards, dones, actions = datasource.collect(1, timesteps, key=key)
    logits, rvecs, rmaps, zs = _simulation_rollout(
        params, obs, actions, datasource.binary_input_channels)
    preds = np.asarray(jax.nn.sigmoid(logits))
    obs_np, rew_np = np.asarray(obs[0]), np.asarray(rewards[0])
    dones_np = np.asarray(dones[0])

    vid = Video(os.path.join(out_dir, f"simulation_ftr_iter_{train_iter:06d}.mp4"),
                framerate=3)
    est_cum = np.zeros(rvecs.shape[-1])
    true_cum = np.zeros(rew_np.shape[-1])
    for i in range(preds.shape[0]):
        t = 2 + i
        est_cum += np.asarray(rvecs[i])
        true_cum += rew_np[t]
        truth = obs_np[t]
        overlay = reward_overlay(preds[i], np.asarray(rmaps[i]))
        factors = factor_grid(np.asarray(zs[i]))
        vid.write_frame(_hstack_panels(truth, overlay, factors))
        if dones_np[t]:
            break
    path = vid.finish()
    print("True cumulative reward: {}".format(format_reward_vector(true_cum)))
    print("Estimated cumulative reward: {}".format(format_reward_vector(est_cum)))
    print("Finished trajectory simulation in {:.02f}s".format(time.time() - start))
    return path
