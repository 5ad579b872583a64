"""Live MPC episode: play an environment with the learned model
(reference play(), main.py:327-400).

Flow parity: 3 no-op frames seed the encoder (the reference uses action
index 3 as its "no_op", main.py:335-346 — replicated), then each step plans
with the one-compiled-program beam (agent.mpc), acts in the real
environment, splits positive/negative reward, re-encodes from the rolling
3-frame window, and finally writes the episode video and an
``evaluation_metrics_<timestamp>.txt`` score file consumed by the metric
scripts (main.py:397-399; scripts/print_metrics_minipacman.sh:18-19).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.agent.mpc import rollout_reward_table
from scmgan_tpu.analysis.video import Video
from scmgan_tpu.models.world_model import WorldModel, encode, transition


def play(params: WorldModel, datasource, max_steps: int = 300,
         rollout_depth: int = 12, lookahead: int = 2,
         negative_positive_tradeoff: float = 10.0, out_dir: str = ".",
         verbose: bool = True, seed: Optional[int] = None,
         use_int8: bool = False, rollout_samples: int = 1,
         rollout_policy: str = "noop", stall_patience: int = 10,
         env=None, write_video: bool = True):
    """Returns (cumulative_reward, steps).  Writes video + metrics file.

    ``rollout_policy``: tail policy for the planning beam — the
    reference's "noop"/"random" (main.py:467-471) plus our compiled
    1-step-"greedy" tail (agent/mpc.py).

    ``stall_patience``: anti-stall countermeasure (0 disables).  The
    deterministic beam has a failure mode where the model hallucinates
    future reward for an action that doesn't change the real state, and
    the argmax replays it forever (observed on gridworld: 3/10 episodes
    scored 0 stuck at a wall).  If the feature frame is bit-identical
    for ``stall_patience`` consecutive real steps, one uniformly random
    different action is taken to break the fixed point; planning resumes
    from the new state.  The reference has the same trap and no
    countermeasure.
    """
    num_actions = datasource.binary_input_channels
    # ``env`` override: a pre-seeded HostEnv (parity tests pin the device
    # play loop against this one by sharing the env PRNG chain)
    env = env if env is not None else datasource.make_env(screen_size=512)
    no_op = 3 % num_actions  # reference literally uses 3 (main.py:335)

    obs = env.reset()
    s_0, _ = datasource.convert_frame(obs)
    obs, _, done, _ = env.step(no_op)
    s_1, _ = datasource.convert_frame(obs)
    obs, _, done, _ = env.step(no_op)
    s_2, _ = datasource.convert_frame(obs)
    state_list = [np.asarray(s_0), np.asarray(s_1), np.asarray(s_2)]

    def encode_window(frames):
        stacked = jnp.asarray(np.stack(frames))[None]  # (1, 3, H, W, C)
        return encode(params.encoder, stacked)

    onehot = lambda a: jax.nn.one_hot(jnp.int32(a), num_actions)[None]
    z = encode_window(state_list)
    z = transition(params.transition, z, onehot(no_op), train=False)

    # int8 planning: calibrated per-channel quantization, whole beam.
    # Measured on trained pong (scripts/mpc_fidelity.py, clean chip):
    # 58.7 ms/plan vs exact 156.6 (2.7x) at 0.48 mean relative regret;
    # the exact-head hybrid chose better (0.33) but measured *slower*
    # than exact planning (170 ms) - quantize/dequantize switching in the
    # enumerated head costs more than it saves, so the speed knob is the
    # whole-beam calibrated path and the hybrid stays API-only.
    qt = None
    if use_int8:
        from scmgan_tpu.agent.mpc import calibrated_qt

        qt = calibrated_qt(params, z, num_actions,
                           key=jax.random.PRNGKey(seed or 0))

    ts = int(time.time())
    vid = (Video(os.path.join(out_dir, f"SimpleRolloutAgent-{ts}.mp4"),
                 framerate=10) if write_video else None)
    cumulative_reward = 0.0
    cumulative_positive = 0.0
    cumulative_negative = 0.0
    t = 2
    done = False
    plan_key = jax.random.PRNGKey(seed if seed is not None else int(time.time()))
    stall_rng = np.random.default_rng(seed if seed is not None else 0)
    stalled = 0
    prev_frame = np.asarray(state_list[-1])
    needs_key = rollout_samples > 1 or rollout_policy == "random"
    while not done:
        scores = rollout_reward_table(
            params, z, num_actions, lookahead, rollout_depth, rollout_policy,
            negative_positive_tradeoff, use_int8=use_int8, qt=qt,
            key=jax.random.fold_in(plan_key, t) if needs_key else None,
            rollout_samples=rollout_samples)
        max_a = int(jnp.argmax(scores))
        if stall_patience and stalled >= stall_patience:
            others = [a for a in range(num_actions) if a != max_a]
            max_a = int(stall_rng.choice(others)) if others else max_a
            stalled = 0
            if verbose:
                print(f"t={t} stall break: random action {max_a}")

        obs, reward, done, info = env.step(max_a)
        rewards_info = [v for v in info.values()] if len(info) > 1 else []
        if rewards_info:
            positive = sum(v for v in rewards_info if v > 0)
            negative = sum(v for v in rewards_info if v < 0)
        else:
            positive = max(0.0, reward)
            negative = min(0.0, reward)
        cumulative_positive += positive
        cumulative_negative -= negative
        cumulative_reward += reward

        ftr_state, rgb_state = datasource.convert_frame(obs)
        caption = "Negative Reward: {}    Positive Reward: {}".format(
            int(cumulative_negative), int(cumulative_positive))
        if verbose:
            score_strs = " ".join(f"{float(s):.02f}" for s in np.asarray(scores))
            print(f"t={t} curr. r={cumulative_reward:.02f} future r: {score_strs}")
        if vid is not None:
            vid.write_frame(rgb_state, resize_to=(512, 512), caption=caption)

        ftr_np = np.asarray(ftr_state)
        stalled = stalled + 1 if np.array_equal(ftr_np, prev_frame) else 0
        prev_frame = ftr_np
        state_list = state_list[1:] + [ftr_np]
        z = encode_window(state_list)
        z = transition(params.transition, z, onehot(max_a), train=False)
        t += 1
        if t > max_steps:
            print("Ending evaluation due to time limit")
            break
    if vid is not None:
        vid.finish()
    msg = f"Finished at t={t} with cumulative reward {cumulative_reward}"
    with open(os.path.join(out_dir, f"evaluation_metrics_{int(time.time())}.txt"),
              "w") as fp:
        fp.write(msg + "\n")
    print(msg)
    return cumulative_reward, t
