"""Whole-episode MPC evaluation as ONE compiled program.

The host play loop (agent/play.py, reference main.py:327-400) makes
4-6 device calls per environment step; under a remote-attached TPU each
call pays tunnel latency, so a 300-step episode costs minutes of
wall-clock while the chip sits idle.  For the pure-JAX environment zoo
nothing in the episode needs the host: this module compiles the ENTIRE
protocol — reset, 3 no-op seed frames, per-step planning beam
(agent/mpc.rollout_reward_table), real-env step, pos/neg reward split,
rolling 3-frame re-encode, anti-stall kick, 300-step cap — into a single
``vmap(scan(step))`` program over all episodes at once.  An episode
sweep that took ~80 minutes host-side executes in seconds of device
time.

Protocol parity with agent/play.py is exact by construction:
  * the same PRNG chain as HostEnv (PRNGKey(seed), one split per
    reset/step — envs/base.py:165-191) drives reset and env stepping, so
    for a deterministic-dynamics env an episode's trajectory is
    IDENTICAL to the host loop's for the same seed (pinned by
    tests/test_play_device.py);
  * rewards during the two no-op seed steps are discarded, accumulation
    is masked after done, and the cap matches the host loop's
    ``t > max_steps`` break (t runs 2..max_steps inclusive);
  * score files use the reference's format (main.py:397-399).

Divergences (documented): the anti-stall random kick draws from
jax.random instead of the host loop's numpy generator (same
uniform-over-other-actions distribution), and episodes that end early
still execute masked steps on device (results unaffected).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.agent.mpc import rollout_reward_table
from scmgan_tpu.envs.base import EnvSpec
from scmgan_tpu.models.world_model import WorldModel, encode, transition


@partial(jax.jit, static_argnames=(
    "spec", "num_actions", "max_steps", "lookahead", "rollout_depth",
    "rollout_policy", "negative_positive_tradeoff", "rollout_samples",
    "stall_patience"))
def _play_episodes(
    params: WorldModel,
    seeds: jax.Array,
    spec: EnvSpec,
    num_actions: int,
    max_steps: int,
    lookahead: int,
    rollout_depth: int,
    rollout_policy: str,
    negative_positive_tradeoff: float,
    rollout_samples: int,
    stall_patience: int,
):
    """(cum_reward, cum_pos, cum_neg, steps) per episode — all episodes
    in one program."""
    needs_key = rollout_samples > 1 or rollout_policy == "random"
    no_op = 3 % num_actions
    no_op_oh = jax.nn.one_hot(jnp.int32(no_op), num_actions)[None]

    def one_episode(seed):
        env_key = jax.random.PRNGKey(seed)
        plan_key = jax.random.PRNGKey(seed)
        stall_key = jax.random.PRNGKey(seed + 977_351)

        # HostEnv key chain: one split per reset/step (envs/base.py:173-175)
        env_key, sub = jax.random.split(env_key)
        state = spec.reset(sub)
        s0 = spec.render(state)
        env_key, sub = jax.random.split(env_key)
        state, _, _ = spec.step(state, jnp.int32(no_op), sub)
        s1 = spec.render(state)
        env_key, sub = jax.random.split(env_key)
        state, _, _ = spec.step(state, jnp.int32(no_op), sub)
        s2 = spec.render(state)
        window = jnp.stack([s0, s1, s2])                 # (3, H, W, C)

        z = encode(params.encoder, window[None])
        z = transition(params.transition, z, no_op_oh, train=False)

        def body(carry, t):
            state, env_key, window, z, cum, pos, neg, alive, stalled = carry
            scores = rollout_reward_table(
                params, z, num_actions, lookahead, rollout_depth,
                rollout_policy, negative_positive_tradeoff,
                key=(jax.random.fold_in(plan_key, t) if needs_key
                     else None),
                rollout_samples=rollout_samples)
            max_a = jnp.argmax(scores).astype(jnp.int32)
            if stall_patience:
                kick = stalled >= stall_patience
                r = jax.random.randint(jax.random.fold_in(stall_key, t),
                                       (), 0, num_actions - 1)
                rand_a = (r + (r >= max_a)).astype(jnp.int32)
                max_a = jnp.where(kick, rand_a, max_a)
                stalled = jnp.where(kick, 0, stalled)

            env_key, sub = jax.random.split(env_key)
            state, reward_vec, done = spec.step(state, max_a, sub)
            rv = reward_vec.astype(jnp.float32)
            cum = cum + jnp.sum(rv) * alive
            pos = pos + jnp.sum(jnp.maximum(rv, 0.0)) * alive
            neg = neg - jnp.sum(jnp.minimum(rv, 0.0)) * alive

            frame = spec.render(state)
            same = jnp.all(frame == window[-1])
            stalled = jnp.where(same, stalled + 1, 0)
            window = jnp.concatenate([window[1:], frame[None]], axis=0)
            z = encode(params.encoder, window[None])
            z = transition(params.transition, z,
                           jax.nn.one_hot(max_a, num_actions)[None],
                           train=False)
            steps_inc = alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (state, env_key, window, z, cum, pos, neg, alive,
                    stalled), steps_inc

        carry0 = (state, env_key, window, z, jnp.float32(0.0),
                  jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0),
                  jnp.int32(0))
        ts = jnp.arange(2, max_steps + 1)
        (_, _, _, _, cum, pos, neg, _, _), incs = jax.lax.scan(
            body, carry0, ts)
        # host loop: t starts at 2 and increments once per executed step
        return cum, pos, neg, jnp.int32(2 + jnp.sum(incs))

    return jax.vmap(one_episode)(seeds)


# Measured worker-fault boundary (scripts/repro_play64_crash.py, round
# 5, two passes; matrix in docs/play64_crash_matrix.json): on 64x64
# envs, episode-batched beam programs kill the remote TPU worker ("TPU
# worker process crashed or restarted" — a worker-side fault, not a
# Python error) as a function of lanes x beam steps, NOT lanes alone:
#
#   lanes x (lookahead+1+depth)  |  outcome   (lanes = eps x A^(la+1))
#   960 / 1472 / 1920 / 2112 /   |  pass  (incl. 64 lanes at depth 30
#   2880                         |         and 192 lanes at depth 12)
#   2944 / 4800 / 5120 / 9600    |  crash (incl. 128 lanes at depth 20
#                                |         and 256 lanes at depth 16)
#
# Independent of scan length (25 vs 300 env steps).  The 2880 edge
# config is FLAKY — it passed once in the bisect matrix, then an
# identical 192-lane depth-12 sweep arm crashed the worker — so the
# budget backs off to the next-lower measured configuration
# (64 lanes x depth 30 = 2112 lane-steps), normalized by latent
# pixels.  128-lane depth-12 programs (1920) have passed repeatedly.
_LANE_STEP_PIXEL_BUDGET = 2112 * 64 * 64


def _episode_chunk(spec, num_actions: int, lookahead: int, depth: int,
                   rollout_policy: str, rollout_samples: int) -> int:
    """Max episodes per compiled program under the lane-step budget."""
    import os as _os

    budget = int(_os.environ.get("SCMGAN_PLAY_LANE_BUDGET",
                                 _LANE_STEP_PIXEL_BUDGET))
    width = num_actions ** (lookahead + 1)
    if rollout_policy == "greedy":
        width *= num_actions          # the greedy tail's A-wide transient
    width *= max(rollout_samples, 1)
    per_episode = (width * (lookahead + 1 + depth)
                   * spec.height * spec.width)
    return max(1, budget // per_episode)


def fits_on_device(spec, num_actions: int, lookahead: int = 2,
                   rollout_depth: int = 12, rollout_policy: str = "noop",
                   rollout_samples: int = 1, **_ignored) -> bool:
    """True if even a SINGLE episode's beam fits the lane-step budget —
    callers should fall back to the host play loop otherwise (a
    too-large single-episode program kills the remote worker; the
    chunker can only clamp to 1)."""
    import os as _os

    budget = int(_os.environ.get("SCMGAN_PLAY_LANE_BUDGET",
                                 _LANE_STEP_PIXEL_BUDGET))
    # The greedy tail's A-wide transient counts PARTIALLY against the
    # worker limit (measured round 5: 1-episode greedy pong passes at
    # depth 12 — carried 960 lane-steps, transient-weighted 3840 — but
    # crashes at depth 20), so the conservative full xA multiplier
    # applies here too: 64x64 greedy arms fall back to the host loop,
    # 16x16 greedy arms stay on-device (16x smaller pixel footprint).
    width = num_actions ** (lookahead + 1) * max(rollout_samples, 1)
    if rollout_policy == "greedy":
        width *= num_actions
    per_episode = (width * (lookahead + 1 + rollout_depth)
                   * spec.height * spec.width)
    return per_episode <= budget


def play_on_device(params: WorldModel, datasource, episodes: int = 10,
                   max_steps: int = 300, rollout_depth: int = 12,
                   lookahead: int = 2,
                   negative_positive_tradeoff: float = 10.0,
                   rollout_policy: str = "noop", rollout_samples: int = 1,
                   stall_patience: int = 10, seed0: int = 0,
                   out_dir: Optional[str] = None, verbose: bool = True):
    """Run ``episodes`` MPC episodes fully on device; returns
    (rewards list, steps list).  Episode e uses env seed ``seed0 + e``:
    trajectory-for-trajectory parity holds against
    ``play(env=HostEnv(spec, seed=seed0 + e), seed=seed0 + e)`` (that is
    how tests/test_play_device.py pins it).  Note the host *sweep* path
    (``play`` without an ``env`` override) draws env seeds from the
    datasource's own key chain instead, so host-mode and device-mode
    sweep arms sample different — equally valid — episode sets.

    Writes reference-format score files when ``out_dir`` is given
    (main.py:397-399), named ``evaluation_metrics_<ts>_<seed>.txt`` —
    seed-suffixed because on-device episodes finish in the same second
    and per-second timestamps collide across batched calls.

    Episodes are processed in program chunks sized by the lane-step
    budget (see _episode_chunk): large envs exceed a remote-worker
    program limit when too many episode beams batch into one program
    (measured boundary in the comment above _episode_chunk) — chunking
    keeps each program under it while per-episode results stay
    bit-identical (episodes are independent lanes of the vmap).

    Exact-path planner only (the int8 beam is a host-play knob)."""
    spec = datasource.spec if hasattr(datasource, "spec") else datasource
    chunk = _episode_chunk(spec, spec.num_actions, lookahead,
                           rollout_depth, rollout_policy, rollout_samples)
    t0 = time.time()
    cum, steps = [], []
    for e0 in range(0, episodes, chunk):
        n = min(chunk, episodes - e0)
        seeds = jnp.arange(seed0 + e0, seed0 + e0 + n, dtype=jnp.int32)
        c, _, _, st = _play_episodes(
            params, seeds, spec, spec.num_actions, max_steps, lookahead,
            rollout_depth, rollout_policy,
            float(negative_positive_tradeoff), rollout_samples,
            stall_patience)
        cum.extend(float(x) for x in np.asarray(c))
        steps.extend(int(x) for x in np.asarray(st))
    if verbose:
        print(f"play_on_device: {episodes} episodes in "
              f"{time.time() - t0:.1f}s  rewards={cum}")
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        ts = int(time.time())
        for i, (r, t) in enumerate(zip(cum, steps)):
            msg = f"Finished at t={t} with cumulative reward {r}"
            with open(os.path.join(
                    out_dir,
                    f"evaluation_metrics_{ts}_{seed0 + i}.txt"), "w") as fp:
                fp.write(msg + "\n")
    return cum, steps
