"""Beam-oracle control: the MPC planner with the TRUE environment as its
simulator.

Round-2 finding: on minipacman the learned-model planner is statistically
indistinguishable from a random policy.  That observation confounds two
hypotheses — (a) the world model is too inaccurate to plan with, or
(b) the beam/lookahead/tail planning *structure* cannot help in this
environment no matter how good the model is.  This control separates
them: run the exact same beam (same action table, first-action
enumeration, tail policy, depth, tradeoff weighting — agent/mpc.py,
reference main.py:455-489) but simulate futures with the real
``spec.step``/pure-JAX dynamics and score with the real rewards.

  * oracle >> random  =>  planning works; the world model binds.
  * oracle ~= random  =>  no model could make this planner beat random
                          here; the planner structure binds.

Only possible because the environments are pure functions of explicit
state (envs/base.py) — the whole oracle beam compiles to one program,
something the reference's stateful Python envs cannot do.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.agent.mpc import _action_table
from scmgan_tpu.envs.base import EnvSpec, HostEnv


@partial(jax.jit, static_argnames=("spec", "num_actions", "lookahead",
                                   "rollout_depth", "rollout_policy",
                                   "negative_positive_tradeoff", "samples"))
def oracle_rollout_scores(
    spec: EnvSpec,
    state,
    num_actions: int,
    lookahead: int = 2,
    rollout_depth: int = 12,
    rollout_policy: str = "noop",
    negative_positive_tradeoff: float = 10.0,
    key: Optional[jax.Array] = None,
    samples: int = 1,
):
    """(num_actions,) expected best cumulative TRUE reward per first action.

    Mirrors mpc.rollout_reward_table but steps the real environment from
    the real ``state``.  ``samples`` > 1 averages over the env's own
    stochasticity (e.g. minipacman ghost moves), replica-major like the
    model beam's MC sampling.  Reward accumulation stops at episode end
    (done-masking) — the real-world analog of the model beam's implicit
    "episodes never end inside the horizon".
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    table = _action_table(num_actions, lookahead, rollout_depth,
                          rollout_policy,
                          key if rollout_policy == "random" else None)
    width = table.shape[0]
    wb = width * samples

    beam = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (wb,) + jnp.shape(x)), state)
    num_rewards = spec.num_rewards

    def step(carry, a_t):
        st, cum, alive, k = carry
        k, sub = jax.random.split(k)
        a_rep = jnp.tile(a_t, samples)                     # replica-major
        st, r, done = jax.vmap(spec.step)(
            st, a_rep, jax.random.split(sub, wb))
        cum = cum + r.astype(jnp.float32) * alive[:, None]
        alive = alive * (1.0 - done.astype(jnp.float32))
        return (st, cum, alive, k), None

    carry0 = (beam, jnp.zeros((wb, num_rewards), jnp.float32),
              jnp.ones((wb,), jnp.float32), key)
    (_, cum, _, _), _ = jax.lax.scan(step, carry0,
                                     jnp.swapaxes(table, 0, 1))
    cum = cum.at[:, 0].multiply(negative_positive_tradeoff)
    scores = cum.sum(axis=1).reshape(samples, width).mean(axis=0)
    return jnp.max(scores.reshape(num_actions, -1), axis=1)


@partial(jax.jit, static_argnames=(
    "spec", "max_steps", "lookahead", "rollout_depth", "rollout_policy",
    "negative_positive_tradeoff", "samples"))
def _oracle_episodes(seeds, spec: EnvSpec, max_steps: int, lookahead: int,
                     rollout_depth: int, rollout_policy: str,
                     negative_positive_tradeoff: float, samples: int):
    """All oracle episodes as one compiled program (same pattern as
    agent/play_device.py; episode protocol of play_oracle below, PRNG
    chain of HostEnv so seeds line up with the host loop)."""
    no_op = 3 % spec.num_actions

    def one_episode(seed):
        env_key = jax.random.PRNGKey(seed)
        plan_key = jax.random.PRNGKey(seed)
        env_key, sub = jax.random.split(env_key)
        state = spec.reset(sub)
        env_key, sub = jax.random.split(env_key)
        state, _, _ = spec.step(state, jnp.int32(no_op), sub)
        env_key, sub = jax.random.split(env_key)
        state, _, _ = spec.step(state, jnp.int32(no_op), sub)

        def body(carry, t):
            state, env_key, cum, alive = carry
            scores = oracle_rollout_scores(
                spec, state, spec.num_actions, lookahead, rollout_depth,
                rollout_policy, negative_positive_tradeoff,
                key=jax.random.fold_in(plan_key, t), samples=samples)
            a = jnp.argmax(scores).astype(jnp.int32)
            env_key, sub = jax.random.split(env_key)
            state, reward_vec, done = spec.step(state, a, sub)
            cum = cum + jnp.sum(reward_vec.astype(jnp.float32)) * alive
            inc = alive
            alive = alive * (1.0 - done.astype(jnp.float32))
            return (state, env_key, cum, alive), inc

        (_, _, cum, _), incs = jax.lax.scan(
            body, (state, env_key, jnp.float32(0.0), jnp.float32(1.0)),
            jnp.arange(2, max_steps + 1))
        return cum, jnp.int32(2 + jnp.sum(incs))

    return jax.vmap(one_episode)(seeds)


def play_oracle_on_device(spec: EnvSpec, episodes: int = 10,
                          max_steps: int = 300, lookahead: int = 2,
                          rollout_depth: int = 12,
                          rollout_policy: str = "noop",
                          negative_positive_tradeoff: float = 10.0,
                          samples: int = 1, seed0: int = 0,
                          verbose: bool = True):
    """Batched on-device oracle control; returns (rewards, steps) lists."""
    import time

    seeds = jnp.arange(seed0, seed0 + episodes, dtype=jnp.int32)
    t0 = time.time()
    cum, steps = _oracle_episodes(
        seeds, spec, max_steps, lookahead, rollout_depth, rollout_policy,
        float(negative_positive_tradeoff), samples)
    cum = [float(x) for x in np.asarray(cum)]
    steps = [int(x) for x in np.asarray(steps)]
    if verbose:
        print(f"play_oracle_on_device: {episodes} episodes in "
              f"{time.time() - t0:.1f}s  rewards={cum}")
    return cum, steps


def play_oracle(spec: EnvSpec, max_steps: int = 300, lookahead: int = 2,
                rollout_depth: int = 12, rollout_policy: str = "noop",
                negative_positive_tradeoff: float = 10.0,
                samples: int = 1, seed: int = 0, verbose: bool = False):
    """One episode planned with the true-dynamics oracle beam.

    Returns (cumulative_reward, steps).  Same episode protocol as
    agent.play (3 no-op seed steps, <= max_steps, reference
    main.py:333-395) so scores are directly comparable.
    """
    env = HostEnv(spec, seed=seed)
    no_op = 3 % spec.num_actions
    env.reset()
    env.step(no_op)
    env.step(no_op)
    key = jax.random.PRNGKey(seed)
    cumulative = 0.0
    done = False
    t = 2
    while not done:
        key, sub = jax.random.split(key)
        scores = oracle_rollout_scores(
            spec, env.state, spec.num_actions, lookahead, rollout_depth,
            rollout_policy, negative_positive_tradeoff, key=sub,
            samples=samples)
        a = int(jnp.argmax(scores))
        _, reward, done, _ = env.step(a)
        cumulative += reward
        if verbose:
            print(f"t={t} a={a} r={cumulative:+.1f} "
                  + " ".join(f"{float(s):.2f}" for s in np.asarray(scores)))
        t += 1
        if t > max_steps:
            break
    return cumulative, t
