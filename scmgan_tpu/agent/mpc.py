"""Model-predictive-control planner.

The reference plans by looping in Python over candidate first actions, each
spawning a beam of num_actions^lookahead futures rolled out ``rollout_depth``
steps under a noop/random policy, taking the max cumulative reward per first
action with negative reward weighted 10x (reference main.py:354-363 and
compute_rollout_reward, main.py:455-489).  That is
A * A^lookahead * depth transition evaluations per environment step, issued
one Python call at a time.

TPU-native: the ENTIRE search — all A^(lookahead+1) futures x depth steps —
is one compiled ``scan`` over a batched transition, i.e. one kernel launch
per environment step with the beam as the batch dimension feeding the MXU.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.models.world_model import WorldModel, predict_reward, transition


def _action_table(num_actions: int, lookahead: int, rollout_depth: int,
                  rollout_policy: str, key: Optional[jax.Array]) -> jnp.ndarray:
    """(width, rollout_depth + 1) int32 action plans.

    Plan structure per future: [first_action, l1, l2, ..., noop/random...]
    — first action enumerated, then an exhaustive lookahead block, then the
    rollout policy (noop action index 0, reference main.py:467-471).
    For the ``greedy`` tail policy the table's tail entries are ignored
    (actions are chosen on-device per step); the table still fixes the
    enumerated head and the tail length.
    """
    width = num_actions ** (lookahead + 1)
    seqs = np.zeros((width, rollout_depth + 1), np.int64)
    prefix = np.stack(np.meshgrid(
        *[np.arange(num_actions)] * (lookahead + 1), indexing="ij"
    ), axis=-1).reshape(width, lookahead + 1)
    seqs[:, : lookahead + 1] = prefix
    table = jnp.asarray(seqs, jnp.int32)
    if rollout_policy == "random":
        assert key is not None
        tail = jax.random.randint(
            key, (width, rollout_depth - lookahead), 0, num_actions)
        table = table.at[:, lookahead + 1:].set(tail)
    return table


@partial(jax.jit, static_argnames=("num_actions", "lookahead", "rollout_depth",
                                   "rollout_policy", "negative_positive_tradeoff",
                                   "use_int8", "int8_tail", "share_prefix",
                                   "rollout_samples"))
def rollout_reward_table(
    params: WorldModel,
    z: jax.Array,
    num_actions: int,
    lookahead: int = 2,
    rollout_depth: int = 12,
    rollout_policy: str = "noop",
    negative_positive_tradeoff: float = 10.0,
    key: Optional[jax.Array] = None,
    use_int8: bool = False,
    int8_tail: bool = False,
    qt=None,
    share_prefix: bool = True,
    rollout_samples: int = 1,
):
    """Expected best cumulative reward per first action.

    z: (1, H, W, L) current latent state.  Returns (num_actions,) scores:
    score[a] = max over a's beam of sum_r(tradeoff-weighted cumulative
    reward), replicating compute_rollout_reward (main.py:455-489) with the
    first-action loop folded into the same batch.

    Speed/fidelity knobs for the quantized serving transition
    (models/quantized.py, ~2.2x faster on v5e):
      * ``use_int8``      — whole beam through int8.  Caveat: with the
        uncalibrated static scales, near-tie scores (e.g. pong) flip the
        argmax (~34% agreement measured round 1).
      * ``int8_tail``     — the enumerated head (first + lookahead steps,
        the part that differentiates candidate actions) runs exact; only
        the noop/random rollout tail runs int8.
      * ``qt``            — a prebuilt QuantizedTransition; pass one from
        calibrate_transition for per-channel calibrated scales (much
        higher rank fidelity than the static-scale default).
    The reward-scoring head (predict_reward) is always exact.

    ``rollout_samples`` > 1 (beyond the reference): the deterministic
    hard-threshold rollout is chaotic — epsilon perturbations diverge into
    different trajectories, so a plan's score is one noisy draw and
    near-tie argmaxes flip (measured: bf16-exact control agrees with f32
    only 53%, BENCH_NOTES).  Instead of scoring ONE deterministic future
    per plan, replicate the beam K times and roll the tail with the
    model's own straight-through-Bernoulli sampling (the distribution the
    transition was trained under), then average each plan's cumulative
    reward over the K replicas — a Monte-Carlo estimate of the plan's
    EXPECTED return that integrates out the chaos instead of inheriting
    it.  The whole K-times-wider beam is still one compiled program.
    Requires ``key``; exact path only (sampling happens in the float
    sigmoid domain the int8 kernels never materialize).
    """
    if rollout_samples > 1:
        if use_int8 or int8_tail:
            raise ValueError(
                "rollout_samples > 1 needs the exact stochastic transition "
                "(int8 kernels carry binary latents, nothing to sample)")
        if key is None:
            raise ValueError("rollout_samples > 1 requires a PRNG key")
    if use_int8 or int8_tail:
        from scmgan_tpu.models.quantized import (
            quantize_transition,
            transition_int8_v2,
        )

        if qt is None:
            qt = quantize_transition(params.transition)
        # v2 is bit-identical to transition_int8 and measurably faster
        int8_step = lambda zb, a: transition_int8_v2(qt, zb, a)
    exact_step = lambda zb, a: transition(params.transition, zb, a,
                                          train=False)
    head_fn = int8_step if use_int8 else exact_step
    tail_fn = int8_step if (use_int8 or int8_tail) else exact_step

    table = _action_table(num_actions, lookahead, rollout_depth,
                          rollout_policy, key)
    width = table.shape[0]

    # enumerated lookahead block (exact under int8_tail), then the rollout
    # tail — reference structure: main.py:467-479.
    if share_prefix:
        # Prefix-shared head: beams sharing an action prefix are identical
        # until their plans diverge, so stage k evaluates only the
        # A^(k+1) unique prefixes instead of the full A^(lookahead+1)
        # beam — ~11% fewer transition+reward evals at the reference
        # recipe (A=4, lookahead 2, depth 12), bit-identical scores.
        # Stage-k beam index i encodes the prefix (a_0..a_k) base-A
        # lexicographically (a_0-major), matching _action_table's row
        # order, so the fully-widened beam lines up with table rows.
        z_beam = jnp.broadcast_to(z, (1,) + z.shape[1:])
        cumulative = None
        for k in range(lookahead + 1):
            z_beam = jnp.repeat(z_beam, num_actions, axis=0)
            stage_a = jnp.tile(jnp.arange(num_actions), num_actions ** k)
            a_oh = jax.nn.one_hot(stage_a, num_actions, dtype=z.dtype)
            z_beam = head_fn(z_beam, a_oh)
            r = predict_reward(params.reward_predictor, z_beam)
            cumulative = r if cumulative is None else (
                jnp.repeat(cumulative, num_actions, axis=0) + r)
    else:
        z_beam = jnp.broadcast_to(z, (width,) + z.shape[1:])
        a0 = jax.nn.one_hot(table[:, 0], num_actions, dtype=z.dtype)
        z_beam = head_fn(z_beam, a0)
        cumulative = predict_reward(params.reward_predictor, z_beam)
        for i in range(lookahead):
            a_oh = jax.nn.one_hot(table[:, 1 + i], num_actions,
                                  dtype=z_beam.dtype)
            z_beam = head_fn(z_beam, a_oh)
            cumulative = cumulative + predict_reward(params.reward_predictor,
                                                     z_beam)

    if rollout_samples > 1:
        # K replicas per plan, replica-major so scores reshape to
        # (K, width); the enumerated head is shared (deterministic), only
        # the tail explores the sampled futures.
        z_beam = jnp.tile(z_beam, (rollout_samples, 1, 1, 1))
        cumulative = jnp.tile(cumulative, (rollout_samples, 1))
        sample_key = jax.random.fold_in(key, 0x5A)

    # step-reward weights used both for the greedy tail's argmax and the
    # final score (tradeoff on channel 0, main.py:483-484)
    num_rewards = cumulative.shape[1]
    w_reward = jnp.ones((num_rewards,), jnp.float32).at[0].set(
        negative_positive_tradeoff)

    def _sampled_or_tail(zb, a_oh, k):
        if rollout_samples > 1:
            return transition(params.transition, zb, a_oh, key=k, train=True)
        return tail_fn(zb, a_oh)

    def step(carry, a_t):
        z_beam, cum, k = carry
        k, sub = jax.random.split(k)
        if rollout_policy == "greedy":
            # Beyond the reference's noop/random tails: a compiled
            # 1-step-greedy rollout policy.  Each tail step evaluates all
            # A successors of every beam state and follows the argmax of
            # the tradeoff-weighted predicted step reward — so a plan's
            # tail value estimates "act sensibly afterwards" instead of
            # "freeze" (noop) or "thrash" (random).  Costs A x the tail
            # transitions; the whole thing is still one scan.
            wb = z_beam.shape[0]
            zz = jnp.repeat(z_beam, num_actions, axis=0)
            aa = jnp.tile(jnp.arange(num_actions), wb)
            a_oh = jax.nn.one_hot(aa, num_actions, dtype=z_beam.dtype)
            z_next = _sampled_or_tail(zz, a_oh, sub)
            r = predict_reward(params.reward_predictor, z_next)  # (wb*A, R)
            r_w = (r.astype(jnp.float32) * w_reward).sum(-1)
            choice = jnp.argmax(r_w.reshape(wb, num_actions), axis=1)
            pick = lambda x: x.reshape((wb, num_actions) + x.shape[1:])[
                jnp.arange(wb), choice]
            z_beam = pick(z_next)
            cum = cum + pick(r)
        else:
            if rollout_samples > 1:
                a_t = jnp.tile(a_t, rollout_samples)  # replica-major
            a_oh = jax.nn.one_hot(a_t, num_actions, dtype=z_beam.dtype)
            z_beam = _sampled_or_tail(z_beam, a_oh, sub)
            cum = cum + predict_reward(params.reward_predictor, z_beam)
        z_beam = jax.lax.stop_gradient(z_beam)
        return (z_beam, cum, k), None

    scan_key = sample_key if rollout_samples > 1 else jax.random.PRNGKey(0)
    (_, cumulative, _), _ = jax.lax.scan(
        step, (z_beam, cumulative, scan_key),
        jnp.swapaxes(table[:, 1 + lookahead:], 0, 1))

    # Heuristic caution: weight reward channel 0 (main.py:483-484).
    cumulative = cumulative.at[:, 0].multiply(negative_positive_tradeoff)
    scores = jnp.sum(cumulative, axis=1)                      # (K*width,)
    if rollout_samples > 1:
        scores = scores.reshape(rollout_samples, width).mean(axis=0)
    per_first = scores.reshape(num_actions, -1)               # (A, A^lookahead)
    return jnp.max(per_first, axis=1)


def make_planner(params: WorldModel, num_actions: int, lookahead: int = 2,
                 rollout_depth: int = 12, rollout_policy: str = "noop",
                 negative_positive_tradeoff: float = 10.0,
                 use_int8: bool = False, int8_tail: bool = False, qt=None,
                 rollout_samples: int = 1):
    """Returns plan(z, key=None) -> (best_action, scores)."""

    def plan(z, key=None):
        scores = rollout_reward_table(
            params, z, num_actions, lookahead, rollout_depth,
            rollout_policy, negative_positive_tradeoff, key=key,
            use_int8=use_int8, int8_tail=int8_tail, qt=qt,
            rollout_samples=rollout_samples)
        return int(jnp.argmax(scores)), scores

    return plan


def calibrated_qt(params: WorldModel, z: jax.Array, num_actions: int,
                  key: Optional[jax.Array] = None, n_samples: int = 32,
                  steps: int = 16):
    """Build a calibrated QuantizedTransition from a seed latent state.

    Sweeps ``steps`` exact transition steps from ``z`` under random
    actions (serving-semantics hard-threshold carry) and calibrates
    per-channel activation max ranges over the whole rollout
    (models/quantized.py::calibrate_transition sequence form).  ``steps``
    should cover the planner's beam depth (lookahead + rollout_depth):
    under-covering the visited state distribution makes the requant clip,
    and clipping error compounds step over step.
    """
    from scmgan_tpu.models.quantized import calibrate_transition

    if key is None:
        key = jax.random.PRNGKey(0)
    zs = jnp.repeat(z, n_samples, axis=0)
    a_seq = jax.nn.one_hot(
        jax.random.randint(key, (zs.shape[0], steps), 0, num_actions),
        num_actions, dtype=zs.dtype)
    return calibrate_transition(params.transition, zs, a_seq)
