"""Serving-student distillation of the Transition.

The serving workload (the free-run behind measure_prediction_mse,
reference main.py:784-855, and the MPC beam, main.py:455-489) is entirely
the 128-wide Transition (reference models.py:43-119).  BENCH_NOTES shows
the exact int8 serving path already runs at ~90% of this chip's measured
conv ceiling, so further throughput must come from fewer operations, not
better kernels: train a width-H student transition to imitate the trained
teacher's eval-mode latent dynamics, keep the teacher's encoder/decoder/
reward nets verbatim (decode_fused alone serves ~587k frames/s), and gate
the swap on the reference MSE protocol staying within 1% at t+10
(BASELINE.md north-star clause).

Objective: BCE between the student's deterministic sigmoid output and the
teacher's hard-thresholded next latents, over the exact state distribution
of the eval free-run (main.py:796-799): z_0 is the raw encoder output,
every later input is a binary latent carried through an eval rollout,
actions start at index 1.

On-policy correction (DAgger-style): at serve time the student free-runs
on *its own* binary latents, so a student trained only on teacher-visited
states compounds its errors (measured: +10.7% MSE@t+10 for an h=64
student at 2k teacher-only iters).  ``p_on_policy`` mixes the rollout
carry per (sample, step): with that probability the next input state is
the student's own hard-thresholded output, else the teacher's.  Targets
are always the teacher's one-step output *from the visited state*, which
is exactly the DAgger expert-labels-learner-states recipe.  Ramping
p 0 -> 1 over training (scheduled sampling) gives the curriculum:
imitate first, then learn to correct your own drift.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from scmgan_tpu.envs.base import rollout
from scmgan_tpu.models.world_model import WorldModel, encode, transition
from scmgan_tpu.ops.spectral_norm import update_spectral_norms


def make_distill_step(spec, teacher: WorldModel, tx,
                      batch_size: int, rollout_len: int):
    """Returns a jitted ``(student, opt_state, key, p_on_policy) ->
    (student, opt_state, bce, bit_acc)`` step.  Data is generated on
    device each call: fresh env trajectories, rolled out with a per-sample
    teacher/student carry mix (see module docstring), teacher one-step
    outputs from the visited states as the imitation target."""

    def distill_step(student, opt_state, key, p_on_policy=0.0):
        k_env, k_mix = jax.random.split(key)
        obs, _, _, actions = rollout(
            spec, k_env, batch_size, rollout_len + 2, "random")
        a_oh = jax.nn.one_hot(actions, spec.num_actions, dtype=jnp.float32)
        a_tm = jnp.swapaxes(a_oh, 0, 1)                      # (T, B, A)
        z0 = encode(teacher.encoder, obs[:, :3].astype(jnp.float32))
        use_student = jax.random.bernoulli(
            k_mix, p_on_policy, (rollout_len, batch_size))   # (T, B)

        # The carry visits student-reachable states; labels are always the
        # teacher's one-step output from the visited state.  The student
        # inside the data rollout is the *current* (pre-update) one —
        # stop_gradient keeps the generator out of the loss graph.
        frozen = jax.lax.stop_gradient(student)

        def gen_step(z, t):
            y = transition(teacher.transition, z, a_tm[t], train=False)
            y_s = transition(frozen, z, a_tm[t], train=False)
            z_next = jnp.where(
                use_student[t - 1][:, None, None, None], y_s, y)
            return z_next, (z, a_tm[t], y)

        _, (Z, A, Y) = jax.lax.scan(
            gen_step, z0, jnp.arange(1, rollout_len + 1))
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        Z, A, Y = flat(Z), flat(A), jax.lax.stop_gradient(flat(Y))
        Z = jax.lax.stop_gradient(Z)

        def loss_fn(sp):
            p = transition(sp, Z, A, train=True, deterministic=True)
            p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
            bce = -(Y * jnp.log(p) + (1.0 - Y) * jnp.log(1.0 - p))
            bits = jnp.mean(
                ((p > 0.5).astype(jnp.float32) == Y).astype(jnp.float32))
            return jnp.mean(bce), bits

        (loss, bits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(student)
        updates, opt_state = tx.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        # Power-iteration refresh once per step, like the trainer (the
        # reference updates u/v on every forward,
        # spectral_normalization.py:66-68).
        student = update_spectral_norms(student)
        return student, opt_state, loss, bits

    return jax.jit(distill_step)


def measure_fidelity(teacher: WorldModel, student_transition, datasource,
                     out_dir: str, eval_batch_size: int = 100,
                     eval_timesteps: int = 30, seed: int = 0,
                     horizons: Tuple[int, ...] = (3, 5, 10, 20),
                     include_int8: bool = True) -> dict:
    """Paired reference-protocol MSE comparison (same eval trajectories for
    all engines).  Returns the fidelity record; ``within_1pct`` is the
    serving gate: MSE@t+10 no more than 1% worse than the teacher — scored
    on the engine that actually serves (calibrated int8 student when
    ``include_int8``, else the exact student)."""
    import os

    from scmgan_tpu.analysis.mse import measure_prediction_mse

    os.makedirs(os.path.join(out_dir, "_t"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_s"), exist_ok=True)
    eval_key = jax.random.PRNGKey(seed + 12345)
    res_t = measure_prediction_mse(
        teacher, datasource, train_iter=1, batch_size=eval_batch_size,
        timesteps=eval_timesteps, out_dir=os.path.join(out_dir, "_t"),
        make_plots=False, key=eval_key)
    res_s = measure_prediction_mse(
        teacher._replace(transition=student_transition),
        datasource, train_iter=1, batch_size=eval_batch_size,
        timesteps=eval_timesteps, out_dir=os.path.join(out_dir, "_s"),
        make_plots=False, key=eval_key)
    mse_t, mse_s = res_t[0], res_s[0]
    hs = [h for h in horizons if h < min(len(mse_t), len(mse_s))]
    fid = {
        "eval_batch_size": eval_batch_size,
        "eval_timesteps": eval_timesteps,
        "teacher_mse": {h: mse_t[h] for h in hs},
        "student_mse": {h: mse_s[h] for h in hs},
        "delta_pct": {h: 100.0 * (mse_s[h] - mse_t[h]) / mse_t[h]
                      for h in hs},
    }
    gate_delta = fid["delta_pct"].get(10)

    if include_int8:
        # Score the serving engine itself: multi-step max-calibrated int8
        # (the recipe that reached exact-path parity on trained flagship
        # models — BENCH_NOTES round 2), under the unchanged protocol.
        from scmgan_tpu.models.quantized import (
            calibrate_transition,
            transition_int8_v2,
        )

        obs, _, _, actions = datasource.collect(
            64, 30, key=jax.random.PRNGKey(seed + 777))
        a_oh = jax.nn.one_hot(actions, datasource.binary_input_channels,
                              dtype=jnp.float32)
        z_cal = (encode(teacher.encoder, obs[:, :3].astype(jnp.float32))
                 > 0.5).astype(jnp.float32)
        qt = calibrate_transition(student_transition, z_cal,
                                  a_oh[:, 2:29], percentile=100.0)
        int8_fn = lambda z, a: transition_int8_v2(qt, z, a).astype(
            jnp.float32)
        os.makedirs(os.path.join(out_dir, "_q"), exist_ok=True)
        res_q = measure_prediction_mse(
            teacher._replace(transition=student_transition), datasource,
            train_iter=1, batch_size=eval_batch_size,
            timesteps=eval_timesteps, out_dir=os.path.join(out_dir, "_q"),
            make_plots=False, key=eval_key, transition_fn=int8_fn)
        mse_q = res_q[0]
        qh = [h for h in hs if h < len(mse_q)]
        fid["student_int8_mse"] = {h: mse_q[h] for h in qh}
        fid["int8_delta_pct"] = {
            h: 100.0 * (mse_q[h] - mse_t[h]) / mse_t[h] for h in qh}
        gate_delta = fid["int8_delta_pct"].get(10, gate_delta)

    fid["mse10_delta_pct"] = gate_delta
    fid["within_1pct"] = gate_delta is not None and gate_delta <= 1.0
    return fid
