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
from scmgan_tpu.models.world_model import (
    WorldModel,
    decode,
    encode,
    transition,
)
from scmgan_tpu.ops.conv import conv2d, leaky_relu
from scmgan_tpu.ops.spectral_norm import sn_weight, update_spectral_norms


def _ste(x, q):
    """Straight-through: forward ``q``, gradient of ``x``."""
    return x + jax.lax.stop_gradient(q - x)


def _ste_round_clip(x):
    return _ste(x, jnp.clip(jnp.round(x), -127, 127))


def fake_quant_transition(params: dict, act_scale: dict, z: jax.Array,
                          action_onehot: jax.Array) -> jax.Array:
    """Differentiable mirror of the int8 serving engine
    (``calibrate_transition`` + ``transition_int8_v2``): per-input-channel
    scales folded into the weights, per-output-channel symmetric int8
    weights, per-channel activation requantization — all with
    straight-through rounding so the student can be trained *through* the
    quantization grid (QAT).  ``act_scale`` is the calibration record from
    ``quantized.activation_scales`` (recomputed periodically from the
    current student by the distillation driver).

    Not bit-exact to the int8 kernels (f32 accumulation vs int32) but on
    the same grid: weights and hidden activations take exactly the values
    the serving engine can represent.  Deterministic sigmoid head.
    """
    b, h, w, latent = z.shape
    a_map = jnp.broadcast_to(
        action_onehot[:, None, None, :].astype(z.dtype),
        (b, h, w, action_onehot.shape[-1]))
    ones_in = jnp.ones((latent + action_onehot.shape[-1],), jnp.float32)

    def in_scales(name):
        if name == "conv1":
            return ones_in
        if name in ("conv2", "conv3", "conv4"):
            return act_scale[{"conv2": "conv1", "conv3": "conv2",
                              "conv4": "conv3"}[name]]
        if name == "conv5":  # concat(h4, h2)
            return jnp.concatenate([act_scale["conv4"], act_scale["conv2"]])
        if name == "conv6":  # concat(h5, h1)
            return jnp.concatenate([act_scale["conv5"], act_scale["conv1"]])
        raise ValueError(name)

    def qconv(name, x_int, requant=True):
        """x_int: input on its integer grid (value / s_in)."""
        p = params[name]
        w_raw = sn_weight(p) if "sn" in p else p["w"]
        s_in = jax.lax.stop_gradient(in_scales(name))
        w_f = w_raw * s_in[None, None, :, None]
        ws = jax.lax.stop_gradient(
            jnp.max(jnp.abs(w_f.reshape(-1, w_f.shape[-1])), axis=0)
            / 127.0 + 1e-12)
        w_deq = _ste_round_clip(w_f / ws) * ws        # serving weight grid
        y = conv2d({"w": w_deq, "b": p["b"]}, x_int, circular=True)
        if not requant:
            return y
        y = leaky_relu(y)
        # multiply by the reciprocal exactly like the runtime requant
        # (quantized._qepilogue: round(y * rq)) — y/s differs in the last
        # ulp and can flip round-to-nearest at .5 boundaries
        rq = jax.lax.stop_gradient(1.0 / act_scale[name])
        return _ste_round_clip(y * rq)                # next integer grid

    # conv1 inputs (binary latents + one-hot actions) are already integers
    x = jnp.concatenate([z, a_map], axis=-1)
    h1 = qconv("conv1", x)
    h2 = qconv("conv2", h1)
    h3 = qconv("conv3", h2)
    h4 = qconv("conv4", h3)
    h5 = qconv("conv5", jnp.concatenate([h4, h2], axis=-1))
    logits = qconv("conv6", jnp.concatenate([h5, h1], axis=-1),
                   requant=False)
    return jax.nn.sigmoid(logits)


def make_distill_step(spec, teacher: WorldModel, tx,
                      batch_size: int, rollout_len: int, qat: bool = False):
    """Returns a jitted ``(student, opt_state, key, p_on_policy[, act_scale])
    -> (student, opt_state, bce, bit_acc)`` step.  Data is generated on
    device each call: fresh env trajectories, rolled out with a per-sample
    teacher/student carry mix (see module docstring), teacher one-step
    outputs from the visited states as the imitation target.

    ``qat=True`` trains through the serving engine's quantization grid
    (``fake_quant_transition``): the step then requires ``act_scale`` (from
    ``quantized.activation_scales`` on the current student — recalibrate
    periodically), the on-policy carry visits the *quantized* student's
    states, and the loss is scored on the fake-quant forward.  This is what
    closes the int8-minus-exact fidelity gap at serve time.
    """

    def distill_step(student, opt_state, key, p_on_policy=0.0,
                     act_scale=None):
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

        def student_fwd(sp, z, a):
            if qat:
                return fake_quant_transition(sp, act_scale, z, a)
            return transition(sp, z, a, train=True, deterministic=True)

        def gen_step(z, t):
            y = transition(teacher.transition, z, a_tm[t], train=False)
            y_s = (student_fwd(frozen, z, a_tm[t]) > 0.5).astype(z.dtype) \
                if qat else transition(frozen, z, a_tm[t], train=False)
            z_next = jnp.where(
                use_student[t - 1][:, None, None, None], y_s, y)
            return z_next, (z, a_tm[t], y)

        _, (Z, A, Y) = jax.lax.scan(
            gen_step, z0, jnp.arange(1, rollout_len + 1))
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        Z, A, Y = flat(Z), flat(A), jax.lax.stop_gradient(flat(Y))
        Z = jax.lax.stop_gradient(Z)

        def loss_fn(sp):
            p = student_fwd(sp, Z, A)
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


def make_gt_finetune_step(spec, teacher: WorldModel, tx, batch_size: int,
                          horizon: int, qat: bool = True):
    """Fine-tune the student on the *gated metric itself*: free-run pixel
    MSE against ground-truth frames under the exact eval protocol
    (analysis/mse.py::_free_run_stats, reference main.py:784-835) —
    encode frames 0..2, advance once with action[1], then for each
    t = 2..2+horizon decode through the frozen teacher decoder, score the
    done-masked pixel MSE against obs[t], and advance with action[t].

    Distillation (BCE to teacher bits) upper-bounds the student at teacher
    fidelity; this objective removes that ceiling — the student descends
    the same quantity the fidelity gate reads (a student can come out
    *better* than the teacher at t+10).  The forward is the QAT fake-quant
    mirror of the int8 serving engine, the carry is hard-binarized with a
    straight-through gradient (the eval free-run carries binary latents),
    and the whole rollout is backpropagated (per-step ``jax.checkpoint``
    keeps BPTT memory at one step's activations).

    Returns a jitted ``(student, opt_state, key[, act_scale]) ->
    (student, opt_state, gate_mse, mean_mse)`` step where ``gate_mse`` is
    the masked pixel MSE at the gate horizon (t+10) and ``mean_mse`` the
    mean over all scored steps.
    """

    def ft_step(student, opt_state, key, act_scale=None):
        # horizon+3 frames: 3 context + scored steps t = 2..2+horizon-1,
        # with one advance before scoring (the protocol's action[1] step).
        obs, _, dones, actions = rollout(
            spec, key, batch_size, horizon + 3, "random")
        f32 = jnp.float32
        a_oh = jax.nn.one_hot(actions, spec.num_actions, dtype=f32)
        act_tm = jnp.swapaxes(a_oh, 0, 1)                     # (T, B, A)
        obs_tm = jnp.swapaxes(obs.astype(f32), 0, 1)          # (T, B, H, W, C)
        done_tm = jnp.swapaxes(dones.astype(f32), 0, 1)
        z0 = encode(teacher.encoder, obs[:, :3].astype(f32))
        b = obs.shape[0]

        def loss_fn(sp):
            def fwd(z, a):
                p = (fake_quant_transition(sp, act_scale, z, a) if qat
                     else transition(sp, z, a, train=True,
                                     deterministic=True))
                # eval free-runs carry hard-binarized latents; STE keeps
                # the rollout differentiable
                return _ste(p, (p > 0.5).astype(p.dtype))

            z = fwd(z0, act_tm[1])

            @jax.checkpoint
            def step(carry, t):
                z, active = carry
                active = active * (1.0 - done_tm[t])
                pred = jax.nn.sigmoid(decode(teacher.decoder, z))
                per_traj = jnp.mean((obs_tm[t] - pred) ** 2, axis=(1, 2, 3))
                n = jnp.maximum(jnp.sum(active), 1.0)
                mse_t = jnp.sum(active * per_traj) / n
                z = fwd(z, act_tm[t])
                return (z, active), mse_t

            (_, _), mses = jax.lax.scan(
                step, (z, jnp.ones((b,), f32)), jnp.arange(2, 2 + horizon))
            gate = mses[10] if horizon > 10 else mses[-1]
            return jnp.mean(mses), gate

        (loss, gate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(student)
        updates, opt_state = tx.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        student = update_spectral_norms(student)
        return student, opt_state, gate, loss

    return jax.jit(ft_step)


def measure_fidelity(teacher: WorldModel, student_transition, datasource,
                     out_dir: str, eval_batch_size: int = 100,
                     eval_timesteps: int = 30, seed: int = 0,
                     horizons: Tuple[int, ...] = (3, 5, 10, 20),
                     include_int8: bool = True,
                     eval_seed: Optional[int] = None) -> dict:
    """Paired reference-protocol MSE comparison (same eval trajectories for
    all engines).  Returns the fidelity record; ``within_1pct`` is the
    serving gate: MSE@t+10 no more than 1% worse than the teacher — scored
    on the engine that actually serves (calibrated int8 student when
    ``include_int8``, else the exact student).

    ``eval_seed`` varies only the evaluation trajectories (calibration
    stays tied to ``seed``) — used by the driver's ``--eval-seeds``
    aggregation: at batch 100 a single MSE@t+10 estimate carries ~2.5%
    standard error (hard-threshold rollout chaos decorrelates the paired
    rollouts), so resolving a 1% gate needs several thousand paired
    trajectories."""
    import os

    from scmgan_tpu.analysis.mse import measure_prediction_mse

    os.makedirs(os.path.join(out_dir, "_t"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_s"), exist_ok=True)
    eval_key = jax.random.PRNGKey(
        (seed if eval_seed is None else eval_seed) + 12345)
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
