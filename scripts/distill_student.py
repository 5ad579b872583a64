"""Distill the flagship transition into a narrower serving student.

The serving workload (free-run prediction, MPC beam) is entirely the
128-wide Transition (reference models.py:43-119) — BENCH_NOTES shows the
exact int8 path already runs at ~90% of this chip's measured conv ceiling,
so further throughput must come from *fewer operations*, not better
kernels.  This script trains a width-H student transition to imitate the
trained teacher's eval-mode latent dynamics; the teacher's encoder,
decoder, and reward predictor (cheap — decode_fused alone serves ~587k
frames/s) are kept verbatim.

Objective: BCE between the student's deterministic sigmoid output and the
teacher's hard-thresholded next latents, on the exact state distribution
of the eval free-run protocol (reference main.py:796-835): z_0 is the raw
encoder output advanced once, every later input is a binary latent carried
through the teacher's own eval rollout.

Fidelity gate: after training, run the reference MSE protocol
(measure_prediction_mse) with teacher vs student transitions on the SAME
eval trajectories and record per-horizon deltas in <out>/fidelity.json.
bench.py only admits the student serving path while the recorded
MSE@t+10 delta stays within 1% (BASELINE.md north-star clause).

Usage:
  python scripts/distill_student.py --env minipacman \
      --teacher runs/minipacman_cf --hidden 64 --iters 2000 \
      --out runs/minipacman_student_h64
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="minipacman")
    p.add_argument("--teacher", default="runs/minipacman_cf")
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--rollout", type=int, default=20,
                   help="teacher free-run length per sampled trajectory")
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--fidelity-only", action="store_true",
                   help="skip training; re-measure fidelity of <out>")
    p.add_argument("--eval-batch-size", type=int, default=100)
    p.add_argument("--eval-timesteps", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from scmgan_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from scmgan_tpu.analysis.mse import measure_prediction_mse
    from scmgan_tpu.config import Config
    from scmgan_tpu.data.datasource import allocate_datasource
    from scmgan_tpu.envs.base import rollout
    from scmgan_tpu.models.world_model import (
        WorldModel,
        encode,
        init_transition,
        transition,
    )
    from scmgan_tpu.ops.spectral_norm import update_spectral_norms
    from scmgan_tpu.train import checkpoint as ckpt
    from scmgan_tpu.train.trainer import init_train_state

    out_dir = args.out or f"runs/{args.env}_student_h{args.hidden}"
    os.makedirs(out_dir, exist_ok=True)

    ds = allocate_datasource(args.env, seed=args.seed)
    spec = ds.spec
    cfg = Config(env=args.env)
    teacher = init_train_state(cfg, spec, jax.random.PRNGKey(0))
    teacher = ckpt.load_train_state(args.teacher, teacher)
    tp = teacher.params

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    student = init_transition(k_init, cfg.latent_dim, spec.num_actions,
                              hidden=args.hidden)

    if not args.fidelity_only:
        tx = optax.chain(optax.clip(0.1),
                         optax.adam(args.learning_rate))
        opt_state = tx.init(student)

        R, B = args.rollout, args.batch_size

        @jax.jit
        def distill_step(student, opt_state, key):
            # On-device data: fresh trajectories + the teacher's own
            # eval-mode rollout as the imitation target (exact protocol
            # state distribution, reference main.py:796-799).
            obs, _, _, actions = rollout(spec, key, B, R + 2, "random")
            a_oh = jax.nn.one_hot(actions, spec.num_actions,
                                  dtype=jnp.float32)
            a_tm = jnp.swapaxes(a_oh, 0, 1)          # (T, B, A)
            z0 = encode(tp.encoder, obs[:, :3].astype(jnp.float32))

            def teacher_step(z, t):
                y = transition(tp.transition, z, a_tm[t], train=False)
                return y, (z, a_tm[t], y)

            _, (Z, A, Y) = jax.lax.scan(
                teacher_step, z0, jnp.arange(1, R + 1))
            flat = lambda x: x.reshape((-1,) + x.shape[2:])
            Z, A, Y = flat(Z), flat(A), flat(Y)
            Y = jax.lax.stop_gradient(Y)

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
            # Power-iteration refresh, once per step like the trainer
            # (reference updates u/v each forward,
            # spectral_normalization.py:66-68).
            student = update_spectral_norms(student)
            return student, opt_state, loss, bits

        t0 = time.time()
        for it in range(args.iters):
            key, k = jax.random.split(key)
            student, opt_state, loss, bits = distill_step(
                student, opt_state, k)
            if it % 100 == 0 or it == args.iters - 1:
                print(f"iter {it:5d}  bce {float(loss):.5f}  "
                      f"bit-acc {float(bits):.5f}  ({time.time()-t0:.1f}s)",
                      flush=True)
        ckpt.save_pytree(os.path.join(out_dir, "model-transition.npz"),
                         student)
    else:
        student = ckpt.load_pytree(
            os.path.join(out_dir, "model-transition.npz"), student)

    # ---- fidelity: reference MSE protocol, teacher vs student, paired ----
    os.makedirs(os.path.join(out_dir, "_t"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "_s"), exist_ok=True)
    eval_key = jax.random.PRNGKey(args.seed + 12345)
    res_t = measure_prediction_mse(
        tp, ds, train_iter=1, batch_size=args.eval_batch_size,
        timesteps=args.eval_timesteps, out_dir=os.path.join(out_dir, "_t"),
        make_plots=False, key=eval_key)
    res_s = measure_prediction_mse(
        tp._replace(transition=student),
        ds, train_iter=1, batch_size=args.eval_batch_size,
        timesteps=args.eval_timesteps, out_dir=os.path.join(out_dir, "_s"),
        make_plots=False, key=eval_key)
    mse_t, mse_s = res_t[0], res_s[0]
    horizons = [h for h in (3, 5, 10, 20) if h < min(len(mse_t), len(mse_s))]
    fid = {
        "env": args.env,
        "teacher": args.teacher,
        "hidden": args.hidden,
        "iters": args.iters,
        "eval_batch_size": args.eval_batch_size,
        "eval_timesteps": args.eval_timesteps,
        "teacher_mse": {h: mse_t[h] for h in horizons},
        "student_mse": {h: mse_s[h] for h in horizons},
        "delta_pct": {h: 100.0 * (mse_s[h] - mse_t[h]) / mse_t[h]
                      for h in horizons},
    }
    fid["mse10_delta_pct"] = fid["delta_pct"].get(10)
    fid["within_1pct"] = (fid["mse10_delta_pct"] is not None
                          and fid["mse10_delta_pct"] <= 1.0)
    with open(os.path.join(out_dir, "fidelity.json"), "w") as f:
        json.dump(fid, f, indent=2)
    print(json.dumps(fid, indent=2))


if __name__ == "__main__":
    main()
