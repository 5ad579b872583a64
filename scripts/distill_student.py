"""Distill the flagship transition into a narrower serving student.

CLI wrapper around scmgan_tpu.train.distill (see its module docstring for
the rationale and the reference protocol citations).  Trains a width-H
student against a trained teacher checkpoint, then writes
``<out>/model-transition.npz`` and ``<out>/fidelity.json`` — the paired
reference-MSE-protocol record that bench.py's student serving path is
gated on (within 1% at t+10, BASELINE.md).

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
    p.add_argument("--on-policy-max", type=float, default=1.0,
                   help="final probability that the rollout carry is the "
                        "student's own state (DAgger mix; teacher labels)")
    p.add_argument("--on-policy-ramp", type=float, default=0.5,
                   help="fraction of iters over which p ramps 0 -> max")
    p.add_argument("--cosine-decay", action="store_true", default=True)
    p.add_argument("--no-cosine-decay", dest="cosine_decay",
                   action="store_false")
    p.add_argument("--out", default=None)
    p.add_argument("--platform", default=None)
    p.add_argument("--fidelity-only", action="store_true",
                   help="skip training; re-measure fidelity of <out>")
    p.add_argument("--init-from", default=None,
                   help="warm-start the student from <dir>/model-transition"
                        ".npz (same hidden width) instead of fresh init")
    p.add_argument("--qat-from", type=float, default=None, metavar="FRAC",
                   help="switch to quantization-aware training (fake-quant "
                        "forward on the serving int8 grid) after this "
                        "fraction of iters; closes the int8-minus-exact "
                        "fidelity gap")
    p.add_argument("--qat-recal", type=int, default=500,
                   help="recalibrate QAT activation scales from the "
                        "current student every N iters")
    p.add_argument("--gt-iters", type=int, default=0,
                   help="after distillation, fine-tune on the gated metric "
                        "itself: free-run pixel MSE vs ground truth under "
                        "the eval protocol (QAT forward, STE binary carry; "
                        "removes the teacher-fidelity ceiling)")
    p.add_argument("--gt-horizon", type=int, default=16)
    p.add_argument("--gt-batch-size", type=int, default=16)
    p.add_argument("--gt-learning-rate", type=float, default=1e-4)
    p.add_argument("--eval-batch-size", type=int, default=100)
    p.add_argument("--eval-timesteps", type=int, default=30)
    p.add_argument("--eval-seeds", type=int, default=1,
                   help="aggregate the fidelity gate over N independent "
                        "paired evals (the @t+10 estimate carries ~2.5% "
                        "standard error per 100 trajectories)")
    p.add_argument("--seed", type=int, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from scmgan_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()

    import optax

    from scmgan_tpu.config import Config
    from scmgan_tpu.data.datasource import allocate_datasource
    from scmgan_tpu.models.world_model import init_transition
    from scmgan_tpu.train import checkpoint as ckpt
    from scmgan_tpu.train.distill import make_distill_step, measure_fidelity
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
    if args.init_from:
        student = ckpt.load_pytree(
            os.path.join(args.init_from, "model-transition.npz"), student)

    if not args.fidelity_only:
        lr = (optax.cosine_decay_schedule(
                  args.learning_rate, args.iters, alpha=0.05)
              if args.cosine_decay else args.learning_rate)
        tx = optax.chain(optax.clip(0.1), optax.adam(lr))
        opt_state = tx.init(student)
        distill_step = make_distill_step(
            spec, tp, tx, args.batch_size, args.rollout)

        qat_start = (args.iters if args.qat_from is None
                     else max(0, int(args.qat_from * args.iters)))
        if qat_start < args.iters:
            import jax.numpy as jnp

            from scmgan_tpu.models.quantized import activation_scales
            from scmgan_tpu.models.world_model import encode

            distill_step_qat = make_distill_step(
                spec, tp, tx, args.batch_size, args.rollout, qat=True)
            calib_fn = jax.jit(activation_scales)

            def recalibrate(sp, k):
                obs, _, _, actions = ds.collect(64, 30, key=k)
                a_oh = jax.nn.one_hot(actions, spec.num_actions,
                                      dtype=jnp.float32)
                z_cal = (encode(tp.encoder, obs[:, :3].astype(jnp.float32))
                         > 0.5).astype(jnp.float32)
                # serving-semantics multi-step calibration (same recipe as
                # measure_fidelity / the MPC int8 path)
                return calib_fn(sp, z_cal, a_oh[:, 2:29])

        ramp_iters = max(1, int(args.on_policy_ramp * args.iters))
        act_scale = None
        t0 = time.time()
        for it in range(args.iters):
            key, k = jax.random.split(key)
            p_on = args.on_policy_max * min(1.0, it / ramp_iters)
            if it >= qat_start:
                if act_scale is None or \
                        (it - qat_start) % args.qat_recal == 0:
                    key, kc = jax.random.split(key)
                    act_scale = recalibrate(student, kc)
                student, opt_state, loss, bits = distill_step_qat(
                    student, opt_state, k, p_on, act_scale)
            else:
                student, opt_state, loss, bits = distill_step(
                    student, opt_state, k, p_on)
            if it % 100 == 0 or it == args.iters - 1:
                tag = " QAT" if it >= qat_start else ""
                print(f"iter {it:5d}  bce {float(loss):.5f}  "
                      f"bit-acc {float(bits):.5f}  p_on {p_on:.2f}{tag}  "
                      f"({time.time()-t0:.1f}s)",
                      flush=True)
        ckpt.save_pytree(os.path.join(out_dir, "model-transition.npz"),
                         student)
    else:
        student = ckpt.load_pytree(
            os.path.join(out_dir, "model-transition.npz"), student)

    if args.gt_iters > 0 and not args.fidelity_only:
        import jax.numpy as jnp

        from scmgan_tpu.models.quantized import activation_scales
        from scmgan_tpu.models.world_model import encode
        from scmgan_tpu.train.distill import make_gt_finetune_step

        lr = (optax.cosine_decay_schedule(
                  args.gt_learning_rate, args.gt_iters, alpha=0.05)
              if args.cosine_decay else args.gt_learning_rate)
        tx = optax.chain(optax.clip(0.1), optax.adam(lr))
        opt_state = tx.init(student)
        ft_step = make_gt_finetune_step(
            spec, tp, tx, args.gt_batch_size, args.gt_horizon, qat=True)
        calib_fn = jax.jit(activation_scales)

        def recalibrate_gt(sp, k):
            obs, _, _, actions = ds.collect(64, 30, key=k)
            a_oh = jax.nn.one_hot(actions, spec.num_actions,
                                  dtype=jnp.float32)
            z_cal = (encode(tp.encoder, obs[:, :3].astype(jnp.float32))
                     > 0.5).astype(jnp.float32)
            return calib_fn(sp, z_cal, a_oh[:, 2:29])

        act_scale = None
        t0 = time.time()
        for it in range(args.gt_iters):
            key, k = jax.random.split(key)
            if act_scale is None or it % args.qat_recal == 0:
                key, kc = jax.random.split(key)
                act_scale = recalibrate_gt(student, kc)
            student, opt_state, gate, mean_mse = ft_step(
                student, opt_state, k, act_scale)
            if it % 50 == 0 or it == args.gt_iters - 1:
                print(f"gt-ft {it:5d}  mse@gate {float(gate):.6f}  "
                      f"mean {float(mean_mse):.6f}  "
                      f"({time.time()-t0:.1f}s)", flush=True)
        ckpt.save_pytree(os.path.join(out_dir, "model-transition.npz"),
                         student)

    per_seed = []
    for i in range(max(1, args.eval_seeds)):
        fid_i = measure_fidelity(
            tp, student, ds, out_dir,
            eval_batch_size=args.eval_batch_size,
            eval_timesteps=args.eval_timesteps, seed=args.seed,
            eval_seed=args.seed + 7919 * i)
        per_seed.append(fid_i)
        print(f"eval seed {i}: mse10_delta_pct "
              f"{fid_i['mse10_delta_pct']:.3f}", flush=True)
    if len(per_seed) == 1:
        fid = per_seed[0]
    else:
        # aggregate means across seeds, deltas from the aggregate means;
        # between-seed scatter gives the gate's standard error
        import math

        fid = dict(per_seed[0])
        n = len(per_seed)
        for k in ("teacher_mse", "student_mse", "student_int8_mse"):
            if k in fid:
                fid[k] = {h: sum(f[k][h] for f in per_seed) / n
                          for h in fid[k]}
        fid["delta_pct"] = {
            h: 100.0 * (fid["student_mse"][h] - fid["teacher_mse"][h])
            / fid["teacher_mse"][h] for h in fid["teacher_mse"]}
        gate_key = ("int8_delta_pct" if "student_int8_mse" in fid
                    else "delta_pct")
        if "student_int8_mse" in fid:
            fid["int8_delta_pct"] = {
                h: 100.0 * (fid["student_int8_mse"][h]
                            - fid["teacher_mse"][h])
                / fid["teacher_mse"][h] for h in fid["teacher_mse"]}
        deltas10 = [f["mse10_delta_pct"] for f in per_seed]
        fid["mse10_delta_pct"] = fid[gate_key].get(10)
        fid["mse10_delta_per_seed"] = deltas10
        fid["mse10_delta_se_pct"] = (
            math.sqrt(sum((d - sum(deltas10) / n) ** 2
                          for d in deltas10) / (n - 1) / n))
        fid["eval_seeds"] = n
        fid["within_1pct"] = (fid["mse10_delta_pct"] is not None
                              and fid["mse10_delta_pct"] <= 1.0)
    fid.update(env=args.env, teacher=args.teacher, hidden=args.hidden,
               iters=args.iters, qat_from=args.qat_from,
               # self-verifying gate: the hash of the teacher this
               # fidelity was measured against (bench.py and
               # tests/test_pretrained_gates.py refuse stale gates)
               teacher_hash=ckpt.bundle_hash(args.teacher))
    with open(os.path.join(out_dir, "fidelity.json"), "w") as f:
        json.dump(fid, f, indent=2)
    # Ship the teacher decoder with the student so the serving bundle is
    # self-contained: bench.py times transition+decode, and the decoder
    # in the measured program must be byte-identical to the served one.
    ckpt.save_pytree(os.path.join(out_dir, "model-decoder.npz"),
                     tp.decoder)
    print(json.dumps(fid, indent=2))


if __name__ == "__main__":
    main()
