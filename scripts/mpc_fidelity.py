#!/usr/bin/env python
"""MPC planner fidelity study: argmax agreement and rank correlation of the
quantized planning paths against the exact bf16 beam, on a trained model.

The round-1 finding was that the static-scale int8 beam agrees with the
exact argmax only ~34% of the time on trained pong (near-tie scores).  This
script measures the fixes: per-channel calibrated quantization
(models/quantized.py::calibrate_transition) and the exact-head/int8-tail
hybrid (agent/mpc.py).  Also times per-plan latency for each path.

Usage: python scripts/mpc_fidelity.py --load-from runs/pong_cf [--env pong]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()


def spearman(a, b):
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    ra = ra - ra.mean()
    rb = rb - rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom else 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--load-from", required=True)
    ap.add_argument("--states", type=int, default=32)
    ap.add_argument("--lookahead", type=int, default=2)
    ap.add_argument("--rollout-depth", type=int, default=12)
    args = ap.parse_args()

    from scmgan_tpu.agent.mpc import calibrated_qt, rollout_reward_table
    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.models import encode
    from scmgan_tpu.train import checkpoint as ckpt
    from scmgan_tpu.train.trainer import init_train_state

    cfg = Config(env=args.env)
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    state = ckpt.load_train_state(args.load_from, state)
    params = state.params
    num_actions = ds.spec.num_actions

    # latent states from real trajectories (windows of 3 frames)
    obs, _, _, _ = ds.collect(args.states, 6, key=key)
    z_all = encode(params.encoder, obs[:, 0:3])
    qt_cal = calibrated_qt(params, z_all[:1], num_actions, key=key)

    # Control: the exact algorithm with bf16 weights — no quantization at
    # all.  Its disagreement with the f32 exact beam measures how much
    # argmax instability is intrinsic score tie-ness (any epsilon flips a
    # tie) rather than int8 error.
    p_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    paths = {
        "exact": (params, dict()),
        "exact_bf16": (p_bf16, dict()),
        "int8_static": (params, dict(use_int8=True)),
        "int8_calibrated": (params, dict(use_int8=True, qt=qt_cal)),
        "hybrid_tail": (params, dict(int8_tail=True, qt=qt_cal)),
    }

    scores = {name: [] for name in paths}
    latency = {}
    for name, (p, kw) in paths.items():
        plan = lambda z: rollout_reward_table(
            p, z, num_actions, args.lookahead, args.rollout_depth,
            "noop", 10.0, **kw)
        # warmup/compile
        np.asarray(plan(z_all[:1]))
        t0 = time.perf_counter()
        for i in range(args.states):
            scores[name].append(
                np.asarray(plan(z_all[i:i + 1]), dtype=np.float32))
        latency[name] = (time.perf_counter() - t0) / args.states

    ex = np.stack(scores["exact"])
    # Tie-ness of the decision problem itself: margin between the best and
    # second-best exact score, relative to the per-state score spread.
    ex_sorted = np.sort(ex, axis=1)
    spread_all = np.maximum(ex_sorted[:, -1] - ex_sorted[:, 0], 1e-9)
    margin = (ex_sorted[:, -1] - ex_sorted[:, -2]) / spread_all
    out = {"metric": "mpc_argmax_agreement", "env": args.env,
           "states": args.states,
           "exact_ms_per_plan": round(latency["exact"] * 1e3, 2),
           "exact_top2_rel_margin": {
               "median": round(float(np.median(margin)), 4),
               "mean": round(float(margin.mean()), 4)}}
    # Regret is the decision-quality metric that argmax agreement is not:
    # pong's per-action plan scores are near-ties, so a quantized path can
    # disagree on the argmax while giving up almost no exact-path value.
    # regret[i] = exactscore(exact argmax) - exactscore(quantized argmax),
    # normalized by the exact score *spread* over actions for that state.
    ex_best = ex.max(axis=1)
    ex_spread = np.maximum(ex.max(axis=1) - ex.min(axis=1), 1e-9)
    for name in ("exact_bf16", "int8_static", "int8_calibrated",
                 "hybrid_tail"):
        s = np.stack(scores[name])
        agree = float((s.argmax(1) == ex.argmax(1)).mean())
        rho = float(np.mean([spearman(s[i], ex[i]) for i in range(len(s))]))
        chosen = ex[np.arange(len(s)), s.argmax(1)]
        regret = (ex_best - chosen) / ex_spread
        out[name] = {"argmax_agreement": round(agree, 3),
                     "rank_corr": round(rho, 3),
                     "mean_relative_regret": round(float(regret.mean()), 4),
                     "p95_relative_regret": round(
                         float(np.percentile(regret, 95)), 4),
                     "ms_per_plan": round(latency[name] * 1e3, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
