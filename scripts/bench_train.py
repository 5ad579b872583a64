#!/usr/bin/env python
"""Training-throughput benchmark: train iterations/sec and samples/sec.

Secondary perf metric alongside bench.py's rollout frames/sec: measures
the full jitted train step (forward + backward + optimizer + spectral-norm
refresh) including on-device trajectory collection, at the reference
recipe's batch size.

Usage: python scripts/bench_train.py [--env pong] [--iters 100]
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

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=10)
    args = ap.parse_args()

    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.train.trainer import init_train_state, make_train_step

    cfg = Config(env=args.env, batch_size=args.batch_size,
                 horizon_min=args.horizon, horizon_max=args.horizon,
                 train_iters=args.iters)
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    step = make_train_step(cfg, horizon=args.horizon)

    # compile + warmup (collection program + train step)
    batch = ds.collect(cfg.batch_size, args.horizon)
    state, metrics = step(state, batch, key, jnp.float32(0.5),
                          jnp.float32(0.0))
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(args.iters):
        key, k1, k2 = jax.random.split(key, 3)
        batch = ds.collect(cfg.batch_size, args.horizon, key=k1)
        state, metrics = step(state, batch, k2, jnp.float32(0.5),
                              jnp.float32(0.0))
    loss = float(metrics["loss"])  # sync
    dt = time.perf_counter() - t0

    its = args.iters / dt

    # MFU: XLA's own flop count for the compiled step + collection programs
    # against the chip's bf16 peak (v5e: 197 TFLOP/s).  cost_analysis counts
    # every HLO flop (fwd + bwd + optimizer + SN refresh), so this is the
    # honest "model flops" utilization of the whole training iteration.
    mfu = None
    try:
        if hasattr(step, "lower"):
            compiled = step.lower(state, batch, key, jnp.float32(0.5),
                                  jnp.float32(0.0)).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            step_flops = float(ca.get("flops", 0.0))
            peak = 197e12 if jax.devices()[0].platform == "tpu" else None
            if peak and step_flops:
                mfu = step_flops * its / peak
    except Exception:
        pass

    out = {
        "metric": "train_iters_per_sec",
        "value": round(its, 2),
        "unit": "iters/sec",
        "samples_per_sec": round(its * cfg.batch_size, 1),
        "env": args.env,
        "batch_size": cfg.batch_size,
        "horizon": args.horizon,
        "final_loss": round(loss, 6),
    }
    if mfu is not None:
        out["train_step_mfu"] = round(mfu, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
