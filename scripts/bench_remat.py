#!/usr/bin/env python
"""Remat-policy study for the BPTT training scan (SURVEY §5 long-context).

Compares the train step with and without rematerializing the transition's
conv activations in the backward pass, at the reference recipe (batch 32,
horizon 10):

  * measured step time (steady state)
  * XLA cost analysis (flops)
  * XLA memory analysis (argument + temp allocation high-water)

The LO/TD paths already remat their slot-advance and re-encode blocks
unconditionally (train/losses.py — required to fit HBM at horizon 10);
this script decides the policy for the *plain* scan, where activations fit
comfortably and remat is expected to lose (extra flops, no memory need).

Usage: python scripts/bench_remat.py [--horizon 10] [--batch-size 32]
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


def measure(cfg, horizon, ds, iters):
    from scmgan_tpu.train.trainer import init_train_state, make_train_step

    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    step = make_train_step(cfg, horizon=horizon)
    batch = ds.collect(cfg.batch_size, horizon)
    info = {}
    try:
        lowered = step.lower(state, batch, key, jnp.float32(0.5),
                             jnp.float32(0.0))
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        info["flops"] = float(ca.get("flops", 0.0))
        ma = compiled.memory_analysis()
        if ma is not None:
            info["temp_bytes"] = int(getattr(ma, "temp_size_in_bytes", 0))
    except Exception as e:
        info["analysis_error"] = str(e)[:100]

    state, m = step(state, batch, key, jnp.float32(0.5), jnp.float32(0.0))
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, key, jnp.float32(0.5),
                        jnp.float32(0.0))
    float(m["loss"])
    info["step_s"] = (time.perf_counter() - t0) / iters
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=10)
    args = ap.parse_args()

    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource

    out = {"metric": "train_remat_study", "env": args.env,
           "batch_size": args.batch_size, "horizon": args.horizon}
    ds = allocate_datasource(args.env)
    for name, remat in (("no_remat", False), ("remat_transition", True)):
        cfg = Config(env=args.env, batch_size=args.batch_size,
                     horizon_min=args.horizon, horizon_max=args.horizon,
                     train_iters=100, remat_transition=remat)
        info = measure(cfg, args.horizon, ds, args.iters)
        out[name] = {k: (round(v, 5) if isinstance(v, float) else v)
                     for k, v in info.items()}
    a, b = out["no_remat"], out["remat_transition"]
    if "step_s" in a and "step_s" in b:
        out["winner"] = "no_remat" if a["step_s"] <= b["step_s"] \
            else "remat_transition"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
