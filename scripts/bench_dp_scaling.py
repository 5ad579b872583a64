#!/usr/bin/env python
"""Data-parallel scaling efficiency on the virtual CPU mesh.

Times the steady-state sharded train step at dp = 1/2/4/8 with a fixed
global batch (weak-scaling per-device work shrinks; good dp scaling means
step time drops toward 1/N).  Virtual CPU devices share host cores, so the
absolute numbers are not TPU predictions — the point is that GSPMD emits a
genuinely parallel program with no serialization or replication bugs
(per-device HLO identical, collectives only for gradients).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/bench_dp_scaling.py [--iters 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

from scmgan_tpu.utils.compile_cache import setup_compile_cache

# CPU-mesh programs live in their own cache: they'd evict/pollute the TPU one
setup_compile_cache(default_dir="/root/repo/.jax_cache")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=5)
    args = ap.parse_args()

    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.parallel import make_mesh
    from scmgan_tpu.train.trainer import init_train_state, make_train_step

    cfg = Config(env="pong", batch_size=args.batch_size,
                 horizon_min=args.horizon, horizon_max=args.horizon,
                 train_iters=100, compute_dtype="float32")
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    batch = ds.collect(cfg.batch_size, args.horizon)

    results = {}
    for dp in (1, 2, 4, 8):
        if dp > jax.device_count():
            continue
        mesh = make_mesh((dp, 1), devices=jax.devices()[:dp])
        state = init_train_state(cfg, ds.spec, key)
        step = make_train_step(cfg, horizon=args.horizon,
                               mesh_and_rules=mesh)
        state, m = step(state, batch, key, jnp.float32(0.5),
                        jnp.float32(0.0))
        float(m["loss"])  # sync after compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, m = step(state, batch, key, jnp.float32(0.5),
                            jnp.float32(0.0))
        float(m["loss"])
        results[dp] = (time.perf_counter() - t0) / args.iters

    base = results.get(1)
    print(json.dumps({
        "metric": "dp_scaling_step_seconds",
        "global_batch": cfg.batch_size,
        "horizon": args.horizon,
        "step_s": {str(k): round(v, 4) for k, v in results.items()},
        "speedup_vs_dp1": {str(k): round(base / v, 2)
                           for k, v in results.items()} if base else {},
    }))


if __name__ == "__main__":
    main()
