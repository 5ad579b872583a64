#!/usr/bin/env python
"""Environment simulation throughput (frames/sec of the on-device
vmap(scan(step)) rollout) for the pure-JAX env zoo.

Parity artifact for the reference's printed-but-never-recorded env
throughput numbers (reference envs/minipacman.py:186-188,
envs/atari.py:148-150, envs/centipede.py:96-114) — except the reference
steps envs one at a time on host CPU, while here the whole batched
rollout (step + render + auto-reset) is one compiled XLA program.

Usage: python scripts/bench_envs.py [--envs pong,minipacman,...]
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

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

DEFAULT_ENVS = "pong,minipong,minipacman,gridworld,gameoflife,boxes,roomba1"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", default=DEFAULT_ENVS)
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--timesteps", type=int, default=64)
    args = ap.parse_args()

    from scmgan_tpu.envs import get_env
    from scmgan_tpu.envs.base import rollout

    out = {"bench": "env_throughput", "batch": args.batch_size,
           "timesteps": args.timesteps, "frames_per_sec": {}}
    key = jax.random.PRNGKey(0)
    for name in args.envs.split(","):
        spec = get_env(name)
        run = jax.jit(lambda k, spec=spec: rollout(
            spec, k, args.batch_size, args.timesteps))
        obs, *_ = run(key)          # compile + warmup
        float(obs.sum())
        best = float("inf")
        for i in range(3):
            k = jax.random.fold_in(key, i)
            t0 = time.perf_counter()
            obs, *_ = run(k)
            float(obs.sum())
            best = min(best, time.perf_counter() - t0)
        out["frames_per_sec"][name] = round(
            args.batch_size * args.timesteps / best, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
