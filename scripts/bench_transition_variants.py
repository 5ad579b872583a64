#!/usr/bin/env python
"""Free-run throughput of the serving-transition variants on the bench
workload (batch 256 x 64 steps, transition + decode per frame — the same
measurement as bench.py).  Each variant runs in a watchdogged subprocess
(a pathological compile can't hang the sweep) and prints one JSON line;
the parent prints a summary table line.

Usage: python scripts/bench_transition_variants.py [variant ...]
Variants: int8 ring ring_bf16 halo split bf16
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ALL = ["int8", "int8_v2", "int8_nodecode", "ring", "ring_bf16", "ring_qdec", "halo", "split", "bf16"]


def _measure(variant: str) -> None:
    import jax
    import jax.numpy as jnp

    from scmgan_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache()

    from scmgan_tpu.envs import get_env
    from scmgan_tpu.models import decode_fused as decode, init_world_model, transition
    from scmgan_tpu.models import quantized as q

    spec = get_env("pong")
    latent, batch, steps = 16, 256, 64
    cdt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    params = init_world_model(
        key, latent, spec.num_actions, spec.num_rewards, spec.channels,
        spec.channels, img_size=spec.height)
    params_c = jax.tree.map(
        lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params)
    z0 = (jax.random.uniform(key, (batch, spec.height, spec.width, latent))
          > 0.5).astype(cdt)
    actions = jax.nn.one_hot(
        jax.random.randint(key, (steps, batch), 0, spec.num_actions),
        spec.num_actions, dtype=cdt)

    qt = q.quantize_transition(params.transition)
    step_fns = {
        "bf16": lambda z, a: transition(params_c.transition, z, a,
                                        train=False),
        "int8": lambda z, a: q.transition_int8(qt, z, a),
        "int8_v2": lambda z, a: q.transition_int8_v2(qt, z, a),
        "ring": lambda z, a: q.transition_int8_ring(qt, z, a),
        "ring_bf16": lambda z, a: q.transition_int8_ring(
            qt, z, a, epilogue_dtype=jnp.bfloat16),
        "halo": lambda z, a: q.transition_int8_halo(qt, z, a),
        "split": lambda z, a: q.transition_int8_split(qt, z, a),
    }
    if variant == "int8_v2":
        z0 = z0.astype(jnp.int8)  # v2 carries binary latents as int8
    if variant == "int8_nodecode":
        # transition only — isolates the conv chain from the decoder
        @jax.jit
        def free_run(z0, actions):
            def step(z, a):
                z = q.transition_int8(qt, z, a)
                return z, jnp.sum(z, dtype=jnp.float32)

            _, s = jax.lax.scan(step, z0, actions)
            return jnp.sum(s)
    elif variant == "ring_qdec":
        # full-int8 serving: ring transition + int8 decoder, int8 carry
        qd = q.quantize_decoder(params.decoder)
        z0 = z0.astype(jnp.int8)

        @jax.jit
        def free_run(z0, actions):
            def step(z, a):
                z = q.transition_int8_ring(qt, z, a)
                frame = jax.nn.sigmoid(q.decode_int8(qd, z))
                return z, jnp.sum(frame, dtype=jnp.float32)

            _, s = jax.lax.scan(step, z0, actions)
            return jnp.sum(s)
    else:
        tfn = step_fns[variant]

        @jax.jit
        def free_run(z0, actions):
            def step(z, a):
                z = tfn(z, a)
                frame = jax.nn.sigmoid(
                    decode(params_c.decoder, z.astype(cdt)))
                return z, jnp.sum(frame, dtype=jnp.float32)

            _, s = jax.lax.scan(step, z0, actions)
            return jnp.sum(s)

    float(free_run(z0, actions))  # compile + warmup
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(free_run(z0, actions))
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"variant": variant, "fps": batch * steps / best}))


def main(variants):
    results = {}
    for v in variants:
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", v],
                capture_output=True, text=True, timeout=1200)
            line = out.stdout.strip().splitlines()[-1]
            results[v] = round(float(json.loads(line)["fps"]), 1)
        except Exception as e:  # noqa: BLE001
            results[v] = f"failed: {e}"
    print(json.dumps({"bench": "transition_variants", "results": results}))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--one":
        _measure(sys.argv[2])
    else:
        main(sys.argv[1:] or ALL)
