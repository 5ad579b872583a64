"""Width-scaling study for the distilled serving student.

Measures the int8 serving chain (transition_int8_v2 + fused bf16 decoder)
at several hidden widths with random weights — pure throughput, no
fidelity.  Answers "which student width clears the 50k north star on this
chip?" before spending distillation compute on it: MXU lane padding (128
lanes; int8 packs the contraction dim) can erase the nominal FLOP saving
of a narrower hidden, so the FLOP ratio alone is not evidence.

Usage:  python scripts/bench_student_width.py [--widths 64,96,104,112,128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--widths", default="64,96,104,112,128")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--reps", type=int, default=4)
    args = p.parse_args(argv)

    from scmgan_tpu.utils.compile_cache import setup_compile_cache

    setup_compile_cache(default_dir="/tmp/jax_bench_cache",
                        min_compile_secs=1.0)

    import jax
    import jax.numpy as jnp

    from scmgan_tpu.envs import get_env
    from scmgan_tpu.models import decode_fused, init_world_model
    from scmgan_tpu.models.quantized import (
        quantize_transition,
        transition_int8_v2,
    )
    from scmgan_tpu.models.world_model import init_transition

    spec = get_env("pong")
    latent, batch, steps = 16, args.batch, args.steps
    key = jax.random.PRNGKey(0)
    params = init_world_model(
        key, latent, spec.num_actions, spec.num_rewards, spec.channels,
        spec.channels, img_size=spec.height)
    dec_c = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params.decoder)
    z0 = (jax.random.uniform(key, (batch, spec.height, spec.width, latent))
          > 0.5).astype(jnp.int8)
    actions = jax.nn.one_hot(
        jax.random.randint(key, (steps, batch), 0, spec.num_actions),
        spec.num_actions, dtype=jnp.bfloat16)

    results = {}
    for hidden in [int(w) for w in args.widths.split(",")]:
        qt = quantize_transition(
            init_transition(key, latent, spec.num_actions, hidden=hidden))

        @jax.jit
        def free_run(z0, actions, qt=qt):
            def step(z, a):
                z = transition_int8_v2(qt, z, a)
                frame = jax.nn.sigmoid(decode_fused(dec_c,
                                                    z.astype(jnp.bfloat16)))
                return z, jnp.sum(frame, dtype=jnp.float32)

            _, s = jax.lax.scan(step, z0, actions)
            return jnp.sum(s)

        float(free_run(z0, actions))  # compile + warmup
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(free_run(z0, actions))
            best = min(best, time.perf_counter() - t0)
        fps = batch * steps / best
        results[hidden] = round(fps, 1)
        print(f"hidden {hidden:4d}: {fps:9.1f} frames/s", flush=True)

    print(json.dumps({"widths_fps": results, "batch": batch,
                      "steps": steps}))


if __name__ == "__main__":
    main()
