#!/usr/bin/env python
"""Headline benchmark: predicted 64x64 frames/sec/chip.

Measures the world model's free-run prediction throughput — transition +
decoder per predicted frame, eval mode, bf16 compute — the workload behind
the reference's measure_prediction_mse free-run (reference main.py:784-855)
and the MPC beam.  Target (BASELINE.md): >= 50,000 predicted 64x64
frames/sec/chip on TPU v5e.

Prints ONE JSON line:
  {"metric": "predicted_frames_per_sec", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 50000}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 50_000.0


def main():
    from scmgan_tpu.envs import get_env
    from scmgan_tpu.models import decode, init_world_model, transition

    spec = get_env("pong")  # 64x64x3 frames, 4 actions — flagship scale
    latent = 16
    batch = 256
    steps = 64
    cdtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    params = init_world_model(
        key, latent, spec.num_actions, spec.num_rewards, spec.channels,
        spec.channels, img_size=spec.height)
    params = jax.tree.map(
        lambda x: x.astype(cdtype) if x.dtype == jnp.float32 else x, params)

    z0 = (jax.random.uniform(key, (batch, spec.height, spec.width, latent),
                             cdtype) > 0.5).astype(cdtype)
    actions = jax.nn.one_hot(
        jax.random.randint(key, (steps, batch), 0, spec.num_actions),
        spec.num_actions, dtype=cdtype)

    @jax.jit
    def free_run(params, z0, actions):
        def step(z, a):
            z = transition(params.transition, z, a, train=False)
            frame = jax.nn.sigmoid(decode(params.decoder, z))
            return z, jnp.sum(frame, dtype=jnp.float32)

        _, sums = jax.lax.scan(step, z0, actions)
        return jnp.sum(sums)

    # compile + warmup.  NOTE: value materialization (float()) rather than
    # block_until_ready(): under the axon remote-execution platform
    # block_until_ready returns before the computation is actually done,
    # which inflates throughput ~1000x.  float() forces a device->host
    # transfer of the result and is an honest sync point.
    float(free_run(params, z0, actions))

    n_rounds = 5
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        float(free_run(params, z0, actions))
    dt = time.perf_counter() - t0

    frames = n_rounds * batch * steps
    fps = frames / dt
    print(json.dumps({
        "metric": "predicted_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


if __name__ == "__main__":
    main()
