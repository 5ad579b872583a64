#!/usr/bin/env python
"""Measure the serving decoder's wall-time share at student widths.

BENCH_NOTES (round 2) measured the bf16 decoder chain at 0.89 ms/step
(~12% of wall) at the h128 teacher.  At h48 the transition is ~13x
cheaper, so the decoder's fixed cost is a much larger fraction — this
script isolates it: free-run throughput with the decoder vs transition
only, at each tracked student width.  Checkpoints: student transitions
load their tracked bundles; the decoder and the h128 transition are
randomly initialized (throughput is weight-value-independent — the
program, shapes, and dtypes are what is being timed).

Usage: python scripts/bench_decoder_share.py [h48 h64 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache(default_dir="/tmp/jax_bench_cache", min_compile_secs=1.0)

from scmgan_tpu.envs import get_env
from scmgan_tpu.models import decode_fused, init_world_model
from scmgan_tpu.models.quantized import quantize_transition, transition_int8_v2
from scmgan_tpu.models.world_model import init_transition
from scmgan_tpu.train.checkpoint import load_pytree

BATCH, STEPS = 256, 64


def measure(hidden: int, decode_mode: str) -> float:
    """decode_mode: 'xla' (decode_fused), 'pallas' (fused_decode kernel),
    or 'none' (transition only)."""
    spec = get_env("minipacman")
    latent = 16
    key = jax.random.PRNGKey(0)
    params = init_world_model(
        key, latent, spec.num_actions, spec.num_rewards, spec.channels,
        spec.channels, img_size=spec.height)
    dec = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params.decoder)
    if hidden == 128:
        qt = quantize_transition(params.transition)
    else:
        npz = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"pretrained_models/minipacman_student_h{hidden}/"
            "model-transition.npz")
        tmpl = init_transition(key, latent, spec.num_actions, hidden=hidden)
        qt = quantize_transition(load_pytree(npz, tmpl))
    z0 = (jax.random.uniform(key, (BATCH, spec.height, spec.width, latent))
          > 0.5).astype(jnp.int8)
    actions = jax.nn.one_hot(
        jax.random.randint(key, (STEPS, BATCH), 0, spec.num_actions),
        spec.num_actions, dtype=jnp.bfloat16)

    if decode_mode == "pallas":
        from scmgan_tpu.ops.pallas.fused_decoder import (
            fused_decode_packed,
            pack_decoder_weights,
        )

        # pack once outside the scan: keeps the flip/sum/pad ops out of
        # the loop-body HLO so only the kernel itself is timed
        packed = pack_decoder_weights(dec, latent)

    @jax.jit
    def free_run(z0, actions):
        def step(z, a):
            z = transition_int8_v2(qt, z, a)
            if decode_mode == "xla":
                frame = jax.nn.sigmoid(decode_fused(dec, z.astype(jnp.bfloat16)))
            elif decode_mode == "pallas":
                frame = jax.nn.sigmoid(fused_decode_packed(packed, z))
            else:
                return z, jnp.sum(z, dtype=jnp.float32)
            return z, jnp.sum(frame, dtype=jnp.float32)

        _, s = jax.lax.scan(step, z0, actions)
        return jnp.sum(s)

    float(free_run(z0, actions))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(free_run(z0, actions))
        best = min(best, time.perf_counter() - t0)
    return BATCH * STEPS / best


def main():
    widths = [int(w.lstrip("h")) for w in sys.argv[1:]] or [48]
    for h in widths:
        full = measure(h, "xla")
        fused = measure(h, "pallas")
        trans = measure(h, "none")
        ms_full = BATCH / full * 1e3
        ms_fused = BATCH / fused * 1e3
        ms_trans = BATCH / trans * 1e3
        print(json.dumps({
            "hidden": h,
            "fps_xla_decode": round(full, 1),
            "fps_pallas_decode": round(fused, 1),
            "fps_transition_only": round(trans, 1),
            "ms_per_step": {"xla": round(ms_full, 3),
                            "pallas": round(ms_fused, 3),
                            "transition_only": round(ms_trans, 3)},
            "decoder_ms_xla": round(ms_full - ms_trans, 3),
            "decoder_ms_pallas": round(ms_fused - ms_trans, 3),
            "decoder_share_pct_xla": round(
                100 * (ms_full - ms_trans) / ms_full, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
