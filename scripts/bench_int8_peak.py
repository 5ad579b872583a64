#!/usr/bin/env python
"""Establish the practical int8 compute ceiling of this chip, to decide
whether the 50k frames/s target is reachable by a better kernel or capped
by hardware/XLA throughput.

Measures (all steady-state, CSE-proofed by chaining state through a scan,
synced by value materialization):

  1. pure int8 GEMM peak at GEMM-friendly shapes (M large, K/N 128-mult)
  2. GEMM at the transition's effective shapes (K=1152, N=128)
  3. XLA int8 conv at the exact hot shape (3x3, 128->128, 64x64, B=256)
  4. the same conv with column taps folded into channels (kernel (3,1),
     K=384/tap, pre-augmented input): does a deeper contraction per tap
     raise the emitter's throughput?  (If yes, a Pallas kernel that builds
     the augmentation in VMEM is worth writing; if no, the emitter number
     IS the ceiling.)

Usage: python scripts/bench_int8_peak.py
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

DN = ("NHWC", "HWIO", "NHWC")
STEPS = 300


def timed_tops(make_step, x0, flops_per_step):
    @jax.jit
    def run(x0):
        def body(x, _):
            return make_step(x), jnp.int32(0)
        y, _ = lax.scan(body, x0, None, length=STEPS)
        return y

    float(jnp.sum(run(x0)).astype(jnp.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0)).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return flops_per_step * STEPS / best / 1e12


def main():
    key = jax.random.PRNGKey(0)
    out = {"bench": "int8_peak", "tops": {}}

    # 1/2. GEMMs: chain by requantizing the int32 result back to int8.
    for tag, (m, k, n) in {
        "gemm_8192x2048x2048": (8192, 2048, 2048),
        "gemm_65536x1152x128": (65536, 1152, 128),
        "gemm_65536x1152x256": (65536, 1152, 256),
        "gemm_1048576x128x128": (1048576, 128, 128),
    }.items():
        w = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        x0 = jax.random.randint(key, (m, k), -127, 127, jnp.int8)

        def gemm_step(x, w=w, m=m, k=k):
            acc = lax.dot(x, w, preferred_element_type=jnp.int32)
            q = (acc >> 8).astype(jnp.int8)  # cheap int requant
            # keep shape (m, k): tile/crop the (m, n) result
            reps = -(-k // q.shape[1])
            return jnp.tile(q, (1, reps))[:, :k]

        out["tops"][tag] = round(timed_tops(gemm_step, x0, 2 * m * k * n), 1)

    # 3. the hot conv shape itself
    B, H, W, C = 256, 64, 64, 128
    w33 = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)
    x0 = jax.random.randint(key, (B, H, W, C), -127, 127, jnp.int8)

    def conv_step(x):
        acc = lax.conv_general_dilated(
            x, w33, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    conv_flops = 2 * B * H * W * 9 * C * C
    out["tops"]["conv3x3_128_b256"] = round(
        timed_tops(conv_step, x0, conv_flops), 1)

    # 4. column-taps-in-channels formulation: (3,1) kernel over 3C channels
    w31 = jax.random.randint(key, (3, 1, 3 * C, C), -127, 127, jnp.int8)
    xa0 = jax.random.randint(key, (B, H, W, 3 * C), -127, 127, jnp.int8)

    def conv31_step(xa):
        acc = lax.conv_general_dilated(
            xa, w31, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        q = (acc >> 8).astype(jnp.int8)
        return jnp.concatenate([q, q, q], axis=-1)

    out["tops"]["conv3x1_384taps_b256"] = round(
        timed_tops(conv31_step, xa0, conv_flops), 1)

    # 5. bf16 GEMM reference point (is int8 really ~2x bf16 here?)
    m, k, n = 8192, 2048, 2048
    wb = jax.random.normal(key, (k, n), jnp.bfloat16)
    xb0 = jax.random.normal(key, (m, k), jnp.bfloat16)

    def bgemm_step(x):
        y = lax.dot(x, wb, preferred_element_type=jnp.float32)
        return y[:, :k].astype(jnp.bfloat16)

    out["tops"]["gemm_bf16_8192x2048x2048"] = round(
        timed_tops(bgemm_step, xb0, 2 * m * k * n), 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
