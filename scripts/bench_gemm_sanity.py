#!/usr/bin/env python
"""GEMM sanity checks on this backend:

  * the per-call dispatch overhead of the axon remote-execution platform
    (which silently inflates any microbench that divides a short program's
    wall time by a small op count),
  * realizable big-GEMM throughput for int8 and bf16 `lax.dot`,
  * whether int8 GEMM via the conv emitter (1x1 conv) beats `lax.dot`,
  * the transition's hot 3x3 conv shape as a reference point.

Every measurement chains L iterations inside one jitted scan so the
dispatch overhead is amortized to <1%; timing is by value materialization
(BENCH_NOTES round-1 lesson: block_until_ready returns early here).

Usage: python scripts/bench_gemm_sanity.py
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


def timed_scan(step, x0, length, reps=3):
    """Seconds per step of `step`, amortized over `length` in-jit iters."""

    @jax.jit
    def run(x):
        y, _ = lax.scan(lambda c, _: (step(c), jnp.int32(0)),
                        x, None, length=length)
        return y

    float(jnp.sum(run(x0)).astype(jnp.float32))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0)).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best / length


def main():
    key = jax.random.PRNGKey(0)
    out = {"bench": "gemm_sanity"}

    # 0. dispatch overhead: a near-empty program, timed per call
    tiny = jnp.zeros((8, 128), jnp.float32)
    f0 = jax.jit(lambda x: x + 1.0)
    float(jnp.sum(f0(tiny)))
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        float(jnp.sum(f0(tiny)))
        best = min(best, time.perf_counter() - t0)
    out["dispatch_overhead_ms"] = round(best * 1e3, 2)

    tops = {}
    M, K, N = 8192, 2048, 2048
    flops = 2.0 * M * K * N

    # 1. int8 dot -> int32, chained via cheap int requant
    w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    x8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)

    def int8_gemm(x):
        acc = lax.dot(x, w8, preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    tops["int8_dot_8192x2048x2048"] = round(
        flops / timed_scan(int8_gemm, x8, 100) / 1e12, 1)

    # 2. same GEMM through the conv emitter (1x1 conv)
    xc = x8.reshape(128, 8, 8, K)
    wc = jax.random.randint(key, (1, 1, K, N), -127, 127, jnp.int8)

    def int8_conv_gemm(x):
        acc = lax.conv_general_dilated(
            x, wc, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        return (acc >> 8).astype(jnp.int8)

    tops["int8_1x1conv_8192x2048x2048"] = round(
        flops / timed_scan(int8_conv_gemm, xc, 100) / 1e12, 1)

    # 3. bf16 dot -> bf16
    wb = jax.random.normal(key, (K, N), jnp.bfloat16)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)

    def bf16_gemm(x):
        return lax.dot(x, wb, preferred_element_type=jnp.bfloat16)

    tops["bf16_dot_8192x2048x2048"] = round(
        flops / timed_scan(bf16_gemm, xb, 100) / 1e12, 1)

    # 4. the transition's hot conv, long-chain amortized
    B, H, W, C = 256, 64, 64, 128
    w33 = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)
    x33 = jax.random.randint(key, (B, H, W, C), -127, 127, jnp.int8)
    scale = jnp.full((C,), 0.001, jnp.float32)

    def conv33(x):
        acc = lax.conv_general_dilated(
            x, w33, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale
        y = jnp.where(y >= 0, y, 0.01 * y)
        return jnp.clip(jnp.round(y * 15.875), -127, 127).astype(jnp.int8)

    cf = 2.0 * B * H * W * 9 * C * C
    tops["int8_conv3x3_128_b256"] = round(
        cf / timed_scan(conv33, x33, 300) / 1e12, 1)

    out["tops"] = tops
    print(json.dumps(out))


if __name__ == "__main__":
    main()
