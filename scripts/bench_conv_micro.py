#!/usr/bin/env python
"""Stage-by-stage decomposition of one ring-conv layer at bench shape
(B=256, 64x64, 128->128 int8): SAME conv alone, + epilogue, + border
strips, + the dynamic-update-slices.  Isolates whether the DUS ring
update costs a full-tensor copy (the main risk of the pad-free rewrite).

Chains state through a scan so loop-invariant CSE can't fake the numbers
(BENCH_NOTES round-1 lesson #3); syncs by value materialization.

Usage: python scripts/bench_conv_micro.py
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
B, H, W, C = 256, 64, 64, 128
STEPS = 300


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda v: v.block_until_ready(), out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out).astype(jnp.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out)
              .astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def main():
    key = jax.random.PRNGKey(0)
    w8 = jax.random.randint(key, (3, 3, C, C), -127, 127, jnp.int8)
    scale = jnp.full((C,), 0.001, jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    x0 = jax.random.randint(key, (B, H, W, C), -127, 127, jnp.int8)

    def epi(acc):
        y = acc.astype(jnp.float32) * scale + bias
        y = jnp.where(y >= 0, y, 0.01 * y)
        return jnp.clip(jnp.round(y * 15.875), -127, 127).astype(jnp.int8)

    def conv_same(x):
        return lax.conv_general_dilated(
            x, w8, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)

    def strips(x):
        rows_in = jnp.concatenate([
            jnp.concatenate([x[:, H - 1:], x[:, :2]], axis=1),
            jnp.concatenate([x[:, H - 2:], x[:, :1]], axis=1)], axis=0)
        rows_in = jnp.concatenate(
            [rows_in[:, :, W - 1:], rows_in, rows_in[:, :, :1]], axis=2)
        rows = epi(lax.conv_general_dilated(
            rows_in, w8, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.int32))
        cols_in = jnp.concatenate([
            jnp.concatenate([x[:, :, W - 1:], x[:, :, :2]], axis=2),
            jnp.concatenate([x[:, :, W - 2:], x[:, :, :1]], axis=2)], axis=0)
        cols_in = jnp.concatenate(
            [cols_in[:, H - 1:], cols_in, cols_in[:, :1]], axis=1)
        cols = epi(lax.conv_general_dilated(
            cols_in, w8, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.int32))
        return rows, cols

    variants = {}

    def scan_over(step):
        @jax.jit
        def run(x0):
            def body(x, _):
                return step(x), jnp.int32(0)
            y, _ = lax.scan(body, x0, None, length=STEPS)
            return y
        return run

    # 1. wrap-pad + VALID conv + fused epilogue (the round-1 formulation)
    def pad_step(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
        return epi(lax.conv_general_dilated(
            xp, w8, (1, 1), "VALID", dimension_numbers=DN,
            preferred_element_type=jnp.int32))
    variants["wrap_pad_conv"] = timed(scan_over(pad_step), x0)

    # 2. SAME conv + epilogue only (borders wrong; lower bound)
    def same_step(x):
        return epi(conv_same(x))
    variants["same_conv"] = timed(scan_over(same_step), x0)

    # 3. SAME conv + strips computed but thrown into the add (no DUS)
    def strip_nodus_step(x):
        y = epi(conv_same(x))
        rows, cols = strips(x)
        # fold strip values in without DUS (wrong result, isolates DUS cost)
        return y + rows[:B] * 0 + cols[:B, :, :1] * 0
    variants["same_plus_strips_nodus"] = timed(scan_over(strip_nodus_step), x0)

    # 4. full ring: SAME + strips + 4x DUS
    def ring_step(x):
        y = epi(conv_same(x))
        rows, cols = strips(x)
        y = lax.dynamic_update_slice(y, rows[:B], (0, 0, 0, 0))
        y = lax.dynamic_update_slice(y, rows[B:], (0, H - 1, 0, 0))
        y = lax.dynamic_update_slice(y, cols[:B], (0, 0, 0, 0))
        y = lax.dynamic_update_slice(y, cols[B:], (0, 0, W - 1, 0))
        return y
    variants["ring_full"] = timed(scan_over(ring_step), x0)

    flops = 2 * B * H * W * 9 * C * C
    out = {"bench": "conv_micro", "shape": [B, H, W, C],
           "ms_per_conv": {k: round(v * 1e3, 3) for k, v in variants.items()},
           "tops": {k: round(flops / v / 1e12, 1) for k, v in variants.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
