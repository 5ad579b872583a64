#!/usr/bin/env python
"""The definitive MXU ceiling probe: square 4096^3 GEMMs, 300 chained
in-jit iterations (dispatch overhead <0.1%), minimal chaining glue.
Establishes the chip's realizable int8 and bf16 peaks for BENCH_NOTES'
roofline analysis.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from jax import lax
from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

N, L = 4096, 300
flops = 2.0 * N * N * N

def timed(step, x0):
    @jax.jit
    def run(x):
        y, _ = lax.scan(lambda c, _: (step(c), jnp.int32(0)), x, None, length=L)
        return y
    float(jnp.sum(run(x0)).astype(jnp.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x0)).astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return flops * L / best / 1e12

key = jax.random.PRNGKey(0)
out = {"bench": "peak4096", "tops": {}}
w8 = jax.random.randint(key, (N, N), -127, 127, jnp.int8)
x8 = jax.random.randint(key, (N, N), -127, 127, jnp.int8)
out["tops"]["int8"] = round(timed(
    lambda x: (lax.dot(x, w8, preferred_element_type=jnp.int32) >> 8
               ).astype(jnp.int8), x8), 1)
wb = jax.random.normal(key, (N, N), jnp.bfloat16)
xb = jax.random.normal(key, (N, N), jnp.bfloat16)
out["tops"]["bf16"] = round(timed(
    lambda x: lax.dot(x, wb, preferred_element_type=jnp.bfloat16), xb), 1)
print(json.dumps(out))
