"""Standalone repro for the XLA:CPU many-programs crash (no repo imports).

Upstream-grade reduction of the failure that shaped this repo's test
protocol (scripts/run_tests.sh, tests/conftest.py): a single Python
process that JIT-compiles hundreds of DISTINCT XLA:CPU programs dies
with a C-level fault late in the sequence, while the same programs all
compile fine across several smaller processes.

Observed crash-mode matrix (round 4, jax 0.9.0, XLA:CPU, single
process, full 260-test suite — reproduced three ways):

    cache mode                     | failure at ~program 230
    -------------------------------+--------------------------------
    cold persistent cache + writes | `Fatal Python error: Aborted` in
                                   | put_executable_and_time /
                                   | executable serialize
    warm cache, read-only          | SIGSEGV on an AOT executable load
    cache disabled                 | SIGSEGV inside compilation

The common factor is the per-process count of compiled programs, not
the cache: with the suite split across 4 xdist workers (~65 programs
each) every mode is stable.  This script reproduces the profile
without any repo code: it compiles N distinct programs (distinct by
baked-in constants and varying shapes), optionally interleaving
"big" programs (a deep scanned conv stack, the shape of the programs
near the suite's crash point).

Usage (bound it — a successful repro is a process death):

    timeout 1200 python scripts/repro_xla_crash.py --programs 300
    # cache modes:
    #   default: no persistent cache
    #   --cache DIR: persistent cache at DIR (writes enabled)
    #   --cache DIR --read-only: warm read-only

Exit behavior: prints one line per 10 programs; a crash kills the
process mid-sequence (the last printed index bounds the threshold).
Completing all programs prints DONE — on machines/builds without the
bug this is the expected outcome.
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--programs", type=int, default=300)
    ap.add_argument("--big-every", type=int, default=12,
                    help="every K-th program is a deep scanned conv "
                         "stack instead of a trivial kernel (0 = never)")
    ap.add_argument("--big-depth", type=int, default=24)
    ap.add_argument("--cache", type=str, default=None)
    ap.add_argument("--read-only", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.cache:
        jax.config.update("jax_compilation_cache_dir", args.cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_raise_persistent_cache_errors", False)
        if args.read_only:
            import jax._src.compilation_cache as _cc

            _cc.put_executable_and_time = lambda *a, **k: None

    import jax.numpy as jnp
    import numpy as np

    def make_trivial(i):
        # Distinct by constant and by shape: a fresh executable each time.
        n = 8 + (i % 17)

        def f(x):
            return jnp.tanh(x * (i + 1) + jnp.arange(n, dtype=x.dtype))

        return jax.jit(f), np.ones((n,), np.float32)

    def make_big(i):
        # The shape of the programs near the suite's crash point: a
        # scanned NHWC conv stack with weights baked per-layer.
        depth = args.big_depth
        h = 16 + (i % 3) * 8

        def f(x, ws):
            def body(carry, w):
                y = jax.lax.conv_general_dilated(
                    carry, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return jnp.tanh(y), ()

            out, _ = jax.lax.scan(body, x, ws)
            return out.mean()

        x = np.ones((2, h, h, 8), np.float32)
        ws = np.full((depth, 3, 3, 8, 8), 0.01, np.float32)
        return jax.jit(f), (x, ws)

    for i in range(args.programs):
        big = args.big_every and (i % args.big_every == args.big_every - 1)
        if big:
            fn, a = make_big(i)
            out = fn(*a)
        else:
            fn, a = make_trivial(i)
            out = fn(a)
        jax.block_until_ready(out)
        if i % 10 == 9:
            print(f"compiled {i + 1}/{args.programs} "
                  f"({'big' if big else 'trivial'})", flush=True)
    print("DONE: all programs compiled and ran — no crash on this "
          "machine/build")


if __name__ == "__main__":
    sys.exit(main())
