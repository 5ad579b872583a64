#!/usr/bin/env python
"""Training-MFU ceiling decomposition (round-4 VERDICT #8 stretch).

The train step runs at ~51% MFU (84 TF/s of the chip's measured 166
TF/s bf16 peak; BENCH_NOTES "MFU correction").  This script answers
whether that is scheduling overhead (fixable) or the SHAPE MIX (a
ceiling): it measures each component of the per-scan-step work as a
standalone fwd+bwd program at its exact in-step shapes —

  transition   (the hot 128-ch convs, batch B)
  lo_advance   (the S*B-batch transition with the forced remat)
  decoder      (per-factor small-channel convs)
  reward       (VALID small convs)
  encoder      (3-frame stack, small channels)

— takes each component's XLA-counted FLOPs and measured TF/s, and
computes the FLOP-weighted attainable rate of the mix
(sum f_i / sum f_i/r_i, the harmonic composition: what a perfect
scheduler could reach running these exact programs back to back).
If attainable ~= the measured in-step rate, 51% is the mix ceiling;
the difference is what scheduling/fusion work could still buy.

Run on an idle chip.  Usage:
    python scripts/profile_mfu_ceiling.py [--env pong] [--batch-size 32]
Prints one JSON line; results recorded in BENCH_NOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()


def timed(fn, iters=30):
    out = fn()
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def flops_of(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.models.world_model import (
        decode,
        encode,
        predict_reward,
        transition,
    )
    from scmgan_tpu.train.trainer import init_train_state

    cfg = Config(env=args.env, batch_size=args.batch_size,
                 horizon_min=args.horizon, horizon_max=args.horizon)
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    p = state.params

    B = args.batch_size
    H = W = ds.spec.height
    L = 16
    A = ds.binary_input_channels
    S = args.horizon  # LO slot count ~ horizon window
    cdt = cfg.cdtype

    obs, _, _, _ = ds.collect(B, 3, key=key)
    obs = obs.astype(cdt)
    z = encode(p.encoder, obs[:, 0:3])
    a_oh = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), A, dtype=cdt)
    z_lo = jnp.tile(z, (S, 1, 1, 1))
    a_lo = jnp.tile(a_oh, (S, 1))

    # fwd+bwd per component: grad wrt params of a scalar readout — the
    # same work profile as each component contributes inside the loss.
    def g(fn):
        return jax.jit(jax.grad(lambda pp, *xs: jnp.sum(
            fn(pp, *xs).astype(jnp.float32))))

    trans_fn = lambda pp, zz, aa, kk: transition(pp, zz, aa, kk, train=True)
    lo_fn = lambda pp, zz, aa, kk: jax.checkpoint(
        lambda q, x, a, k: transition(q, x, a, k, train=True))(pp, zz, aa, kk)
    dec_fn = lambda pp, zz: decode(pp, zz)
    rew_fn = lambda pp, zz: predict_reward(pp, zz)
    enc_fn = lambda pp, oo: encode(pp, oo)

    comps = {}
    for name, fn, params, xs in [
        ("transition", trans_fn, p.transition, (z, a_oh, key)),
        ("lo_advance", lo_fn, p.transition, (z_lo, a_lo, key)),
        ("decoder", dec_fn, p.decoder, (z,)),
        ("reward", rew_fn, p.reward_predictor, (z,)),
        ("encoder", enc_fn, p.encoder, (obs[:, 0:3],)),
    ]:
        jg = g(fn)
        ms = timed(lambda jg=jg, params=params, xs=xs:
                   jax.tree.leaves(jg(params, *xs))[0], args.iters) * 1e3
        fl = flops_of(jg, params, *xs)
        comps[name] = {"ms": round(ms, 3), "gflop": round(fl / 1e9, 2),
                       "tflops": round(fl / (ms / 1e3) / 1e12, 1)}
        print(f"{name:12s} {ms:8.2f} ms  {fl/1e9:8.2f} GF  "
              f"{fl/(ms/1e3)/1e12:6.1f} TF/s", flush=True)

    # Ceiling framing.  Two methodology caveats make a naive
    # FLOP-weighted mix composition misleading: (a) sub-ms standalone
    # programs (decoder 19 GF, reward 2.5 GF) are DISPATCH-bound, so
    # their standalone TF/s wildly understates their fused in-step
    # rate; (b) per-step occurrence counts depend on which losses are
    # active.  The robust statement is simpler: the step's FLOPs are
    # dominated by the transition conv stack (and its LO/S*B-batch
    # variant), whose STANDALONE fwd+bwd rate at the exact in-step
    # shapes is the shape-imposed ceiling — no scheduler can run the
    # step faster than its dominant component runs alone.
    hot = max(comps["transition"]["tflops"], comps["lo_advance"]["tflops"])
    result = {
        "env": args.env, "batch": B, "horizon": args.horizon,
        "components": comps,
        "shape_ceiling_tflops": hot,
        "note": "shape_ceiling = the dominant (transition-family) "
                "component's standalone fwd+bwd rate at in-step shapes; "
                "compare BENCH_NOTES' measured in-step 84 TF/s. Small "
                "components' standalone rates are dispatch-bound and "
                "not meaningful.",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
