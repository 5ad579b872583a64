#!/usr/bin/env python
"""Train-step time breakdown: where do the milliseconds go?

Times, as separate jitted programs on the real device:
  collect   — on-device env trajectory collection
  forward   — loss forward only
  fwd+bwd   — value_and_grad of the loss
  optimizer — Adam update + apply
  sn        — spectral-norm u/v refresh
  full      — the production train step (everything fused in one program)

plus XLA's flop count per program, so the dominant term and its achieved
TFLOP/s are explicit.  Usage:
  python scripts/profile_train_step.py [--env pong] [--batch-size 32]
Prints one JSON line.
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
import optax

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()


def timed(fn, iters=30):
    """fn() must return a jax array.  Dispatches ``iters`` calls
    asynchronously and materializes only the last result: the axon
    tunnel's per-sync round-trip (~30 ms) would otherwise dominate every
    measurement of a small program."""
    out = fn()  # compile/warm
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def flops_of(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0))
    except Exception:
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.train.losses import world_model_loss
    from scmgan_tpu.train.trainer import (
        init_train_state,
        loss_config,
        make_optimizer,
        make_train_step,
    )
    from scmgan_tpu.models.world_model import WorldModel
    from scmgan_tpu.ops.spectral_norm import update_spectral_norms

    cfg = Config(env=args.env, batch_size=args.batch_size,
                 horizon_min=args.horizon, horizon_max=args.horizon)
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    state = init_train_state(cfg, ds.spec, key)
    lcfg = loss_config(cfg, args.horizon)
    opt = make_optimizer(cfg)

    batch = ds.collect(cfg.batch_size, args.horizon, key=key)
    batch = jax.tree.map(lambda x: x.copy(), batch)  # host-independent copy
    obs = batch[0].astype(cfg.cdtype)
    b2 = (obs, *batch[1:])
    theta, cfa = jnp.float32(0.5), jnp.float32(0.0)

    fwd = jax.jit(lambda p, b, k: world_model_loss(p, b, k, theta, cfa, lcfg))
    grad = jax.jit(jax.value_and_grad(
        lambda p, b, k: world_model_loss(p, b, k, theta, cfa, lcfg)[0]))

    g_example = grad(state.params, b2, key)[1]

    def opt_fn(g, os_, p):
        upd, os2 = opt.update(g, os_, p)
        return optax.apply_updates(p, upd), os2
    opt_j = jax.jit(opt_fn)

    sn_j = jax.jit(lambda p: WorldModel(*update_spectral_norms(p)))

    full = make_train_step(cfg, horizon=args.horizon)

    res = {}
    res["collect_ms"] = round(timed(
        lambda: ds.collect(cfg.batch_size, args.horizon, key=key)[0],
        args.iters) * 1e3, 2)

    res["forward_ms"] = round(timed(
        lambda: fwd(state.params, b2, key)[0], args.iters) * 1e3, 2)
    fg = flops_of(fwd, state.params, b2, key)
    res["forward_gflop"] = round(fg / 1e9, 1) if fg else None

    res["fwd_bwd_ms"] = round(timed(
        lambda: grad(state.params, b2, key)[0], args.iters) * 1e3, 2)
    gf = flops_of(grad, state.params, b2, key)
    res["fwd_bwd_gflop"] = round(gf / 1e9, 1) if gf else None
    if gf:
        res["fwd_bwd_tflops"] = round(gf / (res["fwd_bwd_ms"] / 1e3) / 1e12, 1)

    res["optimizer_ms"] = round(timed(
        lambda: opt_j(g_example, state.opt_state, state.params)[0]
        .transition["conv2"]["b"], args.iters) * 1e3, 2)

    res["sn_refresh_ms"] = round(timed(
        lambda: sn_j(state.params).transition["conv2"]["b"],
        args.iters) * 1e3, 2)

    st = [state]

    def run_full():
        s, m = full(st[0], batch, key, theta, cfa)
        st[0] = s
        return m["loss"]
    res["full_step_ms"] = round(timed(run_full, args.iters) * 1e3, 2)
    ff = flops_of(full, st[0], batch, key, theta, cfa)
    res["full_gflop"] = round(ff / 1e9, 1) if ff else None
    if ff:
        res["full_tflops"] = round(ff / (res["full_step_ms"] / 1e3) / 1e12, 1)

    res["metric"] = "train_step_breakdown"
    res["env"] = args.env
    res["batch"] = args.batch_size
    res["horizon"] = args.horizon
    print(json.dumps(res))


if __name__ == "__main__":
    main()
