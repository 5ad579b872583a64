"""MPC planner sweep (round-3 VERDICT #1): make planning demonstrably
work beyond gridworld, or prove the bound.

Arms, per environment bundle:
  * the reference recipe (lookahead 2, depth 12, noop tail, tradeoff 10 —
    reference main.py:455-489)
  * deeper/wider beams the compiled planner can afford (lookahead 3,
    depth 16-24)
  * the compiled 1-step-greedy tail (agent/mpc.py)
  * Monte-Carlo plan scoring (--mpc-samples)
  * tradeoff variants — in pos/neg-split envs channel 0 is POSITIVE, so
    the reference's x10 is greed; 0.1 is death-averse caution
  * a random-policy baseline under the same episode protocol
  * the beam-oracle control (true dynamics as simulator, agent/oracle.py)
    — separates "model binds" from "planner structure binds"

Writes runs/mpc_sweep_<env>.json with per-arm episode scores and
mean +- stderr.  Run on the TPU (no conftest CPU forcing applies here).

Usage:
    python scripts/mpc_sweep.py --env minipacman \
        --bundle pretrained_models/minipacman_cf [--episodes 10] \
        [--arms ref,greedy,...] [--skip-oracle]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("SCMGAN_FORCE_CPU"):
    # JAX_PLATFORMS=cpu is too late here: the image's sitecustomize
    # registers the axon TPU plugin at interpreter startup.  An explicit
    # config update before the first backend use is what wins (same
    # trick as tests/conftest.py) — used to run the cheap random
    # baseline on CPU in parallel with TPU planner arms.
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()


ARMS = {
    # name: kwargs for play()
    "ref": dict(lookahead=2, rollout_depth=12),
    "l3": dict(lookahead=3, rollout_depth=12),
    "d20": dict(lookahead=2, rollout_depth=20),
    "d30": dict(lookahead=2, rollout_depth=30),
    "greedy": dict(lookahead=2, rollout_depth=12, rollout_policy="greedy"),
    "greedy_d20": dict(lookahead=2, rollout_depth=20,
                       rollout_policy="greedy"),
    "greedy_d30": dict(lookahead=2, rollout_depth=30,
                       rollout_policy="greedy"),
    "l3_greedy": dict(lookahead=3, rollout_depth=16,
                      rollout_policy="greedy"),
    "mc8": dict(lookahead=2, rollout_depth=12, rollout_samples=8),
    "mc16": dict(lookahead=2, rollout_depth=12, rollout_samples=16),
    "greedy_mc8": dict(lookahead=2, rollout_depth=12,
                       rollout_policy="greedy", rollout_samples=8),
    "caution": dict(lookahead=2, rollout_depth=12,
                    negative_positive_tradeoff=0.1),
    "neutral": dict(lookahead=2, rollout_depth=12,
                    negative_positive_tradeoff=1.0),
    "greedy_caution": dict(lookahead=2, rollout_depth=12,
                           rollout_policy="greedy",
                           negative_positive_tradeoff=0.1),
}


def play_random(spec, max_steps=300, seed=0):
    """Random-policy baseline under the play() episode protocol
    (3 no-op seed steps then <= max_steps random actions)."""
    from scmgan_tpu.envs.base import HostEnv

    env = HostEnv(spec, seed=seed)
    rng = np.random.default_rng(seed)
    no_op = 3 % spec.num_actions
    env.reset()
    env.step(no_op)
    env.step(no_op)
    cum, t, done = 0.0, 2, False
    while not done:
        _, r, done, _ = env.step(int(rng.integers(spec.num_actions)))
        cum += r
        t += 1
        if t > max_steps:
            break
    return cum, t


def summarize(scores, seeds=None):
    """Per-arm record.  ``seeds`` tags each episode with its identity so
    merge_sweeps.py can refuse overlapping reruns (ADVICE r4 "high": a
    seed0=0 power-up once duplicated the original sweep's episodes
    verbatim into the tracked JSON).  Device-mode episodes are tagged
    with their integer env seed; host-mode episodes with
    "ds<seed0>+<idx>" — the datasource key chain, not seed0+idx, draws
    their env seeds, so (seed0, idx) is the reproducible identity."""
    a = np.asarray(scores, np.float64)
    rec = {
        "episodes": [float(x) for x in a],
        "mean": float(a.mean()),
        "std": float(a.std(ddof=1)) if len(a) > 1 else 0.0,
        "stderr": float(a.std(ddof=1) / np.sqrt(len(a))) if len(a) > 1
        else 0.0,
        "n": len(a),
    }
    if seeds is not None:
        rec["seeds"] = list(seeds)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--random-episodes", type=int, default=30)
    ap.add_argument("--max-steps", type=int, default=300)
    ap.add_argument("--arms", type=str, default=None,
                    help="comma-separated arm names (default: all)")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="run each arm's episodes as ONE compiled "
                         "on-device program (agent/play_device.py) "
                         "instead of the host play loop — identical "
                         "protocol, pinned by tests/test_play_device.py; "
                         "~2 orders of magnitude less wall-clock on a "
                         "remote-attached chip")
    ap.add_argument("--episodes-per-call", type=int, default=10,
                    help="device mode: episode batch per program call "
                         "(memory knob; the beam is episodes x width "
                         "wide)")
    ap.add_argument("--seed0", type=int, default=0,
                    help="first episode seed; also seeds the datasource "
                         "env chain, so N parallel sweep processes with "
                         "disjoint seed0 ranges produce independent "
                         "episodes (host play is tunnel-latency-bound — "
                         "parallel processes overlap the latency)")
    ap.add_argument("--oracle-samples", type=int, default=4)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from scmgan_tpu.agent.oracle import play_oracle
    from scmgan_tpu.agent.play import play
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.train import checkpoint as ckpt

    ds = allocate_datasource(args.env, seed=args.seed0)
    spec = ds.spec
    wm = init_world_model(
        jax.random.PRNGKey(0), 16, ds.binary_input_channels,
        ds.scalar_output_channels, ds.conv_input_channels,
        ds.conv_output_channels, img_size=spec.height)
    wm = ckpt.load_model(args.bundle, wm)

    out_path = args.out or f"runs/mpc_sweep_{args.env}.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    results = {"env": args.env, "bundle": args.bundle,
               "max_steps": args.max_steps, "arms": {}}

    def flush():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    # random baseline (cheap: more episodes for a tight error bar).
    # --random-episodes 0 skips it (e.g. when the baseline is computed in
    # a parallel CPU process — the env dynamics are identical on any
    # backend — and merged into the sweep JSON afterwards).
    if args.random_episodes > 0:
        t0 = time.time()
        rand_seeds = [1000 + args.seed0 + i
                      for i in range(args.random_episodes)]
        rand_scores = [play_random(spec, args.max_steps, seed=s)[0]
                       for s in rand_seeds]
        results["arms"]["random"] = summarize(rand_scores, seeds=rand_seeds)
        print(f"random: {results['arms']['random']['mean']:+.2f} "
              f"+- {results['arms']['random']['stderr']:.2f} "
              f"({time.time() - t0:.0f}s)")
        flush()

    arm_names = ([] if args.arms == "none"
                 else args.arms.split(",") if args.arms else list(ARMS))
    for name in arm_names:
        kw = ARMS[name]
        scores = []
        seeds = []
        t0 = time.time()
        # keep each arm's evaluation_metrics_*.txt score files so the
        # winning arm's can be copied into the tracked bundle without
        # re-running the episodes
        arm_dir = os.path.join(os.path.dirname(out_path) or ".",
                               f"mpc_scores_{args.env}", name)
        os.makedirs(arm_dir, exist_ok=True)
        use_device = args.device
        if use_device:
            from scmgan_tpu.agent.play_device import fits_on_device

            if not fits_on_device(spec, spec.num_actions, **kw):
                print(f"{name}: single-episode beam exceeds the device "
                      f"lane-step budget — running this arm on the host "
                      f"loop instead")
                use_device = False
        if use_device:
            from scmgan_tpu.agent.play_device import play_on_device

            for ep0 in range(0, args.episodes, args.episodes_per_call):
                n = min(args.episodes_per_call, args.episodes - ep0)
                rs, _ = play_on_device(
                    wm, ds, episodes=n, max_steps=args.max_steps,
                    out_dir=arm_dir, verbose=False,
                    seed0=args.seed0 + ep0, **kw)
                scores.extend(rs)
                seeds.extend(range(args.seed0 + ep0, args.seed0 + ep0 + n))
        else:
            for ep in range(args.episodes):
                r, _ = play(wm, ds, max_steps=args.max_steps,
                            out_dir=arm_dir, verbose=False,
                            seed=args.seed0 + ep, **kw)
                scores.append(r)
                seeds.append(f"ds{args.seed0}+{ep}")
        results["arms"][name] = dict(summarize(scores, seeds=seeds),
                                     config=str(kw))
        print(f"{name}: {results['arms'][name]['mean']:+.2f} "
              f"+- {results['arms'][name]['stderr']:.2f} "
              f"episodes={scores} ({time.time() - t0:.0f}s)")
        flush()

    if not args.skip_oracle:
        for oname, okw in [
            ("oracle_ref", dict(lookahead=2, rollout_depth=12)),
            ("oracle_deep", dict(lookahead=3, rollout_depth=20)),
        ]:
            scores = []
            seeds = []
            t0 = time.time()
            if args.device:
                from scmgan_tpu.agent.oracle import play_oracle_on_device

                for ep0 in range(0, args.episodes, args.episodes_per_call):
                    n = min(args.episodes_per_call, args.episodes - ep0)
                    rs, _ = play_oracle_on_device(
                        spec, episodes=n, max_steps=args.max_steps,
                        samples=args.oracle_samples,
                        seed0=args.seed0 + ep0, verbose=False, **okw)
                    scores.extend(rs)
                    seeds.extend(range(args.seed0 + ep0,
                                       args.seed0 + ep0 + n))
            else:
                for ep in range(args.episodes):
                    r, _ = play_oracle(spec, max_steps=args.max_steps,
                                       samples=args.oracle_samples,
                                       seed=args.seed0 + ep, **okw)
                    scores.append(r)
                    seeds.append(args.seed0 + ep)
            results["arms"][oname] = dict(summarize(scores, seeds=seeds),
                                          config=str(okw))
            print(f"{oname}: {results['arms'][oname]['mean']:+.2f} "
                  f"+- {results['arms'][oname]['stderr']:.2f} "
                  f"episodes={scores} ({time.time() - t0:.0f}s)")
            flush()

    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
