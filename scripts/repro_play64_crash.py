"""Bisect the 64x64 on-device-play worker fault (round-4 VERDICT #3).

History: agent/play_device.py compiles whole MPC episodes (beam planner
inside the episode scan) into one program.  On 16x16 envs and for
env-only oracle beams this is the production evaluation engine; round 4
recorded that 64x64 *model*-beam episode programs crashed the remote
TPU worker twice, and fell back to the host loop without measuring
where the boundary is (BENCH_NOTES) — even though one 466 s pong
device-arm run IS recorded, so the failure is size- or state-dependent,
not categorical.

This script maps the boundary: it runs `play_on_device` on the shipped
64x64 pong bundle over an escalating (episodes, max_steps, depth)
matrix, each config in its OWN subprocess with a timeout, and records
rc/wall/scores per config to runs/play64_crash_matrix.json.  A config
that kills the worker shows up as a non-zero rc (or timeout) without
taking the matrix down.

Usage:
    python scripts/repro_play64_crash.py              # run the matrix
    python scripts/repro_play64_crash.py --one --episodes 2 ...  # child
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MATRIX = [
    # (episodes, max_steps, depth, lookahead)
    (1, 25, 12, 2),
    (1, 300, 12, 2),
    (2, 300, 12, 2),
    (5, 300, 12, 2),
    (10, 300, 12, 2),
    (5, 300, 20, 2),
    (5, 300, 30, 2),
    (5, 300, 16, 3),
    # round-5 second pass: depth-dependence at low lane counts (the
    # first pass only proved 128 lanes pass at depth 12; a 128-lane
    # depth-20 sweep arm then crashed — the boundary scales with the
    # per-step transition count, i.e. lanes x (lookahead+1+depth))
    (1, 300, 20, 2),
    (2, 300, 20, 2),
    (1, 300, 30, 2),
    (1, 300, 16, 3),
    (3, 300, 12, 2),
]


def run_child(args):
    import jax

    from scmgan_tpu.agent.play_device import play_on_device
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.train import checkpoint as ckpt

    ds = allocate_datasource(args.env, seed=0)
    wm = init_world_model(
        jax.random.PRNGKey(0), 16, ds.binary_input_channels,
        ds.scalar_output_channels, ds.conv_input_channels,
        ds.conv_output_channels, img_size=ds.spec.height)
    wm = ckpt.load_model(args.bundle, wm)
    t0 = time.time()
    scores, steps = play_on_device(
        wm, ds, episodes=args.episodes, max_steps=args.max_steps,
        rollout_depth=args.depth, lookahead=args.lookahead,
        seed0=args.seed0, verbose=False)
    print(json.dumps({"scores": scores, "steps": steps,
                      "wall_s": round(time.time() - t0, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true")
    ap.add_argument("--env", default="pong")
    ap.add_argument("--bundle", default="pretrained_models/pong_cf")
    ap.add_argument("--episodes", type=int, default=1)
    ap.add_argument("--max-steps", type=int, default=300)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--lookahead", type=int, default=2)
    ap.add_argument("--seed0", type=int, default=0)
    ap.add_argument("--timeout", type=int, default=1500,
                    help="per-config subprocess timeout (compile over "
                         "the tunnel is ~5-6 min/program)")
    ap.add_argument("--out", default="runs/play64_crash_matrix.json")
    args = ap.parse_args()

    if args.one:
        return run_child(args)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    results = []
    if os.path.exists(args.out):
        results = json.load(open(args.out)).get("configs", [])
    done = {(r["episodes"], r["max_steps"], r["depth"], r["lookahead"])
            for r in results}
    for eps, steps, depth, la in MATRIX:
        if (eps, steps, depth, la) in done:
            continue
        cmd = [sys.executable, os.path.abspath(__file__), "--one",
               "--env", args.env, "--bundle", args.bundle,
               "--episodes", str(eps), "--max-steps", str(steps),
               "--depth", str(depth), "--lookahead", str(la)]
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout, cwd=REPO)
            rc, tail = p.returncode, (p.stdout + p.stderr)[-2000:]
        except subprocess.TimeoutExpired:
            rc, tail = "timeout", ""
        rec = {"episodes": eps, "max_steps": steps, "depth": depth,
               "lookahead": la, "rc": rc,
               "wall_s": round(time.time() - t0, 1), "tail": tail}
        results.append(rec)
        print(f"eps={eps} steps={steps} depth={depth} la={la} -> rc={rc} "
              f"({rec['wall_s']}s)", flush=True)
        with open(args.out, "w") as f:
            json.dump({"env": args.env, "bundle": args.bundle,
                       "configs": results}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
