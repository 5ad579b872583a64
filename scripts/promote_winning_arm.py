"""Promote the winning MPC sweep arm's score files into a tracked bundle.

mpc_sweep.py keeps each arm's ``evaluation_metrics_*.txt`` files under
``<sweep_dir>/mpc_scores_<env>/<arm>/`` exactly so the winning arm's
10-episode record can ship in the bundle without re-running the episodes
(reference score-file protocol: main.py:397-399, aggregated by
scripts/print_metrics.sh).  Writes ``<bundle>/eval/`` plus an
``mpc_arm.json`` provenance note naming the winning arm and its config.

Model-only arms are eligible (random and the oracle_* controls are
excluded — they don't exercise the bundle's model).

Usage:
    python scripts/promote_winning_arm.py \
        --sweep runs/mpc_sweep_pong.json --bundle pretrained_models/pong_cf
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", required=True)
    ap.add_argument("--bundle", required=True)
    ap.add_argument("--arm", default=None,
                    help="override the argmax-mean arm choice")
    args = ap.parse_args()

    with open(args.sweep) as f:
        sweep = json.load(f)
    env = sweep["env"]
    eligible = {k: v for k, v in sweep["arms"].items()
                if k != "random" and not k.startswith("oracle")}
    if not eligible:
        raise SystemExit("no model arms in sweep")
    arm = args.arm or max(eligible, key=lambda k: eligible[k]["mean"])

    score_dir = os.path.join(os.path.dirname(args.sweep) or ".",
                             f"mpc_scores_{env}", arm)
    files = sorted(glob.glob(os.path.join(score_dir,
                                          "evaluation_metrics_*.txt")))
    if not files:
        raise SystemExit(f"no score files under {score_dir}")

    eval_dir = os.path.join(args.bundle, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    for old in glob.glob(os.path.join(eval_dir, "evaluation_metrics_*.txt")):
        os.remove(old)
    for f_ in files:
        shutil.copy2(f_, eval_dir)

    note = {
        "env": env,
        "winning_arm": arm,
        "config": eligible[arm].get("config"),
        "mean": eligible[arm]["mean"],
        "stderr": eligible[arm]["stderr"],
        "n": eligible[arm]["n"],
        "random_baseline": sweep["arms"].get("random", {}).get("mean"),
        "sweep": os.path.basename(args.sweep),
    }
    with open(os.path.join(eval_dir, "mpc_arm.json"), "w") as f:
        json.dump(note, f, indent=2)
    print(f"promoted arm '{arm}' ({len(files)} score files) -> {eval_dir}")
    print(json.dumps(note, indent=2))


if __name__ == "__main__":
    main()
