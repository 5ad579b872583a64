"""Merge MPC sweep JSONs: concatenate per-arm episode lists and recompute
the summary statistics.

Used to power up an arm with additional episodes run later (round-4
ref_power stage: the minipacman reference-recipe arm needed n>=30 to
resolve its margin over random at >=3 SE, round-3 VERDICT "Weak #4").

Usage:
    python scripts/merge_sweeps.py base.json extra.json [--out merged.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def summarize(scores):
    a = np.asarray(scores, np.float64)
    return {
        "episodes": [float(x) for x in a],
        "mean": float(a.mean()),
        "std": float(a.std(ddof=1)) if len(a) > 1 else 0.0,
        "stderr": float(a.std(ddof=1) / np.sqrt(len(a))) if len(a) > 1
        else 0.0,
        "n": len(a),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("extra")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    with open(args.base) as f:
        base = json.load(f)
    with open(args.extra) as f:
        extra = json.load(f)
    assert base["env"] == extra["env"], "env mismatch"

    for name, arm in extra["arms"].items():
        if name in base["arms"]:
            merged = base["arms"][name]["episodes"] + arm["episodes"]
            cfg = base["arms"][name].get("config") or arm.get("config")
            base["arms"][name] = dict(summarize(merged),
                                      **({"config": cfg} if cfg else {}))
        else:
            base["arms"][name] = arm

    # refresh provenance: bundles live in pretrained_models/ (round-3
    # VERDICT "Weak #5": a stale runs/ path in the tracked JSON)
    if extra.get("bundle"):
        base["bundle"] = extra["bundle"]

    out = args.out or args.base
    with open(out, "w") as f:
        json.dump(base, f, indent=2)
    for name, arm in sorted(base["arms"].items()):
        print(f"{name}: {arm['mean']:+.2f} +- {arm['stderr']:.2f} "
              f"(n={arm['n']})")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
