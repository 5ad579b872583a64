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


def summarize(scores, seeds=None):
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
    ap.add_argument("base")
    ap.add_argument("extra")
    ap.add_argument("--out", default=None)
    ap.add_argument("--allow-overlap", action="store_true",
                    help="merge even when episode seeds overlap "
                         "(overlapping episodes are DROPPED, not "
                         "duplicated)")
    args = ap.parse_args()

    with open(args.base) as f:
        base = json.load(f)
    with open(args.extra) as f:
        extra = json.load(f)
    assert base["env"] == extra["env"], "env mismatch"

    for name, arm in extra["arms"].items():
        if name in base["arms"]:
            barm = base["arms"][name]
            # Overlap guard (ADVICE r4 "high": a seed0=0 power-up once
            # pseudo-replicated the original episodes into the tracked
            # JSON).  Seeds identify episodes; without seeds on BOTH
            # sides we cannot prove independence, so refuse.
            bs, es = barm.get("seeds"), arm.get("seeds")
            if bs is None or es is None:
                raise SystemExit(
                    f"refusing to merge arm '{name}': episode seeds "
                    f"missing on {'base' if bs is None else 'extra'} "
                    f"side — independence unprovable. Re-run the sweep "
                    f"(it now records seeds) or merge by hand.")
            dup = [s for s in es if s in set(bs)]
            if dup:
                if not args.allow_overlap:
                    raise SystemExit(
                        f"refusing to merge arm '{name}': seeds "
                        f"{dup} already present in base — these would "
                        f"be duplicate episodes. Use disjoint --seed0 "
                        f"ranges, or --allow-overlap to drop them.")
                keep = [i for i, s in enumerate(es) if s not in set(bs)]
                print(f"{name}: dropping {len(dup)} overlapping "
                      f"episodes (seeds {dup})")
                arm = dict(arm,
                           episodes=[arm["episodes"][i] for i in keep],
                           seeds=[es[i] for i in keep])
            merged = barm["episodes"] + arm["episodes"]
            merged_seeds = bs + arm["seeds"]
            cfg = barm.get("config") or arm.get("config")
            base["arms"][name] = dict(summarize(merged, seeds=merged_seeds),
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
