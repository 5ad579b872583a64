#!/usr/bin/env python
"""Aggregate MSE-vs-horizon artifacts from several experiments into one
labeled comparison plot with stddev bands.

Generalizes the reference's hardcoded plot generators
(reference scripts/generate_mse_plot_pong.py:84-127,
generate_mse_plot_deterministic.py:20-67, generate_mse_plot_sc2.py:20-40),
which baked experiment-ID lists and NFS paths into the script; here each
series is ``--series LABEL:DIR[:ITER]`` pointing at a directory of
``mse_{pixel,reward}_iter_*.json`` artifacts.

Usage:
  python scripts/generate_mse_plot.py \
      --series "BPTT baseline:runs/a" --series "BPTT + LO:runs/b" \
      --metric pixel --out mse_comparison.png
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def find_artifact(directory: str, metric: str, train_iter=None):
    if train_iter is not None:
        mean_f = os.path.join(directory, f"mse_{metric}_iter_{int(train_iter):06d}.json")
        std_f = os.path.join(directory, f"mse_stddev_{metric}_iter_{int(train_iter):06d}.json")
        return mean_f, std_f
    means = sorted(glob.glob(os.path.join(directory, f"mse_{metric}_iter_*.json")))
    if not means:
        raise FileNotFoundError(f"no mse_{metric}_iter_*.json in {directory}")
    mean_f = means[-1]  # latest iteration
    std_f = mean_f.replace(f"mse_{metric}_", f"mse_stddev_{metric}_")
    return mean_f, std_f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--series", action="append", required=True,
                    help="LABEL:DIR[:ITER]")
    ap.add_argument("--metric", default="pixel", choices=["pixel", "reward"])
    ap.add_argument("--out", default="mse_comparison.png")
    ap.add_argument("--title", default="Prediction Error vs. Time")
    ap.add_argument("--max-horizon", type=int, default=None)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for spec in args.series:
        parts = spec.split(":")
        label, directory = parts[0], parts[1]
        train_iter = parts[2] if len(parts) > 2 else None
        mean_f, std_f = find_artifact(directory, args.metric, train_iter)
        mean = np.asarray(json.load(open(mean_f)))
        try:
            err = np.asarray(json.load(open(std_f)))
        except FileNotFoundError:
            err = np.zeros_like(mean)
        if args.max_horizon:
            mean, err = mean[: args.max_horizon], err[: args.max_horizon]
        x = np.arange(len(mean))
        (line,) = ax.plot(x, mean, label=label)
        ax.fill_between(x, mean - err, mean + err, alpha=0.2,
                        color=line.get_color())

    ax.set_title(args.title)
    ax.grid(True)
    ax.set_ylim(bottom=0)
    ax.set_ylabel("MSE")
    ax.set_xlabel("Prediction horizon (timesteps)")
    ax.legend()
    fig.savefig(args.out, dpi=120)
    print(f"Wrote {args.out}")


if __name__ == "__main__":
    main()
