"""Explain the Higgins pong row (round-4 VERDICT "Weak #3").

docs/higgins_zoo.json shows pong as the only env where the
location-aware spatial-moments metric (0.430) scores BELOW the
reference conv-sum protocol (0.492).  Two structural facts about the
pong Higgins simulator (envs/betterpong.py::simulator, replicating
reference envs/betterpong.py:140-172) explain the row:

  1. DEAD FACTORS: the nominal factor count is 6, but z[4] and z[5]
     (the velocities) never touch the scene — the simulator seeds
     vel_x and vel_y from z[0] (the reference's left_y quirk,
     envs/betterpong.py:164-165).  A pair "sharing factor 4" (or 5) is
     two INDEPENDENT scenes; no instrument can distinguish label 4
     from label 5, so the ceiling for ANY encoder is
     (4 x 1.0 + 2 x 0.5) / 6 = 0.833, and both metrics operate in a
     compressed range where their difference shrinks.
  2. SMALL-SAMPLE NOISE: the zoo row is one seed with a 128-sample
     test set (SE ~= 0.044 per metric) — a 0.06 gap is ~1 SE.

This script tests both: it reruns the two protocols over multiple
seeds (CI on the gap), and reruns them restricted to the 4 LIVE
factors (positions; dead labels removed), where the spatial metric
should separate decisively, as it does on every other env.

Usage:  SCMGAN_FORCE_CPU=1 python scripts/higgins_pong_anatomy.py
Writes  docs/higgins_pong_anatomy.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("SCMGAN_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

import numpy as np  # noqa: E402

from scmgan_tpu.analysis.higgins import (  # noqa: E402
    higgins_metric_conv,
    higgins_metric_spatial,
    make_encoder_fn,
)
from scmgan_tpu.data import allocate_datasource  # noqa: E402
from scmgan_tpu.envs import betterpong  # noqa: E402
from scmgan_tpu.models import init_world_model  # noqa: E402
from scmgan_tpu.train import checkpoint as ckpt  # noqa: E402

SEEDS = [0, 1, 2, 3, 4]


def live_factor_simulator(rng):
    """4-live-factor wrapper: pads the two dead velocity columns with
    fresh noise (they are ignored by the simulator either way)."""

    def sim(factors4):
        pad = rng.uniform(size=(factors4.shape[0], 2))
        return betterpong.simulator(
            np.concatenate([factors4, pad], axis=1))

    return sim


def mean_se(xs):
    a = np.asarray(xs, np.float64)
    return float(a.mean()), float(a.std(ddof=1) / np.sqrt(len(a)))


def main():
    ds = allocate_datasource("pong", seed=0)
    wm = init_world_model(
        jax.random.PRNGKey(0), 16, ds.binary_input_channels,
        ds.scalar_output_channels, ds.conv_input_channels,
        ds.conv_output_channels, img_size=ds.spec.height)
    wm = ckpt.load_model("pretrained_models/pong_cf", wm)
    enc_fn = make_encoder_fn(wm.encoder)

    results = {"bundle": "pretrained_models/pong_cf",
               "seeds": SEEDS,
               "ceiling_6_factor": (4 * 1.0 + 2 * 0.5) / 6}

    arms = {}
    for name, true_dim, sim_builder in [
        ("all6", 6, lambda rng: betterpong.simulator),
        ("live4", 4, live_factor_simulator),
    ]:
        conv_accs, spat_accs = [], []
        for s in SEEDS:
            rng = np.random.default_rng(10_000 + s)
            sim = sim_builder(rng)
            conv_accs.append(higgins_metric_conv(
                sim, true_dim, enc_fn, 16, seed=s))
            spat_accs.append(higgins_metric_spatial(
                sim, true_dim, enc_fn, 16, seed=s))
        cm, cse = mean_se(conv_accs)
        sm, sse = mean_se(spat_accs)
        gaps = [sp - cv for sp, cv in zip(spat_accs, conv_accs)]
        gm, gse = mean_se(gaps)
        arms[name] = {
            "true_factors": true_dim,
            "chance": 1.0 / true_dim,
            "conv_sum": {"mean": cm, "se": cse, "per_seed": conv_accs},
            "spatial": {"mean": sm, "se": sse, "per_seed": spat_accs},
            "spatial_minus_conv": {"mean": gm, "se": gse,
                                   "per_seed": gaps},
        }
        print(f"{name}: conv {cm:.3f}+-{cse:.3f}  spatial {sm:.3f}"
              f"+-{sse:.3f}  gap {gm:+.3f}+-{gse:.3f}")

    results["arms"] = arms
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "higgins_pong_anatomy.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
