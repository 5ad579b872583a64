"""Spatial-Higgins sweep across the trained-model zoo.

Runs BOTH disentanglement protocols on every trained checkpoint whose env
defines a Higgins simulator (reference higgins.py:22-87 protocol;
runs/ zoo from scripts/run_round2_campaign.sh):

  * conv-sum    — the reference's conv protocol (sums |dz| over the latent
                  map's spatial dims; structurally blind to spatially-coded
                  factors, see README "Higgins root cause")
  * spatial     — higgins_metric_spatial (per-channel mass + centroid
                  moments; the location-aware extension)

Writes runs/higgins_zoo.json and prints a table.  Chance = 1/true_factors.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("SCMGAN_FORCE_CPU"):
    # sitecustomize registers the axon TPU plugin before env vars can
    # win; an explicit config update before first backend use does.
    jax.config.update("jax_platforms", "cpu")

from scmgan_tpu.utils.compile_cache import setup_compile_cache

# A fresh process otherwise recompiles every program over the axon
# tunnel (~5 min each) — the sweep is compile-bound.
setup_compile_cache()

from scmgan_tpu.analysis.higgins import (
    higgins_metric_conv,
    higgins_metric_spatial,
    make_encoder_fn,
)
from scmgan_tpu.config import Config
from scmgan_tpu.envs import get_env
from scmgan_tpu.train import checkpoint as ckpt
from scmgan_tpu.train.trainer import init_train_state

ZOO = [
    # tracked bundles (retrained round 3 on action-aligned rollouts)
    ("minipong", "pretrained_models/minipong_cf"),
    ("boxes", "pretrained_models/boxes_cf"),
    ("pong", "pretrained_models/pong_cf"),
    # round 5: the remaining flagships, via the new ground-truth factor
    # simulators (envs/gridworld.py, envs/minipacman.py)
    ("gridworld", "pretrained_models/gridworld_cf"),
    ("minipacman", "pretrained_models/minipacman_cf"),
    # ablation grid (5k iters, pong): does the counterfactual recipe
    # change spatial-factor identifiability vs plain BPTT / LO?
    ("pong", "runs/grid_bptt"),
    ("pong", "runs/grid_cf"),
    ("pong", "runs/grid_lo"),
    ("pong", "runs/grid_bptt_det"),
    ("pong", "runs/grid_cf_det"),
]


def main():
    # resume: completed rows from a prior (timed-out) sweep are kept
    results = {}
    if os.path.exists("runs/higgins_zoo.json"):
        with open("runs/higgins_zoo.json") as f:
            results = json.load(f)
    for env_name, run_dir in ZOO:
        if os.path.basename(run_dir) in results:
            print(f"-- {run_dir} already measured, skipping")
            continue
        if not os.path.isdir(run_dir):
            print(f"-- {run_dir} missing, skipping")
            continue
        spec = get_env(env_name)
        if spec.simulator is None:
            print(f"-- {env_name} has no simulator, skipping")
            continue
        cfg = Config(env=env_name)
        state = init_train_state(cfg, spec, jax.random.PRNGKey(0))
        state = ckpt.load_train_state(run_dir, state)
        enc = make_encoder_fn(state.params.encoder)
        # 500 probe-training iters = the reference protocol
        # (reference higgins.py:22,91)
        conv_acc = higgins_metric_conv(
            spec.simulator, spec.true_latent_dim, enc, cfg.latent_dim,
            train_iters=500)
        spatial_acc = higgins_metric_spatial(
            spec.simulator, spec.true_latent_dim, enc, cfg.latent_dim,
            train_iters=500)
        chance = 1.0 / spec.true_latent_dim
        results[os.path.basename(run_dir)] = {
            "env": env_name,
            "run": run_dir,
            "true_factors": spec.true_latent_dim,
            "chance": chance,
            "higgins_conv_sum": float(conv_acc),
            "higgins_spatial": float(spatial_acc),
        }
        print(f"{env_name:10s} {run_dir:22s} factors={spec.true_latent_dim} "
              f"chance={chance:.3f} conv-sum={conv_acc:.3f} "
              f"spatial={spatial_acc:.3f}")
        # write incrementally: a timeout keeps completed rows
        with open("runs/higgins_zoo.json", "w") as f:
            json.dump(results, f, indent=2)
    print("wrote runs/higgins_zoo.json")


if __name__ == "__main__":
    main()
