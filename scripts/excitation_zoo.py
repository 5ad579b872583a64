"""Generate excitation-BPTT "causal backtrack" videos from trained models.

Reference protocol (reference excitation_bptt.py:6-53): roll the trained
transition forward until a large expected reward, backprop the localized
reward map through the latent rollout, decode gradient-masked latents into
a reversed video of what caused the reward.  This script produces that
artifact for the trained checkpoints in runs/ — the interpretability
counterpart to the causal-graph PNGs already recorded there.

Usage:  SCMGAN_PLATFORM=cpu python scripts/excitation_zoo.py [env:run_dir ...]
Writes  runs/<name>/eval/excitation_bptt_*.mp4 and prints a summary line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("SCMGAN_PLATFORM"):
    # JAX_PLATFORMS is too late on this image (sitecustomize registers the
    # axon TPU plugin first); the config update before first device use wins.
    jax.config.update("jax_platforms", os.environ["SCMGAN_PLATFORM"])

from scmgan_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()

from scmgan_tpu.analysis.excitation_bptt import visualize_bptt
from scmgan_tpu.config import Config
from scmgan_tpu.data.datasource import allocate_datasource
from scmgan_tpu.models import encode
from scmgan_tpu.train import checkpoint as ckpt
from scmgan_tpu.train.trainer import init_train_state

ZOO = [
    ("gridworld", "runs/gridworld_cf"),
    ("pong", "runs/pong_cf"),
    ("minipacman", "runs/minipacman_cf"),
]


def run_one(env_name: str, run_dir: str, tries: int = 8):
    ds = allocate_datasource(env_name, seed=0)
    cfg = Config(env=env_name)
    state = init_train_state(cfg, ds.spec, jax.random.PRNGKey(0))
    state = ckpt.load_train_state(run_dir, state)
    out_dir = os.path.join(run_dir, "eval")
    os.makedirs(out_dir, exist_ok=True)
    # Different seeds give different start states + rollout actions; the
    # reference just retried manually until a reward fired.
    for seed in range(tries):
        obs, _, _, _ = ds.collect(1, 3, key=jax.random.PRNGKey(100 + seed))
        z0 = encode(state.params.encoder, obs[:, 0:3])
        path = visualize_bptt(state.params, z0, ds.binary_input_channels,
                              steps=30, out_dir=out_dir, seed=seed,
                              filename=f"excitation_bptt_seed{seed}.mp4")
        if path is not None:
            return path
    return None


def main():
    zoo = ZOO
    if len(sys.argv) > 1:
        zoo = [tuple(a.split(":", 1)) for a in sys.argv[1:]]
    results = {}
    for env_name, run_dir in zoo:
        if not os.path.isdir(run_dir):
            print(f"-- {run_dir} missing, skipping")
            continue
        path = run_one(env_name, run_dir)
        results[os.path.basename(run_dir)] = path
        print(f"{env_name:12s} {run_dir:22s} -> {path}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
