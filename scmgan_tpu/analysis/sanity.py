"""Checkpoint sanity check — load a saved model and reconstruct one frame.

Standalone-script parity with the reference's ``visualize.py:30-65``,
which loads the five .pth files and writes a single reconstruction image.

Usage:
  python -m scmgan_tpu.analysis.sanity --env pong --load-from <dir>
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def sanity_check(load_from: str, env: str = "pong", out_dir: str = ".",
                 latent_dim: int = 16, seed: int = 0) -> str:
    from scmgan_tpu.analysis.video import save_image
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.models import decode, encode, init_world_model
    from scmgan_tpu.train.checkpoint import load_model

    ds = allocate_datasource(env, seed=seed)
    template = init_world_model(
        jax.random.PRNGKey(seed), latent_dim, ds.binary_input_channels,
        ds.scalar_output_channels, ds.conv_input_channels,
        ds.conv_output_channels, img_size=ds.spec.height)
    params = load_model(load_from, template)

    obs, *_ = ds.collect(1, 3)
    z = encode(params.encoder, obs[:, :3])
    recon = np.asarray(jax.nn.sigmoid(decode(params.decoder, z)))[0]
    actual = np.asarray(obs[0, 2])
    panel = np.concatenate([actual, recon], axis=1)
    path = os.path.join(out_dir, "sanity_reconstruction.png")
    save_image(panel, path, resize_to=(256, 512))
    print(f"Wrote {path}")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="pong")
    ap.add_argument("--load-from", required=True)
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--latent-dim", type=int, default=16)
    args = ap.parse_args()
    sanity_check(args.load_from, args.env, args.out_dir, args.latent_dim)


if __name__ == "__main__":
    main()
