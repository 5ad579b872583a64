"""Higgins disentanglement on the (regenerated) dSprites factor grid.

The reference ships a dSprites loader with a 4-factor Higgins simulator
(reference envs/dsprites.py:31-51,82-87) but never wires it into a
training run — dSprites has no dynamics, so there is no world model to
probe.  This script closes the protocol gap the TPU-native way: it trains
a plain autoencoder (this repo's Encoder + Decoder, BCE pixel loss) on
dSprites images, then reports the flat, conv-sum (reference
higgins.py:90-155) and spatial-moment Higgins scores of that encoder,
plus a random-init encoder baseline for scale.

Runs on CPU by default so it can share the machine with a TPU training
job (the nets are deliberately narrow).  Merges its row into
runs/higgins_zoo.json, the file behind docs/higgins_zoo.json.

Usage:
    python scripts/higgins_dsprites.py [--iters 1000] [--hidden 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scmgan_tpu.analysis.higgins import (
    higgins_metric,
    higgins_metric_conv,
    higgins_metric_spatial,
)
from scmgan_tpu.envs import dsprites
from scmgan_tpu.models.world_model import (
    decode,
    encode,
    init_decoder,
    init_encoder,
)

LATENT = 16


def make_ae_encoder_fn(enc_params):
    """dsprites.simulator yields (B, 64, 64); the encoder wants
    (B, F=3, H, W, C=1) — tile the single frame into the 3-frame window
    exactly like analysis.higgins.make_encoder_fn does for env renders."""

    @jax.jit
    def _enc(x):
        x = x[..., None]                       # (B, H, W, 1)
        x = jnp.repeat(x[:, None], 3, axis=1)  # (B, 3, H, W, 1)
        return encode(enc_params, x)

    return lambda images: _enc(jnp.asarray(images, jnp.float32))


def train_autoencoder(key, iters: int, batch_size: int, hidden: int,
                      lr: float = 1e-4):
    k_enc, k_dec = jax.random.split(key)
    enc = init_encoder(k_enc, LATENT, color_channels=1, hidden=hidden)
    dec = init_decoder(k_dec, LATENT, color_channels=1)
    params = {"enc": enc, "dec": dec}
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            frames = jnp.repeat(x[:, None], 3, axis=1)
            z = encode(p["enc"], frames)
            logits = decode(p["dec"], z)
            # BCE vs the binary sprite image (reference decoder loss,
            # main.py:189-197)
            return optax.sigmoid_binary_cross_entropy(logits, x).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for i in range(iters):
        imgs, _ = dsprites.get_batch(batch_size, rng)
        x = jnp.asarray(imgs[:, 0][..., None])  # (B, 64, 64, 1)
        params, opt_state, loss = step(params, opt_state, x)
        if i % 100 == 0 or i == iters - 1:
            print(f"ae iter {i:5d}  bce {float(loss):.5f}  "
                  f"({time.time() - t0:.1f}s)", flush=True)
    return params["enc"]


def measure(enc_params, train_iters: int = 500):
    enc_fn = make_ae_encoder_fn(enc_params)
    # latent map is 64x64x16 (stride-1 encoder) -> flat dim for the
    # reference's flat protocol (higgins.py:22-87)
    flat_dim = 64 * 64 * LATENT
    flat = higgins_metric(dsprites.simulator, dsprites.NUM_FACTORS, enc_fn,
                          flat_dim, train_iters=train_iters)
    conv = higgins_metric_conv(dsprites.simulator, dsprites.NUM_FACTORS,
                               enc_fn, LATENT, train_iters=train_iters)
    spatial = higgins_metric_spatial(dsprites.simulator,
                                     dsprites.NUM_FACTORS, enc_fn, LATENT,
                                     train_iters=train_iters)
    return flat, conv, spatial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--higgins-iters", type=int, default=500,
                    help="probe training iters (reference higgins.py:22)")
    ap.add_argument("--out", default="runs/higgins_zoo.json")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    print("== random-init encoder baseline ==", flush=True)
    rand_enc = init_encoder(key, LATENT, color_channels=1,
                            hidden=args.hidden)
    r_flat, r_conv, r_spatial = measure(rand_enc, args.higgins_iters)

    print("== training dsprites autoencoder ==", flush=True)
    enc = train_autoencoder(key, args.iters, args.batch_size, args.hidden)
    flat, conv, spatial = measure(enc, args.higgins_iters)

    row = {
        "env": "dsprites",
        "run": "autoencoder (this script)",
        "true_factors": dsprites.NUM_FACTORS,
        "chance": 1.0 / dsprites.NUM_FACTORS,
        "higgins_flat": float(flat),
        "higgins_conv_sum": float(conv),
        "higgins_spatial": float(spatial),
        "random_encoder_baseline": {
            "higgins_flat": float(r_flat),
            "higgins_conv_sum": float(r_conv),
            "higgins_spatial": float(r_spatial),
        },
        "ae_iters": args.iters,
        "hidden": args.hidden,
    }
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    results["dsprites_ae"] = row
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(row, indent=2))
    print(f"merged dsprites row into {args.out}")


if __name__ == "__main__":
    main()
