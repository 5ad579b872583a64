#!/usr/bin/env python
"""CSRN demo: train SimpleFCN (conv + CSRN + conv) on a toy directional
segmentation task.

Parity with the reference's spatial_recurrent __main__
(reference spatial_recurrent.py:143-186), which teaches the network to
paint the regions below/left/right of an object different colors — a task
that *requires* long-range spatial context, which the four directional GRU
sweeps provide and plain convs cannot.  The reference used a kitty photo;
here the object is a synthetic rectangle (no asset needed).

Run: python examples/csrn_demo.py [--iters 300]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from scmgan_tpu.ops.conv import conv2d, conv2d_init, leaky_relu
from scmgan_tpu.ops.csrn import csrn_apply, csrn_init

SIZE = 64


def make_example(rx: int = 20, ry: int = 10, w: int = 27, h: int = 32):
    """(input, target): object on white canvas; target paints below red,
    left green, right blue (reference get_example_pair,
    spatial_recurrent.py:152-166)."""
    x = np.ones((SIZE, SIZE, 3), np.float32)
    x[ry:ry + h, rx:rx + w] = 0.2  # the "object"
    y = np.ones((SIZE, SIZE, 3), np.float32)
    y[ry + h:, rx:rx + w] = (1, 0, 0)
    y[ry:ry + h, :rx] = (0, 1, 0)
    y[ry:ry + h, rx + w:] = (0, 0, 1)
    return x[None], y[None]


def init_simple_fcn(key, channels: int = 32):
    """SimpleFCN: conv -> CSRN -> conv (reference spatial_recurrent.py:
    124-139, without the BatchNorms — batch size is 1 here anyway)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": conv2d_init(k1, 3, channels, 3),
        "csrn": csrn_init(k2, channels, exploding_init=False),
        "conv2": conv2d_init(k3, channels, 3, 3),
    }


def apply_simple_fcn(params, x):
    h = leaky_relu(conv2d(params["conv1"], x), 0.2)
    h = csrn_apply(params["csrn"], h)
    h = leaky_relu(h, 0.2)
    return jax.nn.sigmoid(conv2d(params["conv2"], h))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    params = init_simple_fcn(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    x, y = make_example()
    x, y = jnp.asarray(x), jnp.asarray(y)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((apply_simple_fcn(p, x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.iters):
        params, opt_state, loss = step(params, opt_state)
        if i % 50 == 0:
            print(f"iter {i}: mse {float(loss):.5f}")

    out = np.asarray(apply_simple_fcn(params, x))[0]
    panel = np.concatenate([np.asarray(x)[0], out, np.asarray(y)[0]], axis=1)
    from PIL import Image

    path = os.path.join(args.out_dir, "csrn_segmentation.png")
    Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(path)
    print(f"final mse {float(loss):.5f}; wrote {path}")


if __name__ == "__main__":
    main()
