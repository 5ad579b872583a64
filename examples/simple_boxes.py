#!/usr/bin/env python
"""simple_boxes — the standalone SCM-extraction mini-pipeline.

JAX re-design of the reference's self-contained experiment
(reference envs/simple_boxes.py:1-358, and its sibling
envs/advanced_boxes.py): a FallingBox environment (agent pushes a box
left/right while gravity pulls it down), a small conv encoder/decoder with
an MLP transition whose weights carry a *scheduled L1 penalty*, and causal
-graph extraction directly from the transition's weight-product
|W2|x|W1| — the clearest statement of the SCM idea the full framework
approximates (SURVEY §3.5).

Run:  python examples/simple_boxes.py [--iters 2000] [--latent 4]
Artifacts: simple_boxes_causal_graph.png, simple_boxes_recon.png
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

from scmgan_tpu.ops.conv import conv2d, conv2d_init, leaky_relu, linear, linear_init


# --------------------------------------------------------------------------
# FallingBox environment (reference envs/simple_boxes.py:12-37)
# --------------------------------------------------------------------------

def sample_transition_batch(rng: np.random.Generator, batch: int):
    """(before, action_onehot, after) frames of the falling box."""
    x = rng.integers(8, 24, size=batch)
    y = rng.integers(8, 24, size=batch)
    r = rng.integers(4, 10, size=batch)
    a = rng.integers(0, 2, size=batch)

    def render(xs, ys, rs):
        frames = np.zeros((batch, 32, 32), np.float32)
        for i in range(batch):
            y0, y1 = max(ys[i] - rs[i], 0), min(ys[i] + rs[i], 32)
            x0, x1 = max(xs[i] - rs[i], 0), min(xs[i] + rs[i], 32)
            frames[i, y0:y1, x0:x1] = 1.0
        return frames

    before = render(x, y, r)
    x2 = np.where(a == 0, x - 3, x + 3)   # button 0 pushes left
    y2 = y + 5                             # gravity
    after = render(x2, y2, r)
    actions = np.eye(2, dtype=np.float32)[a]
    return (jnp.asarray(before[..., None]), jnp.asarray(actions),
            jnp.asarray(after[..., None]))


# --------------------------------------------------------------------------
# Model (conv encoder -> latent -> MLP transition -> deconv decoder)
# --------------------------------------------------------------------------

def init_params(key, latent: int):
    ks = jax.random.split(key, 12)
    return {
        "enc": {
            "c1": conv2d_init(ks[0], 1, 32, 3),
            "c2": conv2d_init(ks[1], 32, 64, 3),
            "c3": conv2d_init(ks[2], 64, 64, 3),
            "c4": conv2d_init(ks[3], 64, 64, 3),
            "fc": linear_init(ks[4], 64 * 4 * 4, latent),
        },
        "dec": {
            "fc": linear_init(ks[5], latent, 128 * 4 * 4),
            "c1": conv2d_init(ks[6], 128, 64, 3),
            "c2": conv2d_init(ks[7], 64, 32, 3),
            "c3": conv2d_init(ks[8], 32, 16, 3),
            "c4": conv2d_init(ks[9], 16, 1, 3),
        },
        # bias-free 2-layer MLP transition (simple_boxes.py:165-181) —
        # its weights ARE the causal structure.
        "trans": {
            "fc1": {"w": 0.1 * jax.random.normal(ks[10], (latent + 2, 16))},
            "fc2": {"w": 0.1 * jax.random.normal(ks[11], (16, latent))},
        },
    }


def _upsample2(x):
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def encode(p, x):
    x = leaky_relu(conv2d(p["c1"], x), 0.2)
    x = leaky_relu(conv2d(p["c2"], x, stride=2), 0.2)    # 16
    x = leaky_relu(conv2d(p["c3"], x, stride=2), 0.2)    # 8
    x = leaky_relu(conv2d(p["c4"], x, stride=2), 0.2)    # 4
    return linear(p["fc"], x.reshape(x.shape[0], -1))


def decode(p, z):
    x = leaky_relu(linear(p["fc"], z), 0.2).reshape(-1, 4, 4, 128)
    x = leaky_relu(conv2d(p["c1"], _upsample2(x)), 0.2)  # 8
    x = leaky_relu(conv2d(p["c2"], _upsample2(x)), 0.2)  # 16
    x = leaky_relu(conv2d(p["c3"], _upsample2(x)), 0.2)  # 32
    return jax.nn.sigmoid(conv2d(p["c4"], x))


def transition(p, z, a):
    x = jnp.concatenate([z, a], axis=-1)
    x = leaky_relu(x @ p["fc1"]["w"], 0.2)
    return jnp.tanh(x @ p["fc2"]["w"])


def causal_graph_from_weights(trans_params) -> np.ndarray:
    """|W2| x |W1| weight-product adjacency, normalized
    (reference compute_causal_graph, simple_boxes.py:184-207)."""
    w1 = np.abs(np.asarray(trans_params["fc1"]["w"]))  # (L+A, 16)
    w2 = np.abs(np.asarray(trans_params["fc2"]["w"]))  # (16, L)
    scm = w1 @ w2                                       # (L+A, L)
    return scm / (scm.max() + 1e-4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--latent", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--l1-max", type=float, default=0.05)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    params = init_params(jax.random.PRNGKey(0), args.latent)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, before, actions, after, l1_coef):
        def loss_fn(p):
            z = encode(p["enc"], before)
            recon = decode(p["dec"], z)
            z2 = transition(p["trans"], z, actions)
            pred = decode(p["dec"], z2)
            recon_loss = jnp.mean((recon - before) ** 2)
            pred_loss = jnp.mean((pred - after) ** 2)
            # scheduled L1 sparsity on the transition weights — the prune
            # pressure that exposes the causal graph
            # (simple_boxes.py:327-338)
            l1 = (jnp.abs(p["trans"]["fc1"]["w"]).mean()
                  + jnp.abs(p["trans"]["fc2"]["w"]).mean())
            return recon_loss + pred_loss + l1_coef * l1, (recon_loss, pred_loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    for i in range(args.iters):
        before, actions, after = sample_transition_batch(rng, args.batch)
        # L1 ramps in over training (reference schedule idea)
        l1 = args.l1_max * min(1.0, 2.0 * i / args.iters)
        params, opt_state, loss, (rl, pl) = train_step(
            params, opt_state, before, actions, after, jnp.float32(l1))
        if i % 200 == 0:
            print(f"iter {i}: loss {float(loss):.5f} "
                  f"(recon {float(rl):.5f}, pred {float(pl):.5f}, l1 {l1:.3f})")

    scm = causal_graph_from_weights(params["trans"])
    print("Causal adjacency (rows: z+actions, cols: z'):")
    for row in scm:
        print("  " + " ".join(f"{v:.02f}" for v in row))

    from scmgan_tpu.analysis.causal_graph import render_causal_graph

    img = render_causal_graph(scm)
    if img is not None:
        from PIL import Image

        path = os.path.join(args.out_dir, "simple_boxes_causal_graph.png")
        Image.fromarray(img).save(path)
        print(f"Wrote {path}")

    # reconstruction sanity image
    before, actions, after = sample_transition_batch(rng, 4)
    z = encode(params["enc"], before)
    pred = decode(params["dec"], transition(params["trans"], z, actions))
    panel = np.concatenate([
        np.concatenate(np.asarray(before[..., 0]), axis=1),
        np.concatenate(np.asarray(after[..., 0]), axis=1),
        np.concatenate(np.asarray(pred[..., 0]), axis=1),
    ], axis=0)
    from PIL import Image

    path = os.path.join(args.out_dir, "simple_boxes_recon.png")
    Image.fromarray((np.clip(panel, 0, 1) * 255).astype(np.uint8)).save(path)
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
