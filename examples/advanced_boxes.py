#!/usr/bin/env python
"""advanced_boxes — SCM-extraction mini-pipeline, 4-action variant.

JAX re-design of reference envs/advanced_boxes.py:12-362: like
simple_boxes, but the box has FOUR movement actions (left/right/up/down)
while its *width shrinks autonomously* (-2 per step, independent of height)
— designed so a disentangled transition must separate agent-controlled
factors (x, y) from autonomous ones (width), rather than entangling e.g.
size and aspect ratio (reference comment at envs/advanced_boxes.py:36-39).

Reuses the simple_boxes model/training; only the world differs.

Run:  python examples/advanced_boxes.py [--iters 2000] [--latent 5]
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

from examples.simple_boxes import (
    causal_graph_from_weights,
    decode,
    encode,
    init_params,
    transition,
)


def sample_transition_batch(rng: np.random.Generator, batch: int):
    """(before, action_onehot, after) of the shrinking box
    (reference envs/advanced_boxes.py:24-47)."""
    x = rng.integers(10, 22, size=batch)
    y = rng.integers(10, 22, size=batch)
    w = rng.integers(5, 10, size=batch)
    h = rng.integers(5, 10, size=batch)
    a = rng.integers(0, 4, size=batch)

    def render(xs, ys, ws, hs):
        frames = np.zeros((batch, 32, 32), np.float32)
        for i in range(batch):
            x0, x1 = max(xs[i] - hs[i], 0), max(min(xs[i] + hs[i], 32), 0)
            y0, y1 = max(ys[i] - ws[i], 0), max(min(ys[i] + ws[i], 32), 0)
            frames[i, x0:x1, y0:y1] = 1.0
        return frames

    before = render(x, y, w, h)
    x2 = x + np.select([a == 0, a == 1], [-3, 3], 0)
    y2 = y + np.select([a == 2, a == 3], [-3, 3], 0)
    w2 = w - 2  # autonomous shrink
    after = render(x2, y2, w2, h)
    actions = np.eye(4, dtype=np.float32)[a]
    return (jnp.asarray(before[..., None]), jnp.asarray(actions),
            jnp.asarray(after[..., None]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--latent", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--l1-max", type=float, default=0.05)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # num_actions=4: transition input is latent + 4
    params = init_params(jax.random.PRNGKey(0), args.latent)
    params["trans"]["fc1"]["w"] = 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (args.latent + 4, 16))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, before, actions, after, l1_coef):
        def loss_fn(p):
            z = encode(p["enc"], before)
            recon = decode(p["dec"], z)
            z2 = transition(p["trans"], z, actions)
            pred = decode(p["dec"], z2)
            l1 = (jnp.abs(p["trans"]["fc1"]["w"]).mean()
                  + jnp.abs(p["trans"]["fc2"]["w"]).mean())
            return (jnp.mean((recon - before) ** 2)
                    + jnp.mean((pred - after) ** 2) + l1_coef * l1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.iters):
        before, actions, after = sample_transition_batch(rng, args.batch)
        l1 = args.l1_max * min(1.0, 2.0 * i / args.iters)
        params, opt_state, loss = train_step(
            params, opt_state, before, actions, after, jnp.float32(l1))
        if i % 200 == 0:
            print(f"iter {i}: loss {float(loss):.5f} (l1 {l1:.3f})")

    scm = causal_graph_from_weights(params["trans"])
    print("Causal adjacency (rows: z+4 actions, cols: z'):")
    for row in scm:
        print("  " + " ".join(f"{v:.02f}" for v in row))


if __name__ == "__main__":
    main()
