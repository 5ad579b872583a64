"""Causal-graph extraction via counterfactual latent perturbation.

Protocol parity with the reference (reference main.py:512-586 +
causal_graph.py:45-80): sample a transition two predicted steps deep, zero
each latent factor in turn, measure the squared counterfactual deviation it
causes in every destination factor, normalize to [0, 1], max over 10 runs;
render both the adjacency matrix and a circular-layout digraph whose edge
alphas are the causal weights.

TPU-native: the reference perturbs factors one at a time in a Python loop
(main.py:564-581); here all ``latent_dim`` counterfactuals are a *batch* —
one vmapped transition evaluates every perturbation at once.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.models.world_model import WorldModel, encode, transition


@partial(jax.jit, static_argnames=("num_actions",))
def _causal_edge_weights(params: WorldModel, src_z, onehot_a,
                         num_actions: int):
    """(latent_dim, latent_dim) edge weights from one batch.

    src_z: (B, H, W, L); weight[i, j] = max over batch of squared deviation
    of factor j when factor i is zeroed (reference main.py:554-586).
    """
    latent_dim = src_z.shape[-1]
    dst_z = transition(params.transition, src_z, onehot_a, train=False)

    def one_factor(i):
        perturbed = src_z * (1.0 - jax.nn.one_hot(i, latent_dim,
                                                  dtype=src_z.dtype))
        cf = transition(params.transition, perturbed, onehot_a, train=False)
        diff = (dst_z - cf) ** 2                     # (B, H, W, L)
        # reference: max over batch AND spatial dims per destination factor
        # (cf_difference[:, dst].max(), main.py:577-581).  On binary
        # eval-mode latents a single flipped pixel saturates the edge to 1,
        # so we also return the mean deviation as a non-saturating
        # diagnostic (printed alongside; the max matrix stays the artifact).
        return jnp.max(diff, axis=(0, 1, 2)), jnp.mean(diff, axis=(0, 1, 2))

    weights, mean_dev = jax.vmap(one_factor)(jnp.arange(latent_dim))
    return weights, mean_dev


def sample_transition(params: WorldModel, datasource,
                      batch_size: int = 32, key: Optional[jax.Array] = None):
    """Encode t=0..2, advance two predicted steps; return (src_z, onehot_a)
    (reference sample_transition, main.py:534-551)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    obs, rewards, dones, actions = datasource.collect(batch_size, 5, key=key)
    num_actions = datasource.binary_input_channels
    oh = lambda t: jax.nn.one_hot(actions[:, t], num_actions, dtype=obs.dtype)
    z = encode(params.encoder, obs[:, 0:3])
    z = transition(params.transition, z, oh(2), train=False)
    src_z = transition(params.transition, z, oh(3), train=False)
    return src_z, oh(4)


def compute_causal_graph(params: WorldModel, datasource, train_iter: int = 0,
                         runs: int = 10, out_dir: str = ".",
                         key: Optional[jax.Array] = None,
                         make_images: bool = True) -> np.ndarray:
    """Normalized causal adjacency, max over ``runs`` batches
    (reference compute_causal_graph, main.py:512-531).  Each run's matrix
    is normalized to its own max BEFORE the max-over-runs — the
    reference's order (compute_causal_edge_weights normalizes at
    main.py:584-586, then main.py:519 maxes the normalized matrices).
    Writes causal_matrix_iter_*.{png,json} and causal_graph_iter_*.png;
    the JSON carries both the max matrix and the mean-deviation
    diagnostic."""
    if key is None:
        key = jax.random.PRNGKey(train_iter)
    num_actions = datasource.binary_input_channels
    weights_runs, mean_runs = [], []
    for i in range(runs):
        src_z, onehot_a = sample_transition(
            params, datasource, key=jax.random.fold_in(key, i))
        w_i, m_i = _causal_edge_weights(params, src_z, onehot_a, num_actions)
        w_i = np.asarray(w_i)
        weights_runs.append(w_i / max(w_i.max(), 1e-12))
        mean_runs.append(np.asarray(m_i))
    w = np.max(weights_runs, axis=0)

    print("Causal Graph Edge Weights")
    print(f"Latent Factor -> Latent Factor dim={w.shape[0]}")
    for row in w:
        print("\t".join(f"{v:.03f}" for v in row))

    # Non-saturating diagnostic: with hard-thresholded (binary) eval-mode
    # latents, max-over-batch-and-space saturates every edge that flips a
    # single pixel anywhere; the mean deviation preserves edge ordering.
    m = np.mean(mean_runs, axis=0)
    m = m / max(m.max(), 1e-12)
    print("Mean-deviation diagnostic (non-saturating, normalized)")
    for row in m:
        print("\t".join(f"{v:.03f}" for v in row))

    if make_images:
        import json

        from scmgan_tpu.analysis.video import save_image

        with open(os.path.join(
                out_dir, f"causal_matrix_iter_{train_iter:06d}.json"),
                "w") as fp:
            json.dump({"max": w.tolist(), "mean_deviation": m.tolist(),
                       "runs": runs}, fp, indent=2)
        save_image(w, os.path.join(
            out_dir, f"causal_matrix_iter_{train_iter:06d}.png"),
            resize_to=(256, 256))
        img = render_causal_graph(w)
        if img is not None:
            from PIL import Image

            Image.fromarray(img).save(os.path.join(
                out_dir, f"causal_graph_iter_{train_iter:06d}.png"))
            # mean-deviation variant: the non-saturating instrument
            save_image(m, os.path.join(
                out_dir, f"causal_matrix_mean_iter_{train_iter:06d}.png"),
                resize_to=(256, 256))
            img_m = render_causal_graph(m)
            if img_m is not None:
                Image.fromarray(img_m).save(os.path.join(
                    out_dir,
                    f"causal_graph_mean_iter_{train_iter:06d}.png"))
    return w


def render_causal_graph(scm: np.ndarray) -> Optional[np.ndarray]:
    """Circular-layout digraph with edge alpha = causal weight (reference
    causal_graph.py:45-80).  Returns RGB pixels, or None if networkx /
    matplotlib are unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import networkx as nx
    except Exception:
        return None

    rows, cols = scm.shape
    adjacency = np.zeros((rows, rows))
    adjacency[:, :cols] = scm
    edge_alphas = adjacency.flatten()

    G = nx.MultiDiGraph(np.ones(adjacency.shape))
    pos = nx.layout.circular_layout(G)
    fig = plt.figure(figsize=(6, 6))
    nx.draw_networkx_nodes(G, pos, node_size=40, node_color="blue")
    edges = nx.draw_networkx_edges(
        G, pos, node_size=40, arrowstyle="->", arrowsize=20, width=2)
    labels = [f"$z_{{{i}}}$" for i in range(cols)] + [
        f"$a_{{{i}}}$" for i in range(rows - cols)]
    label_pos = {k: (v[0], v[1] + 0.1) for k, v in pos.items()}
    nx.draw_networkx_labels(G, label_pos,
                            {i: labels[i] for i in range(len(labels))},
                            font_size=16)
    if edges is not None:
        for i, e in enumerate(edges):
            e.set_alpha(float(np.clip(edge_alphas[i], 0, 1)))
    plt.gca().set_axis_off()
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return buf
