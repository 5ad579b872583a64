"""CSRN — Convolutional Spatial Recurrent Network.

Library-parity component (reference spatial_recurrent.py:21-139; imported
by the reference's models.py but unused by the model classes).  Four
directional GRUs sweep the image top-down / bottom-up / left-right /
right-left; between consecutive rows (columns) the recurrent state passes
through a 1-D conv + tanh so activations spread like a cone; the four
context maps combine through a 1x1 conv.  The reference deliberately uses
exploding-scale init (normal(0, channels), spatial_recurrent.py:9-17) —
replicated behind ``exploding_init``.

TPU-native: each directional sweep is one ``lax.scan`` over rows/columns
with the (batch*width) GRU batch as the lane dimension — no Python loop per
row.  Faithfulness notes: like the reference, the GRUs are bias-free, and
the reference's right-sweep writes into ``context_left`` (a bug —
spatial_recurrent.py:116 overwrites the left context); we keep the four
contexts separate (documented divergence: the right sweep contributes its
own map).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from scmgan_tpu.ops.conv import conv2d


def _normal(key, shape, scale, dtype=jnp.float32):
    return scale * jax.random.normal(key, shape, dtype)


def gru_init(key, in_dim: int, hidden: int, scale: float, dtype=jnp.float32):
    """Bias-free GRU params (torch nn.GRU(bias=False) layout: weights for
    reset/update/new gates stacked)."""
    k1, k2 = jax.random.split(key)
    return {
        "w_ih": _normal(k1, (in_dim, 3 * hidden), scale, dtype),
        "w_hh": _normal(k2, (hidden, 3 * hidden), scale, dtype),
    }


def gru_cell(params, x, h):
    """One bias-free GRU step (torch gate order: r, z, n)."""
    hidden = h.shape[-1]
    gi = x @ params["w_ih"]
    gh = h @ params["w_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def conv1d_init(key, in_ch, out_ch, scale, ksize=3, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "w": _normal(k1, (ksize, in_ch, out_ch), scale, dtype),
        "b": jnp.zeros((out_ch,), dtype),
    }


def conv1d(params, x):
    """x: (B, L, C) -> (B, L, C_out), SAME padding."""
    y = lax.conv_general_dilated(
        x, params["w"], (1,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC"))
    return y + params["b"]


def csrn_init(key, channels: int, exploding_init: bool = True,
              dtype=jnp.float32) -> dict:
    scale = float(channels) if exploding_init else 1.0 / jnp.sqrt(channels)
    ks = jax.random.split(key, 9)
    p = {}
    for i, d in enumerate(["down", "up", "left", "right"]):
        p[f"conv_{d}"] = conv1d_init(ks[i], channels, channels, scale, dtype=dtype)
        p[f"rnn_{d}"] = gru_init(ks[4 + i], channels, channels, scale, dtype)
    # 1x1 combine conv (torch-default-ish small init)
    k = ks[8]
    p["conv_combine"] = {
        "w": _normal(k, (1, 1, channels * 4, channels),
                     1.0 / (channels * 2.0), dtype),
        "b": jnp.zeros((channels,), dtype),
    }
    return p


def _sweep(x_lines, rnn_params, conv_params, reverse: bool):
    """x_lines: (L, B, W, C) sequence of rows (or cols).  Returns the
    per-line GRU outputs (L, B, W, C)."""
    l, b, w, c = x_lines.shape

    def step(h, line):
        # line: (B, W, C) -> GRU over flattened (B*W, C)
        out = gru_cell(rnn_params, line.reshape(b * w, c), h)
        ctx = out.reshape(b, w, c)
        conv_out = jnp.tanh(conv1d(conv_params, ctx))
        return conv_out.reshape(b * w, c), ctx

    h0 = jnp.zeros((b * w, c), x_lines.dtype)
    _, ctx = lax.scan(step, h0, x_lines, reverse=reverse)
    return ctx


def csrn_apply(params: dict, x: jax.Array) -> jax.Array:
    """x: (B, H, W, C) NHWC -> (B, H, W, C)."""
    b, h, w, c = x.shape
    rows = jnp.transpose(x, (1, 0, 2, 3))           # (H, B, W, C)
    cols = jnp.transpose(x, (2, 0, 1, 3))           # (W, B, H, C)

    above = _sweep(rows, params["rnn_down"], params["conv_down"], False)
    below = _sweep(rows, params["rnn_up"], params["conv_up"], True)
    left = _sweep(cols, params["rnn_left"], params["conv_left"], False)
    right = _sweep(cols, params["rnn_right"], params["conv_right"], True)

    above = jnp.transpose(above, (1, 0, 2, 3))      # (B, H, W, C)
    below = jnp.transpose(below, (1, 0, 2, 3))
    left = jnp.transpose(left, (1, 2, 0, 3))        # (B, H, W, C)
    right = jnp.transpose(right, (1, 2, 0, 3))

    ctx = jnp.concatenate([above, below, left, right], axis=-1)
    y = lax.conv_general_dilated(
        ctx, params["conv_combine"]["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + params["conv_combine"]["b"]
