"""Int8 serving-mode transition via XLA convs.

The transition dominates rollout cost (the decoder is ~40x cheaper —
measured on v5e), and on v5e the MXU runs int8 x int8 -> int32 convs ~1.3x
faster than bf16 through XLA's conv emitter.  This module quantizes the
transition for inference:

  * weights: per-output-channel symmetric int8 (spectral norm folded in),
  * activations: static per-layer scale (conv1's inputs — binary latents +
    one-hot actions — are exactly int8; leaky-ReLU outputs use a calibrated
    range),
  * each conv: int8 conv -> int32 accum -> f32 dequant+bias+leaky-ReLU ->
    requantize; XLA fuses the elementwise epilogue into the conv.

This is the XLA-scheduled sibling of ops/pallas/quantized_transition.py —
same arithmetic, different executor; benchmarks pick the faster.  Lossy by
design: serving/rollout only (MPC beams, throughput benchs); training and
parity-critical evaluation use the exact bf16/f32 paths.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from scmgan_tpu.ops.spectral_norm import sn_weight
from scmgan_tpu.ops.stochastic import st_bernoulli

DN = ("NHWC", "HWIO", "NHWC")
ACT_SCALE = 8.0 / 127.0   # leaky-ReLU activations calibrated to [0, 8]


class QuantizedTransition(NamedTuple):
    """Pre-quantized transition weights (host-prepared, device-resident).
    Dimensions are derived from weight shapes so the tuple stays a pure
    array pytree (safe to pass through jit)."""

    weights: dict     # name -> int8 HWIO kernel
    scales: dict      # name -> f32 (Cout,) folded (w_scale * in_scale)
    biases: dict      # name -> f32 (Cout,)


def _quantize(w: jax.Array):
    co = w.shape[-1]
    m = w.reshape(-1, co).astype(jnp.float32)
    scale = jnp.max(jnp.abs(m), axis=0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(m / scale), -127, 127).astype(jnp.int8)
    return q.reshape(w.shape), scale


def quantize_transition(params: dict, latent_dim: int = None,
                        num_actions: int = None) -> QuantizedTransition:
    weights, scales, biases = {}, {}, {}
    specs = [
        ("conv1", sn_weight(params["conv1"]), 1.0),
        ("conv2", sn_weight(params["conv2"]), ACT_SCALE),
        ("conv3", sn_weight(params["conv3"]), ACT_SCALE),
        ("conv4", sn_weight(params["conv4"]), ACT_SCALE),
        ("conv5", sn_weight(params["conv5"]), ACT_SCALE),
        ("conv6", params["conv6"]["w"], ACT_SCALE),
    ]
    for name, w, in_scale in specs:
        q, ws = _quantize(w)
        weights[name] = q
        scales[name] = ws * in_scale
        biases[name] = params[name]["b"].astype(jnp.float32)
    return QuantizedTransition(weights, scales, biases)


def _qconv(qt: QuantizedTransition, name: str, x_i8: jax.Array,
           *, requant: bool = True, epilogue_dtype=jnp.float32):
    """int8 conv with dequant + leaky-ReLU + requant epilogue.

    ``epilogue_dtype=bf16`` halves the VPU elementwise traffic of the
    epilogue; the int32->bf16 cast costs ~0.4% relative error on the
    accumulator — below the quantization noise floor.
    """
    x_pad = jnp.pad(x_i8, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")
    acc = lax.conv_general_dilated(
        x_pad, qt.weights[name], (1, 1), "VALID", dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    y = (acc.astype(epilogue_dtype) * qt.scales[name].astype(epilogue_dtype)
         + qt.biases[name].astype(epilogue_dtype))
    if not requant:
        return y.astype(jnp.float32)
    y = jnp.where(y >= 0, y, jnp.asarray(0.01, epilogue_dtype) * y)
    q = jnp.round(y.astype(jnp.float32) * (1.0 / ACT_SCALE)) \
        if epilogue_dtype == jnp.float32 else \
        jnp.round(y * jnp.asarray(1.0 / ACT_SCALE, epilogue_dtype))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def transition_int8(qt: QuantizedTransition, z: jax.Array,
                    action_onehot: jax.Array,
                    key: Optional[jax.Array] = None, *,
                    sample: bool = False,
                    epilogue_dtype=jnp.float32) -> jax.Array:
    """Serving-mode transition step.  z: (B, H, W, latent) binary values."""
    b, h, w, _ = z.shape
    num_actions = action_onehot.shape[-1]
    a_map = jnp.broadcast_to(action_onehot[:, None, None, :],
                             (b, h, w, num_actions))
    x = jnp.concatenate(
        [z.astype(jnp.int8), a_map.astype(jnp.int8)], axis=-1)
    qc = lambda name, t, **kw: _qconv(qt, name, t,
                                      epilogue_dtype=epilogue_dtype, **kw)
    h1 = qc("conv1", x)
    h2 = qc("conv2", h1)
    h3 = qc("conv3", h2)
    h4 = qc("conv4", h3)
    h5 = qc("conv5", jnp.concatenate([h4, h2], axis=-1))
    logits = qc("conv6", jnp.concatenate([h5, h1], axis=-1),
                requant=False)
    p = jax.nn.sigmoid(logits)
    if sample and key is not None:
        out = st_bernoulli(key, p)
    else:
        out = (p > 0.5).astype(jnp.float32)
    return out.astype(z.dtype)
