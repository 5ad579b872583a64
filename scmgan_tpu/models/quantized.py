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
    requant: dict     # name -> f32 (Cout,) or scalar: 1 / output act scale


def _binarize_latent(z: jax.Array) -> jax.Array:
    """Latents enter the int8 engine as {0,1}.  A float carry straight off
    the encoder holds continuous sigmoid values; `astype(int8)` would
    FLOOR them all to 0 (measured: free-run diverges to a constant frame,
    23x MSE at t+10) - threshold at 0.5 instead.  Integer carries pass
    through."""
    if jnp.issubdtype(z.dtype, jnp.floating):
        return (z > 0.5).astype(jnp.int8)
    return z.astype(jnp.int8)


def _quantize(w: jax.Array):
    co = w.shape[-1]
    m = w.reshape(-1, co).astype(jnp.float32)
    scale = jnp.max(jnp.abs(m), axis=0) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(m / scale), -127, 127).astype(jnp.int8)
    return q.reshape(w.shape), scale


def quantize_transition(params: dict, latent_dim: int = None,
                        num_actions: int = None) -> QuantizedTransition:
    """Static-scale quantization (activations assumed in [0, 8]).

    On trained models the static range wastes int8 resolution (real
    activations are tighter and channel-dependent): measured ~13-14%
    worse free-run MSE@10 on trained pong / minipacman
    (scripts/bench_int8_mse.py).  For serving trained models prefer
    ``calibrate_transition`` with a multi-step action sequence: same
    kernels and speed, per-channel scales from a rollout that covers the
    states the free-run actually visits.
    """
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
    requant = {name: jnp.float32(1.0 / ACT_SCALE) for name, _, _ in specs}
    return QuantizedTransition(weights, scales, biases, requant)


def activation_scales(params: dict, z_samples: jax.Array,
                      action_onehots: jax.Array,
                      percentile: float = 100.0) -> dict:
    """Per-channel activation scales of the transition's five hidden
    leaky-ReLU layers, measured on an exact forward (single-step) or exact
    free-run (``action_onehots`` of shape (N, T, A)).  Shared by
    ``calibrate_transition`` (weight folding) and the QAT distillation
    path (train/distill.py), so both quantize against the same grid."""
    from scmgan_tpu.models.world_model import transition as exact_transition

    # exact forward with intermediates (float32 for calibration fidelity)
    p32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)

    def chan_range(x):
        # per-channel |activation| percentile over batch+space.  The
        # default (100 = per-channel max) must NOT lower to
        # jnp.percentile: its sort, repeated per scan step, makes the
        # TPU compile pathological (observed: a 16-step calibration scan
        # hung the remote compile service for 40+ min; jnp.max compiles
        # in seconds).
        flat = jnp.abs(x.reshape(-1, x.shape[-1]))
        if percentile >= 100.0:
            return jnp.max(flat, axis=0)
        return jnp.percentile(flat, percentile, axis=0)

    if action_onehots.ndim == 3:
        def step(z, a):
            h1, h2, h3, h4, h5, z_next = exact_transition(
                p32, z, a, train=False, return_all=True)
            return z_next, tuple(chan_range(h)
                                 for h in (h1, h2, h3, h4, h5))

        _, per_step = lax.scan(
            step, z_samples.astype(jnp.float32),
            jnp.swapaxes(action_onehots, 0, 1).astype(jnp.float32))
        ranges = [jnp.max(r, axis=0) for r in per_step]   # max over time
    else:
        h1, h2, h3, h4, h5, _ = exact_transition(
            p32, z_samples.astype(jnp.float32),
            action_onehots.astype(jnp.float32), train=False,
            return_all=True)
        ranges = [chan_range(h) for h in (h1, h2, h3, h4, h5)]

    return {
        name: jnp.maximum(r, 1e-4) / 127.0   # scale of this conv's OUTPUT
        for name, r in zip(("conv1", "conv2", "conv3", "conv4", "conv5"),
                           ranges)
    }


def calibrate_transition(params: dict, z_samples: jax.Array,
                         action_onehots: jax.Array,
                         percentile: float = 100.0) -> QuantizedTransition:
    """Calibrated per-channel w8a8 quantization of the transition.

    The static-scale pipeline (``quantize_transition``) assumes every
    leaky-ReLU output lives in [0, 8]; real trained activations are much
    tighter and channel-dependent, wasting int8 resolution (>95% bit
    agreement but only ~34% MPC argmax agreement on near-tie scores).
    This variant runs the exact transition on a calibration batch, records
    a per-channel ``percentile`` activation range per layer, and folds each
    layer's per-channel *input* scale into the next layer's weights before
    per-output-channel weight quantization — so the runtime kernels
    (``transition_int8`` / ``_halo`` / ``_split``) are unchanged; only the
    packed weights/scales differ.

    z_samples: (N, H, W, L) binary latents.

    action_onehots: (N, A) for single-step calibration, or (N, T, A) to
    calibrate over a T-step exact free-run from ``z_samples`` (serving
    semantics: hard-thresholded carry).  PREFER the sequence form for
    models that will free-run: ranges measured only at the seed states
    under-cover the states a rollout visits, and the resulting requant
    clipping compounds step over step (measured: single-step calibration
    is 16x worse free-run MSE@10 than the exact path on trained pong;
    multi-step calibration recovers parity — scripts/bench_int8_mse.py).

    ``percentile`` defaults to 100 (per-channel max): for free-running
    serving, clipping even rare activations compounds step over step —
    measured on trained pong, max-calibration reaches exact-path MSE@10
    parity while 99.99 leaves a 2% gap.
    """
    act_scale = activation_scales(params, z_samples, action_onehots,
                                  percentile=percentile)

    latent = z_samples.shape[-1]
    def in_scales(name):
        """Per-input-channel scale vector for each conv's input."""
        if name == "conv1":
            return jnp.ones((latent + action_onehots.shape[-1],), jnp.float32)
        if name in ("conv2", "conv3", "conv4"):
            return act_scale[{"conv2": "conv1", "conv3": "conv2",
                              "conv4": "conv3"}[name]]
        if name == "conv5":  # concat(h4, h2)
            return jnp.concatenate([act_scale["conv4"], act_scale["conv2"]])
        if name == "conv6":  # concat(h5, h1)
            return jnp.concatenate([act_scale["conv5"], act_scale["conv1"]])
        raise ValueError(name)

    weights, scales, biases = {}, {}, {}
    w_by_name = {
        "conv1": sn_weight(params["conv1"]),
        "conv2": sn_weight(params["conv2"]),
        "conv3": sn_weight(params["conv3"]),
        "conv4": sn_weight(params["conv4"]),
        "conv5": sn_weight(params["conv5"]),
        "conv6": params["conv6"]["w"],
    }
    for name, w in w_by_name.items():
        s_in = in_scales(name)
        w_folded = w.astype(jnp.float32) * s_in[None, None, :, None]
        q, ws = _quantize(w_folded)
        weights[name] = q
        scales[name] = ws  # input scale already folded per-channel
        biases[name] = params[name]["b"].astype(jnp.float32)
    # requant divisors: this layer's own per-channel output scale
    requant = {name: 1.0 / act_scale[name]
               for name in ("conv1", "conv2", "conv3", "conv4", "conv5")}
    requant["conv6"] = jnp.float32(1.0)  # never requantized (logits head)
    return QuantizedTransition(weights, scales, biases, requant)


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
    rq = qt.requant[name]
    q = jnp.round(y.astype(jnp.float32) * rq) \
        if epilogue_dtype == jnp.float32 else \
        jnp.round(y * rq.astype(epilogue_dtype))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _qepilogue(qt: QuantizedTransition, name: str, acc: jax.Array,
               *, requant: bool = True, epilogue_dtype=jnp.float32,
               extra_bias_i32: Optional[jax.Array] = None):
    """Dequant + bias + leaky-ReLU + requant on an int32 accumulator."""
    if extra_bias_i32 is not None:
        acc = acc + extra_bias_i32[:, None, None, :]
    y = (acc.astype(epilogue_dtype) * qt.scales[name].astype(epilogue_dtype)
         + qt.biases[name].astype(epilogue_dtype))
    if not requant:
        return y.astype(jnp.float32)
    y = jnp.where(y >= 0, y, jnp.asarray(0.01, epilogue_dtype) * y)
    rq = qt.requant[name]
    q = jnp.round(y.astype(jnp.float32) * rq) \
        if epilogue_dtype == jnp.float32 else \
        jnp.round(y * rq.astype(epilogue_dtype))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _action_bias(qt: QuantizedTransition, action_onehot: jax.Array,
                 latent: int) -> jax.Array:
    """conv1's action half folded to a rank-1 per-sample int32 bias.

    The one-hot action map is spatially constant, so its conv contribution
    is ``sum_{k,l} W1[k,l,action,:]`` — one (B, A) x (A, C_out) int32
    matmul instead of materializing the (B, H, W, A) broadcast map.
    Shared by every int8 transition variant; keep the arithmetic here so
    the 'bit-identical family' claim stays one definition."""
    w1 = qt.weights["conv1"]
    w1a_sum = jnp.sum(w1[:, :, latent:, :].astype(jnp.int32), axis=(0, 1))
    return lax.dot(action_onehot.astype(jnp.int32), w1a_sum,
                   preferred_element_type=jnp.int32)


def _wrap_pad1(x: jax.Array) -> jax.Array:
    """1-pixel circular pad of the two spatial dims (torus topology)."""
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="wrap")


def _vconv(x_i8: jax.Array, w_i8: jax.Array, pad: int = 0) -> jax.Array:
    """VALID int8 conv; negative ``pad`` crops the input inside the conv
    config (free — no materialized slice)."""
    padding = "VALID" if pad == 0 else [(pad, pad), (pad, pad)]
    return lax.conv_general_dilated(
        x_i8, w_i8, (1, 1), padding, dimension_numbers=DN,
        preferred_element_type=jnp.int32)


def transition_int8_halo(qt: QuantizedTransition, z: jax.Array,
                         action_onehot: jax.Array,
                         key: Optional[jax.Array] = None, *,
                         sample: bool = False,
                         epilogue_dtype=jnp.bfloat16) -> jax.Array:
    """Halo-chain serving transition: bit-identical int32 accumulations to
    ``transition_int8`` with ~2.5 GB/step less HBM traffic at batch 256.

    Three structural rewrites of the same arithmetic:

      * ONE wrap-pad to (H+12, W+12) feeds all six convs as a shrinking
        VALID chain (circular convs are shift-equivariant on the torus, so
        conv_VALID(wrap_pad(x, k)) == wrap_pad(conv_circ(x), k-1) — by
        induction the chain is exact).  The reference instead re-pads
        before every conv (models.py:51-56); under XLA a wrap pad cannot
        fold into the conv config, so each one materializes a full copy.
      * The U-Net concats (reference models.py:96-101) become split-kernel
        conv sums: conv(concat(a, b), W) == conv(a, W[..., :Ca, :]) +
        conv(b, W[..., Ca:, :]).  Skip tensors are center-cropped via
        negative conv padding — free in the conv config.
      * conv1's action half is a conv of a spatially-constant one-hot map,
        i.e. a rank-1 term: one_hot @ sum_taps(W1[..., L:, :]) — folded
        into the epilogue as a per-sample int32 bias.

    Spatial sizes along the chain (64x64 latents): pad 76 -> conv1 74 ->
    conv2 72 -> conv3 70 -> conv4 68 -> conv5 66 -> conv6 64.  The halo
    recompute costs ~13.5% extra MXU flops, traded for the removed pad
    and concat round-trips (a net win: the path is partially memory-bound).
    """
    b, h, w, latent = z.shape
    ep = epilogue_dtype

    zp = jnp.pad(_binarize_latent(z), ((0, 0), (6, 6), (6, 6), (0, 0)),
                 mode="wrap")

    w1 = qt.weights["conv1"]
    a_bias = _action_bias(qt, action_onehot, latent)

    def epi(name, acc, **kw):
        return _qepilogue(qt, name, acc, epilogue_dtype=ep, **kw)

    h1 = epi("conv1", _vconv(zp, w1[:, :, :latent, :]),
             extra_bias_i32=a_bias)                                   # 74
    h2 = epi("conv2", _vconv(h1, qt.weights["conv2"]))                # 72
    h3 = epi("conv3", _vconv(h2, qt.weights["conv3"]))                # 70
    h4 = epi("conv4", _vconv(h3, qt.weights["conv4"]))                # 68
    w5 = qt.weights["conv5"]
    hid = w5.shape[-1]
    h5 = epi("conv5", _vconv(h4, w5[:, :, :hid, :])
             + _vconv(h2, w5[:, :, hid:, :], pad=-2))                 # 66
    w6 = qt.weights["conv6"]
    logits = epi("conv6", _vconv(h5, w6[:, :, :hid, :])
                 + _vconv(h1, w6[:, :, hid:, :], pad=-4),
                 requant=False)                                       # 64
    p = jax.nn.sigmoid(logits)
    if sample and key is not None:
        out = st_bernoulli(key, p)
    else:
        out = (p > 0.5).astype(jnp.float32)
    return out.astype(z.dtype)


def transition_int8_split(qt: QuantizedTransition, z: jax.Array,
                          action_onehot: jax.Array,
                          key: Optional[jax.Array] = None, *,
                          sample: bool = False,
                          epilogue_dtype=jnp.float32) -> jax.Array:
    """Serving transition with concat-free U-Net skips, bit-identical to
    ``transition_int8``.

    Two rewrites of the same int32 arithmetic, keeping the per-conv 64x64
    shapes (unlike the halo variant, which trades +13.5% MXU flops for pad
    removal and measures *slower* on v5e — the path is compute-bound):

      * conv(concat(a, b), W) == conv(a, W[:, :, :Ca]) + conv(b, W[:, :, Ca:])
        — and the wrap-padded skip tensors (h1 for conv2, h2 for conv3) are
        already materialized, so the split reuses them: the two 256-channel
        concat writes + reads (~1 GB/step at batch 256) disappear.
      * conv1's action half is a conv of a spatially-constant one-hot map —
        a rank-1 int32 bias (one_hot @ sum_taps(W1[..., L:, :])), so the
        (B, H, W, A) broadcast map is never built.
    """
    b, h, w, latent = z.shape
    ep = epilogue_dtype

    wpad = _wrap_pad1

    w1 = qt.weights["conv1"]
    a_bias = _action_bias(qt, action_onehot, latent)

    def epi(name, acc, **kw):
        return _qepilogue(qt, name, acc, epilogue_dtype=ep, **kw)

    zp = wpad(_binarize_latent(z))
    h1 = epi("conv1", _vconv(zp, w1[:, :, :latent, :]),
             extra_bias_i32=a_bias)
    h1p = wpad(h1)
    h2 = epi("conv2", _vconv(h1p, qt.weights["conv2"]))
    h2p = wpad(h2)
    h3 = epi("conv3", _vconv(h2p, qt.weights["conv3"]))
    h4 = epi("conv4", _vconv(wpad(h3), qt.weights["conv4"]))
    w5 = qt.weights["conv5"]
    hid = w5.shape[-1]
    h5 = epi("conv5", _vconv(wpad(h4), w5[:, :, :hid, :])
             + _vconv(h2p, w5[:, :, hid:, :]))
    w6 = qt.weights["conv6"]
    logits = epi("conv6", _vconv(wpad(h5), w6[:, :, :hid, :])
                 + _vconv(h1p, w6[:, :, hid:, :]),
                 requant=False)
    p = jax.nn.sigmoid(logits)
    if sample and key is not None:
        out = st_bernoulli(key, p)
    else:
        out = (p > 0.5).astype(jnp.float32)
    return out.astype(z.dtype)


class QuantizedDecoder(NamedTuple):
    """Pre-quantized decoder (reference models.py:260-287: two stride-1
    transposed convs == SAME convs with flipped kernels, then per-factor
    additive sum).  Inputs are binary serving latents (exactly int8)."""

    w1: jax.Array      # int8 HWIO (flipped) kernel, latent -> 4*latent
    w2: jax.Array      # int8 HWIO (flipped) kernel, 4*latent -> latent*color
    s1: jax.Array      # f32 (4L,) conv1 dequant scale
    s2: jax.Array      # f32 (L*color,) conv2 dequant scale (act scale folded)
    b1: jax.Array      # f32 (4L,)
    b2: jax.Array      # f32 (L*color,)


def quantize_decoder(params: dict) -> QuantizedDecoder:
    w1f = params["conv1"]["w"][::-1, ::-1, :, :]
    w2f = params["conv2"]["w"][::-1, ::-1, :, :]
    q1, s1 = _quantize(w1f)
    q2, s2 = _quantize(w2f)
    return QuantizedDecoder(
        q1, q2, s1, s2 * ACT_SCALE,
        params["conv1"]["b"].astype(jnp.float32),
        params["conv2"]["b"].astype(jnp.float32))


def decode_int8(qd: QuantizedDecoder, z_i8: jax.Array) -> jax.Array:
    """int8 decoder: z (B,H,W,L) binary int8 -> pixel logits (B,H,W,color).

    Same layer semantics as models.decode (per-factor additive decoding);
    weights per-output-channel int8, hidden leaky-ReLU activations
    requantized with the static [0, 8] range.  Lossy (serving only): the
    logits head stays f32.
    """
    acc1 = lax.conv_general_dilated(
        z_i8, qd.w1, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    h = acc1.astype(jnp.float32) * qd.s1 + qd.b1
    h = jnp.where(h >= 0, h, 0.01 * h)
    h_q = jnp.clip(jnp.round(h / ACT_SCALE), -127, 127).astype(jnp.int8)
    acc2 = lax.conv_general_dilated(
        h_q, qd.w2, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    x = acc2.astype(jnp.float32) * qd.s2 + qd.b2
    b, hh, ww, _ = x.shape
    latent = z_i8.shape[-1]
    color = x.shape[-1] // latent
    return jnp.sum(x.reshape(b, hh, ww, latent, color), axis=3)


def _ring_qconv(qt: QuantizedTransition, name: str, x_i8: jax.Array,
                w_i8: Optional[jax.Array] = None, *, requant: bool = True,
                epilogue_dtype=jnp.float32,
                extra_bias_i32: Optional[jax.Array] = None):
    """Circular int8 conv with NO materialized wrap-pad.

    The torus conv (reference models.py:51-56 re-pads with mode='wrap'
    before every conv; under XLA that materializes a full (B, H+2, W+2, C)
    copy per conv — ~275 MB of HBM round-trip per conv at batch 256) is
    decomposed as:

      * a SAME conv with implicit zero padding — the padding lives in the
        conv config, so the interior (all but the outermost output ring)
        is exact and no padded copy ever exists in HBM;
      * exact border fixups: the 4 one-pixel-wide output strips are
        recomputed from 3-wide input slices (with the wrap applied to the
        tiny strip only), run through the same int32 conv + epilogue, and
        dynamic-update-sliced over the ring.  Both row strips (and both
        col strips) are stacked on the batch axis so each pair is one
        conv.  Strip recompute is ~6% extra MXU work; the corner pixels
        are computed identically by both their row and col strip.

    Bit-identical to the wrap-pad path: same int32 accumulations, same
    epilogue arithmetic, per output pixel.
    """
    if w_i8 is None:
        w_i8 = qt.weights[name]
    b, h, w, _ = x_i8.shape

    acc = lax.conv_general_dilated(
        x_i8, w_i8, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.int32)
    y = _qepilogue(qt, name, acc, requant=requant,
                   epilogue_dtype=epilogue_dtype,
                   extra_bias_i32=extra_bias_i32)

    def strip_epi(acc_s):
        return _qepilogue(qt, name, acc_s, requant=requant,
                          epilogue_dtype=epilogue_dtype,
                          extra_bias_i32=(None if extra_bias_i32 is None
                                          else jnp.concatenate(
                                              [extra_bias_i32] * 2)))

    # row strips: outputs rows {0, h-1}; inputs rows {h-1,0,1} / {h-2,h-1,0}
    rows_in = jnp.concatenate([
        jnp.concatenate([x_i8[:, h - 1:], x_i8[:, :2]], axis=1),
        jnp.concatenate([x_i8[:, h - 2:], x_i8[:, :1]], axis=1),
    ], axis=0)                                            # (2B, 3, W, C)
    rows_in = jnp.concatenate(
        [rows_in[:, :, w - 1:], rows_in, rows_in[:, :, :1]], axis=2)
    rows_out = strip_epi(lax.conv_general_dilated(
        rows_in, w_i8, (1, 1), "VALID", dimension_numbers=DN,
        preferred_element_type=jnp.int32))                # (2B, 1, W, Co)

    # col strips: outputs cols {0, w-1}
    cols_in = jnp.concatenate([
        jnp.concatenate([x_i8[:, :, w - 1:], x_i8[:, :, :2]], axis=2),
        jnp.concatenate([x_i8[:, :, w - 2:], x_i8[:, :, :1]], axis=2),
    ], axis=0)                                            # (2B, H, 3, C)
    cols_in = jnp.concatenate(
        [cols_in[:, h - 1:], cols_in, cols_in[:, :1]], axis=1)
    cols_out = strip_epi(lax.conv_general_dilated(
        cols_in, w_i8, (1, 1), "VALID", dimension_numbers=DN,
        preferred_element_type=jnp.int32))                # (2B, H, 1, Co)

    y = lax.dynamic_update_slice(y, rows_out[:b], (0, 0, 0, 0))
    y = lax.dynamic_update_slice(y, rows_out[b:], (0, h - 1, 0, 0))
    y = lax.dynamic_update_slice(y, cols_out[:b], (0, 0, 0, 0))
    y = lax.dynamic_update_slice(y, cols_out[b:], (0, 0, w - 1, 0))
    return y


def transition_int8_ring(qt: QuantizedTransition, z: jax.Array,
                         action_onehot: jax.Array,
                         key: Optional[jax.Array] = None, *,
                         sample: bool = False,
                         epilogue_dtype=jnp.float32) -> jax.Array:
    """Serving transition with pad-free circular convs (``_ring_qconv``)
    and conv1's action half folded to a rank-1 per-sample int32 bias.
    Bit-identical int32 accumulations to ``transition_int8``; the six
    materialized wrap-pads (~1.6 GB/step of HBM round-trips at batch 256)
    are replaced by ~6% strip recompute on the MXU.
    """
    b, h, w, latent = z.shape
    ep = epilogue_dtype

    w1 = qt.weights["conv1"]
    a_bias = _action_bias(qt, action_onehot, latent)

    def rc(name, t, w_i8=None, **kw):
        return _ring_qconv(qt, name, t, w_i8, epilogue_dtype=ep, **kw)

    x = _binarize_latent(z)
    h1 = rc("conv1", x, w1[:, :, :latent, :], extra_bias_i32=a_bias)
    h2 = rc("conv2", h1)
    h3 = rc("conv3", h2)
    h4 = rc("conv4", h3)
    h5 = rc("conv5", jnp.concatenate([h4, h2], axis=-1))
    logits = rc("conv6", jnp.concatenate([h5, h1], axis=-1), requant=False)
    if sample and key is not None:
        out = st_bernoulli(key, jax.nn.sigmoid(logits))
    else:
        # threshold(sigmoid(x), 0.5) == (x > 0): skip the sigmoid entirely
        out = (logits > 0).astype(jnp.float32)
    return out.astype(z.dtype)


def transition_int8_v2(qt: QuantizedTransition, z: jax.Array,
                       action_onehot: jax.Array,
                       key: Optional[jax.Array] = None, *,
                       sample: bool = False,
                       epilogue_dtype=jnp.float32) -> jax.Array:
    """`transition_int8` with three zero-risk trims, bit-identical outputs:

      * conv1's action half is a rank-1 per-sample int32 bias (a conv of a
        spatially-constant one-hot map), so the (B,H,W,A) broadcast and the
        20-channel concat are never built;
      * the non-sampling head uses (logits > 0) == threshold(sigmoid, 0.5)
        — one compare instead of a transcendental over (B,H,W,L);
      * returns int8 when the carry is int8 (free-run scans keep latents
        int8 end-to-end; binary values are exact in any dtype).

    Keeps the per-conv wrap-pad formulation — measured fastest on v5e
    (BENCH_NOTES: pads are fully overlapped; ring/halo/split all lost).
    """
    b, h, w, latent = z.shape
    ep = epilogue_dtype

    w1 = qt.weights["conv1"]
    a_bias = _action_bias(qt, action_onehot, latent)

    wpad = _wrap_pad1

    def conv(name, x_pad, w_i8=None):
        return lax.conv_general_dilated(
            x_pad, qt.weights[name] if w_i8 is None else w_i8, (1, 1),
            "VALID", dimension_numbers=DN, preferred_element_type=jnp.int32)

    def epi(name, acc, **kw):
        return _qepilogue(qt, name, acc, epilogue_dtype=ep, **kw)

    h1 = epi("conv1", conv("conv1", wpad(_binarize_latent(z)),
                           w1[:, :, :latent, :]), extra_bias_i32=a_bias)
    h2 = epi("conv2", conv("conv2", wpad(h1)))
    h3 = epi("conv3", conv("conv3", wpad(h2)))
    h4 = epi("conv4", conv("conv4", wpad(h3)))
    h5 = epi("conv5", conv("conv5", wpad(jnp.concatenate([h4, h2], -1))))
    logits = epi("conv6", conv("conv6", wpad(jnp.concatenate([h5, h1], -1))),
                 requant=False)
    if sample and key is not None:
        out = st_bernoulli(key, jax.nn.sigmoid(logits))
    else:
        out = (logits > 0)
    return out.astype(z.dtype)


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
        [_binarize_latent(z), a_map.astype(jnp.int8)], axis=-1)
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
