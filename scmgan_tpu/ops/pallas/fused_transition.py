"""Fused Pallas kernel for the Transition inference step.

The Transition (reference models.py:43-119; our NHWC redesign in
scmgan_tpu.models.world_model) is the single hottest function — O(horizon)
calls per train step and O(A^(lookahead+1) * depth) per MPC environment
step (SURVEY §3.4).  Under plain XLA each of its six convs round-trips the
64x64x128 activation through HBM.  This kernel executes the ENTIRE step —
action broadcast, all six circular 3x3 convs, both U-Net skip concats,
leaky-ReLUs, sigmoid, and the Bernoulli/threshold discretization — in one
pallas_call with every activation resident in VMEM.

Key TPU tricks:
  * Circular padding is free: a 3x3 circular conv is nine `pltpu.roll`s of
    the activation (wrap-around shift along H and W) each feeding a
    (H*W, Cin) x (Cin, Cout) MXU matmul accumulated in f32.  No padding,
    no edge masking.
  * Channel concats never materialize: conv5(concat(h4, h2)) is computed
    as conv(h4, W5a) + conv(h2, W5b) with the weight split done on the
    host at pack time.
  * Grid over batch; weights (~1.5 MB bf16) use a constant index_map so
    they stay resident in VMEM across grid steps.
  * Bernoulli sampling uses the on-core PRNG (pltpu.prng_seed /
    prng_random_bits), seeded per (call, batch-element).

Inference-only (eval / MPC / free-run benchmarking): training keeps the
XLA path, whose fusion + autodiff are already good; this kernel has no VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scmgan_tpu.ops.spectral_norm import sn_weight

# conv6 output (latent_dim, typically 16) padded up to one lane tile.
LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_transition_weights(params: dict, latent_dim: int, num_actions: int,
                            dtype=jnp.bfloat16):
    """Host-side weight preparation.

    Returns a dict of HWIO->(9, Cin, Cout) matmul weights with:
      * spectral normalization applied (sn_weight) for conv1-5,
      * conv1 input channels zero-padded to a multiple of 8 sublanes,
      * conv5/conv6 split into (main, skip) halves,
      * conv6 output padded to ``latent_pad`` channels,
      * biases padded to match.
    """
    c_in1 = latent_dim + num_actions
    c_in1_pad = _round_up(c_in1, 8)
    latent_pad = _round_up(latent_dim, 8)

    def mat(w):
        kh, kw, ci, co = w.shape
        return w.reshape(kh * kw, ci, co)

    w1 = sn_weight(params["conv1"]).astype(dtype)
    w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, c_in1_pad - c_in1), (0, 0)))
    w2 = sn_weight(params["conv2"]).astype(dtype)
    w3 = sn_weight(params["conv3"]).astype(dtype)
    w4 = sn_weight(params["conv4"]).astype(dtype)
    w5 = sn_weight(params["conv5"]).astype(dtype)   # (3,3,256,128)
    w6 = params["conv6"]["w"].astype(dtype)          # (3,3,256,latent)
    hidden = w2.shape[-1]
    w5a, w5b = w5[:, :, :hidden], w5[:, :, hidden:]
    w6a, w6b = w6[:, :, :hidden], w6[:, :, hidden:]
    pad6 = ((0, 0), (0, 0), (0, 0), (0, latent_pad - latent_dim))
    w6a = jnp.pad(w6a, pad6)
    w6b = jnp.pad(w6b, pad6)

    # biases as (1, C) rows — VMEM wants rank >= 2
    b = lambda name: params[name]["b"].astype(jnp.float32)[None, :]
    b6 = jnp.pad(b("conv6"), ((0, 0), (0, latent_pad - latent_dim)))
    return {
        "w1": mat(w1), "w2": mat(w2), "w3": mat(w3), "w4": mat(w4),
        "w5a": mat(w5a), "w5b": mat(w5b), "w6a": mat(w6a), "w6b": mat(w6b),
        "b1": b("conv1"), "b2": b("conv2"), "b3": b("conv3"),
        "b4": b("conv4"), "b5": b("conv5"), "b6": b6,
        "c_in1": c_in1, "c_in1_pad": c_in1_pad, "latent_pad": latent_pad,
    }


def _wrap_shift(x, s: int, axis: int):
    """Static circular shift by s in {-1, 0, 1}: rolled[i] = x[(i - s) % N].
    Implemented with static slices + concat (pltpu.roll lowers to a
    dynamic rotate that only supports 32-bit element types)."""
    if s == 0:
        return x
    idx_head = [slice(None)] * x.ndim
    idx_tail = [slice(None)] * x.ndim
    if s > 0:
        idx_head[axis] = slice(-s, None)
        idx_tail[axis] = slice(None, -s)
    else:
        idx_head[axis] = slice(-s, None)
        idx_tail[axis] = slice(None, -s)
    return jnp.concatenate([x[tuple(idx_head)], x[tuple(idx_tail)]],
                           axis=axis)


def _patches(x):
    """Circular im2col: (H, W, Cin) -> (H*W, 9*Cin) of wrap-shifted taps.
    Built in VMEM; the channel-axis concat is just buffer placement."""
    h, wdim, cin = x.shape
    cols = []
    for kh in range(3):
        xh = _wrap_shift(x, 1 - kh, axis=0)
        for kw in range(3):
            cols.append(_wrap_shift(xh, 1 - kw, axis=1))
    return jnp.concatenate(cols, axis=-1).reshape(h * wdim, 9 * cin)


def _circ_conv(x, w9, bias, *, accum_dtype=jnp.float32):
    """3x3 circular conv of x (H, W, Cin) with w9 (9, Cin, Cout) as ONE
    (H*W, 9*Cin) x (9*Cin, Cout) MXU matmul over the circular im2col —
    K = 9*128 keeps the systolic array saturated (vs nine K=128 calls)."""
    h, wdim, cin = x.shape
    cout = w9.shape[-1]
    wmat = w9.reshape(9 * cin, cout)
    acc = jnp.dot(_patches(x), wmat, preferred_element_type=accum_dtype)
    acc = acc + bias.astype(accum_dtype)  # bias: (1, Cout) broadcasts
    return acc.reshape(h, wdim, cout)


def _circ_conv2(xa, w9a, xb, w9b, bias, *, accum_dtype=jnp.float32):
    """Concat-conv: conv(concat(xa, xb)) as one matmul over both im2cols
    (the U-Net skip concats of conv5/conv6, reference models.py:95-102)."""
    h, wdim, ca = xa.shape
    cb = xb.shape[-1]
    cout = w9a.shape[-1]
    patches = jnp.concatenate(
        [_patches(xa), _patches(xb)], axis=-1)       # (H*W, 9*(ca+cb))
    wmat = jnp.concatenate(
        [w9a.reshape(9 * ca, cout), w9b.reshape(9 * cb, cout)], axis=0)
    acc = jnp.dot(patches, wmat, preferred_element_type=accum_dtype)
    acc = acc + bias.astype(accum_dtype)
    return acc.reshape(h, wdim, cout)


def _lrelu(x, slope=0.01):
    return jnp.where(x >= 0, x, slope * x)


def _make_kernel(sample: bool, latent_dim: int, hidden: int):
    def kernel(seed_ref, x_ref,
               w1, w2, w3, w4, w5a, w5b, w6a, w6b,
               b1, b2, b3, b4, b5, b6,
               out_ref):
        cdt = x_ref.dtype
        x = x_ref[0]                                      # (H, W, Cin1p)
        h1 = _lrelu(_circ_conv(x, w1[:], b1[:])).astype(cdt)
        h2 = _lrelu(_circ_conv(h1, w2[:], b2[:])).astype(cdt)
        h3 = _lrelu(_circ_conv(h2, w3[:], b3[:])).astype(cdt)
        h4 = _lrelu(_circ_conv(h3, w4[:], b4[:])).astype(cdt)
        h5 = _lrelu(_circ_conv2(h4, w5a[:], h2, w5b[:], b5[:])).astype(cdt)
        logits = _circ_conv2(h5, w6a[:], h1, w6b[:], b6[:])
        p = jax.nn.sigmoid(logits)                        # f32 (H, W, Lp)
        if sample:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.prng_random_bits(p.shape)
            u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            z = (u < p).astype(cdt)
        else:
            z = (p > 0.5).astype(cdt)
        out_ref[0] = z

    return kernel


@functools.partial(jax.jit, static_argnames=("sample",))
def _fused_call(packed, x, seed, *, sample: bool):
    b, h, w, c_pad = x.shape
    latent_pad = packed["w6a"].shape[-1]
    hidden = packed["w2"].shape[-1]
    kernel = _make_kernel(sample, latent_pad, hidden)

    weight_names = ["w1", "w2", "w3", "w4", "w5a", "w5b", "w6a", "w6b",
                    "b1", "b2", "b3", "b4", "b5", "b6"]
    weight_args = [packed[n] for n in weight_names]
    # weights: whole-array blocks, constant index map -> stay in VMEM.
    # (index maps take (*grid_indices, *scalar_prefetch_refs))
    w_specs = [
        pl.BlockSpec(wa.shape, lambda i, *_, _n=wa.ndim: (0,) * _n,
                     memory_space=pltpu.VMEM)
        for wa in weight_args
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c_pad), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, h, w, latent_pad),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * b * h * w * 9 * (
        c_pad * hidden + 3 * hidden * hidden + 2 * 2 * hidden * hidden
        + 2 * hidden * latent_pad)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, latent_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            # six 64x64x128 activations + two skips + f32 accumulators;
            # fits in bf16 but needs more than the default 16 MB scoped
            # window.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=x.size * 2 * 2, transcendentals=0),
    )(seed, x, *weight_args)


def fused_transition(params: dict, z: jax.Array, action_onehot: jax.Array,
                     key: Optional[jax.Array] = None, *,
                     sample: bool = False) -> jax.Array:
    """Drop-in inference replacement for models.world_model.transition
    (eval mode by default; ``sample=True`` draws ST-free Bernoulli samples
    for stochastic rollouts).

    z: (B, H, W, latent); action_onehot: (B, A).  Returns (B, H, W, latent).
    """
    b, h, w, latent_dim = z.shape
    num_actions = action_onehot.shape[-1]
    # bf16 keeps the full activation set resident in VMEM; latents are
    # binary so the input cast is lossless, and accumulation stays f32.
    out_dtype = z.dtype
    z = z.astype(jnp.bfloat16)
    packed = pack_transition_weights(params, latent_dim, num_actions, z.dtype)
    c_in1_pad = int(packed["c_in1_pad"])
    a_map = jnp.broadcast_to(
        action_onehot[:, None, None, :].astype(z.dtype),
        (b, h, w, num_actions))
    x = jnp.concatenate([z, a_map], axis=-1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                    (0, c_in1_pad - latent_dim - num_actions)))
    if key is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max)
    out = _fused_call(
        {k: v for k, v in packed.items()
         if k not in ("c_in1", "c_in1_pad", "latent_pad")},
        x, seed, sample=sample)
    return out[..., :latent_dim].astype(out_dtype)
