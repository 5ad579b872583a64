"""Pallas int8 fused-transition kernel, v3 schedule.

Third-generation schedule for the whole-transition kernel (see
BENCH_NOTES.md for the measured history):

  v1  nine wrap-shifted taps per conv        -> copy traffic ~18 MB/conv
  v2  materialized im2col (K = 9*128 matmul) -> same copies, better MXU
  v3  (this) int8 activations; per conv build THREE W-shifted, H-padded
      buffers (66, 64, C int8 — ~0.5 MB each); the nine taps then become
      FREE leading-dim row slices of those buffers feeding
      (4096, C) x (C, Cout) int8 MXU matmuls with int32 accumulation.

Why this wins on copies: a leading-dim slice of a (66, 64, C) VMEM array
is an address offset of whole (sublane, lane) tiles — no relayout.  Only
the W direction (sublane dim) needs real data movement, and int8 halves
every byte moved.  Copy traffic drops to ~1.5 MB/conv vs ~18 MB.

Numerics match models/quantized.py (same per-channel weight scales,
static activation scale, f32 epilogue); the two paths share
pack-time quantization through ``pack_int8_weights``.

Inference-only; no VJP.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scmgan_tpu.models.quantized import ACT_SCALE, _quantize
from scmgan_tpu.ops.spectral_norm import sn_weight


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_int8_weights(params: dict, latent_dim: int, num_actions: int):
    """Kernel operands: int8 (9, Cin, Cout) kernels, f32 (1, Cout) folded
    scales, f32 (1, Cout) biases; conv1 input padded to an int8 sublane
    tile (32), conv5/conv6 split into (main, skip) halves, conv6 output
    padded to 8."""
    c_in1 = latent_dim + num_actions
    c_in1_pad = _round_up(c_in1, 32)
    latent_pad = _round_up(latent_dim, 8)

    def prep(w, in_scale):
        kh, kw, ci, co = w.shape
        q, ws = _quantize(w)
        return (q.reshape(kh * kw, ci, co),
                (ws * in_scale)[None, :].astype(jnp.float32))

    out = {}
    w1 = sn_weight(params["conv1"])
    w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, c_in1_pad - c_in1), (0, 0)))
    out["w1"], out["s1"] = prep(w1, 1.0)
    for i in (2, 3, 4):
        out[f"w{i}"], out[f"s{i}"] = prep(sn_weight(params[f"conv{i}"]),
                                          ACT_SCALE)
    w5 = sn_weight(params["conv5"])
    hidden = w5.shape[-2] // 2
    out["w5a"], out["s5a"] = prep(w5[:, :, :hidden], ACT_SCALE)
    out["w5b"], out["s5b"] = prep(w5[:, :, hidden:], ACT_SCALE)
    w6 = params["conv6"]["w"]
    pad6 = ((0, 0), (0, 0), (0, 0), (0, latent_pad - latent_dim))
    out["w6a"], out["s6a"] = prep(jnp.pad(w6[:, :, :hidden], pad6), ACT_SCALE)
    out["w6b"], out["s6b"] = prep(jnp.pad(w6[:, :, hidden:], pad6), ACT_SCALE)

    b = lambda n: params[n]["b"].astype(jnp.float32)[None, :]
    out["b1"], out["b2"], out["b3"] = b("conv1"), b("conv2"), b("conv3")
    out["b4"], out["b5"] = b("conv4"), b("conv5")
    out["b6"] = jnp.pad(b("conv6"), ((0, 0), (0, latent_pad - latent_dim)))
    meta = {"c_in1_pad": c_in1_pad, "latent_pad": latent_pad}
    return out, meta


def _wshift(x, s: int):
    """Circular W shift (axis 1, the sublane dim): rolled[:, j] =
    x[:, (j - s) % W]."""
    if s == 0:
        return x
    return jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1) if s > 0 else \
        jnp.concatenate([x[:, -s:], x[:, :-s]], axis=1)


def _hpad(x):
    """(H, W, C) -> (H+2, W, C) circular: row -1 on top, row 0 at bottom."""
    return jnp.concatenate([x[-1:], x, x[:1]], axis=0)


def _conv_i8(x_i8, wq, wscale, bias, acc0=None, *, schedule: str = "v3"):
    """int8 circular 3x3 conv; returns the f32 dequantized pre-activation
    (H, W, Cout).

    schedule="v3": 9 matmuls of K=C on free row slices of 3 W-shifted
    H-padded buffers (~1.5 MB copies/conv).
    schedule="v4": per W-shift, the 3 H-taps channel-concat into one
    (H*W, 3C) patch so each shift is ONE matmul of K=3C (3 matmuls/conv,
    better MXU pipelining, ~4.5 MB copies/conv).
    """
    h, wdim, cin = x_i8.shape
    cout = wq.shape[-1]
    acc = jnp.zeros((h * wdim, cout), jnp.int32)
    for kw in range(3):
        # tap offset kw corresponds to input shift s = 1 - kw
        buf = _hpad(_wshift(x_i8, 1 - kw))          # (H+2, W, C)
        if schedule == "v4":
            patches = jnp.concatenate(
                [buf[kh:kh + h] for kh in range(3)], axis=-1
            ).reshape(h * wdim, 3 * cin)
            wmat = jnp.concatenate(
                [wq[kh * 3 + kw] for kh in range(3)], axis=0)
            acc = acc + jnp.dot(patches, wmat,
                                preferred_element_type=jnp.int32)
        else:
            for kh in range(3):
                xs = buf[kh:kh + h].reshape(h * wdim, cin)  # free row slice
                acc = acc + jnp.dot(xs, wq[kh * 3 + kw],
                                    preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * wscale + bias
    if acc0 is not None:
        y = y + acc0
    return y.reshape(h, wdim, cout)


def _requant(y):
    z = jnp.where(y >= 0, y, 0.01 * y)
    return jnp.clip(jnp.round(z * (1.0 / ACT_SCALE)), -127, 127).astype(
        jnp.int8)


def _make_kernel(sample: bool, schedule: str = "v3"):
    conv = lambda *a, **k: _conv_i8(*a, schedule=schedule, **k)

    def kernel(seed_ref, x_ref,
               w1, w2, w3, w4, w5a, w5b, w6a, w6b,
               s1, s2, s3, s4, s5a, s5b, s6a, s6b,
               b1, b2, b3, b4, b5, b6,
               out_ref):
        x = x_ref[0]
        h1 = _requant(conv(x, w1[:], s1[:], b1[:]))
        h2 = _requant(conv(h1, w2[:], s2[:], b2[:]))
        h3 = _requant(conv(h2, w3[:], s3[:], b3[:]))
        h4 = _requant(conv(h3, w4[:], s4[:], b4[:]))
        hh, ww = x.shape[0], x.shape[1]
        pre5 = (conv(h4, w5a[:], s5a[:], b5[:])
                + conv(h2, w5b[:], s5b[:],
                       jnp.zeros_like(b5[:]))).reshape(hh, ww, -1)
        h5 = _requant(pre5)
        logits = (conv(h5, w6a[:], s6a[:], b6[:])
                  + conv(h1, w6b[:], s6b[:], jnp.zeros_like(b6[:])))
        p = jax.nn.sigmoid(logits)
        if sample:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            bits = pltpu.prng_random_bits(p.shape)
            u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
            z = u < p
        else:
            z = p > 0.5
        out_ref[0] = z.astype(jnp.int8)

    return kernel


_OPS = ["w1", "w2", "w3", "w4", "w5a", "w5b", "w6a", "w6b",
        "s1", "s2", "s3", "s4", "s5a", "s5b", "s6a", "s6b",
        "b1", "b2", "b3", "b4", "b5", "b6"]


@functools.partial(jax.jit, static_argnames=("sample", "schedule"))
def int8_kernel_call(packed, x_i8, seed, *, sample: bool = False,
                     schedule: str = "v3"):
    """x_i8: (B, H, W, c_in1_pad) int8 -> (B, H, W, latent_pad) int8."""
    b, h, w, c_pad = x_i8.shape
    latent_pad = packed["w6a"].shape[-1]
    kernel = _make_kernel(sample, schedule)
    args = [packed[n] for n in _OPS]
    w_specs = [
        pl.BlockSpec(a.shape, lambda i, *_, _n=a.ndim: (0,) * _n,
                     memory_space=pltpu.VMEM)
        for a in args
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
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, latent_pad), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(seed, x_i8, *args)


def int8_fused_transition(params: dict, z: jax.Array,
                          action_onehot: jax.Array,
                          key: Optional[jax.Array] = None, *,
                          sample: bool = False) -> jax.Array:
    """Drop-in int8 serving transition via the v3 pallas kernel.
    z: (B, H, W, latent) binary values."""
    b, h, w, latent_dim = z.shape
    num_actions = action_onehot.shape[-1]
    packed, meta = pack_int8_weights(params, latent_dim, num_actions)
    a_map = jnp.broadcast_to(action_onehot[:, None, None, :],
                             (b, h, w, num_actions))
    x = jnp.concatenate([z.astype(jnp.int8), a_map.astype(jnp.int8)],
                        axis=-1)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                    (0, meta["c_in1_pad"] - latent_dim - num_actions)))
    if key is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max)
    out = int8_kernel_call(packed, x, seed, sample=sample)
    return out[..., :latent_dim].astype(z.dtype)
