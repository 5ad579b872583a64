"""Fused Pallas kernel for the serving decoder.

The decoder (reference models.py:253-291; our additive-factor redesign in
models/world_model.py::decode_fused) is two small-channel stride-1 convs:
latent(16) -> 4*latent(64) -> color(3) with a leaky-ReLU between.  Its
FLOPs are trivial (~0.09 GFLOP/frame vs the transition's 1-6.5), but under
XLA the two convs cannot fuse, so every free-run step round-trips the
(B, 64, 64, 64) bf16 intermediate through HBM — at B=256 that is 134 MB
written + read per predicted frame batch, which dominates the decoder's
wall time now that the distilled students have shrunk the transition
(BENCH_NOTES: the decoder chain is a fixed ~0.4-0.9 ms/step tax).

This kernel executes conv1 + leaky-ReLU + factor-summed conv2 in ONE
pallas_call with the intermediate resident in VMEM:

  * Zero-padded SAME 3x3 convs (the decoder is not circular — reference
    models.py:260-266 uses plain padding=1) as a single
    (H*W, 9*Cin) x (9*Cin, Cout) MXU matmul over a zero-filled im2col.
  * The transposed-conv kernel flip and the per-factor output sum
    (decode_fused's exact linear folding) happen at pack time on the host.
  * Grid over batch; weights (~75 KB bf16) stay VMEM-resident across grid
    steps via a constant index map; per-image input/output DMAs pipeline
    against compute.

Inference-only (free-run benches, MPC video rollouts): training and
parity-critical eval keep the XLA `decode` path (autodiff + per-factor
visualization live there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scmgan_tpu.ops.pallas.fused_transition import _lrelu, _round_up


def pack_decoder_weights(params: dict, latent_dim: int, dtype=jnp.bfloat16):
    """Host-side weight prep: flip the transposed-conv kernels (stride-1
    pad-1 ConvTranspose == SAME conv with an HW-flipped kernel, see
    ops/conv.py::conv_transpose2d), fold the per-factor sum into conv2
    (exact by linearity — models/world_model.py::decode_fused), pad channel
    dims to sublane multiples."""
    w1 = params["conv1"]["w"][::-1, ::-1, :, :]          # (3,3,L,4L)
    w2 = params["conv2"]["w"][::-1, ::-1, :, :]          # (3,3,4L,L*color)
    kh, kw, hid, lc = w2.shape
    color = lc // latent_dim
    w2s = jnp.sum(w2.reshape(kh, kw, hid, latent_dim, color), axis=3)
    b2s = jnp.sum(params["conv2"]["b"].reshape(latent_dim, color), axis=0)

    latent_pad = _round_up(latent_dim, 8)
    color_pad = _round_up(color, 8)
    w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, latent_pad - latent_dim), (0, 0)))
    w2s = jnp.pad(w2s, ((0, 0), (0, 0), (0, 0), (0, color_pad - color)))

    def mat(w):
        a, b, ci, co = w.shape
        return w.reshape(a * b, ci, co).astype(dtype)

    return {
        "w1": mat(w1), "w2": mat(w2s),
        "b1": params["conv1"]["b"].astype(jnp.float32)[None, :],
        "b2": jnp.pad(b2s.astype(jnp.float32)[None, :],
                      ((0, 0), (0, color_pad - color))),
        "latent_pad": latent_pad, "color_pad": color_pad, "color": color,
    }


def _zero_shift(x, s: int, axis: int):
    """Static shift by s in {-1, 0, 1} with zero fill (SAME-pad conv tap):
    shifted[i] = x[i - s], out-of-range reads are 0."""
    if s == 0:
        return x
    zshape = list(x.shape)
    zshape[axis] = abs(s)
    zeros = jnp.zeros(zshape, x.dtype)
    idx = [slice(None)] * x.ndim
    if s > 0:
        idx[axis] = slice(None, -s)
        return jnp.concatenate([zeros, x[tuple(idx)]], axis=axis)
    idx[axis] = slice(-s, None)
    return jnp.concatenate([x[tuple(idx)], zeros], axis=axis)


def _zpatches(x):
    """Zero-padded im2col: (H, W, Cin) -> (H*W, 9*Cin)."""
    h, wdim, cin = x.shape
    cols = []
    for kh in range(3):
        xh = _zero_shift(x, 1 - kh, axis=0)
        for kw in range(3):
            cols.append(_zero_shift(xh, 1 - kw, axis=1))
    return jnp.concatenate(cols, axis=-1).reshape(h * wdim, 9 * cin)


def _zconv(x, w9, bias):
    h, wdim, cin = x.shape
    cout = w9.shape[-1]
    acc = jnp.dot(_zpatches(x), w9.reshape(9 * cin, cout),
                  preferred_element_type=jnp.float32)
    return (acc + bias).reshape(h, wdim, cout)


def _kernel(x_ref, w1, w2, b1, b2, out_ref):
    x = x_ref[0]                                       # (H, W, Lp) bf16
    h1 = _lrelu(_zconv(x, w1[:], b1[:])).astype(x.dtype)
    logits = _zconv(h1, w2[:], b2[:])                  # f32 (H, W, Cp)
    out_ref[0] = logits.astype(out_ref.dtype)


@jax.jit
def _fused_call(packed, x):
    b, h, w, latent_pad = x.shape
    color_pad = packed["w2"].shape[-1]
    names = ["w1", "w2", "b1", "b2"]
    args = [packed[n] for n in names]
    w_specs = [
        pl.BlockSpec(a.shape, lambda i, _n=a.ndim: (0,) * _n,
                     memory_space=pltpu.VMEM)
        for a in args
    ]
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, latent_pad), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, h, w, color_pad), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, color_pad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * latent_pad * (w1s := packed["w1"].shape[-1])
            + 2 * b * h * w * 9 * w1s * color_pad,
            # activations + weights/biases; the constant index map keeps
            # the ~75 KB of weights VMEM-resident, so they are fetched
            # once, not once per grid step.
            bytes_accessed=x.size * 2 + b * h * w * color_pad * 2
            + sum(int(a.size) * a.dtype.itemsize for a in args),
            transcendentals=0),
    )(x, *args)


def fused_decode_packed(packed: dict, z: jax.Array) -> jax.Array:
    """fused_decode with weights already prepared by pack_decoder_weights.

    Pack once OUTSIDE any rollout loop: packing does device work (kernel
    flips, the per-factor sum, padding), and calling fused_decode inside a
    lax.scan body would place those ops in the loop-body HLO, relying on
    XLA loop-invariant hoisting that is not guaranteed for the reduce.
    """
    b, h, w, latent_dim = z.shape
    latent_pad = int(packed["latent_pad"])
    z = z.astype(jnp.bfloat16)
    if latent_pad != latent_dim:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, latent_pad - latent_dim)))
    out = _fused_call(
        {k: v for k, v in packed.items()
         if k not in ("latent_pad", "color_pad", "color")}, z)
    return out[..., : packed["color"]]


def fused_decode(params: dict, z: jax.Array) -> jax.Array:
    """Drop-in inference replacement for models.world_model.decode_fused.

    z: (B, H, W, latent) binary latents (any float/int dtype);
    returns pixel logits (B, H, W, color) in bfloat16.

    Re-packs the weights on every call — for per-frame or in-loop use,
    pack once with pack_decoder_weights and call fused_decode_packed.
    """
    packed = pack_decoder_weights(params, z.shape[-1])
    return fused_decode_packed(packed, z)
