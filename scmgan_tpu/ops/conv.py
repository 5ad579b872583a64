"""Functional conv/linear layers in NHWC (TPU-native layout).

The reference uses torch ``nn.Conv2d`` in NCHW with cuDNN (e.g.
reference models.py:51-56,129-134).  Here the canonical layout is NHWC with
HWIO kernels so the channel dimension rides the TPU lane dimension (128 wide)
and 3x3x128x128 convs tile directly onto the MXU.

Circular padding: the reference Transition declares
``padding=2, padding_mode='circular'`` (reference models.py:51-56).  Torch
expands circular padding as ``((p+1)//2, p//2)`` per side, so p=2 is an
effective 1-pixel circular pad each side -> *same-size* 3x3 circular conv.
We implement that directly: explicit wrap-pad of 1 followed by a VALID conv.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels.
DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def _fan_in(kshape: Sequence[int]) -> int:
    # HWIO: kh * kw * in_ch
    kh, kw, in_ch, _ = kshape
    return kh * kw * in_ch


def conv2d_init(
    key: jax.Array,
    in_ch: int,
    out_ch: int,
    ksize: int = 3,
    dtype=jnp.float32,
) -> dict:
    """Torch-default (kaiming-uniform a=sqrt(5)) init: U(-b, b), b=1/sqrt(fan_in).

    Matches the initialization statistics of the reference's nn.Conv2d layers
    so training dynamics are comparable.
    """
    kshape = (ksize, ksize, in_ch, out_ch)
    bound = 1.0 / math.sqrt(_fan_in(kshape))
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, kshape, dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (out_ch,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def circular_pad(x: jax.Array, pad: int = 1) -> jax.Array:
    """Wrap-pad H and W of an NHWC tensor (toroidal topology)."""
    return jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="wrap"
    )


def conv2d(
    params: dict,
    x: jax.Array,
    *,
    stride: int = 1,
    padding="SAME",
    circular: bool = False,
    w: Optional[jax.Array] = None,
) -> jax.Array:
    """Apply an NHWC conv.  ``w`` overrides ``params['w']`` (used by spectral
    norm to inject the sigma-normalized weight)."""
    kernel = params["w"] if w is None else w
    if circular:
        x = circular_pad(x, (kernel.shape[0] - 1) // 2)
        padding = "VALID"
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DIMENSION_NUMBERS,
    )
    return y + params["b"].astype(y.dtype)


def conv_transpose2d_init(
    key: jax.Array, in_ch: int, out_ch: int, ksize: int = 3, dtype=jnp.float32
) -> dict:
    """Init for a stride-1 transposed conv (reference Decoder,
    models.py:260-266).  Torch's ConvTranspose2d fan_in is kh*kw*out_ch/groups
    computed on its (in, out, kh, kw) weight — with stride 1 and padding 1 the
    operator is a same-size conv with a spatially-flipped kernel, so we store
    a plain HWIO kernel and match torch's init bound 1/sqrt(kh*kw*out_ch)."""
    kshape = (ksize, ksize, in_ch, out_ch)
    bound = 1.0 / math.sqrt(ksize * ksize * out_ch)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, kshape, dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (out_ch,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def conv_transpose2d(params: dict, x: jax.Array) -> jax.Array:
    """Stride-1, padding-1 transposed conv == same-padding conv with the
    kernel flipped in H and W.  One fused XLA conv on the MXU."""
    w = params["w"][::-1, ::-1, :, :]
    y = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=DIMENSION_NUMBERS,
    )
    return y + params["b"].astype(y.dtype)


def linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32) -> dict:
    bound = 1.0 / math.sqrt(in_dim)
    wkey, bkey = jax.random.split(key)
    w = jax.random.uniform(wkey, (in_dim, out_dim), dtype, minval=-bound, maxval=bound)
    b = jax.random.uniform(bkey, (out_dim,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def linear(params: dict, x: jax.Array, w: Optional[jax.Array] = None) -> jax.Array:
    kernel = params["w"] if w is None else w
    y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=x.dtype)
    return y + params["b"].astype(y.dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.01) -> jax.Array:
    """Torch-default leaky ReLU slope (F.leaky_relu, reference models.py:77)."""
    return jax.nn.leaky_relu(x, negative_slope)
