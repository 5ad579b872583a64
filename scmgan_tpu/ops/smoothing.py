"""Depthwise gaussian smoothing (reference GaussianSmoothing,
models.py:315-378; used by the reference's visualize.py only).

Implemented as a separable depthwise conv: two rank-1 passes instead of the
reference's full k*k depthwise kernel — fewer FLOPs, identical result (a 2-D
gaussian is the outer product of two 1-D gaussians, which is exactly how the
reference builds its kernel)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(kernel_size: int, sigma: float, dtype=jnp.float32) -> jax.Array:
    x = jnp.arange(kernel_size, dtype=dtype)
    mean = (kernel_size - 1) / 2.0
    # Matches the reference's (unnormalized-then-normalized) construction
    # including its (x - mean) / (2*sigma) exponent form (models.py:343-349).
    k = jnp.exp(-(((x - mean) / (2.0 * sigma)) ** 2)) / (sigma * math.sqrt(2 * math.pi))
    return k / jnp.sum(k)


def gaussian_smooth2d(x: jax.Array, kernel_size: int, sigma: float) -> jax.Array:
    """Per-channel gaussian blur of an NHWC tensor."""
    c = x.shape[-1]
    k = gaussian_kernel1d(kernel_size, sigma, x.dtype)
    pad = kernel_size // 2
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        x, kh, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    y = lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn,
        feature_group_count=c)
    return y
