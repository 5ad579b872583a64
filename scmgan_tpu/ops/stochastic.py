"""Stochastic discretization ops.

The reference's ``DifferentiableBernoulliSampler`` is a custom autograd
Function: forward samples Bernoulli(x), backward is the identity
(straight-through estimator; reference models.py:30-40).  In JAX the whole
construct is one line of stop_gradient algebra — no custom VJP machinery
needed, and XLA fuses it into the surrounding elementwise ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def st_bernoulli(key: jax.Array, p: jax.Array) -> jax.Array:
    """Straight-through Bernoulli sample: value is a draw from Bernoulli(p),
    gradient is d/dp identity."""
    sample = jax.random.bernoulli(key, p).astype(p.dtype)
    return p + jax.lax.stop_gradient(sample - p)


def hard_threshold(p: jax.Array, thresh: float = 0.5) -> jax.Array:
    """Eval-mode discretization: (p > 0.5) as float (reference models.py:112)."""
    return (p > thresh).astype(p.dtype)


def random_eps(key: jax.Array, p: float = 0.5, batch_size: int = 32,
               height: int = 64, width: int = 64,
               channels: int = 3) -> jax.Array:
    """Bernoulli noise-map generator (reference models.py:24-26; a
    noise-GAN leftover unused by the main path, kept for library parity).
    NHWC layout."""
    return jax.random.bernoulli(
        key, p, (batch_size, height, width, channels)).astype(jnp.float32)


def hypersphere_norm(x: jax.Array, eps: float = 1e-4) -> jax.Array:
    """L2-normalize a latent batch to the unit hypersphere (reference
    models.py:382-385 ``norm``; unused by the main path)."""
    n = jnp.linalg.norm(x.reshape(x.shape[0], -1), axis=1)
    return x / (n.reshape((-1,) + (1,) * (x.ndim - 1)) + eps)
