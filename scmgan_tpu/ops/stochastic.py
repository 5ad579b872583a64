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
