"""Statistics helpers.

``cov``: covariance estimator with the reference's exact semantics
(reference utils.py:3-33 — imported by main.py:22, unused in the main
path; kept for library parity)."""

from __future__ import annotations

import jax.numpy as jnp


def cov(m: jnp.ndarray, rowvar: bool = False) -> jnp.ndarray:
    """Covariance matrix of observations.

    rowvar=False (default): columns are variables, rows observations —
    matching the reference's default (utils.py:3-33).
    """
    if m.ndim > 2:
        raise ValueError("m has more than 2 dimensions")
    if m.ndim < 2:
        m = m.reshape(1, -1)
    if not rowvar and m.shape[0] != 1:
        m = m.T
    fact = 1.0 / (m.shape[1] - 1)
    m = m - jnp.mean(m, axis=1, keepdims=True)
    return (fact * (m @ m.T)).squeeze()
