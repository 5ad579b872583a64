"""Spectral normalization as explicit functional state.

The reference wraps conv modules in a ``SpectralNorm`` that mutates
registered ``u``/``v`` buffers *inside every forward call* (reference
spectral_normalization.py:14-68).  In-place mutation inside a traced forward
is hostile to XLA, so we restructure:

  * ``u``/``v`` live in the param tree alongside the weight.
  * ``sn_weight`` computes ``w / sigma`` with ``sigma = u^T W v`` where u, v
    are stop-gradiented — gradients flow through W exactly as in torch
    (w_bar requires grad, u/v do not; spectral_normalization.py:33-35).
  * The power iteration is a *pure function of the weight alone* (it never
    reads activations), so it is hoisted out of the forward pass entirely:
    ``update_spectral_norms`` runs k power-iteration steps once per train
    step, replacing the reference's one-iteration-per-forward mutation.
    Power iteration converges geometrically, so sigma tracks the same value;
    k defaults to 1 (configurable to match the reference's per-forward count).

Weight matricization: torch reshapes (O, I, kh, kw) to (O, I*kh*kw)
(spectral_normalization.py:29-31).  Our HWIO kernels reshape to (-1, O) and
transpose; singular values are invariant to the column permutation between
the two matricizations, so sigma is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2normalize(v: jax.Array) -> jax.Array:
    return v / (jnp.linalg.norm(v) + _EPS)


def _as_matrix(w: jax.Array) -> jax.Array:
    """HWIO (or (in,out) linear) weight -> (out, rest) matrix."""
    return w.reshape(-1, w.shape[-1]).T


def sn_init(key: jax.Array, w: jax.Array, warmup_iters: int = 10) -> dict:
    """Create the u/v power-iteration state for a weight.

    u/v are warmed up with a few power iterations so that sigma = u.Wv is a
    meaningful spectral-norm estimate from the very first forward.  (With
    raw random u/v, sigma ~ 0 and w/sigma explodes — the reference avoids
    this only because torch's wrapper runs an iteration inside every
    forward, spectral_normalization.py:66-68.)
    """
    m = _as_matrix(w)
    height, width = m.shape
    ku, kv = jax.random.split(key)
    u = _l2normalize(jax.random.normal(ku, (height,), w.dtype))
    v = _l2normalize(jax.random.normal(kv, (width,), w.dtype))
    u, v = sn_power_iteration(w, u, v, iters=warmup_iters)
    return {"u": u.astype(w.dtype), "v": v.astype(w.dtype)}


def sn_power_iteration(w: jax.Array, u: jax.Array, v: jax.Array, iters: int = 1):
    """Pure power-iteration update (no gradient flows; run outside the loss)."""
    m = _as_matrix(jax.lax.stop_gradient(w)).astype(jnp.float32)
    for _ in range(iters):
        v = _l2normalize(m.T @ u)
        u = _l2normalize(m @ v)
    return u, v


def sn_weight(params: dict) -> jax.Array:
    """sigma-normalized weight, differentiable w.r.t. the raw weight.

    sigma = u . (W v) with u, v treated as constants, exactly the gradient
    structure of the reference (spectral_normalization.py:33-35).
    """
    w = params["w"]
    u = jax.lax.stop_gradient(params["sn"]["u"]).astype(w.dtype)
    v = jax.lax.stop_gradient(params["sn"]["v"]).astype(w.dtype)
    m = _as_matrix(w)
    sigma = jnp.dot(u, m @ v)
    return w / sigma


def update_spectral_norms(params, iters: int = 1):
    """Walk a param pytree; for every dict holding {'w', 'sn'}, refresh u/v.

    Pure: returns a new tree.  Called once per train step (the TPU-native
    replacement for the reference's per-forward in-place `_update_u_v`,
    spectral_normalization.py:23-35,66-68).
    """

    def _walk(node):
        if isinstance(node, dict):
            if "sn" in node and "w" in node:
                u, v = sn_power_iteration(
                    node["w"], node["sn"]["u"], node["sn"]["v"], iters
                )
                new = dict(node)
                new["sn"] = {"u": u.astype(node["sn"]["u"].dtype),
                             "v": v.astype(node["sn"]["v"].dtype)}
                return new
            return {k: _walk(x) for k, x in node.items()}
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            return type(node)(*(_walk(x) for x in node))
        if isinstance(node, (list, tuple)):
            return type(node)(_walk(x) for x in node)
        return node

    return _walk(params)
