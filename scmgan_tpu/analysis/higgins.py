"""Higgins et al. beta-VAE disentanglement metric.

Protocol parity with the reference (reference higgins.py:22-155): generate
image pairs sharing exactly one ground-truth factor via the env's
``simulator``, encode both, average |z_left - z_right| over L=5 draws, and
train a linear classifier to predict *which* factor was shared; the metric
is the classifier's accuracy.  Two variants: flat latents
(``higgins_metric``) and conv latents with spatially-summed z-diffs
(``higgins_metric_conv``, reference higgins.py:90-155).

TPU-native: the classifier (a single linear layer + Adam, reference
higgins.py:7-15) trains with a jitted optax step; image generation stays in
the simulator (host or device depending on the env).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _train_classifier(z_diffs: jnp.ndarray, labels: jnp.ndarray,
                      num_classes: int, train_iters: int,
                      key: jax.Array, lr: float = 1e-3):
    """Linear softmax classifier on z-diff vectors; returns params."""
    dim = z_diffs.shape[-1]
    w = jnp.zeros((dim, num_classes), jnp.float32)
    b = jnp.zeros((num_classes,), jnp.float32)
    opt = optax.adam(lr)
    opt_state = opt.init((w, b))

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p[0] + p[1]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params = (w, b)
    n = z_diffs.shape[0]
    batch = min(256, n)
    for i in range(train_iters):
        k = jax.random.fold_in(key, i)
        idx = jax.random.randint(k, (batch,), 0, n)
        params, opt_state, _ = step(params, opt_state, z_diffs[idx],
                                    labels[idx])
    return params


def _moment_features(z: np.ndarray) -> np.ndarray:
    """(B, H, W, C) conv latents -> (B, C*3) per-channel spatial moments:
    total mass, centroid-y, centroid-x (centroids normalized to [0, 1]).

    The reference's conv protocol reduces |dz| with a spatial SUM
    (higgins.py:121-122), which is invariant to WHERE activation moved —
    structurally blind to spatially-coded factors (the round-2 oracle
    experiment: a ground-truth-render encoder scores chance).  Moments
    keep the location information that this architecture actually uses to
    code factors."""
    zf = np.abs(z.astype(np.float32))
    m = zf.sum(axis=(1, 2))                                   # (B, C)
    h, w = zf.shape[1:3]
    ys = np.arange(h, dtype=np.float32)[None, :, None, None]
    xs = np.arange(w, dtype=np.float32)[None, None, :, None]
    denom = np.maximum(m, 1e-6)
    cy = (zf * ys).sum(axis=(1, 2)) / denom / max(h - 1, 1)
    cx = (zf * xs).sum(axis=(1, 2)) / denom / max(w - 1, 1)
    return np.concatenate([m, cy, cx], axis=-1)


def _collect_z_diffs(simulator, encoder_fn, true_latent_dim: int,
                     encoded_latent_dim: int, batches: int, batch_size: int,
                     rng: np.random.Generator, conv: bool, L: int = 5,
                     spatial_moments: bool = False):
    """Build the (num_samples, encoded_latent_dim) z-diff dataset + labels.

    Mirrors generate_equivariance_test_batch (reference higgins.py:35-56):
    each pair of factor vectors shares exactly one randomly-chosen factor.
    """
    all_diffs, all_labels = [], []
    for _ in range(batches):
        y = rng.integers(0, true_latent_dim, size=batch_size)
        diffs = np.zeros((L, batch_size, encoded_latent_dim), np.float32)
        for l in range(L):
            factors = rng.uniform(size=(batch_size, 2, true_latent_dim))
            factors[np.arange(batch_size), 0, y] = factors[
                np.arange(batch_size), 1, y]
            left = np.asarray(simulator(factors[:, 0]), np.float32)
            right = np.asarray(simulator(factors[:, 1]), np.float32)
            zl = np.asarray(encoder_fn(jnp.asarray(left)))
            zr = np.asarray(encoder_fn(jnp.asarray(right)))
            if spatial_moments:
                # |feature(z_l) - feature(z_r)| on per-channel moments —
                # location-aware, unlike the reference's spatial sum.
                d = np.abs(_moment_features(zl) - _moment_features(zr))
            else:
                d = np.abs(zl - zr)
                if conv:
                    # conv latents: sum over spatial dims (higgins.py:121-122)
                    d = d.sum(axis=(1, 2))
            diffs[l] = d.reshape(batch_size, -1)
        all_diffs.append(diffs.mean(axis=0))
        all_labels.append(y)
    return (np.concatenate(all_diffs), np.concatenate(all_labels))


def higgins_metric(simulator: Callable, true_latent_dim: int,
                   encoder_fn: Callable, encoded_latent_dim: int,
                   batch_size: int = 32, train_iters: int = 200,
                   seed: int = 0, conv: bool = False,
                   test_batches: int = 8,
                   spatial_moments: bool = False) -> float:
    """Returns test accuracy of the factor classifier (the metric)."""
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    n_batches = max(4, train_iters // 20)
    z_diffs, labels = _collect_z_diffs(
        simulator, encoder_fn, true_latent_dim, encoded_latent_dim,
        n_batches, batch_size, rng, conv, spatial_moments=spatial_moments)
    # normalize for stable linear training (per-feature: moment features
    # mix scales — mass ~O(HW), centroids in [0, 1])
    scale = z_diffs.std(axis=0, keepdims=True) + 1e-8 \
        if spatial_moments else z_diffs.std() + 1e-8
    z_train = jnp.asarray(z_diffs / scale)
    y_train = jnp.asarray(labels)
    params = _train_classifier(z_train, y_train, true_latent_dim,
                               train_iters, key)

    zt, yt = _collect_z_diffs(
        simulator, encoder_fn, true_latent_dim, encoded_latent_dim,
        test_batches, batch_size, rng, conv,
        spatial_moments=spatial_moments)
    logits = jnp.asarray(zt / scale) @ params[0] + params[1]
    acc = float((jnp.argmax(logits, -1) == jnp.asarray(yt)).mean())
    print(f"Higgins metric test accuracy: {acc:.4f}")
    return acc


def make_encoder_fn(encoder_params):
    """Standard encoder adapter for the Higgins protocols: tiles a
    single-frame simulator render into the encoder's 3-frame window
    (ENCODER_INPUT_FRAMES; reference models.py:19) and encodes."""
    from scmgan_tpu.models import encode

    def encoder_fn(images):
        x = jnp.asarray(images)
        if x.ndim == 4:
            x = jnp.repeat(x[:, None], 3, axis=1)
        return encode(encoder_params, x)

    return encoder_fn


def higgins_metric_conv(simulator, true_latent_dim, encoder_fn,
                        encoded_latent_dim, batch_size: int = 16,
                        train_iters: int = 100, seed: int = 0) -> float:
    """Conv-latent variant (reference higgins.py:90-155): z-diffs are summed
    over the spatial dimensions of the latent map before classification."""
    return higgins_metric(simulator, true_latent_dim, encoder_fn,
                          encoded_latent_dim, batch_size=batch_size,
                          train_iters=train_iters, seed=seed, conv=True)


def higgins_metric_spatial(simulator, true_latent_dim, encoder_fn,
                           num_channels: int, batch_size: int = 16,
                           train_iters: int = 200, seed: int = 0) -> float:
    """Location-aware conv-latent variant (extension beyond the reference).

    The reference's conv protocol (higgins.py:121-122) sums |dz| over the
    latent map's spatial dims, so it can only detect *channel-coded*
    factors; this architecture codes factors *spatially* (which latent
    pixels are active), and the round-2 oracle experiment showed even a
    perfect spatial code scores chance under the sum.  This variant
    classifies |moment(z_l) - moment(z_r)| on per-channel spatial moments
    (mass, centroid-y, centroid-x) — the same protocol otherwise
    (paired factors sharing exactly one, L=5 averaging, linear probe)."""
    return higgins_metric(simulator, true_latent_dim, encoder_fn,
                          num_channels * 3, batch_size=batch_size,
                          train_iters=train_iters, seed=seed,
                          spatial_moments=True)
