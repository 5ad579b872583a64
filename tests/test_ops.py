"""Unit tests for the op library: conv parity, spectral norm, ST-Bernoulli."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.ops import (
    circular_pad,
    conv2d,
    conv2d_init,
    gaussian_smooth2d,
    hard_threshold,
    sn_init,
    sn_power_iteration,
    sn_weight,
    st_bernoulli,
    update_spectral_norms,
)
from scmgan_tpu.ops.coordconv import coord_channels


def test_circular_pad_wraps(key):
    x = jax.random.normal(key, (1, 4, 4, 2))
    p = circular_pad(x, 1)
    assert p.shape == (1, 6, 6, 2)
    np.testing.assert_allclose(p[:, 0], p[:, 4])   # top row is old bottom
    np.testing.assert_allclose(p[:, -1], p[:, 1])
    np.testing.assert_allclose(p[:, :, 0], p[:, :, 4])


def test_conv2d_same_shape(key):
    params = conv2d_init(key, 3, 8)
    x = jax.random.normal(key, (2, 16, 16, 3))
    assert conv2d(params, x).shape == (2, 16, 16, 8)
    assert conv2d(params, x, circular=True).shape == (2, 16, 16, 8)
    assert conv2d(params, x, padding="VALID").shape == (2, 14, 14, 8)
    assert conv2d(params, x, stride=2, padding="VALID").shape == (2, 7, 7, 8)


def test_conv_matches_manual_correlation(key):
    """The NHWC/HWIO conv computes a cross-correlation (torch Conv2d
    semantics), verified against an explicit einsum."""
    k1, k2 = jax.random.split(key)
    params = conv2d_init(k1, 2, 3, ksize=3)
    x = jax.random.normal(k2, (1, 5, 5, 2))
    y = conv2d(params, x, padding="VALID")
    w = params["w"]  # (3,3,2,3)
    manual = jnp.einsum("hwio,hwi->o", w, x[0, 1:4, 1:4, :]) + params["b"]
    np.testing.assert_allclose(np.asarray(y[0, 1, 1]), np.asarray(manual),
                               rtol=1e-5, atol=1e-5)


def test_torch_default_init_bounds(key):
    params = conv2d_init(key, 16, 128, 3)
    bound = 1.0 / np.sqrt(3 * 3 * 16)
    assert float(jnp.abs(params["w"]).max()) <= bound
    assert float(jnp.abs(params["b"]).max()) <= bound


def test_sn_sigma_converges_to_spectral_norm(key):
    """After power iterations, sigma estimates the largest singular value
    and the normalized weight has unit spectral norm."""
    w = jax.random.normal(key, (3, 3, 8, 16))
    params = {"w": w, "sn": sn_init(key, w)}
    for _ in range(50):
        u, v = sn_power_iteration(w, params["sn"]["u"], params["sn"]["v"])
        params["sn"] = {"u": u, "v": v}
    wn = sn_weight(params)
    m = np.asarray(wn.reshape(-1, 16)).T
    s = np.linalg.svd(m, compute_uv=False)
    np.testing.assert_allclose(s[0], 1.0, rtol=1e-3)


def test_sn_weight_gradient_flows_through_sigma(key):
    w = jax.random.normal(key, (3, 3, 4, 4))
    params = {"w": w, "sn": sn_init(key, w)}

    def f(p):
        return jnp.sum(sn_weight(p) ** 2)

    g = jax.grad(f)(params)
    assert float(jnp.abs(g["w"]).max()) > 0
    # u/v carry no gradient (stop_gradient), like torch's requires_grad=False
    assert float(jnp.abs(g["sn"]["u"]).max()) == 0.0
    assert float(jnp.abs(g["sn"]["v"]).max()) == 0.0


def test_update_spectral_norms_walks_nested_trees(key):
    w = jax.random.normal(key, (3, 3, 4, 8))
    tree = {"layer": {"w": w, "sn": sn_init(key, w), "b": jnp.zeros(8)},
            "plain": {"w": jnp.ones((3, 3, 2, 2)), "b": jnp.zeros(2)}}
    out = update_spectral_norms(tree)
    assert not np.allclose(np.asarray(out["layer"]["sn"]["u"]),
                           np.asarray(tree["layer"]["sn"]["u"]))
    np.testing.assert_array_equal(np.asarray(out["plain"]["w"]),
                                  np.asarray(tree["plain"]["w"]))


def test_st_bernoulli_values_and_gradient(key):
    p = jnp.full((1000,), 0.3)
    s = st_bernoulli(key, p)
    assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}
    assert abs(float(s.mean()) - 0.3) < 0.06
    # straight-through: gradient of sum(sample) w.r.t. p is all-ones
    g = jax.grad(lambda p: jnp.sum(st_bernoulli(key, p)))(p)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_hard_threshold():
    x = jnp.array([0.2, 0.5, 0.7])
    np.testing.assert_array_equal(np.asarray(hard_threshold(x)), [0.0, 0.0, 1.0])


def test_gaussian_smooth_preserves_mass(key):
    x = jax.random.uniform(key, (1, 32, 32, 3))
    y = gaussian_smooth2d(x, kernel_size=5, sigma=1.0)
    assert y.shape == x.shape
    # interior mass approximately preserved (normalized kernel)
    np.testing.assert_allclose(
        float(y[0, 8:24, 8:24].mean()), float(x[0, 8:24, 8:24].mean()), atol=0.02
    )


def test_coord_channels_range():
    cx, cy = coord_channels(2, 8, 8)
    assert cx.shape == (2, 8, 8, 1)
    assert float(cx.min()) == -1.0 and float(cx.max()) < 1.0
