"""Pipeline-parallel transition: exactness vs the single-device path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.models.world_model import init_transition, transition
from scmgan_tpu.parallel.pipeline import N_STAGES, pipeline_transition


@pytest.fixture(scope="module")
def pipe_mesh():
    devs = jax.devices()
    if len(devs) < N_STAGES:
        pytest.skip(f"needs {N_STAGES} devices")
    return jax.sharding.Mesh(np.array(devs[:N_STAGES]), ("pipe",))


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    latent, actions, hidden = 8, 4, 32
    params = init_transition(k1, latent, actions, hidden=hidden)
    b, h, w = 8, 16, 16
    z = (jax.random.uniform(k2, (b, h, w, latent)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(
        jax.random.randint(k3, (b,), 0, actions), actions)
    return params, z, a


def test_pipeline_matches_single_device(pipe_mesh, setup):
    params, z, a = setup
    ref = transition(params, z, a, train=False)
    for n_micro in (1, 2, 4):
        out = pipeline_transition(params, z, a, pipe_mesh, n_micro=n_micro)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref)), n_micro


def test_pipeline_probabilities_match(pipe_mesh, setup):
    params, z, a = setup
    probs_ref = transition(params, z, a, train=True, deterministic=True)
    probs = pipeline_transition(params, z, a, pipe_mesh, n_micro=2,
                                sample=False)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               rtol=0, atol=1e-6)


def test_pipeline_under_jit(pipe_mesh, setup):
    params, z, a = setup
    fn = jax.jit(lambda p, z, a: pipeline_transition(
        p, z, a, pipe_mesh, n_micro=4))
    out = fn(params, z, a)
    ref = transition(params, z, a, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
