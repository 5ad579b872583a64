"""Multi-device tests on the virtual 8-CPU mesh: dp/tp sharded training
steps execute and match single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.config import Config
from scmgan_tpu.data import allocate_datasource
from scmgan_tpu.parallel import (
    batch_shardings,
    leaf_spec,
    make_mesh,
    param_shardings,
    shard_pytree,
)
from scmgan_tpu.train.trainer import init_train_state, make_train_step

from jax.sharding import PartitionSpec as P


def _require_multi_device():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (xla_force_host_platform_device_count)")


def test_virtual_device_count():
    _require_multi_device()
    assert jax.device_count() >= 8


def test_leaf_spec_rules():
    assert leaf_spec((3, 3, 16, 128), 2, "model") == P(None, None, None, "model")
    assert leaf_spec((3, 3, 16, 127), 2, "model") == P()  # not divisible
    assert leaf_spec((128,), 2, "model") == P("model")
    assert leaf_spec((64, 32), 2, "model") == P(None, "model")
    assert leaf_spec((), 2, "model") == P()
    assert leaf_spec((3, 3, 16, 128), 1, "model") == P()  # no model axis


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_train_step_runs(mesh_shape):
    """dp(+tp) train step on the virtual mesh: compiles, executes, and the
    resulting params remain finite and correctly sharded."""
    _require_multi_device()
    cfg = Config(env="gridworld", latent_dim=8, batch_size=8, train_iters=10)
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    mesh = make_mesh(mesh_shape)
    state = init_train_state(cfg, ds.spec, key)
    batch = ds.collect(cfg.batch_size, 5)
    step = make_train_step(cfg, horizon=5, mesh_and_rules=mesh)
    state2, metrics = step(state, batch, key, jnp.float32(0.5), jnp.float32(0.0))
    assert np.isfinite(float(metrics["loss"]))
    w = state2.params.transition["conv2"]["w"]  # (3,3,128,128)
    if mesh_shape[1] > 1:
        spec = w.sharding.spec
        assert spec[-1] == "model"


def test_dp_matches_single_device_numerics():
    """The same step on a (8,1) data-parallel mesh and on one device
    produces the same loss and parameters (up to float tolerance)."""
    _require_multi_device()
    cfg = Config(env="gridworld", latent_dim=8, batch_size=8, train_iters=10,
                 compute_dtype="float32")
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(0)
    batch = ds.collect(cfg.batch_size, 5)

    state_a = init_train_state(cfg, ds.spec, key)
    state_b = jax.tree.map(lambda x: x.copy(), state_a)

    step_single = make_train_step(cfg, horizon=5)
    mesh = make_mesh((8, 1))
    step_dp = make_train_step(cfg, horizon=5, mesh_and_rules=mesh)

    out_a, m_a = step_single(state_a, batch, key, jnp.float32(0.5), jnp.float32(0.0))
    out_b, m_b = step_dp(state_b, batch, key, jnp.float32(0.5), jnp.float32(0.0))
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_a.params.encoder["conv4"]["w"]),
        np.asarray(out_b.params.encoder["conv4"]["w"]),
        rtol=2e-3, atol=2e-5,
    )


def test_batch_shardings_place_on_data_axis():
    _require_multi_device()
    mesh = make_mesh((8, 1))
    x = jnp.zeros((8, 4, 16, 16, 3))
    sharded = shard_pytree((x,), batch_shardings((x,), mesh))[0]
    assert sharded.sharding.spec[0] == "data"


def test_distributed_init_noop_single_process(monkeypatch):
    from scmgan_tpu.parallel import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize() is False


def test_process_batch_slice_single():
    from scmgan_tpu.parallel import distributed

    local, offset = distributed.process_batch_slice(32)
    assert local == 32 and offset == 0


def test_lo_dp_matches_single_device_numerics():
    """Latent overshooting (the O(T^2) objective) on a dp mesh matches
    single-device numerics — the sharded compile of every trainable
    objective is demonstrated, not just the plain BPTT step."""
    _require_multi_device()
    # horizon 6: the first step with a nonzero LO pair set is t=4
    # (the reference sums pairs t_a in [2, t-2], main.py:230)
    cfg = Config(env="gridworld", latent_dim=8, batch_size=8, train_iters=10,
                 latent_overshooting=True, horizon_min=6, horizon_max=6,
                 compute_dtype="float32")
    ds = allocate_datasource(cfg.env)
    key = jax.random.PRNGKey(1)
    batch = ds.collect(cfg.batch_size, 7)

    state_a = init_train_state(cfg, ds.spec, key)
    state_b = jax.tree.map(lambda x: x.copy(), state_a)

    step_single = make_train_step(cfg, horizon=6)
    mesh = make_mesh((8, 1))
    step_dp = make_train_step(cfg, horizon=6, mesh_and_rules=mesh)

    out_a, m_a = step_single(state_a, batch, key, jnp.float32(0.5),
                             jnp.float32(0.0))
    out_b, m_b = step_dp(state_b, batch, key, jnp.float32(0.5),
                         jnp.float32(0.0))
    assert float(m_a["lo_loss"]) > 0.0
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_a["lo_loss"]), float(m_b["lo_loss"]),
                               rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_a.params.transition["conv6"]["w"]),
        np.asarray(out_b.params.transition["conv6"]["w"]),
        rtol=2e-3, atol=2e-5,
    )


def test_spatial_sharded_transition():
    """Spatial partitioning: H split over the 'model' axis; GSPMD inserts
    the halo exchanges for the 3x3 windows and torus wrap rows.  Output
    must match the unsharded transition exactly and stay H-sharded."""
    from jax.sharding import NamedSharding

    from scmgan_tpu.models import init_world_model, transition
    from scmgan_tpu.parallel import spatial_activation_sharding

    mesh = make_mesh((2, 4))
    key = jax.random.PRNGKey(0)
    wm = init_world_model(key, 8, 4, 1, 3, 3, img_size=16)
    z = (jax.random.uniform(key, (4, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([0, 1, 2, 3]), 4)
    ref = transition(wm.transition, z, a, train=False)

    zsh = spatial_activation_sharding(mesh)
    ash = NamedSharding(mesh, P("data", None))
    f = jax.jit(lambda z, a: transition(wm.transition, z, a, train=False),
                in_shardings=(zsh, ash), out_shardings=zsh)
    out = f(jax.device_put(z, zsh), jax.device_put(a, ash))
    assert float((jnp.asarray(out) == ref).mean()) == 1.0
    assert out.sharding.is_equivalent_to(zsh, 4)
