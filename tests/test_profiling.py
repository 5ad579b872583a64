"""Profiling utilities + trainer failure-detection tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scmgan_tpu.utils.profiling import PhaseTimer, sync, trace


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b", sync_tree=jnp.ones((4,))):
        pass
    assert t.counts["a"] == 2
    assert t.totals["a"] > 0
    assert "phase timings" in t.summary()
    assert "a" in t.summary()


def test_sync_forces_completion():
    x = jnp.ones((8, 8)) * 2
    sync({"x": x})  # must not raise


def test_trace_writes_profile(tmp_path):
    with trace(str(tmp_path / "prof")):
        _ = jnp.dot(jnp.ones((64, 64)), jnp.ones((64, 64))).block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(tmp_path / "prof"):
        found.extend(files)
    assert found, "profiler produced no trace files"


def test_trainer_raises_on_nan():
    from scmgan_tpu.config import Config
    from scmgan_tpu.data import allocate_datasource
    from scmgan_tpu.train.trainer import init_train_state, train

    cfg = Config(env="gridworld", latent_dim=8, batch_size=4, train_iters=1,
                 horizon_min=3, horizon_max=3,
                 learning_rate=1e-4)
    ds = allocate_datasource(cfg.env)
    state = init_train_state(cfg, ds.spec, jax.random.PRNGKey(0))
    # poison the params so the first loss is NaN
    poisoned = state.params._replace(
        encoder=jax.tree.map(
            lambda x: jnp.full_like(x, jnp.nan), state.params.encoder))
    state = state._replace(params=poisoned)
    with pytest.raises(FloatingPointError, match="NaN"):
        # iter 200 multiples trigger the check; start_iter=200 does
        train(cfg.replace(start_iter=200, train_iters=200), ds, state)
