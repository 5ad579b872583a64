"""Serving-student distillation (scmgan_tpu/train/distill.py)."""

import jax
import jax.numpy as jnp
import optax
import pytest

from scmgan_tpu.data.datasource import allocate_datasource
from scmgan_tpu.models.quantized import activation_scales
from scmgan_tpu.models.world_model import init_transition, init_world_model
from scmgan_tpu.train.distill import (
    fake_quant_transition,
    make_distill_step,
    measure_fidelity,
)


@pytest.fixture(scope="module")
def setup():
    ds = allocate_datasource("gridworld", seed=0)
    spec = ds.spec
    teacher = init_world_model(
        jax.random.PRNGKey(0), 16, spec.num_actions, spec.num_rewards,
        spec.channels, spec.channels, hidden=32,
        img_size=(spec.height, spec.width))
    return ds, spec, teacher


def test_distill_step_learns(setup):
    """A few steps against a fixed (random-init) teacher must reduce the
    imitation BCE and keep shapes/dtypes stable."""
    _, spec, teacher = setup
    student = init_transition(jax.random.PRNGKey(1), 16, spec.num_actions,
                              hidden=16)
    tx = optax.chain(optax.clip(0.1), optax.adam(1e-3))
    opt_state = tx.init(student)
    step = make_distill_step(spec, teacher, tx, batch_size=4, rollout_len=4)

    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        student, opt_state, loss, bits = step(student, opt_state, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(bits) <= 1.0
    # SN state stayed finite through the power-iteration refresh
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(student)
    )


def test_distill_step_on_policy_mix(setup):
    """The DAgger mix (p_on_policy > 0) must run under the same jit
    compilation (scalar prob is a traced arg, not a static one) and keep
    learning: the rollout carry visits student states, teacher labels."""
    _, spec, teacher = setup
    student = init_transition(jax.random.PRNGKey(3), 16, spec.num_actions,
                              hidden=16)
    tx = optax.chain(optax.clip(0.1), optax.adam(1e-3))
    opt_state = tx.init(student)
    step = make_distill_step(spec, teacher, tx, batch_size=4, rollout_len=4)

    key = jax.random.PRNGKey(4)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        # ramp 0 -> 1 like the driver script; distinct floats must not
        # retrigger compilation (weak-typed 0-d tracer)
        student, opt_state, loss, _ = step(student, opt_state, k, i / 8.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert step._cache_size() == 1


def test_fake_quant_transition_grid_and_grads(setup):
    """The QAT forward must (a) produce probabilities, (b) place its
    hidden weights on the serving int8 grid (round-trip through
    quantization changes nothing), and (c) pass gradients through the
    straight-through estimator to every parameter."""
    _, spec, _ = setup
    params = init_transition(jax.random.PRNGKey(5), 16, spec.num_actions,
                             hidden=16)
    key = jax.random.PRNGKey(6)
    z = (jax.random.uniform(key, (2, spec.height, spec.width, 16))
         > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([0, 1]), spec.num_actions,
                       dtype=jnp.float32)
    scales = activation_scales(params, z, a)
    p = fake_quant_transition(params, scales, z, a)
    assert p.shape == z.shape
    assert bool(jnp.all((p >= 0) & (p <= 1)))

    def loss(sp):
        return jnp.mean(fake_quant_transition(sp, scales, z, a))

    grads = jax.grad(loss)(params)
    # every conv weight receives gradient signal through the STE
    for name in ("conv1", "conv3", "conv6"):
        g = grads[name]["w"]
        assert bool(jnp.any(g != 0)), name
        assert bool(jnp.all(jnp.isfinite(g)))


def test_distill_step_qat(setup):
    """QAT distillation must run jitted with act_scale as a traced pytree
    and reduce the fake-quant imitation BCE."""
    _, spec, teacher = setup
    student = init_transition(jax.random.PRNGKey(7), 16, spec.num_actions,
                              hidden=16)
    tx = optax.chain(optax.clip(0.1), optax.adam(1e-3))
    opt_state = tx.init(student)
    step = make_distill_step(spec, teacher, tx, batch_size=4, rollout_len=4,
                             qat=True)
    key = jax.random.PRNGKey(8)
    z = (jax.random.uniform(key, (4, spec.height, spec.width, 16))
         > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.zeros((4,), jnp.int32), spec.num_actions,
                       dtype=jnp.float32)
    losses = []
    for i in range(8):
        key, k = jax.random.split(key)
        if i % 4 == 0:  # periodic recalibration, like the driver
            scales = activation_scales(student, z, a)
        student, opt_state, loss, bits = step(
            student, opt_state, k, 0.5, scales)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert 0.0 <= float(bits) <= 1.0


def test_measure_fidelity_gate(setup, tmp_path):
    """The teacher against itself is a perfect student: deltas 0, gate
    open; a random student must report larger error than the teacher."""
    ds, spec, teacher = setup
    fid = measure_fidelity(
        teacher, teacher.transition, ds, str(tmp_path / "self"),
        eval_batch_size=8, eval_timesteps=14, horizons=(3, 5, 10),
        include_int8=False)
    assert fid["within_1pct"]
    assert abs(fid["mse10_delta_pct"]) < 1e-6

    rand = init_transition(jax.random.PRNGKey(9), 16, spec.num_actions,
                           hidden=16)
    # include_int8: the gate must be scored on the calibrated-int8 engine
    # (what actually serves), recorded as int8_delta_pct
    fid_r = measure_fidelity(
        teacher, rand, ds, str(tmp_path / "rand"),
        eval_batch_size=8, eval_timesteps=14, horizons=(3, 5, 10))
    assert set(fid_r["delta_pct"]) == {3, 5, 10}
    assert set(fid_r["int8_delta_pct"]) == {3, 5, 10}
    assert fid_r["mse10_delta_pct"] is None or isinstance(
        fid_r["mse10_delta_pct"], float)


def test_gt_finetune_step_descends_gate_metric(setup):
    """The ground-truth fine-tune stage (make_gt_finetune_step) must
    backprop through the binarized free-run: a few steps on a fixed env
    reduce the free-run pixel MSE the fidelity gate reads, with a QAT
    fake-quant forward and finite SN state throughout."""
    from scmgan_tpu.train.distill import make_gt_finetune_step

    ds, spec, teacher = setup
    student = init_transition(jax.random.PRNGKey(5), 16, spec.num_actions,
                              hidden=16)
    tx = optax.chain(optax.clip(0.1), optax.adam(3e-3))
    opt_state = tx.init(student)
    ft = make_gt_finetune_step(spec, teacher, tx, batch_size=4, horizon=6,
                               qat=True)

    obs, _, _, actions = ds.collect(8, 12, key=jax.random.PRNGKey(6))
    from scmgan_tpu.models.world_model import encode

    z_cal = (encode(teacher.encoder, obs[:, :3].astype(jnp.float32))
             > 0.5).astype(jnp.float32)
    a_oh = jax.nn.one_hot(actions, spec.num_actions, dtype=jnp.float32)
    act_scale = activation_scales(student, z_cal, a_oh[:, 2:11])

    key = jax.random.PRNGKey(7)
    means = []
    for _ in range(6):
        key, k = jax.random.split(key)
        student, opt_state, gate, mean_mse = ft(
            student, opt_state, k, act_scale)
        means.append(float(mean_mse))
    assert means[-1] < means[0]
    assert float(gate) >= 0.0
    assert all(
        bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(student)
    )
