"""Training engine: optimizers, the jitted+sharded train step, and the
outer loop with the horizon curriculum, periodic evaluation, and
checkpointing.

Reference behavior reproduced (reference main.py:106-298):
  * one Adam per network at the same learning rate (main.py:125-129)
  * elementwise gradient value-clipping at 0.1 for encoder/transition/
    decoder only (main.py:287-290)
  * reward_predictor always steps; the other nets are frozen under
    ``--finetune-reward`` (main.py:292-296)
  * linear horizon curriculum from horizon_min to horizon_max
    (main.py:143-145)
  * evaluation + checkpoint every ITERS_PER_VIDEO=2000 iterations
    (main.py:133-141)

TPU-native structure:
  * The horizon takes at most (horizon_max - horizon_min + 1) distinct
    values over a run, so it is a *static* compile-time constant: each
    horizon bucket compiles once and the scan has no wasted steps, instead
    of padding every iteration to horizon_max.
  * Spectral-norm u/v power iteration is a pure post-step param update
    (see scmgan_tpu.ops.spectral_norm).
  * The step is jit-compiled with donated state; under a device mesh the
    batch is sharded over the 'data' axis and the 128-channel conv weights
    over 'model' (see scmgan_tpu.parallel).
"""

from __future__ import annotations

import functools
import time
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from scmgan_tpu.config import Config
from scmgan_tpu.models.world_model import WorldModel, init_world_model
from scmgan_tpu.ops.spectral_norm import update_spectral_norms
from scmgan_tpu.train.losses import LossConfig, world_model_loss


class TrainState(NamedTuple):
    params: WorldModel
    opt_state: Any
    step: jax.Array


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Per-network Adam with value clipping on enc/dec/trans
    (reference main.py:125-129,287-296)."""
    clipped = optax.chain(
        optax.clip(cfg.grad_clip_value),
        optax.adam(cfg.learning_rate),
    )
    plain = optax.adam(cfg.learning_rate)
    frozen = optax.set_to_zero()
    wm_label = "frozen" if cfg.finetune_reward else "clipped"
    labels = WorldModel(
        encoder=wm_label,
        decoder=wm_label,
        transition=wm_label,
        reward_predictor="plain",
        discriminator="plain",
    )
    # optax.multi_transform accepts a prefix pytree of labels; a WorldModel
    # of strings labels each network's whole subtree.
    return optax.multi_transform(
        {"clipped": clipped, "plain": plain, "frozen": frozen}, labels
    )


def init_train_state(cfg: Config, spec, key: jax.Array) -> TrainState:
    params = init_world_model(
        key,
        cfg.latent_dim,
        spec.num_actions,
        spec.num_rewards,
        spec.channels,
        spec.channels,
        hidden=cfg.hidden_dim,
        img_size=(spec.height, spec.width),
        dtype=cfg.pdtype,
    )
    opt = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=opt.init(params),
        step=jnp.asarray(cfg.start_iter, jnp.int32),
    )


def horizon_at(cfg: Config, train_iter: int) -> int:
    """Linear curriculum (reference main.py:143-145)."""
    theta = train_iter / cfg.train_iters
    delta = cfg.horizon_max - cfg.horizon_min
    return cfg.horizon_min + int(delta * theta)


def loss_config(cfg: Config, horizon: int) -> LossConfig:
    return LossConfig(
        horizon=horizon,
        truncate_bptt=cfg.truncate_bptt,
        latent_overshooting=cfg.latent_overshooting,
        latent_td=cfg.latent_td,
        td_steps=cfg.td_steps,
        enable_cf_shuffle=cfg.enable_disentanglement_loss,
        enable_cf_control=cfg.enable_action_control_loss,
        counterfactual_horizon=cfg.counterfactual_horizon,
        reward_coef=cfg.reward_coef,
        td_lambda=cfg.td_lambda,
        cf_lambda=cfg.cf_regularization_lambda,
        activation_l1_coef=cfg.activation_l1_coef,
        transition_l1_coef=cfg.transition_l1_coef,
        deterministic_transition=cfg.deterministic_transition,
        remat_transition=cfg.remat_transition,
        scan_unroll=cfg.scan_unroll,
    )


@functools.lru_cache(maxsize=64)
def make_train_step(cfg: Config, horizon: int, mesh_and_rules=None):
    """Build the jitted train step for one horizon bucket.

    Returns fn(state, batch, key, theta, cf_active) -> (state, metrics).
    When ``mesh_and_rules`` is provided (see scmgan_tpu.parallel.mesh),
    inputs/params carry NamedSharding constraints and XLA inserts the ICI
    collectives for dp/tp execution.
    """
    lcfg = loss_config(cfg, horizon)
    opt = make_optimizer(cfg)

    def step_fn(state: TrainState, batch, key, theta, cf_active):
        obs, rewards, dones, actions = batch
        obs = obs.astype(cfg.cdtype)
        grad_fn = jax.value_and_grad(world_model_loss, has_aux=True)
        (loss, metrics), grads = grad_fn(
            state.params, (obs, rewards, dones, actions), key, theta,
            cf_active, lcfg
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # Pure power-iteration refresh of all spectral-norm u/v states —
        # the functional stand-in for the reference's per-forward in-place
        # update (spectral_normalization.py:66-68).
        params = WorldModel(*update_spectral_norms(params))
        return (
            TrainState(params, opt_state, state.step + 1),
            metrics,
        )

    if mesh_and_rules is not None:
        from scmgan_tpu.parallel.mesh import shard_train_step

        return shard_train_step(step_fn, mesh_and_rules)
    return jax.jit(step_fn, donate_argnums=(0,))


def train(
    cfg: Config,
    datasource,
    state: Optional[TrainState] = None,
    *,
    mesh_and_rules=None,
    eval_fn=None,
    checkpoint_fn=None,
    log_fn=None,
    key: Optional[jax.Array] = None,
):
    """The outer training loop (reference train(), main.py:106-298).

    eval_fn(state, train_iter), checkpoint_fn(state, train_iter) and
    log_fn(train_iter, metrics) are host-side hooks; everything else stays
    on device.
    """
    spec = datasource.spec
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    if state is None:
        key, init_key = jax.random.split(key)
        state = init_train_state(cfg, spec, init_key)

    # Multi-host input pipeline: each process's envs produce only its slice
    # of the global batch; shard_train_step assembles the slices into the
    # global 'data'-sharded array (parallel/mesh.py) without any host ever
    # gathering the whole batch.  Single-process: local == global.
    from scmgan_tpu.parallel.distributed import process_batch_slice

    local_batch, batch_offset = process_batch_slice(cfg.batch_size)

    nan_check_every = 200  # cheap training-health watchdog (syncs anyway)
    for train_iter in range(cfg.start_iter, cfg.train_iters + 1):
        if train_iter % cfg.iters_per_video == 0:
            if eval_fn is not None:
                eval_fn(state, train_iter)
            if checkpoint_fn is not None:
                checkpoint_fn(state, train_iter)

        horizon = horizon_at(cfg, train_iter)
        theta = train_iter / cfg.train_iters
        cf_active = 1.0 if train_iter % cfg.cf_regularization_rate == 0 else 0.0

        key, k_data, k_step = jax.random.split(key, 3)
        # decorrelate per-process env streams by the process's batch offset
        k_local = jax.random.fold_in(k_data, batch_offset)
        batch = datasource.collect(local_batch, horizon, key=k_local)
        step = make_train_step(cfg, horizon, mesh_and_rules)
        state, metrics = step(
            state, batch, k_step, jnp.float32(theta), jnp.float32(cf_active)
        )
        if train_iter % nan_check_every == 0:
            # Failure detection (SURVEY §5): a diverged model wastes the
            # rest of the run silently; fail fast with context instead.
            loss_val = float(metrics["loss"])
            if loss_val != loss_val:  # NaN
                raise FloatingPointError(
                    f"training loss became NaN at iter {train_iter} "
                    f"(horizon {horizon}); check learning rate / inputs")
        if log_fn is not None:
            log_fn(train_iter, metrics)
    return state
