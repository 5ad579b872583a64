"""Training objectives — one pure function over (params, batch, key).

Reproduces the reference's full objective set (reference main.py:106-312):

  * multi-step BPTT reconstruction (pixel BCE) with done-masking
  * reward MSE (theta-scheduled, REWARD_COEF-weighted)
  * optional truncated BPTT (stop_gradient on the transition input)
  * optional latent overshooting (Hafner et al.; main.py:217-234)
  * latent TD(lambda) — declared by the reference's flags with its loss
    helper (main.py:37-39,302-303) but never wired into train(); wired here
    as a windowed variant of overshooting with lambda^k weights.
  * counterfactual disentanglement (factor-swap) regularizer (main.py:242-262)
  * counterfactual action-control regularizer (main.py:264-283)
  * activation/transition L1 sparsity — present but commented out in the
    reference (main.py:199-213); implemented behind coefficients that
    default to *disabled* to match reference behavior.

The time loop is a single ``lax.scan`` over a time-major batch; latent
overshooting keeps its growing latent set in a (T, B, H, W, L) buffer whose
slots advance in one batched transition call per step (the slot axis folds
into the batch axis — one big MXU conv instead of t small ones).

Losses accumulate in float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scmgan_tpu.models.world_model import (
    WorldModel,
    decode,
    encode,
    predict_reward,
    transition,
)


class LossConfig(NamedTuple):
    """Static (compile-time) loss switches; traced scalars stay out of here."""

    horizon: int                 # this iteration's prediction horizon
    truncate_bptt: bool = False
    latent_overshooting: bool = False
    latent_td: bool = False
    td_steps: int = 3
    enable_cf_shuffle: bool = False
    enable_cf_control: bool = False
    counterfactual_horizon: int = 1
    reward_coef: float = 1e-3
    td_lambda: float = 0.9
    cf_lambda: float = 1e-2
    activation_l1_coef: float = 0.0   # reference default: disabled
    transition_l1_coef: float = 0.0   # reference default: disabled
    deterministic_transition: bool = False  # ablation: no Bernoulli sampling
    remat_transition: bool = False    # recompute the BPTT-scan transition
                                      # activations in backward (memory for
                                      # flops; see scripts/bench_remat.py)
    scan_unroll: int = 1              # lax.scan unroll factor for the BPTT
                                      # time loop: ~10% faster steps at
                                      # full unroll (XLA schedules across
                                      # step boundaries) for more compile
                                      # time per horizon bucket


def bce_from_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-element binary cross entropy, computed stably from logits.

    Equals the reference's F.binary_cross_entropy(sigmoid(logits), target)
    (main.py:189,310-312) without the intermediate probability round-trip.
    """
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def decoder_pixel_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B,): BCE mean over pixels+channels
    (reference main.py:310-312)."""
    return bce_from_logits(logits.astype(jnp.float32),
                           targets.astype(jnp.float32)).mean(axis=(1, 2, 3))


def latent_state_loss(target: jax.Array, predicted: jax.Array) -> jax.Array:
    """(B, H, W, L) -> (B,): latent MSE (reference main.py:306-307)."""
    d = target.astype(jnp.float32) - predicted.astype(jnp.float32)
    return (d * d).mean(axis=(1, 2, 3))


def _swap_two_factors(key, z, latent_dim):
    """Per-sample swap of two random latent channels of z (B, H, W, L).

    Vectorized equivalent of the reference's per-sample python loop
    (main.py:247-253).  Returns (z_swapped, unswapped_map (B, L)).
    """
    b = z.shape[0]
    ka, kb = jax.random.split(key)
    idx_a = jax.random.randint(ka, (b,), 0, latent_dim)
    idx_b = jax.random.randint(kb, (b,), 0, latent_dim)
    base = jnp.broadcast_to(jnp.arange(latent_dim), (b, latent_dim))
    perm = base.at[jnp.arange(b), idx_a].set(idx_b)
    perm = perm.at[jnp.arange(b), idx_b].set(idx_a)
    # NOTE: like the reference, if idx_a == idx_b the swap is a no-op but the
    # factor still counts as "swapped" (excluded from the penalty map).
    z_swapped = jnp.take_along_axis(z, perm[:, None, None, :], axis=-1)
    unswapped = jnp.ones((b, latent_dim), jnp.float32)
    unswapped = unswapped.at[jnp.arange(b), idx_a].set(0.0)
    unswapped = unswapped.at[jnp.arange(b), idx_b].set(0.0)
    return z_swapped, unswapped


def world_model_loss(
    params: WorldModel,
    batch,
    key: jax.Array,
    theta: jax.Array,
    cf_active: jax.Array,
    cfg: LossConfig,
):
    """Full training objective for one batch.

    Args:
      params: the five networks.
      batch: (obs (B,T,H,W,C), rewards (B,T,R), dones (B,T), actions (B,T))
        with T >= cfg.horizon.
      key: PRNG key (drives Bernoulli sampling and CF randomization).
      theta: train_iter / train_iters curriculum scalar (main.py:143).
      cf_active: 1.0 on iterations where the CF regularizers fire
        (train_iter % CF_REGULARIZATION_RATE == 0, main.py:242,268).
      cfg: static switches.

    Returns (loss, metrics_dict).
    """
    obs, rewards, dones, actions = batch
    b, t_total = obs.shape[0], obs.shape[1]
    horizon = cfg.horizon
    assert t_total >= horizon, (t_total, horizon)
    latent_dim = params.encoder["conv4"]["w"].shape[-1]
    num_actions = params.transition["conv1"]["w"].shape[2] - latent_dim

    f32 = jnp.float32
    rewards = rewards.astype(f32)
    done_f = dones.astype(f32)
    actions_oh = jax.nn.one_hot(actions, num_actions, dtype=obs.dtype)

    # time-major views for scan
    obs_tm = jnp.swapaxes(obs, 0, 1)          # (T, B, H, W, C)
    rew_tm = jnp.swapaxes(rewards, 0, 1)      # (T, B, R)
    done_tm = jnp.swapaxes(done_f, 0, 1)      # (T, B)
    act_tm = jnp.swapaxes(actions_oh, 0, 1)   # (T, B, A)

    # Encode initial state from frames 0..2 (reference main.py:162).
    z0 = encode(params.encoder, obs[:, 0:3])
    z_orig = z0

    n_steps = horizon - 2  # t = 1 .. horizon-2 inclusive (main.py:177)
    key, scan_key = jax.random.split(key)
    step_keys = jax.random.split(scan_key, n_steps)

    use_lo = cfg.latent_overshooting
    use_td = cfg.latent_td
    lo_window = horizon if use_lo else (cfg.td_steps + 2 if use_td else 0)

    class Carry(NamedTuple):
        z: jax.Array
        active: jax.Array
        loss: jax.Array
        lo_loss: jax.Array
        rew_loss_sum: jax.Array
        rec_loss_sum: jax.Array
        lo_buf: jax.Array       # (B, S, H, W, L) overshooting latents
        lo_valid: jax.Array     # (S,) slot validity

    hh, ww = z0.shape[1], z0.shape[2]
    # Batch-major slot buffer: the (B, S) -> (B*S) flatten below keeps the
    # sharded batch axis as the *major* factor of the merged dim, which
    # GSPMD propagates natively (slot-major layout forced the partitioner
    # to re-shard the whole O(T^2) overshooting graph — multi-minute
    # compiles on an 8-device mesh).
    lo_buf0 = jnp.zeros((b, max(lo_window, 1), hh, ww, latent_dim), z0.dtype)
    carry0 = Carry(
        z=z0,
        active=jnp.ones((b,), f32),
        loss=jnp.zeros((), f32),
        lo_loss=jnp.zeros((), f32),
        rew_loss_sum=jnp.zeros((), f32),
        rec_loss_sum=jnp.zeros((), f32),
        lo_buf=lo_buf0,
        lo_valid=jnp.zeros((max(lo_window, 1),), f32),
    )

    def scan_step(carry: Carry, inp):
        t, k_t = inp  # t in 1..horizon-2
        z, active = carry.z, carry.active
        active = active * (1.0 - done_tm[t])

        # --- reward loss (main.py:180-185) --------------------------------
        expected_r = predict_reward(params.reward_predictor, z).astype(f32)
        r_diff = jnp.mean(
            jnp.mean((expected_r - rew_tm[t]) ** 2, axis=1) * active
        )

        # --- reconstruction loss (main.py:187-197) -------------------------
        logits = decode(params.decoder, z)
        rec_vec = decoder_pixel_loss(logits, obs_tm[t])
        rec_loss = jnp.mean(rec_vec * active)

        loss = carry.loss + theta * cfg.reward_coef * r_diff + rec_loss

        # optional L1 sparsity (reference main.py:199-213, disabled there)
        if cfg.activation_l1_coef:
            l1 = jnp.abs(z.astype(f32)).mean(axis=(1, 2, 3))
            loss = loss + theta * cfg.activation_l1_coef * jnp.mean(l1 * active)

        # --- truncated BPTT: detach the transition input (main.py:192-193) -
        z_in = jax.lax.cond(
            t > 1, jax.lax.stop_gradient, lambda x: x, z
        ) if cfg.truncate_bptt else z

        # --- transition (main.py:205-215) ----------------------------------
        k_trans, k_enc, k_lo = jax.random.split(k_t, 3)
        trans_fn = lambda p, zz, aa, kk: transition(
            p, zz, aa, kk, train=True,
            deterministic=cfg.deterministic_transition)
        if cfg.remat_transition:
            trans_fn = jax.checkpoint(trans_fn)
        new_z = trans_fn(params.transition, z_in, act_tm[t], k_trans)

        if cfg.transition_l1_coef:
            tl1 = jnp.abs((new_z - z_in).astype(f32)).mean(axis=(1, 2, 3))
            loss = loss + theta * cfg.transition_l1_coef * jnp.mean(tl1 * active)

        lo_loss = carry.lo_loss
        lo_buf, lo_valid = carry.lo_buf, carry.lo_valid
        if use_lo or use_td:
            # Latent overshooting (main.py:217-234): keep re-encoded latents
            # from every previous step and advance them all by this step's
            # action[t-1]; penalize old predictions against the fresh
            # (detached) encoding.  TD(lambda) uses the same machinery with a
            # td_steps window and lambda^age weights.
            s = lo_buf.shape[1]
            slot_ids = jnp.arange(s)
            # advance all currently-valid slots with action[t-1].
            # Rematerialized: the backward pass otherwise keeps the conv
            # activations of this S*B-batch transition for every scan step
            # — at horizon 10 that alone exceeds HBM (observed 17.9G of
            # 15.75G).  Recomputing them costs ~1/3 extra LO FLOPs.
            flat = lo_buf.reshape(b * s, hh, ww, latent_dim)
            a_rep = jnp.repeat(act_tm[t - 1], s, axis=0)
            lo_advance = jax.checkpoint(
                lambda p, x, a, k: transition(
                    p, x, a, k, train=True,
                    deterministic=cfg.deterministic_transition))
            adv = lo_advance(params.transition, flat, a_rep, k_lo)
            adv = adv.reshape(b, s, hh, ww, latent_dim)
            lo_buf = jnp.where(
                lo_valid[None, :, None, None, None] > 0, adv, lo_buf
            )
            # fresh encoding of window t-1:t+2 -> slot (t mod S)
            # (also rematerialized — one encoder activation set per scan
            # step adds up across the unrolled-backward scan)
            fresh = jax.checkpoint(encode)(
                params.encoder,
                jax.lax.dynamic_slice_in_dim(obs_tm, t - 1, 3, axis=0)
                .swapaxes(0, 1),
            )
            slot = t % s if use_td else t
            slot = jnp.asarray(slot) % s
            lo_buf = jax.lax.dynamic_update_index_in_dim(
                lo_buf, fresh[:, None], slot, axis=1
            )
            age = (t - slot_ids) % s if use_td else (t - slot_ids)
            if use_lo:
                # reference weights every pair by td_lambda once
                # (main.py:230) and sums pairs t_a in [2, t-2].
                pair_ok = (slot_ids >= 2) & (slot_ids <= t - 2)
                w_pair = jnp.where(pair_ok & (lo_valid > 0), cfg.td_lambda, 0.0)
            else:
                pair_ok = (age >= 1) & (age <= cfg.td_steps) & (slot_ids != slot)
                w_pair = jnp.where(
                    pair_ok & (lo_valid > 0), cfg.td_lambda ** age.astype(f32), 0.0
                )
            target = jax.lax.stop_gradient(fresh)
            per_slot = jax.vmap(
                lambda pred: jnp.mean(latent_state_loss(target, pred) * active),
                in_axes=1,
            )(lo_buf)
            lo_loss = lo_loss + jnp.sum(w_pair * per_slot)
            lo_valid = lo_valid.at[slot].set(1.0)

        new_carry = Carry(
            z=new_z,
            active=active,
            loss=loss,
            lo_loss=lo_loss,
            rew_loss_sum=carry.rew_loss_sum + r_diff,
            rec_loss_sum=carry.rec_loss_sum + rec_loss,
            lo_buf=lo_buf,
            lo_valid=lo_valid,
        )
        return new_carry, None

    ts = jnp.arange(1, horizon - 1)
    carry, _ = jax.lax.scan(scan_step, carry0, (ts, step_keys),
                            unroll=max(1, cfg.scan_unroll))

    loss = carry.loss
    metrics = {
        "reward_loss": carry.rew_loss_sum,
        "reconstruction_loss": carry.rec_loss_sum,
    }
    if use_lo or use_td:
        loss = loss + theta * carry.lo_loss
        metrics["lo_loss"] = carry.lo_loss

    z_final, active = carry.z, carry.active

    # ----- counterfactual disentanglement (main.py:236-262) ----------------
    if cfg.enable_cf_shuffle:
        key, k_swap, k_roll = jax.random.split(key, 3)
        z_cf_b, unswapped = _swap_two_factors(k_swap, z_orig, latent_dim)
        for t in range(1, cfg.counterfactual_horizon):
            k_roll, k_t = jax.random.split(k_roll)
            z_cf_b = transition(params.transition, z_cf_b, actions_oh[:, t],
                                k_t, train=True,
                                deterministic=cfg.deterministic_transition)
        drift = jnp.abs(
            z_final.astype(f32) - z_cf_b.astype(f32)
        ).mean(axis=(1, 2))                       # (B, L)
        cf_loss = cfg.cf_lambda * jnp.mean(
            (drift * unswapped).mean(axis=-1) * active
        )
        loss = loss + cf_active * cf_loss
        metrics["cf_disentanglement_loss"] = cf_loss

    # ----- counterfactual action-control (main.py:264-283) -----------------
    if cfg.enable_cf_control:
        key, k_perm, k_roll = jax.random.split(key, 3)
        # np.random.shuffle(actions) shuffles the *batch* axis (main.py:274-275)
        perm = jax.random.permutation(k_perm, b)
        cf_actions = actions_oh[perm]
        z_cf_b = z_orig
        for t in range(1, cfg.counterfactual_horizon):
            k_roll, k_t = jax.random.split(k_roll)
            z_cf_b = transition(params.transition, z_cf_b, cf_actions[:, t],
                                k_t, train=True,
                                deterministic=cfg.deterministic_transition)
        eps = 1e-3
        div = jnp.abs(z_final.astype(f32) - z_cf_b.astype(f32)).mean(
            axis=(1, 2, 3)
        )
        ctrl_loss = cfg.cf_lambda * jnp.mean(-jnp.log(div + eps) * active)
        loss = loss + cf_active * ctrl_loss
        metrics["cf_control_loss"] = ctrl_loss

    metrics["loss"] = loss
    return loss, metrics
