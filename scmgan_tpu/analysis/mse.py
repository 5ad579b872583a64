"""Prediction-error-vs-horizon measurement — the headline evaluation.

Reproduces the reference's ``measure_prediction_mse`` protocol exactly
(reference main.py:784-893): 100 trajectories x 100 steps, encode once,
free-run the transition in eval mode (hard-threshold latents, detached each
step), and record per-step masked pixel-MSE and reward-MSE means + stddevs;
artifacts are ``mse_{name}_iter_{iter:06d}.json`` +
``mse_stddev_{name}_iter_{iter:06d}.json`` + PNG plots (green pixel curve,
yellow reward curve) and console sparklines.

TPU-native: the entire free-run — all T steps of transition/decoder/
reward-predictor plus the masked-statistics math — is ONE ``lax.scan``
compiled program; the host only trims at the first fully-done step and
writes artifacts.  (The reference runs a Python loop with a host sync per
step, main.py:808-835.)
"""

from __future__ import annotations

import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.models.world_model import (
    WorldModel,
    decode,
    encode,
    predict_reward,
    transition,
)
from scmgan_tpu.utils.timeseries import sparkline


@partial(jax.jit, static_argnames=("num_actions", "transition_fn"))
def _free_run_stats(params: WorldModel, batch, num_actions: int,
                    transition_fn=None):
    """scan the free-run; returns per-step (pixel mse, pixel std, reward
    mse, reward std, active count) for t = 2..T-1.

    ``transition_fn``: optional ``(z, action_onehot) -> z`` override of the
    exact eval-mode transition — lets alternate serving engines (int8,
    distilled students) be scored under the unchanged reference protocol.
    Must return float latents (decoder/reward nets consume them)."""
    obs, rewards, dones, actions = batch
    b, t_total = obs.shape[0], obs.shape[1]
    f32 = jnp.float32
    actions_oh = jax.nn.one_hot(actions, num_actions, dtype=obs.dtype)

    if transition_fn is None:
        transition_fn = lambda z, a: transition(
            params.transition, z, a, train=False)

    # Begin at state t=2: encode frames 0..2, advance once with action[1]
    # (reference main.py:796-799).
    z = encode(params.encoder, obs[:, :3])
    z = transition_fn(z, actions_oh[:, 1])

    obs_tm = jnp.swapaxes(obs, 0, 1)
    rew_tm = jnp.swapaxes(rewards.astype(f32), 0, 1)
    done_tm = jnp.swapaxes(dones.astype(f32), 0, 1)
    act_tm = jnp.swapaxes(actions_oh, 0, 1)

    def masked_stats(diffs, active):
        # reference main.py:816-818: mean/std over the *masked* vector then
        # rescaled by batch/|active| — replicated including torch.std's
        # ddof=1 sample standard deviation.
        n_active = jnp.maximum(jnp.sum(active), 1.0)
        mean = jnp.mean(diffs) * b / n_active
        std = jnp.std(diffs, ddof=1) * b / n_active
        return mean, std

    def step(carry, inp):
        z, active = carry
        t = inp
        active = active * (1.0 - done_tm[t])
        predicted = jax.nn.sigmoid(decode(params.decoder, z).astype(f32))
        expected = obs_tm[t].astype(f32)
        diffs = active * jnp.mean((expected - predicted) ** 2, axis=(1, 2, 3))
        mse_mean, mse_std = masked_stats(diffs, active)

        r_expected = jnp.sum(rew_tm[t], axis=-1)
        r_predicted = jnp.sum(
            predict_reward(params.reward_predictor, z).astype(f32), axis=-1
        )
        r_diffs = active * (r_expected - r_predicted) ** 2
        r_mean, r_std = masked_stats(r_diffs, active)

        z = transition_fn(z, act_tm[t])
        z = jax.lax.stop_gradient(z)
        # Collapse telemetry: total per-factor variance of the carried
        # latent across batch AND space.  Exactly zero means every
        # trajectory carries the identical constant latent — the model has
        # become input-independent from this horizon on (hard-threshold
        # eval latents can hit this fixed point while the MSE curve just
        # goes flat; see the gridworld@10k post-mortem).
        z_var = jnp.sum(jnp.var(z.astype(f32), axis=(0, 1, 2)))
        return (z, active), (mse_mean, mse_std, r_mean, r_std,
                             jnp.sum(active), z_var)

    ts = jnp.arange(2, t_total)
    (_, _), outs = jax.lax.scan(step, (z, jnp.ones((b,), f32)), ts)
    return outs


def measure_prediction_mse(
    params: WorldModel,
    datasource,
    train_iter: int = 0,
    timesteps: int = 100,
    batch_size: int = 100,
    use_training_set: bool = False,
    out_dir: str = ".",
    make_plots: bool = True,
    key: Optional[jax.Array] = None,
    transition_fn=None,
):
    """Returns (mse_losses, mse_stddevs, reward_losses, reward_stddevs) as
    python lists, after writing the reference's JSON/PNG artifacts.
    ``transition_fn`` optionally swaps the serving engine under the same
    protocol (see _free_run_stats)."""
    # training=use_training_set matches the reference's split selection
    # (main.py:791): --evaluate mode passes True (train split), the periodic
    # in-training eval leaves the default False (held-out test split).
    batch = datasource.collect(batch_size, timesteps, key=key,
                               training=use_training_set)
    mse_m, mse_s, rew_m, rew_s, n_active, z_var = (
        np.asarray(x)
        for x in _free_run_stats(params, batch,
                                 datasource.binary_input_channels,
                                 transition_fn=transition_fn)
    )
    # reference breaks at the first step where every trajectory is done
    # (main.py:809-812); active counts are monotone non-increasing.
    alive = n_active > 0
    cut = int(np.argmax(~alive)) if (~alive).any() else len(alive)
    if cut == 0:
        print("Degenerate trajectory, skipping MSE calculation")
        return None
    mse_losses = mse_m[:cut].tolist()
    mse_stddevs = mse_s[:cut].tolist()
    reward_losses = rew_m[:cut].tolist()
    reward_stddevs = rew_s[:cut].tolist()

    collapsed = np.flatnonzero(z_var[:cut] == 0.0)
    if collapsed.size:
        print(
            "WARNING: eval-mode latent collapse at free-run step "
            f"{int(collapsed[0]) + 1}/{cut}: the carried latent is a "
            "batch-wide constant, so predictions are state-independent "
            "from that horizon on (flat MSE curve, degenerate planning). "
            "Usually an undertrained model whose hard-threshold eval "
            "latents hit a fixed point the stochastic train path never "
            "visits — train longer or inspect the causal graph.")

    print("MSE over {} timesteps: min {:.3f} max {:.3f}".format(
        timesteps, min(mse_losses), max(mse_losses)))
    print(sparkline(mse_losses, length=80))
    print("Avg. MSE loss: {}".format(np.mean(mse_losses)))
    print(sparkline(reward_losses, length=80))
    print("Avg. reward MSE loss: {}".format(np.mean(reward_losses)))

    plot_error_graph(mse_losses, mse_stddevs, "pixel", train_iter,
                     facecolor="#00FF00", edgecolor="#00FF00",
                     title="Prediction Error vs. Time (Pixel MSE)",
                     out_dir=out_dir, make_plot=make_plots)
    plot_error_graph(reward_losses, reward_stddevs, "reward", train_iter,
                     facecolor="#FFFF00", edgecolor="#FFFF00",
                     title="Prediction Error vs. Time (Reward)",
                     out_dir=out_dir, make_plot=make_plots)
    return mse_losses, mse_stddevs, reward_losses, reward_stddevs


def plot_error_graph(losses, stddevs, experiment_name: str, train_iter: int,
                     title: str = "", facecolor: str = "#00FF00",
                     edgecolor: str = "#00FF00", out_dir: str = ".",
                     make_plot: bool = True):
    """JSON + PNG artifacts in the reference's exact naming scheme
    (main.py:858-882)."""
    mse_filename = os.path.join(
        out_dir, f"mse_{experiment_name}_iter_{train_iter:06d}.json")
    with open(mse_filename, "w") as fp:
        fp.write(json.dumps(losses, indent=2))
    stddev_filename = os.path.join(
        out_dir, f"mse_stddev_{experiment_name}_iter_{train_iter:06d}.json")
    with open(stddev_filename, "w") as fp:
        fp.write(json.dumps(stddevs, indent=2))

    if not make_plot:
        return
    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots()
    x = np.arange(len(losses))
    mean = np.asarray(losses)
    err = np.asarray(stddevs)
    ax.plot(x, mean, color=edgecolor)
    ax.fill_between(x, mean - err, mean + err, alpha=0.2,
                    facecolor=facecolor, edgecolor=edgecolor)
    ax.set_title(f"Loss: {title}")
    ax.grid(True)
    ax.set_ylim(bottom=0)
    ax.set_ylabel("MSE")
    ax.set_xlabel("Prediction horizon (timesteps)")
    fig.savefig(os.path.join(
        out_dir, f"mse_{experiment_name}_iter_{train_iter:06d}.png"))
    plt.close(fig)
