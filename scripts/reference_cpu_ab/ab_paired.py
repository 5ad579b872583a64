"""PAIRED cross-framework A/B on identical weights AND identical
trajectories (round-3 VERDICT #4).

The original ab_compare.py columns average *independent* 100-trajectory
samples, so the per-horizon readout carries ~100% sampling noise at t+10
— a "within 1%" clause cannot be tested at that power.  This script
removes the sampling noise entirely: a fixed trajectory set is drawn once
per replicate from the reference's own ``get_trajectories``, then

  column A: the reference's OWN eval code (measure_prediction_mse,
            /root/reference/main.py:784-855) runs on that fixed set, via
            a get_trajectories monkeypatch (reference code unmodified);
  column B: the SAME weights imported through train/torch_import and the
            SAME fixed set (converted NCHW->NHWC) evaluated by this
            repo's analysis/mse.py.

Both pipelines are deterministic in eval mode (hard-threshold latents),
so within a replicate the per-horizon delta has ZERO sampling variance —
it measures pipeline divergence only.  The reference column runs under
TWO spectral-norm cadences to decompose that divergence:

  sn=live   — the reference's exact behavior: SpectralNorm power-iterates
              u/v inside every forward, INCLUDING eval forwards
              (/root/reference/spectral_normalization.py:66-68), so the
              effective weights drift over the 98-step free-run;
  sn=frozen — one power iteration applied per layer at load (the
              reference's first-forward state, which train/torch_import
              reproduces), then frozen for the whole free-run — the
              semantics this repo uses at eval (DIVERGENCES.md §1).

ours-vs-frozen isolates pure pipeline/arithmetic parity (expected ~0);
ours-vs-live measures the full behavioral delta including the one
documented semantic divergence.  Replicates over independent trajectory
sets give a CI on each delta that trivially resolves 1%.

Reward columns (--rewards, round-4 VERDICT #4): the reference's
get_trajectories returns rewards shaped (1,T,B) (envs/gridworld.py:83,95
— same in betterpong), so its eval's ``rewards[:, t].sum(-1)``
(main.py:822) collapses to the BATCH-SUMMED true reward broadcast
against every trajectory's prediction — as a "reward MSE" the number is
meaningless, but as ARITHMETIC it is perfectly reproducible.  With
--rewards the harness pins the reward-eval arithmetic on identical
weights in both directions:

  ref_native   — the reference eval, unmodified, on its native (1,T,B)
                 rewards (the buggy broadcast);
  ours_bug     — our eval fed rewards where every trajectory's channel
                 holds the batch-sum scalar, which reproduces the
                 reference's broadcast EXACTLY in our pipeline;
  ref_fixedshape — the unmodified reference eval fed (B,T,1) rewards,
                 under which its own line 822 computes the CORRECT
                 per-trajectory expectation (frozen-SN arm only);
  ours         — our eval's native reward curve (always per-trajectory).

ours_bug-vs-ref_native(frozen) and ours-vs-ref_fixedshape are both
pure-arithmetic comparisons expected at ~0.

Usage:
    python scripts/reference_cpu_ab/ab_paired.py \
        --ckpt pretrained_models/reference_ab_gridworld \
        --env gridworld --iter 5000 [--sets 5] [--timesteps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REFERENCE = "/root/reference"
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)

from stubs import (  # noqa: E402
    install_module_stubs,
    patch_legacy_circular_padding,
    patch_torch_cpu,
)


class FixedDatasource:
    """Datasource shim feeding one fixed trajectory batch to this repo's
    measure_prediction_mse (obs NHWC float32, rewards (B,T,R))."""

    def __init__(self, batch, num_actions):
        self.batch = batch
        self.binary_input_channels = num_actions

    def collect(self, batch_size, timesteps, key=None, training=False):
        return self.batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--env", default="gridworld")
    ap.add_argument("--iter", type=int, required=True)
    ap.add_argument("--sets", type=int, default=5,
                    help="independent fixed trajectory sets (replicates)")
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--sn", default="both",
                    choices=["both", "live", "frozen"],
                    help="reference-column spectral-norm cadence arms")
    ap.add_argument("--seed-base", type=int, default=20_000,
                    help="trajectory-set seeds are seed_base+s; use a "
                         "different base to extend an earlier run with "
                         "fresh replicates (pool the per_set lists)")
    ap.add_argument("--rewards", action="store_true",
                    help="add the reward-arithmetic parity columns "
                         "(ref_native / ours_bug / ref_fixedshape / "
                         "ours) — see module docstring")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    os.environ.setdefault("MPLBACKEND", "Agg")
    install_module_stubs()
    patch_torch_cpu()

    import numpy as np
    import torch

    ckpt = os.path.abspath(args.ckpt)
    # the reference parses argv at import time (main.py:25-51)
    sys.argv = ["main.py", "--env", args.env]
    sys.path.insert(0, REFERENCE)
    import main as ref_main  # noqa: E402

    ref_models = sys.modules["models"]
    ref_sn = sys.modules["spectral_normalization"]
    _update_live = ref_sn.SpectralNorm._update_u_v

    def _update_frozen(self):
        # normalize by sigma from the STORED u/v — no power iteration
        # (this repo's eval semantics, DIVERGENCES.md §1)
        import torch as _t

        w = getattr(self.module, self.name + "_bar")
        u = getattr(self.module, self.name + "_u")
        v = getattr(self.module, self.name + "_v")
        height = w.data.shape[0]
        sigma = u.dot(w.view(height, -1).mv(v))
        setattr(self.module, self.name, w / sigma.expand_as(w))

    ds_ref = ref_main.allocate_datasource(args.env)

    latent_dim = 16  # reference main.py:65
    num_actions = ds_ref.binary_input_channels
    num_rewards = ds_ref.scalar_output_channels

    def build_and_load():
        """Fresh nets + checkpoint load per replicate: the reference's
        SpectralNorm mutates u/v on every forward, so a reload resets
        each replicate to the exact checkpoint state (paired with column
        B, which always evaluates the checkpoint weights)."""
        enc = ref_models.Encoder(latent_dim, ds_ref.conv_input_channels)
        dec = ref_models.Decoder(latent_dim, ds_ref.conv_output_channels)
        rp = ref_models.RewardPredictor(latent_dim, num_rewards)
        trans = ref_models.Transition(latent_dim, num_actions)
        patch_legacy_circular_padding(trans)
        for net, name in [(enc, "encoder"), (dec, "decoder"),
                          (rp, "reward_predictor"), (trans, "transition")]:
            net.load_state_dict(torch.load(
                os.path.join(ckpt, f"model-{name}.pth"),
                map_location="cpu"))
        ref_main.test_mode([enc, dec, rp, trans])
        return enc, dec, rp, trans

    # ---- column B setup: import once (no state mutation on our side) --
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

    from scmgan_tpu.analysis.mse import measure_prediction_mse  # noqa: E402
    from scmgan_tpu.train.torch_import import (  # noqa: E402
        load_reference_checkpoint,
    )

    wm = load_reference_checkpoint(ckpt)

    replicates = []
    t_start = time.time()
    for s in range(args.sets):
        np.random.seed(args.seed_base + s)
        states, rewards, dones, actions = (
            np.ascontiguousarray(x) for x in ds_ref.get_trajectories(
                batch_size=args.batch_size, timesteps=args.timesteps))

        # ---- column A: reference's own eval on the fixed set, under
        # each spectral-norm cadence arm ----
        sn_modes = (["live", "frozen"] if args.sn == "both" else [args.sn])
        fixed = (states, rewards, dones, actions)
        orig_get = ds_ref.get_trajectories
        ds_ref.get_trajectories = lambda *a, **k: fixed
        ref_curves = {}
        ref_rew = {}

        def run_ref_eval(mode, tag):
            """One reference-eval pass under SN cadence ``mode``; returns
            (pixel curve, reward curve) read from its own artifacts."""
            ref_sn.SpectralNorm._update_u_v = _update_live
            enc, dec, rp, trans = build_and_load()
            if mode == "frozen":
                # advance every SN layer to its first-forward state
                # (one live iteration — what torch_import reproduces),
                # then freeze sigma there for the whole free-run
                for net in (enc, dec, rp, trans):
                    for m in net.modules():
                        if isinstance(m, ref_sn.SpectralNorm):
                            _update_live(m)
                ref_sn.SpectralNorm._update_u_v = _update_frozen
            cwd = os.getcwd()
            tmp = tempfile.mkdtemp(
                prefix=f"ab_paired_{args.env}_{s}_{tag}_")
            os.chdir(tmp)
            try:
                with torch.no_grad():
                    ref_main.measure_prediction_mse(
                        ds_ref, enc, dec, trans, rp,
                        train_iter=args.iter,
                        timesteps=args.timesteps)
                with open(f"mse_pixel_iter_{args.iter:06d}.json") as f:
                    pixel = [float(x) for x in json.load(f)]
                with open(f"mse_reward_iter_{args.iter:06d}.json") as f:
                    rew = [float(x) for x in json.load(f)]
            finally:
                os.chdir(cwd)
            return pixel, rew

        try:
            for mode in sn_modes:
                ref_curves[mode], ref_rew[f"native_{mode}"] = run_ref_eval(
                    mode, mode)
            if args.rewards:
                # Unmodified reference eval on CORRECT-shape (B,T,1)
                # rewards: its own line 822 then computes per-trajectory
                # expectations.  Frozen arm = pure arithmetic column.
                assert rewards.shape[0] == 1, (
                    "reward columns assume the scalar-env (1,T,B) shape")
                rewards_fixed = np.ascontiguousarray(
                    rewards.transpose(2, 1, 0))
                fixed_shape = (states, rewards_fixed, dones, actions)
                ds_ref.get_trajectories = lambda *a, **k: fixed_shape
                _, ref_rew["fixedshape_frozen"] = run_ref_eval(
                    "frozen", "fixedshape")
        finally:
            ds_ref.get_trajectories = orig_get
            ref_sn.SpectralNorm._update_u_v = _update_live

        # ---- column B: our eval on the imported weights, same set ----
        obs_ours = states.astype(np.float32).transpose(0, 1, 3, 4, 2)
        rew_ours = np.transpose(rewards.astype(np.float32),
                                (2, 1, 0))  # (1,T,B) -> (B,T,1)
        fds = FixedDatasource(
            (obs_ours, rew_ours, dones.astype(np.float32),
             actions.astype(np.int32)), num_actions)
        out_tmp = tempfile.mkdtemp(prefix=f"ab_paired_ours_{s}_")
        ours = measure_prediction_mse(
            wm, fds, train_iter=args.iter, timesteps=args.timesteps,
            batch_size=args.batch_size, out_dir=out_tmp, make_plots=False)
        ours_curve = ours[0]

        n = min(min(len(c) for c in ref_curves.values()), len(ours_curve))
        rep = {f"ref_{m}": c[:n] for m, c in ref_curves.items()}
        rep["ours"] = ours_curve[:n]

        if args.rewards:
            # our native reward curve is per-trajectory (correct shape)
            rep["rew_ours"] = ours[2][:n]
            # emulate the reference's broadcast on our side: every
            # trajectory's expected reward is the batch sum, which is
            # exactly what rewards[:, t].sum(-1) collapses to on (1,T,B)
            scalar_t = rewards[0].sum(-1).astype(np.float32)     # (T,)
            rew_bug = np.broadcast_to(
                scalar_t[None, :, None],
                (args.batch_size, args.timesteps, 1)).copy()
            fds_bug = FixedDatasource(
                (obs_ours, rew_bug, dones.astype(np.float32),
                 actions.astype(np.int32)), num_actions)
            ours_bug = measure_prediction_mse(
                wm, fds_bug, train_iter=args.iter,
                timesteps=args.timesteps, batch_size=args.batch_size,
                out_dir=tempfile.mkdtemp(prefix=f"ab_bug_{s}_"),
                make_plots=False)
            rep["rew_ours_bug"] = ours_bug[2][:n]
            for k, c in ref_rew.items():
                rep[f"rew_ref_{k}"] = c[:n]
        replicates.append(rep)
        msg = " ".join(f"{m}@10 {c[9]:.6f}" for m, c in ref_curves.items())
        print(f"set {s}: n={n} horizons, {msg} "
              f"ours@10 {ours_curve[9]:.6f}  "
              f"({time.time() - t_start:.0f}s)", flush=True)

    n = min(len(r["ours"]) for r in replicates)
    ref_cols = [k for k in replicates[0] if k.startswith("ref_")]
    horizons = [h for h in [1, 3, 5, 10, 20, 50, n] if h <= n]
    rows = []
    for h in horizons:
        i = h - 1
        row = {
            "horizon": h,
            "ours_pixel_mse_mean": float(np.mean([r["ours"][i]
                                                  for r in replicates])),
        }
        for col in ref_cols:
            rel = [100.0 * (r["ours"][i] - r[col][i])
                   / max(r[col][i], 1e-12) for r in replicates]
            k = len(rel)
            mean = float(np.mean(rel))
            se = float(np.std(rel, ddof=1) / np.sqrt(k)) if k > 1 else 0.0
            row[f"{col}_pixel_mse_mean"] = float(
                np.mean([r[col][i] for r in replicates]))
            row[f"paired_delta_vs_{col}_pct"] = {
                "mean": mean, "se": se,
                "ci95": [mean - 1.96 * se, mean + 1.96 * se],
                "per_set": rel,
            }
        rows.append(row)
        deltas = "  ".join(
            f"vs {c[4:]}: {row[f'paired_delta_vs_{c}_pct']['mean']:+.3f}%"
            f"+-{row[f'paired_delta_vs_{c}_pct']['se']:.3f}"
            for c in ref_cols)
        print(f"h={h:3d}  ours {row['ours_pixel_mse_mean']:.6f}  {deltas}")

    reward_rows = []
    if args.rewards:
        # (ours column, reference column) arithmetic-parity pairs; the
        # live pair also reports the full behavioral delta
        pairs = [(a, b) for a, b in [
            ("rew_ours_bug", "rew_ref_native_frozen"),
            ("rew_ours", "rew_ref_fixedshape_frozen"),
            ("rew_ours_bug", "rew_ref_native_live"),
        ] if a in replicates[0] and b in replicates[0]]
        print("reward-arithmetic parity:")
        for h in horizons:
            i = h - 1
            row = {"horizon": h}
            for a, b in pairs:
                rel = [100.0 * (r[a][i] - r[b][i]) / max(abs(r[b][i]), 1e-12)
                       for r in replicates]
                k = len(rel)
                mean = float(np.mean(rel))
                se = float(np.std(rel, ddof=1) / np.sqrt(k)) if k > 1 else 0.0
                row[f"{a}_mean"] = float(
                    np.mean([r[a][i] for r in replicates]))
                row[f"{b}_mean"] = float(
                    np.mean([r[b][i] for r in replicates]))
                row[f"delta_{a}_vs_{b}_pct"] = {
                    "mean": mean, "se": se, "per_set": rel}
            reward_rows.append(row)
            deltas = "  ".join(
                f"{a[4:]} vs {b[8:]}: "
                f"{row[f'delta_{a}_vs_{b}_pct']['mean']:+.4f}%"
                for a, b in pairs)
            print(f"h={h:3d}  {deltas}")

    result = {
        "env": args.env, "ckpt": os.path.relpath(ckpt, REPO),
        "train_iter": args.iter, "sets": args.sets,
        "seed_base": args.seed_base,
        "batch_size": args.batch_size, "timesteps": args.timesteps,
        "horizons": rows,
        "reward_horizons": reward_rows,
        "replicate_curves": replicates,
        "note": "paired design: both columns evaluate identical weights "
                "on the identical fixed trajectory set per replicate; "
                "both eval pipelines are deterministic, so within-set "
                "deltas carry zero sampling noise — they measure pipeline "
                "divergence only. CI is across independent sets.",
    }
    out_json = args.out_json or os.path.join(
        REPO, "docs", f"reference_ab_paired_{args.env}.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
