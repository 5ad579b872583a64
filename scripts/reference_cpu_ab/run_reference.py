"""Run the UNMODIFIED reference trainer (/root/reference/main.py) on CPU.

Round-2 VERDICT "Next round #2": the "MSE@t+10 within 1% of reference"
clause needs an actual reference-trained model to anchor against.  No
released weights exist, so this harness trains the reference's own code
(default gridworld recipe) on this image's CPU, producing:

  * model-{encoder,decoder,transition,discriminator,reward_predictor}.pth
    (the reference's checkpoint format, reference main.py:136-141)
  * mse_{pixel,reward}_iter_*.json + stddev files — the reference model's
    own MSE curve computed by the reference's own eval code
    (main.py:784-855)

Usage:
    python scripts/reference_cpu_ab/run_reference.py \
        --out runs/reference_ab --train-iters 3000 [--env gridworld]

The heavy visualizations (mp4 composites) are monkeypatched out; the
train loop, losses, models, datasource, and measure_prediction_mse run
the reference's code verbatim.
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"

sys.path.insert(0, HERE)
from stubs import (  # noqa: E402
    install_module_stubs,
    patch_legacy_circular_padding,
    patch_torch_cpu,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--env", default="gridworld")
    ap.add_argument("--train-iters", type=int, default=3000)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--horizon-min", type=int, default=3)
    ap.add_argument("--horizon-max", type=int, default=10)
    ap.add_argument("--iters-per-video", type=int, default=2000,
                    help="checkpoint/eval cadence (reference main.py:53); "
                         "lowered for short CPU runs so a final checkpoint "
                         "exists")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-mse", action="store_true",
                    help="also skip measure_prediction_mse during "
                         "training (for 64x64 envs its 100x100 free-run "
                         "costs ~30 CPU-min per eval; ab_paired.py runs "
                         "its own paired eval on the checkpoints)")
    opts = ap.parse_args()

    os.environ.setdefault("MPLBACKEND", "Agg")
    install_module_stubs()
    patch_torch_cpu()

    import numpy as np
    import torch

    np.random.seed(opts.seed)
    torch.manual_seed(opts.seed)

    out_dir = os.path.abspath(opts.out)
    os.makedirs(out_dir, exist_ok=True)
    os.chdir(out_dir)  # the reference writes artifacts into CWD

    # the reference parses argv at import time (main.py:25-51)
    sys.argv = [
        "main.py", "--env", opts.env,
        "--train-iters", str(opts.train_iters),
        "--batch-size", str(opts.batch_size),
        "--horizon-min", str(opts.horizon_min),
        "--horizon-max", str(opts.horizon_max),
    ]
    sys.path.insert(0, REFERENCE)
    import main as ref_main  # noqa: E402  (the reference's main.py)

    ref_main.ITERS_PER_VIDEO = opts.iters_per_video

    # Keep measure_prediction_mse (JSON artifacts); skip mp4 composites.
    ref_main.visualize_forward_simulation = lambda *a, **k: None
    ref_main.visualize_reconstruction = lambda *a, **k: None
    if opts.skip_mse:
        ref_main.measure_prediction_mse = lambda *a, **k: None

    # torch-version shim: the reference's envs return numpy views with
    # swapped strides (np.swapaxes, envs/gridworld.py:94-97) and its
    # torch build copied them contiguous in torch.Tensor(...); torch 2.13
    # preserves the strides, breaking encoder's .view (models.py:143).
    # Make the data boundary contiguous; reference code stays verbatim.
    _alloc = ref_main.allocate_datasource

    def alloc_contiguous(name):
        ds = _alloc(name)
        get = ds.get_trajectories

        def get_c(*a, **k):
            out = get(*a, **k)
            return tuple(np.ascontiguousarray(x) for x in out)

        ds.get_trajectories = get_c
        return ds

    ref_main.allocate_datasource = alloc_contiguous

    # legacy circular-padding semantics (see stubs.py): hook Transition
    # construction so every instance gets the old pad-(1,1) behavior.
    ref_models = sys.modules["models"]
    _Transition = ref_models.Transition

    class TransitionLegacyPad(_Transition):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            patch_legacy_circular_padding(self)

    ref_models.Transition = TransitionLegacyPad
    ref_main.models.Transition = TransitionLegacyPad

    # torch-version shim: at horizon 3 the transition output never enters
    # the loss, so its params have no grads; old torch's clip_grad_value_
    # skipped them, torch 2.13 raises on the empty grad list.
    import torch.nn.utils.clip_grad as clip_mod

    _clip = clip_mod.clip_grad_value_

    def clip_tolerant(parameters, clip_value, **k):
        params = [p for p in parameters if p.grad is not None]
        if params:
            _clip(params, clip_value, **k)

    clip_mod.clip_grad_value_ = clip_tolerant

    t0 = time.time()
    ref_main.main()
    dt = time.time() - t0
    print(f"reference train finished in {dt:.1f}s "
          f"({opts.train_iters / max(dt, 1e-9):.2f} it/s)")


if __name__ == "__main__":
    main()
