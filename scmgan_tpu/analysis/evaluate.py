"""Top-level evaluation entry point (reference evaluate(), main.py:315-322):
prediction-MSE measurement + forward-simulation video + reconstruction
videos.  All nets run in eval mode (hard-threshold latents); there is no
BatchNorm in the live forward path, so the reference's momentum toggling
(main.py:492-505) has no analogue to replicate.
"""

from __future__ import annotations

from typing import Optional

import jax

from scmgan_tpu.analysis.mse import measure_prediction_mse
from scmgan_tpu.analysis.visualize import (
    visualize_forward_simulation,
    visualize_reconstruction,
)
from scmgan_tpu.models.world_model import WorldModel


def evaluate(params: WorldModel, datasource, train_iter: int = 0,
             use_training_set: bool = False, out_dir: str = ".",
             make_videos: bool = True, eval_batch_size: int = 100,
             eval_timesteps: int = 100, key: Optional[jax.Array] = None):
    print("Evaluating networks...")
    if key is None:
        key = jax.random.PRNGKey(train_iter)
    k1, k2, k3 = jax.random.split(key, 3)
    results = measure_prediction_mse(
        params, datasource, train_iter=train_iter,
        batch_size=eval_batch_size, timesteps=eval_timesteps,
        use_training_set=use_training_set, out_dir=out_dir, key=k1,
    )
    if make_videos:
        visualize_forward_simulation(
            params, datasource, train_iter=train_iter, out_dir=out_dir, key=k2)
        visualize_reconstruction(
            params, datasource, train_iter=train_iter, out_dir=out_dir, key=k3)
    return results
