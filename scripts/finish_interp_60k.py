"""Finish the pong_cf_60k interpretability record: the causal matrices
rendered fine but the BPTT-video stage exceeded its CPU budget, so this
writes the quantitative sanity.json from the committed matrix + a fresh
action-sensitivity probe (same readout as scripts/interpretability_zoo.py),
and records the video status honestly (pong_cf ships the 20k model's
backtrack video for the same env; regenerate the 60k one with
interpretability_zoo.py when CPU budget allows)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("SCMGAN_PLATFORM", "cpu")
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np  # noqa: E402

from interpretability_zoo import action_sensitivity  # noqa: E402

import jax  # noqa: E402

from scmgan_tpu.data import allocate_datasource  # noqa: E402
from scmgan_tpu.models import init_world_model  # noqa: E402
from scmgan_tpu.train import checkpoint as ckpt  # noqa: E402

BUNDLE = "pretrained_models/pong_cf_60k"
OUT = os.path.join(BUNDLE, "interpretability")

ds = allocate_datasource("pong", seed=0)
wm = init_world_model(
    jax.random.PRNGKey(0), 16, ds.binary_input_channels,
    ds.scalar_output_channels, ds.conv_input_channels,
    ds.conv_output_channels, img_size=ds.spec.height)
wm = ckpt.load_model(BUNDLE, wm)

with open(os.path.join(OUT, "causal_matrix_iter_060000.json")) as f:
    mats = json.load(f)
m = np.asarray(mats["mean_deviation"])

sens = action_sensitivity(wm, ds)
out_deg = m.sum(axis=1)
agent = int(np.argmax(sens))
row = m[agent]
sanity = {
    "bundle": BUNDLE,
    "action_sensitivity": sens.tolist(),
    "action_controlled_factor": agent,
    "causal_out_degree_mean_matrix": out_deg.tolist(),
    "agent_row": row.tolist(),
    "agent_strongest_out_edge": int(np.argmax(row)),
    "agent_self_edge_is_strongest": bool(int(np.argmax(row)) == agent),
    "scene_factor_dominates_out_degree": int(np.argmax(out_deg)),
    "latent_dim": int(len(sens)),
    "excitation_bptt": None,
    "note": "expected: the action-controlled factor's strongest out-edge "
            "is its own next state. BPTT video: not regenerated for this "
            "60k continuation (CPU budget); pretrained_models/pong_cf/"
            "interpretability/excitation_bptt_seed1.avi shows the same "
            "env's backtrack on the 20k model — rerun "
            "scripts/interpretability_zoo.py pong:pretrained_models/"
            "pong_cf_60k to produce it.",
}
with open(os.path.join(OUT, "sanity.json"), "w") as f:
    json.dump(sanity, f, indent=2)
print(json.dumps({k: sanity[k] for k in
                  ("action_controlled_factor", "agent_strongest_out_edge",
                   "agent_self_edge_is_strongest")}))
