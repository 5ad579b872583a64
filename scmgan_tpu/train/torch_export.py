"""Exporter: this framework's checkpoints -> the reference's .pth format.

Inverse of train/torch_import.py.  Writes the five torch ``state_dict``
files the reference loads via --load-from (reference main.py:85-90), so a
model trained HERE can be evaluated by the reference's own unmodified
eval code (scripts/reference_cpu_ab/) — the reverse direction of the
cross-framework A/B.  Layout conversions mirror the importer:

  * conv w HWIO -> OIHW (transpose 3,2,0,1)
  * conv-transpose w HWIO -> torch IOHW (transpose 2,3,0,1)
  * linear w (in,out) -> (out,in)
  * SpectralNorm layers -> ``convN.module.{weight_bar,bias,weight_u,
    weight_v}`` (spectral_normalization.py:47-62).  u exports directly
    (both layouts index it by out-channel); v is a permutation of ours:
    torch matricizes (O, I*kh*kw) in (I,kh,kw) order vs our (kh,kw,I) —
    sigma = u.(Wv) is exactly preserved under the permutation.
  * encoder bn_conv1: the reference registers a BatchNorm it never calls
    (models.py:130,139-157); identity buffers are emitted so strict
    ``load_state_dict`` finds every key.
"""

from __future__ import annotations

import os

import numpy as np

from scmgan_tpu.models.world_model import WorldModel
from scmgan_tpu.train.torch_import import REFERENCE_FILES


def _t(x):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(x),
                                                 dtype=np.float32))


def _conv_w(w):
    return _t(np.transpose(np.asarray(w), (3, 2, 0, 1)))   # HWIO -> OIHW


def _convT_w(w):
    return _t(np.transpose(np.asarray(w), (2, 3, 0, 1)))   # HWIO -> IOHW


def _export_layer(layer: dict, prefix: str, *, kind: str = "conv") -> dict:
    sd = {}
    if "sn" in layer:
        w = np.asarray(layer["w"])                          # HWIO
        kh, kw, ci, co = w.shape
        sd[f"{prefix}.module.weight_bar"] = _conv_w(w)
        sd[f"{prefix}.module.bias"] = _t(layer["b"])
        sd[f"{prefix}.module.weight_u"] = _t(layer["sn"]["u"])
        # our v indexes the (kh,kw,I) flattening; torch's indexes (I,kh,kw)
        v = np.asarray(layer["sn"]["v"]).reshape(kh, kw, ci)
        sd[f"{prefix}.module.weight_v"] = _t(
            np.transpose(v, (2, 0, 1)).reshape(-1))
    elif kind == "convT":
        sd[f"{prefix}.weight"] = _convT_w(layer["w"])
        sd[f"{prefix}.bias"] = _t(layer["b"])
    elif kind == "linear":
        sd[f"{prefix}.weight"] = _t(np.asarray(layer["w"]).T)
        sd[f"{prefix}.bias"] = _t(layer["b"])
    else:
        sd[f"{prefix}.weight"] = _conv_w(layer["w"])
        sd[f"{prefix}.bias"] = _t(layer["b"])
    return sd


def _bn_identity(c: int) -> dict:
    import torch

    return {
        "bn_conv1.weight": torch.ones(c),
        "bn_conv1.bias": torch.zeros(c),
        "bn_conv1.running_mean": torch.zeros(c),
        "bn_conv1.running_var": torch.ones(c),
        "bn_conv1.num_batches_tracked": torch.tensor(0, dtype=torch.long),
    }


def export_encoder(p: dict) -> dict:
    sd = {}
    for name in ("conv1", "conv2", "conv3", "conv4"):
        sd.update(_export_layer(p[name], name))
    sd.update(_bn_identity(np.asarray(p["conv1"]["w"]).shape[-1]))
    return sd


def export_transition(p: dict) -> dict:
    sd = {}
    for i in range(1, 7):
        sd.update(_export_layer(p[f"conv{i}"], f"conv{i}"))
    return sd


def export_decoder(p: dict) -> dict:
    sd = {}
    sd.update(_export_layer(p["conv1"], "conv1", kind="convT"))
    sd.update(_export_layer(p["conv2"], "conv2", kind="convT"))
    return sd


def export_reward_predictor(p: dict) -> dict:
    sd = {}
    sd.update(_export_layer(p["conv1"], "conv1"))
    sd.update(_export_layer(p["conv2"], "conv2"))
    return sd


def export_discriminator(p: dict) -> dict:
    sd = {}
    sd.update(_export_layer(p["conv1"], "conv1"))
    sd.update(_export_layer(p["conv2"], "conv2"))
    sd.update(_export_layer(p["conv3"], "conv3"))
    # inverse of the importer's fc1 input-dim permutation: our flatten is
    # NHWC (h,w,c); torch flattens NCHW (c,h,w) (reference models.py:221)
    w = np.asarray(p["fc1"]["w"])                # (in, out), (h,w,c) order
    c = np.asarray(p["conv3"]["w"]).shape[-1]
    s = int(np.sqrt(w.shape[0] // c))
    w_hwc = w.reshape(s, s, c, -1)
    w_chw = np.transpose(w_hwc, (2, 0, 1, 3)).reshape(w.shape[0], -1)
    sd.update(_export_layer({"w": w_chw, "b": p["fc1"]["b"]}, "fc1",
                            kind="linear"))
    return sd


_EXPORTERS = {
    "encoder": export_encoder,
    "decoder": export_decoder,
    "transition": export_transition,
    "reward_predictor": export_reward_predictor,
    "discriminator": export_discriminator,
}


def export_reference_checkpoint(params: WorldModel, out_dir: str):
    """Write the reference's five model-*.pth files from a WorldModel."""
    import torch

    os.makedirs(out_dir, exist_ok=True)
    for name, fname in REFERENCE_FILES.items():
        sd = _EXPORTERS[name](getattr(params, name))
        torch.save(sd, os.path.join(out_dir, fname))
