"""Importer for reference .pth checkpoints.

The reference saves five torch ``state_dict`` files
(model-{encoder,decoder,transition,discriminator,reward_predictor}.pth,
reference main.py:136-141).  This module maps them onto this framework's
param trees so reference-trained weights can be evaluated here directly
(MSE-parity A/B testing).

Layout conversions:
  * Conv2d weight OIHW -> HWIO (transpose 2,3,1,0)
  * ConvTranspose2d weight (I, O, kh, kw) -> HWIO (transpose 2,3,0,1);
    our conv_transpose2d applies the spatial flip at call time, matching
    torch's transposed-conv semantics for stride 1 / padding 1.
  * Linear weight (out, in) -> (in, out)
  * SpectralNorm wrapping: the reference registers ``weight_bar`` /
    ``weight_u`` / ``weight_v`` on the wrapped module
    (spectral_normalization.py:47-62), appearing in the state_dict as
    ``convN.module.weight_bar`` etc.  weight_bar becomes our raw ``w``;
    u imports directly (both layouts index it by out-channel); v is
    re-derived by power iteration (its flattening order differs between
    torch's (I, kh, kw) and our (kh, kw, I) matricization — sigma is
    invariant, the vector layout is not).

Loading uses ``torch.load(map_location='cpu')`` — torch (CPU) is a baked
dependency of the image; no CUDA needed.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from scmgan_tpu.models.world_model import WorldModel
from scmgan_tpu.ops.spectral_norm import sn_power_iteration

REFERENCE_FILES = {
    "encoder": "model-encoder.pth",
    "decoder": "model-decoder.pth",
    "transition": "model-transition.pth",
    "reward_predictor": "model-reward_predictor.pth",
    "discriminator": "model-discriminator.pth",
}


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _conv_w(t):
    return jnp.asarray(_to_np(t).transpose(2, 3, 1, 0))     # OIHW -> HWIO


def _convT_w(t):
    return jnp.asarray(_to_np(t).transpose(2, 3, 0, 1))     # IOHW -> HWIO


def _linear_w(t):
    return jnp.asarray(_to_np(t).T)                          # (out,in)->(in,out)


def _import_layer(sd: Dict, prefix: str, *, kind: str = "conv",
                  spectral: bool = False) -> dict:
    """One conv/convT/linear layer from a reference state_dict."""
    if spectral:
        w = _conv_w(sd[f"{prefix}.module.weight_bar"])
        b = jnp.asarray(_to_np(sd[f"{prefix}.module.bias"]))
        u = jnp.asarray(_to_np(sd[f"{prefix}.module.weight_u"]))
        # Reproduce the reference's FIRST-forward effective weight
        # exactly: its wrapper runs one power iteration from the stored u
        # before computing sigma (spectral_normalization.py:29-35; v is
        # overwritten before use, so only u carries state).  One
        # iteration here yields the identical (u1, v1) pair in our
        # matricization.  (An earlier build converged with 100
        # iterations, which REPLACED the checkpoint's partially-converged
        # sigma with the true sigma-1 — measured as a systematic +6-7%
        # short-horizon MSE delta on the paired A/B before the fix.)
        u2, v2 = sn_power_iteration(w, u, jnp.zeros((w.size // w.shape[-1],),
                                                    w.dtype), iters=1)
        return {"w": w, "b": b,
                "sn": {"u": u2.astype(w.dtype), "v": v2.astype(w.dtype)}}
    if kind == "convT":
        w = _convT_w(sd[f"{prefix}.weight"])
    elif kind == "linear":
        w = _linear_w(sd[f"{prefix}.weight"])
    else:
        w = _conv_w(sd[f"{prefix}.weight"])
    return {"w": w, "b": jnp.asarray(_to_np(sd[f"{prefix}.bias"]))}


def import_encoder(sd: Dict) -> dict:
    # bn_conv1 exists in the state_dict but is never called in forward
    # (reference models.py:130,139-157) — skipped.
    return {
        "conv1": _import_layer(sd, "conv1", spectral=True),
        "conv2": _import_layer(sd, "conv2", spectral=True),
        "conv3": _import_layer(sd, "conv3", spectral=True),
        "conv4": _import_layer(sd, "conv4"),
    }


def import_transition(sd: Dict) -> dict:
    out = {f"conv{i}": _import_layer(sd, f"conv{i}", spectral=True)
           for i in range(1, 6)}
    out["conv6"] = _import_layer(sd, "conv6")
    return out


def import_decoder(sd: Dict) -> dict:
    return {
        "conv1": _import_layer(sd, "conv1", kind="convT"),
        "conv2": _import_layer(sd, "conv2", kind="convT"),
    }


def import_reward_predictor(sd: Dict) -> dict:
    return {
        "conv1": _import_layer(sd, "conv1"),
        "conv2": _import_layer(sd, "conv2"),
    }


def import_discriminator(sd: Dict) -> dict:
    out = {
        "conv1": _import_layer(sd, "conv1", spectral=True),
        "conv2": _import_layer(sd, "conv2", spectral=True),
        "conv3": _import_layer(sd, "conv3"),
        "fc1": _import_layer(sd, "fc1", kind="linear"),
    }
    # torch flattens the conv output NCHW-order before fc1
    # (reference models.py:221); our forward flattens NHWC — permute the
    # fc input dimension accordingly: in = C*H*W with H = W = s, C = 32.
    w = out["fc1"]["w"]                      # (in, out), torch order (c,h,w)
    c = out["conv3"]["w"].shape[-1]
    s = int(np.sqrt(w.shape[0] // c))
    w_chw = w.reshape(c, s, s, -1)
    out["fc1"]["w"] = jnp.transpose(w_chw, (1, 2, 0, 3)).reshape(
        w.shape[0], -1)
    return out


_IMPORTERS = {
    "encoder": import_encoder,
    "decoder": import_decoder,
    "transition": import_transition,
    "reward_predictor": import_reward_predictor,
    "discriminator": import_discriminator,
}


def load_reference_checkpoint(ckpt_dir: str) -> WorldModel:
    """Load the reference's five .pth files into a WorldModel."""
    import torch

    parts = {}
    for name, fname in REFERENCE_FILES.items():
        path = os.path.join(ckpt_dir, fname)
        sd = torch.load(path, map_location="cpu")
        parts[name] = _IMPORTERS[name](sd)
    return WorldModel(**parts)
