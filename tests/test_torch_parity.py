"""Numerical cross-validation against torch.

Builds reference-format state_dicts (the exact key names the reference's
torch modules produce), computes the reference forward passes with torch
functional ops (following reference models.py line by line), imports the
same weights through scmgan_tpu.train.torch_import, and checks our JAX
forwards agree numerically.  This validates every layout translation
(OIHW->HWIO, ConvTranspose, linear transpose, spectral-norm matricization,
circular padding expansion) against the real torch semantics.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from scmgan_tpu.models.world_model import (
    decode,
    discriminate,
    encode,
    predict_reward,
    transition,
)
from scmgan_tpu.train import torch_import

F = torch.nn.functional
RTOL, ATOL = 2e-4, 2e-4


def _t(*shape, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g) * scale


def _sn_dict(prefix, out_ch, in_ch, k=3, seed=0):
    """State-dict entries for one SpectralNorm-wrapped conv
    (spectral_normalization.py:47-62 key names)."""
    w = _t(out_ch, in_ch, k, k, seed=seed)
    return {
        f"{prefix}.module.weight_bar": w,
        f"{prefix}.module.weight_u": _t(out_ch, seed=seed + 1, scale=1.0),
        f"{prefix}.module.weight_v": _t(in_ch * k * k, seed=seed + 2,
                                        scale=1.0),
        f"{prefix}.module.bias": _t(out_ch, seed=seed + 3),
    }


def _plain_dict(prefix, out_ch, in_ch, k=3, seed=0, transpose=False):
    shape = (in_ch, out_ch, k, k) if transpose else (out_ch, in_ch, k, k)
    return {
        f"{prefix}.weight": _t(*shape, seed=seed),
        f"{prefix}.bias": _t(out_ch, seed=seed + 3),
    }


def _sn_effective_weight(sd, prefix):
    """Torch-side sigma-normalized weight with the reference's exact
    first-forward semantics: ONE power iteration from the stored u
    (spectral_normalization.py:29-35 — v is overwritten before use), NOT
    the converged singular value.  torch_import mirrors this."""
    w = sd[f"{prefix}.module.weight_bar"]
    m = w.reshape(w.shape[0], -1).numpy()
    u = sd[f"{prefix}.module.weight_u"].numpy()
    v = m.T @ u
    v = v / (np.linalg.norm(v) + 1e-12)
    u1 = m @ v
    u1 = u1 / (np.linalg.norm(u1) + 1e-12)
    sigma = float(u1 @ (m @ v))
    return w / sigma


def _torch_conv(sd, prefix, x, *, spectral=False, stride=1, padding=1,
                circular=False):
    if spectral:
        w = _sn_effective_weight(sd, prefix)
        b = sd[f"{prefix}.module.bias"]
    else:
        w, b = sd[f"{prefix}.weight"], sd[f"{prefix}.bias"]
    if circular:
        # torch expands circular padding=2 as ((p+1)//2, p//2) = (1,1)
        # per side (reference models.py:51-56 semantics)
        x = F.pad(x, (1, 1, 1, 1), mode="circular")
        return F.conv2d(x, w, b, stride=stride)
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def _nchw(x_jax):
    return torch.from_numpy(np.asarray(x_jax)).permute(0, 3, 1, 2).float()


def _to_jax_nhwc(t):
    return jnp.asarray(t.permute(0, 2, 3, 1).numpy())


def test_encoder_matches_torch(key):
    latent, color = 8, 3
    sd = {}
    sd.update(_sn_dict("conv1", 32, color * 3, seed=10))
    sd.update(_sn_dict("conv2", 32, 32, seed=20))
    sd.update(_sn_dict("conv3", 32, 32, seed=30))
    sd.update(_plain_dict("conv4", latent, 32, seed=40))

    params = torch_import.import_encoder(sd)
    frames = jax.random.uniform(key, (2, 3, 16, 16, color))

    # torch forward (reference models.py:139-157)
    x = _nchw(frames.reshape(2 * 3, 16, 16, color))
    x = x.reshape(2, 3 * color, 16, 16)
    x = F.leaky_relu(_torch_conv(sd, "conv1", x, spectral=True))
    x = F.leaky_relu(_torch_conv(sd, "conv2", x, spectral=True))
    x = F.leaky_relu(_torch_conv(sd, "conv3", x, spectral=True))
    x = torch.sigmoid(_torch_conv(sd, "conv4", x))
    expected = _to_jax_nhwc(x)

    got = encode(params, frames)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=RTOL, atol=ATOL)


def test_transition_matches_torch(key):
    latent, actions = 8, 4
    sd = {}
    sd.update(_sn_dict("conv1", 32, latent + actions, seed=1))
    sd.update(_sn_dict("conv2", 32, 32, seed=2))
    sd.update(_sn_dict("conv3", 32, 32, seed=3))
    sd.update(_sn_dict("conv4", 32, 32, seed=4))
    sd.update(_sn_dict("conv5", 32, 64, seed=5))
    sd.update(_plain_dict("conv6", latent, 64, seed=6))

    params = torch_import.import_transition(sd)
    z = (jax.random.uniform(key, (2, 16, 16, latent)) > 0.5).astype(
        jnp.float32)
    a_idx = jnp.array([1, 3])
    a_oh = jax.nn.one_hot(a_idx, actions)

    # torch forward (reference models.py:59-113, eval mode threshold)
    zt = _nchw(z)
    at = torch.from_numpy(np.asarray(a_oh)).float()
    at = at.unsqueeze(-1).unsqueeze(-1).repeat(1, 1, 16, 16)
    x = torch.cat([zt, at], dim=1)
    x = F.leaky_relu(_torch_conv(sd, "conv1", x, spectral=True,
                                 circular=True))
    skip1 = x
    x = F.leaky_relu(_torch_conv(sd, "conv2", x, spectral=True,
                                 circular=True))
    skip2 = x
    x = F.leaky_relu(_torch_conv(sd, "conv3", x, spectral=True,
                                 circular=True))
    x = F.leaky_relu(_torch_conv(sd, "conv4", x, spectral=True,
                                 circular=True))
    x = torch.cat([x, skip2], dim=1)
    x = F.leaky_relu(_torch_conv(sd, "conv5", x, spectral=True,
                                 circular=True))
    x = torch.cat([x, skip1], dim=1)
    x = _torch_conv(sd, "conv6", x, circular=True)
    expected = (torch.sigmoid(x) > 0.5).float()

    got = transition(params, z, a_oh, train=False)
    # hard thresholds can flip on values straddling 0.5; demand near-total
    # agreement instead of elementwise closeness
    agreement = float(
        (np.asarray(got) == np.asarray(_to_jax_nhwc(expected))).mean())
    assert agreement > 0.999, agreement


def test_decoder_matches_torch(key):
    latent, color = 8, 3
    sd = {}
    sd.update(_plain_dict("conv1", latent * 4, latent, seed=7,
                          transpose=True))
    sd.update(_plain_dict("conv2", latent * color, latent * 4, seed=8,
                          transpose=True))
    params = torch_import.import_decoder(sd)
    z = jax.random.uniform(key, (2, 16, 16, latent))

    zt = _nchw(z)
    x = F.leaky_relu(F.conv_transpose2d(zt, sd["conv1.weight"],
                                        sd["conv1.bias"], stride=1,
                                        padding=1))
    x = F.conv_transpose2d(x, sd["conv2.weight"], sd["conv2.bias"],
                           stride=1, padding=1)
    x = x.reshape(2, latent, color, 16, 16).sum(dim=1)  # models.py:280-287
    expected = _to_jax_nhwc(x)

    got = decode(params, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=RTOL, atol=ATOL)


def test_reward_predictor_matches_torch(key):
    latent, rewards = 8, 2
    sd = {}
    sd.update(_plain_dict("conv1", 32, latent, seed=9))
    sd.update(_plain_dict("conv2", rewards * 3, 32, seed=11))
    params = torch_import.import_reward_predictor(sd)
    z = jax.random.uniform(key, (2, 16, 16, latent))

    zt = _nchw(z)
    x = F.leaky_relu(F.conv2d(zt, sd["conv1.weight"], sd["conv1.bias"]))
    x = F.conv2d(x, sd["conv2.weight"], sd["conv2.bias"], stride=2)
    b, c, h, w = x.shape
    x = x.reshape(b, 3, c // 3, h, w)
    x = torch.softmax(x, dim=1)
    x = x[:, 0] - x[:, 2]
    expected = x.sum(-1).sum(-1)    # models.py:235-250

    got = predict_reward(params, z)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=RTOL, atol=ATOL)


def test_discriminator_matches_torch(key):
    sd = {}
    sd.update(_sn_dict("conv1", 32, 3, seed=12))
    sd.update(_sn_dict("conv2", 32, 32, seed=13))
    sd.update(_plain_dict("conv3", 32, 32, seed=14))
    fc_in = 32 * 7 * 7
    g = torch.Generator().manual_seed(15)
    sd["fc1.weight"] = torch.randn(1, fc_in, generator=g) * 0.01
    sd["fc1.bias"] = torch.randn(1, generator=g) * 0.01
    params = torch_import.import_discriminator(sd)
    x = jax.random.uniform(key, (2, 64, 64, 3))

    xt = _nchw(x)
    h = F.leaky_relu(F.conv2d(xt, _sn_effective_weight(sd, "conv1"),
                              sd["conv1.module.bias"], stride=2))
    h = F.leaky_relu(F.conv2d(h, _sn_effective_weight(sd, "conv2"),
                              sd["conv2.module.bias"], stride=2))
    h = F.leaky_relu(F.conv2d(h, sd["conv3.weight"], sd["conv3.bias"],
                              stride=2))
    h = h.reshape(2, -1)
    expected = F.leaky_relu(h @ sd["fc1.weight"].T + sd["fc1.bias"])

    got = discriminate(params, x)
    # NCHW flatten order differs from NHWC flatten; only the shape and
    # finiteness are comparable unless the fc weight is permuted — the
    # importer keeps torch's flatten convention, so values must match:
    np.testing.assert_allclose(np.asarray(got), expected.detach().numpy(),
                               rtol=RTOL, atol=ATOL)


def test_load_reference_checkpoint_files(tmp_path):
    """End-to-end .pth loading: save reference-format state_dicts with
    torch.save and load them through load_reference_checkpoint."""
    latent, actions, color, rewards = 8, 4, 3, 2
    dicts = {
        "encoder": {},
        "transition": {},
        "decoder": {},
        "reward_predictor": {},
        "discriminator": {},
    }
    dicts["encoder"].update(_sn_dict("conv1", 32, color * 3, seed=50))
    dicts["encoder"].update(_sn_dict("conv2", 32, 32, seed=51))
    dicts["encoder"].update(_sn_dict("conv3", 32, 32, seed=52))
    dicts["encoder"].update(_plain_dict("conv4", latent, 32, seed=53))
    for i in range(1, 6):
        cin = latent + actions if i == 1 else (64 if i == 5 else 32)
        dicts["transition"].update(_sn_dict(f"conv{i}", 32, cin, seed=60 + i))
    dicts["transition"].update(_plain_dict("conv6", latent, 64, seed=66))
    dicts["decoder"].update(_plain_dict("conv1", latent * 4, latent,
                                        seed=70, transpose=True))
    dicts["decoder"].update(_plain_dict("conv2", latent * color, latent * 4,
                                        seed=71, transpose=True))
    dicts["reward_predictor"].update(_plain_dict("conv1", 32, latent,
                                                 seed=72))
    dicts["reward_predictor"].update(_plain_dict("conv2", rewards * 3, 32,
                                                 seed=73))
    dicts["discriminator"].update(_sn_dict("conv1", 32, 3, seed=74))
    dicts["discriminator"].update(_sn_dict("conv2", 32, 32, seed=75))
    dicts["discriminator"].update(_plain_dict("conv3", 32, 32, seed=76))
    g = torch.Generator().manual_seed(77)
    dicts["discriminator"]["fc1.weight"] = torch.randn(1, 32 * 7 * 7,
                                                       generator=g)
    dicts["discriminator"]["fc1.bias"] = torch.randn(1, generator=g)

    for name, sd in dicts.items():
        torch.save(sd, tmp_path / f"model-{name}.pth")

    wm = torch_import.load_reference_checkpoint(str(tmp_path))
    assert wm.encoder["conv1"]["w"].shape == (3, 3, color * 3, 32)
    assert wm.transition["conv5"]["w"].shape == (3, 3, 64, 32)
    assert wm.decoder["conv2"]["w"].shape == (3, 3, latent * 4,
                                              latent * color)
    # loaded model runs
    z = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, latent))
    assert decode(wm.decoder, z).shape == (1, 16, 16, color)


def test_load_model_falls_back_to_reference_pth(tmp_path):
    """--load-from on a directory of reference .pth files (no native .npz)
    must import transparently through train/torch_import.py."""
    from scmgan_tpu.train import checkpoint as ckpt

    latent, actions, color = 8, 4, 3
    dicts = {"encoder": {}, "transition": {}, "decoder": {},
             "reward_predictor": {}, "discriminator": {}}
    dicts["encoder"].update(_sn_dict("conv1", 32, color * 3, seed=150))
    dicts["encoder"].update(_sn_dict("conv2", 32, 32, seed=151))
    dicts["encoder"].update(_sn_dict("conv3", 32, 32, seed=152))
    dicts["encoder"].update(_plain_dict("conv4", latent, 32, seed=153))
    for i in range(1, 6):
        cin = latent + actions if i == 1 else (64 if i == 5 else 32)
        dicts["transition"].update(_sn_dict(f"conv{i}", 32, cin,
                                            seed=160 + i))
    dicts["transition"].update(_plain_dict("conv6", latent, 64, seed=166))
    dicts["decoder"].update(_plain_dict("conv1", latent * 4, latent,
                                        seed=170, transpose=True))
    dicts["decoder"].update(_plain_dict("conv2", latent * color, latent * 4,
                                        seed=171, transpose=True))
    dicts["reward_predictor"].update(_plain_dict("conv1", 32, latent,
                                                 seed=172))
    dicts["reward_predictor"].update(_plain_dict("conv2", 2 * 3, 32,
                                                 seed=173))
    dicts["discriminator"].update(_sn_dict("conv1", 32, 3, seed=174))
    dicts["discriminator"].update(_sn_dict("conv2", 32, 32, seed=175))
    dicts["discriminator"].update(_plain_dict("conv3", 32, 32, seed=176))
    g = torch.Generator().manual_seed(177)
    dicts["discriminator"]["fc1.weight"] = torch.randn(1, 32 * 7 * 7,
                                                       generator=g)
    dicts["discriminator"]["fc1.bias"] = torch.randn(1, generator=g)
    for name, sd in dicts.items():
        torch.save(sd, tmp_path / f"model-{name}.pth")

    wm = ckpt.load_model(str(tmp_path), template=None)  # template unused
    assert wm.transition["conv5"]["w"].shape == (3, 3, 64, 32)
