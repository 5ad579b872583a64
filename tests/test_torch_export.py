"""Roundtrip tests for train/torch_export.py (ours -> reference .pth).

The exporter must (a) emit exactly the key set the reference's modules
register — strict ``load_state_dict`` fails otherwise (reference
main.py:85-90) — and (b) roundtrip through train/torch_import.py back to
the same effective weights, so the reverse A/B (our weights evaluated by
the reference's own eval code) is exact.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from scmgan_tpu.models import init_world_model
from scmgan_tpu.train.torch_export import export_reference_checkpoint
from scmgan_tpu.train.torch_import import load_reference_checkpoint

LATENT, ACTIONS, REWARDS, COLOR = 8, 4, 2, 3


def _sn_keys(prefix):
    return {f"{prefix}.module.weight_bar", f"{prefix}.module.weight_u",
            f"{prefix}.module.weight_v", f"{prefix}.module.bias"}


def _plain_keys(prefix):
    return {f"{prefix}.weight", f"{prefix}.bias"}


def test_export_key_sets_match_reference_registration(tmp_path):
    wm = init_world_model(jax.random.PRNGKey(0), LATENT, ACTIONS, REWARDS,
                          COLOR, COLOR, img_size=16)
    export_reference_checkpoint(wm, str(tmp_path))

    # reference models.py:123-134 — encoder registers bn_conv1 (never
    # called in forward) + 3 SN convs + 1 plain conv
    enc = torch.load(tmp_path / "model-encoder.pth")
    expected = (_sn_keys("conv1") | _sn_keys("conv2") | _sn_keys("conv3")
                | _plain_keys("conv4")
                | {"bn_conv1.weight", "bn_conv1.bias",
                   "bn_conv1.running_mean", "bn_conv1.running_var",
                   "bn_conv1.num_batches_tracked"})
    assert set(enc) == expected

    # reference models.py:43-56 — 5 SN convs + plain conv6
    trans = torch.load(tmp_path / "model-transition.pth")
    expected = set().union(*[_sn_keys(f"conv{i}") for i in range(1, 6)])
    expected |= _plain_keys("conv6")
    assert set(trans) == expected

    dec = torch.load(tmp_path / "model-decoder.pth")
    assert set(dec) == _plain_keys("conv1") | _plain_keys("conv2")

    rp = torch.load(tmp_path / "model-reward_predictor.pth")
    assert set(rp) == _plain_keys("conv1") | _plain_keys("conv2")

    # reference models.py:195-207 — 2 SN convs + plain conv3 + fc1
    disc = torch.load(tmp_path / "model-discriminator.pth")
    expected = (_sn_keys("conv1") | _sn_keys("conv2") | _plain_keys("conv3")
                | _plain_keys("fc1"))
    assert set(disc) == expected

    # conv layout: OIHW (out channels lead)
    assert enc["conv4.weight"].shape == (LATENT, 128, 3, 3)
    # conv-transpose layout: IOHW (in channels lead, torch semantics)
    assert dec["conv1.weight"].shape == (LATENT, LATENT * 4, 3, 3)
    # BN identity (module is dead code in the reference forward)
    assert torch.all(enc["bn_conv1.running_var"] == 1)


def _converge_sn(tree):
    """Run SN power iteration to convergence so u/v are fixed points —
    the importer refines v (and with it u) by 100 iterations, so only a
    converged checkpoint roundtrips u bit-stable (trained checkpoints
    are converged; a fresh init is not)."""
    from scmgan_tpu.ops.spectral_norm import sn_power_iteration

    def conv(layer):
        if isinstance(layer, dict) and "sn" in layer:
            u, v = sn_power_iteration(layer["w"], layer["sn"]["u"],
                                      layer["sn"]["v"], iters=200)
            return {**layer, "sn": {"u": u, "v": v}}
        return layer

    return jax.tree.map(conv, tree,
                        is_leaf=lambda x: isinstance(x, dict) and "w" in x)


def test_export_import_roundtrip(tmp_path):
    wm = init_world_model(jax.random.PRNGKey(1), LATENT, ACTIONS, REWARDS,
                          COLOR, COLOR, img_size=16)
    wm = wm._replace(**{n: _converge_sn(getattr(wm, n))
                        for n in ("encoder", "transition", "decoder",
                                  "reward_predictor", "discriminator")})
    export_reference_checkpoint(wm, str(tmp_path))
    back = load_reference_checkpoint(str(tmp_path))

    for name in ("encoder", "decoder", "transition", "reward_predictor",
                 "discriminator"):
        ours, rt = getattr(wm, name), getattr(back, name)
        for layer, p in ours.items():
            np.testing.assert_allclose(
                np.asarray(rt[layer]["w"]), np.asarray(p["w"]),
                rtol=1e-6, atol=1e-7,
                err_msg=f"{name}.{layer}.w roundtrip mismatch")
            np.testing.assert_allclose(
                np.asarray(rt[layer]["b"]), np.asarray(p["b"]),
                rtol=1e-6, atol=1e-7,
                err_msg=f"{name}.{layer}.b roundtrip mismatch")
            if "sn" in p:
                # u/v vectors need not roundtrip elementwise (the
                # importer re-derives them by power iteration, and
                # near-tied singular values make the vectors themselves
                # ill-conditioned) — but the effective weight is
                # w / sigma, so sigma equality IS functional equality.
                w = np.asarray(p["w"])
                m = w.reshape(-1, w.shape[-1]).T          # (O, kh*kw*I)
                sig_true = np.linalg.svd(m, compute_uv=False)[0]
                u0, v0 = (np.asarray(p["sn"]["u"]),
                          np.asarray(p["sn"]["v"]))
                sig_ours = float(u0 @ (m @ v0))
                u2, v2 = (np.asarray(rt[layer]["sn"]["u"]),
                          np.asarray(rt[layer]["sn"]["v"]))
                sig_rt = float(u2 @ (m @ v2))
                np.testing.assert_allclose(sig_ours, sig_true, rtol=1e-3,
                                           err_msg=f"{name}.{layer}")
                np.testing.assert_allclose(sig_rt, sig_true, rtol=1e-3,
                                           err_msg=f"{name}.{layer}")
