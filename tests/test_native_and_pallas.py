"""Tests for the native C components and the Pallas fused transition
(interpret mode — the compiled path is exercised on real TPU by bench)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# --------------------------------------------------------------------------
# native: AVI writer
# --------------------------------------------------------------------------

def test_avi_writer_produces_valid_riff(tmp_path):
    from scmgan_tpu.native import aviwriter

    frames = (np.random.default_rng(0).random((4, 16, 24, 3)) * 255
              ).astype(np.uint8)
    path = str(tmp_path / "clip.avi")
    aviwriter.write_avi(path, frames, fps=5)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    # RIFF size field == file size - 8
    riff_size = int.from_bytes(data[4:8], "little")
    assert riff_size == len(data) - 8
    assert b"movi" in data and b"idx1" in data
    # 4 frames indexed
    assert data.count(b"00db") >= 8  # movi chunks + idx entries


def test_avi_writer_row_padding(tmp_path):
    from scmgan_tpu.native import aviwriter

    # width 17 -> row 51 bytes padded to 52
    frames = np.zeros((2, 8, 17, 3), np.uint8)
    path = str(tmp_path / "pad.avi")
    aviwriter.write_avi(path, frames, fps=5)
    assert os.path.getsize(path) > 2 * 52 * 8


# --------------------------------------------------------------------------
# native: stitcher
# --------------------------------------------------------------------------

def test_stitcher_clip_semantics():
    from scmgan_tpu.native import stitch_batch

    t1, t2 = 12, 9
    frames = np.arange(t1 + t2, dtype=np.float32)[:, None]
    rewards = np.arange(t1 + t2, dtype=np.float32)[:, None]
    actions = np.arange(t1 + t2, dtype=np.int32)
    offsets = np.array([0, t1])
    lengths = np.array([t1, t2])
    of, orw, od, oa = stitch_batch(frames, rewards, actions, offsets,
                                   lengths, batch=8, timesteps=10,
                                   random_start=True, seed=3)
    assert of.shape == (8, 10, 1)
    assert od.shape == (8, 10)
    # every row's final step of each clip carries done=1
    assert od.any(axis=1).all()
    # frames and actions stay aligned (same arena index)
    np.testing.assert_array_equal(of[..., 0].astype(np.int32), oa)
    # clip content comes from within episodes (never crosses the last step)
    assert int(oa.max()) < t1 + t2


def test_stitcher_deterministic_seed():
    from scmgan_tpu.native import stitch_batch

    frames = np.random.default_rng(0).random((30, 2)).astype(np.float32)
    rewards = np.zeros((30, 1), np.float32)
    actions = np.zeros(30, np.int32)
    offsets, lengths = np.array([0]), np.array([30])
    a = stitch_batch(frames, rewards, actions, offsets, lengths, 4, 8,
                     seed=42)
    b = stitch_batch(frames, rewards, actions, offsets, lengths, 4, 8,
                     seed=42)
    np.testing.assert_array_equal(a[0], b[0])


# --------------------------------------------------------------------------
# pallas fused transition (interpret mode)
# --------------------------------------------------------------------------

def test_fused_transition_matches_xla(monkeypatch, key):
    from jax.experimental import pallas as pl

    import scmgan_tpu.ops.pallas.fused_transition as ft
    from scmgan_tpu.models import init_world_model, transition

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ft.pl, "pallas_call", interp)

    wm = init_world_model(key, 16, 4, 1, 3, 3)
    z = (jax.random.uniform(key, (2, 64, 64, 16)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([1, 3]), 4)
    ref = transition(wm.transition, z, a, train=False)
    out = ft.fused_transition(wm.transition, z, a, sample=False)
    # bf16 kernel vs f32 XLA: only sigmoid values straddling 0.5 may flip
    match = float((ref == out).mean())
    assert match > 0.995, match


def test_fused_decoder_matches_xla(monkeypatch, key):
    from jax.experimental import pallas as pl

    import scmgan_tpu.ops.pallas.fused_decoder as fd
    from scmgan_tpu.models import decode_fused, init_world_model

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(fd.pl, "pallas_call", interp)

    wm = init_world_model(key, 16, 4, 1, 3, 3)
    z = (jax.random.uniform(key, (2, 64, 64, 16)) > 0.5).astype(jnp.float32)
    ref = decode_fused(wm.decoder, z.astype(jnp.bfloat16))
    out = fd.fused_decode(wm.decoder, z)
    assert out.shape == ref.shape
    # both paths run the convs in bf16; the kernel's f32 accumulation can
    # only be more accurate — compare at bf16 resolution
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.02)


def test_fused_decoder_zero_boundary(monkeypatch, key):
    """The decoder is SAME zero-padded, not circular: a lone bright latent
    pixel at the image corner must not leak to the opposite edge."""
    from jax.experimental import pallas as pl

    import scmgan_tpu.ops.pallas.fused_decoder as fd
    from scmgan_tpu.models import decode_fused, init_world_model

    orig = pl.pallas_call
    monkeypatch.setattr(
        fd.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    wm = init_world_model(key, 16, 4, 1, 3, 3)
    z = jnp.zeros((1, 16, 16, 16)).at[0, 0, 0, :].set(1.0)
    ref = decode_fused(wm.decoder, z.astype(jnp.bfloat16))
    out = fd.fused_decode(wm.decoder, z)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.02, atol=0.02)


def test_pack_transition_weights_shapes(key):
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.ops.pallas.fused_transition import pack_transition_weights

    wm = init_world_model(key, 16, 5, 2, 3, 3)
    packed = pack_transition_weights(wm.transition, 16, 5)
    assert packed["w1"].shape == (9, 24, 128)   # 21 -> padded 24
    assert packed["w2"].shape == (9, 128, 128)
    assert packed["w5a"].shape == (9, 128, 128)
    assert packed["w5b"].shape == (9, 128, 128)
    assert packed["w6a"].shape == (9, 128, 16)
    assert packed["b6"].shape == (1, 16)


def test_xla_int8_transition_matches(key):
    from scmgan_tpu.models import init_world_model, transition
    from scmgan_tpu.models.quantized import quantize_transition, transition_int8

    wm = init_world_model(key, 16, 4, 1, 3, 3)
    z = (jax.random.uniform(key, (2, 64, 64, 16)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([1, 3]), 4)
    ref = transition(wm.transition, z, a, train=False)
    qt = quantize_transition(wm.transition, 16, 4)
    out = transition_int8(qt, z, a)
    match = float((ref == out).mean())
    # int8 is a lossy serving mode; bit agreement should still be high
    assert match > 0.95, match
    assert set(np.unique(np.asarray(out))) <= {0.0, 1.0}


def test_int8_pallas_kernel_matches_xla_int8(monkeypatch, key):
    """v3 pallas int8 kernel vs the XLA int8 path, small shapes,
    interpret mode."""
    from jax.experimental import pallas as pl

    import scmgan_tpu.ops.pallas.int8_kernel as ik
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.models.quantized import (
        quantize_transition,
        transition_int8,
    )

    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ik.pl, "pallas_call", interp)
    wm = init_world_model(key, 8, 4, 1, 3, 3, img_size=16)
    z = (jax.random.uniform(key, (2, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([1, 3]), 4)
    ref = transition_int8(quantize_transition(wm.transition), z, a)
    out = ik.int8_fused_transition(wm.transition, z, a)
    match = float((ref == out).mean())
    assert match > 0.99, match


def test_ring_int8_transition_bit_exact(key):
    """The pad-free ring rewrite (SAME conv + exact border-strip fixups +
    rank-1 action bias) must be bit-identical to the per-conv wrap-padded
    int8 path with the f32 epilogue."""
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.models.quantized import (
        quantize_transition,
        transition_int8,
        transition_int8_ring,
    )

    wm = init_world_model(key, 8, 5, 1, 3, 3, img_size=16)
    qt = quantize_transition(wm.transition)
    z = (jax.random.uniform(key, (3, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([1, 4, 0]), 5)
    ref = transition_int8(qt, z, a)
    out = transition_int8_ring(qt, z, a, epilogue_dtype=jnp.float32)
    assert float((ref == out).mean()) == 1.0
    out_bf16 = transition_int8_ring(qt, z, a, epilogue_dtype=jnp.bfloat16)
    assert float((ref == out_bf16).mean()) > 0.9


def test_int8_paths_threshold_continuous_latents(key):
    """Regression: a float latent carry straight off the encoder holds
    continuous sigmoid values; the int8 engine must threshold them at 0.5
    (astype(int8) floored them all to zero — 23x MSE at t+10 on trained
    models before the fix)."""
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.models.quantized import (
        quantize_transition,
        transition_int8,
        transition_int8_v2,
    )

    wm = init_world_model(key, 8, 4, 1, 3, 3, img_size=16)
    qt = quantize_transition(wm.transition)
    zc = jax.random.uniform(key, (2, 16, 16, 8))          # continuous
    zb = (zc > 0.5).astype(jnp.float32)                   # binarized
    a = jax.nn.one_hot(jnp.array([1, 3]), 4)
    for fn in (transition_int8, transition_int8_v2):
        out_c = fn(qt, zc, a)
        out_b = fn(qt, zb, a)
        assert float((out_c == out_b).mean()) == 1.0, fn.__name__


def test_calibrate_transition_sequence_form(key):
    """calibrate_transition with (N, T, A) action sequences sweeps a
    T-step exact free-run; the resulting scales must serve the int8 path
    at least as faithfully as single-step calibration (the single-step
    ranges under-cover rollout states — 16x worse free-run MSE on
    trained pong before the sequence form existed)."""
    from scmgan_tpu.models import init_world_model, transition
    from scmgan_tpu.models.quantized import (
        calibrate_transition,
        transition_int8_v2,
    )

    wm = init_world_model(key, 8, 4, 1, 3, 3, img_size=16)
    k1, k2, k3 = jax.random.split(key, 3)
    z0 = (jax.random.uniform(k1, (4, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a_seq = jax.nn.one_hot(
        jax.random.randint(k2, (4, 6), 0, 4), 4)          # (N, T, A)
    qt = calibrate_transition(wm.transition, z0, a_seq)

    # free-run agreement vs the exact path over the same action sequence
    z_ex, z_q = z0, z0
    agree = []
    for t in range(6):
        a = a_seq[:, t]
        z_ex = transition(wm.transition, z_ex, a, train=False)
        z_q = transition_int8_v2(qt, z_q, a).astype(jnp.float32)
        agree.append(float((z_ex == z_q).mean()))
    assert agree[0] > 0.99, agree
    assert min(agree) > 0.9, agree
    """The trimmed serving path (rank-1 action bias, sign threshold, int8
    carry) must match the reference int8 path bit for bit."""
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.models.quantized import (
        quantize_transition,
        transition_int8,
        transition_int8_v2,
    )

    wm = init_world_model(key, 8, 5, 1, 3, 3, img_size=16)
    qt = quantize_transition(wm.transition)
    z = (jax.random.uniform(key, (3, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([1, 4, 0]), 5)
    ref = transition_int8(qt, z, a)
    out = transition_int8_v2(qt, z, a)
    assert float((ref == out).mean()) == 1.0
    # int8 carry keeps binary values exactly
    out8 = transition_int8_v2(qt, z.astype(jnp.int8), a)
    assert out8.dtype == jnp.int8
    assert float((ref == out8.astype(jnp.float32)).mean()) == 1.0


def test_decode_fused_matches_decode(key):
    """Folding the per-factor sum into conv2's weights is exact (linear)."""
    from scmgan_tpu.models import decode, decode_fused, init_world_model

    wm = init_world_model(key, 8, 4, 1, 3, 3, img_size=16)
    z = (jax.random.uniform(key, (2, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = decode(wm.decoder, z)
    b = decode_fused(wm.decoder, z)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_int8_decoder_close_to_exact(key):
    """The int8 decoder is lossy by design; sigmoided frames must stay
    close to the exact decoder's on binary latents (serving tolerance)."""
    import numpy as np

    from scmgan_tpu.models import decode, init_world_model
    from scmgan_tpu.models.quantized import decode_int8, quantize_decoder

    wm = init_world_model(key, 8, 4, 1, 3, 3, img_size=16)
    z = (jax.random.uniform(key, (2, 16, 16, 8)) > 0.5).astype(jnp.float32)
    exact = jax.nn.sigmoid(decode(wm.decoder, z))
    qd = quantize_decoder(wm.decoder)
    q = jax.nn.sigmoid(decode_int8(qd, z.astype(jnp.int8)))
    mae = float(jnp.mean(jnp.abs(exact - q)))
    assert mae < 0.01, mae
    assert float(jnp.max(jnp.abs(exact - q))) < 0.1


def test_halo_int8_transition_bit_exact(key):
    """The halo-chain rewrite (one wrap-pad + VALID chain + split-kernel
    concats + rank-1 action bias) must produce bit-identical int32
    accumulations to the per-conv-padded int8 path when both use the f32
    epilogue."""
    from scmgan_tpu.models import init_world_model
    from scmgan_tpu.models.quantized import (
        quantize_transition,
        transition_int8,
        transition_int8_halo,
    )

    wm = init_world_model(key, 8, 5, 1, 3, 3, img_size=16)
    qt = quantize_transition(wm.transition)
    z = (jax.random.uniform(key, (3, 16, 16, 8)) > 0.5).astype(jnp.float32)
    a = jax.nn.one_hot(jnp.array([1, 4, 0]), 5)
    ref = transition_int8(qt, z, a)
    out = transition_int8_halo(qt, z, a, epilogue_dtype=jnp.float32)
    assert float((ref == out).mean()) == 1.0
    # the bf16 epilogue is a lossy speed knob; agreement stays high
    out_bf16 = transition_int8_halo(qt, z, a, epilogue_dtype=jnp.bfloat16)
    assert float((ref == out_bf16).mean()) > 0.9
