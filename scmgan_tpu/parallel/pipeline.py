"""Pipeline parallelism for the Transition: GPipe-style microbatching over
a 'pipe' mesh axis with `shard_map` + `lax.ppermute`.

The reference has no pipeline story at all (single GPU, reference
models.py:57); the TPU-native formulation splits the Transition's six-conv
U-Net (models/world_model.py::transition, reference models.py:43-119) into
three two-conv stages placed on consecutive devices of a ('pipe',) mesh
axis.  Microbatches flow stage-to-stage over ICI via `ppermute` while every
stage works on a different microbatch — the classic GPipe schedule with a
(S-1)/(n_micro+S-1) bubble.

Payload design: the U-Net's long skips (conv1 -> conv6 concat and
conv2 -> conv5 concat) mean later stages need early-stage activations, so
the inter-stage payload is the uniform triple (x, skip1, skip2), each
(B_micro, H, W, hidden) — stage 0 fills the skips, stage 1 forwards them,
stage 2 consumes them.  Stage compute is heterogeneous (different channel
counts, no SN on conv6), expressed with `lax.switch` on
`lax.axis_index('pipe')`.

Scope / tradeoff: this model's parameters are ~2 MB, so they are left
replicated across the pipeline — the axis partitions activation compute
and VMEM working set (the actual constraint at very large hidden widths or
serving batches).  For width-scaling beyond one chip's HBM, compose with
the 'model' tensor axis (parallel/mesh.py) rather than sharding stage
params.  Validated bit-exact vs the single-device transition in
tests/test_pipeline.py and executed in __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from scmgan_tpu.models.world_model import _sn_conv
from scmgan_tpu.ops.conv import conv2d, leaky_relu
from scmgan_tpu.ops.stochastic import hard_threshold

N_STAGES = 3


def _stage0(params, payload, z, a_map):
    x = jnp.concatenate([z, a_map], axis=-1)
    s1 = leaky_relu(_sn_conv(params["conv1"], x, circular=True))
    s2 = leaky_relu(_sn_conv(params["conv2"], s1, circular=True))
    return s2, s1, s2


def _stage1(params, payload, z, a_map):
    x, s1, s2 = payload
    x = leaky_relu(_sn_conv(params["conv3"], x, circular=True))
    x = leaky_relu(_sn_conv(params["conv4"], x, circular=True))
    return x, s1, s2


def _stage2(params, payload, z, a_map):
    x, s1, s2 = payload
    x = leaky_relu(
        _sn_conv(params["conv5"], jnp.concatenate([x, s2], axis=-1),
                 circular=True))
    x = conv2d(params["conv6"], jnp.concatenate([x, s1], axis=-1),
               circular=True)
    probs = jax.nn.sigmoid(x)
    # pad the latent-channel result back to the uniform payload width
    hidden = s1.shape[-1]
    out = jnp.zeros(x.shape[:-1] + (hidden,), x.dtype)
    out = out.at[..., : probs.shape[-1]].set(probs)
    return out, s1, s2


def pipeline_transition(
    params: dict,
    z: jax.Array,
    action_onehot: jax.Array,
    mesh: Mesh,
    n_micro: int = 4,
    axis: str = "pipe",
    sample: bool = True,
):
    """Serving-mode transition over a pipeline mesh axis.

    z: (B, H, W, latent); action_onehot: (B, A).  B must divide by
    ``n_micro``.  Returns what ``transition(train=False)`` returns
    (hard-thresholded latents), or the sigmoid probabilities when
    ``sample=False``.
    """
    n_stages = mesh.shape[axis]
    assert n_stages == N_STAGES, (
        f"pipeline axis must have {N_STAGES} devices, got {n_stages}")
    b, h, w, latent = z.shape
    assert b % n_micro == 0, (b, n_micro)
    bm = b // n_micro
    hidden = params["conv2"]["w"].shape[-1]
    n_ticks = n_micro + n_stages - 1

    a_map = jnp.broadcast_to(
        action_onehot[:, None, None, :].astype(z.dtype),
        (b, h, w, action_onehot.shape[-1]))
    z_micro = z.reshape(n_micro, bm, h, w, latent)
    a_micro = a_map.reshape(n_micro, bm, h, w, a_map.shape[-1])

    repl = P()

    def pipelined(params, z_mb, a_mb):
        stage = lax.axis_index(axis)
        zero = jnp.zeros((bm, h, w, hidden), z.dtype)
        out_buf = jnp.zeros((n_micro, bm, h, w, latent), z.dtype)

        def tick(carry, t):
            payload, out_buf = carry
            mb = jnp.minimum(t, n_micro - 1)
            z_t = lax.dynamic_index_in_dim(z_mb, mb, keepdims=False)
            a_t = lax.dynamic_index_in_dim(a_mb, mb, keepdims=False)
            payload = lax.switch(
                stage, (_stage0, _stage1, _stage2), params, payload, z_t, a_t)
            # the last stage finished microbatch t-(S-1) this tick
            done = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            out_buf = lax.dynamic_update_index_in_dim(
                out_buf, payload[0][..., :latent], done, axis=0)
            payload = jax.tree.map(
                lambda v: lax.ppermute(
                    v, axis,
                    [(s, (s + 1) % n_stages) for s in range(n_stages)]),
                payload)
            return (payload, out_buf), None

        (payload, out_buf), _ = lax.scan(
            tick, ((zero, zero, zero), out_buf), jnp.arange(n_ticks))
        # only the last stage's buffer holds results; expose it on the
        # stacked leading axis and select it outside.
        return out_buf[None]

    out = shard_map(
        pipelined, mesh=mesh,
        in_specs=(repl, repl, repl),
        out_specs=P(axis),
        check_vma=False,
    )(params, z_micro, a_micro)
    probs = out[-1].reshape(b, h, w, latent)
    return hard_threshold(probs) if sample else probs
