"""Device mesh + sharding rules: data parallelism over the batch axis and
tensor parallelism over the conv channel axes, via GSPMD.

The reference is strictly single-GPU — `.cuda()` at module construction and
per-iteration host->device uploads (reference models.py:57,137,233,268;
main.py:156-158) with no collective backend at all (SURVEY §2.7).  The
TPU-native scale-out story is declarative: build a `Mesh(('data','model'))`,
place params/batch with NamedShardings, and let XLA GSPMD insert the ICI
collectives (all-gather/reduce-scatter around the channel-sharded convs,
gradient psums across 'data').  No NCCL, no MPI, no hand-written comms in
the train step.

Rules (shape-based, so the same rule shards params, Adam mu/nu, and any
other param-shaped leaf):
  * 4-D HWIO conv kernels: out-channel (last) dim over 'model'
  * 2-D (in, out) linear weights: out dim over 'model'
  * 1-D vectors (biases, SN u/v): over 'model'
  * everything else (scalars, counts): replicated
  * batch leaves: leading dim over 'data'
a dim is only sharded when divisible by the axis size.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Create a 2-axis device mesh.  Default: all devices on 'data'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, (shape, n)
    dev_array = mesh_utils.create_device_mesh(shape, devices=np.asarray(devices))
    return Mesh(dev_array, axis_names)


def leaf_spec(shape: Tuple[int, ...], model_size: int, model_axis: str) -> P:
    """Shape-based tensor-parallel partition spec for a param-like leaf."""
    if model_size <= 1 or len(shape) == 0:
        return P()
    last = shape[-1]
    if last % model_size != 0 or last < model_size:
        return P()
    if len(shape) == 4:  # HWIO conv kernel
        return P(None, None, None, model_axis)
    if len(shape) == 2:  # linear (in, out)
        return P(None, model_axis)
    if len(shape) == 1:  # bias / sn vectors
        return P(model_axis)
    return P()


def param_shardings(tree, mesh: Mesh, model_axis: str = "model"):
    model_size = mesh.shape[model_axis]
    return jax.tree.map(
        lambda l: NamedSharding(mesh, leaf_spec(l.shape, model_size, model_axis)),
        tree,
    )


def batch_shardings(batch, mesh: Mesh, data_axis: str = "data"):
    return jax.tree.map(
        lambda l: NamedSharding(mesh, P(data_axis)), batch
    )


def shard_pytree(tree, shardings):
    return jax.tree.map(jax.device_put, tree, shardings)


def shard_train_step(step_fn, mesh: Mesh, data_axis: str = "data",
                     model_axis: str = "model"):
    """Wrap a train step with *declared* in/out shardings on the jit.

    The shardings are computed once from the first call's pytrees and baked
    into ``jax.jit(in_shardings=..., out_shardings=...)``: the donated state
    stays resident on the mesh across iterations (no per-step host
    round-trip or re-placement), and each fresh host batch is transferred
    directly into its 'data'-sharded layout.  Under multi-host execution
    each process feeds only its local batch slice (see
    parallel.distributed.process_batch_slice); the slices are assembled
    into the global sharded array without any host gathering the whole
    batch.

    Returned fn(state, batch, key, theta, cf_active) -> (state, metrics).
    """
    box: dict = {}

    def wrapper(state, batch, key, theta, cf_active):
        if not box:
            state_sh = param_shardings(state, mesh, model_axis)
            batch_sh = batch_shardings(batch, mesh, data_axis)
            repl = NamedSharding(mesh, P())
            box["batch_sh"] = batch_sh
            box["jit"] = jax.jit(
                step_fn,
                in_shardings=(state_sh, batch_sh, repl, repl, repl),
                # out_shardings is a prefix pytree: state keeps its layout,
                # the metrics dict is replicated.
                out_shardings=(state_sh, repl),
                donate_argnums=(0,),
            )
        if jax.process_count() > 1:
            # each process holds only its slice of the global batch
            batch = jax.tree.map(
                lambda sh, x: jax.make_array_from_process_local_data(sh, x),
                box["batch_sh"], batch,
            )
        return box["jit"](state, batch, key, theta, cf_active)

    return wrapper


def spatial_activation_sharding(mesh: Mesh, data_axis: str = "data",
                                spatial_axis: str = "model"):
    """NamedSharding for (B, H, W, C) activations with the image height
    split over ``spatial_axis`` — spatial partitioning for conv layers.

    The reference has no equivalent (single-GPU); on TPU this is the
    canonical way to scale convs past one chip's HBM for large images:
    annotate the activation sharding and GSPMD partitions every conv in
    the model spatially, inserting halo exchanges (collective-permutes of
    one-row strips over ICI) for the 3x3 windows and for the torus wrap
    rows.  Validated exact vs the unsharded transition in
    tests/test_sharding.py::test_spatial_sharded_transition.

    Use: jit the model fn with in_shardings/out_shardings built from this
    for the latent/frame tensors; params stay on their usual rules.
    """
    return NamedSharding(mesh, P(data_axis, spatial_axis, None, None))
