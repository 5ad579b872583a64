"""scmgan_tpu — a TPU-native world-model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
"Counterfactual Regularization for Model-Based RL" codebase (scm-gan):
action-conditional video-prediction world models with counterfactual
regularizers, an MPC agent, a pure-JAX environment zoo, disentanglement /
causal-graph analysis, and mesh-sharded (dp x tp) training.

Design stance (not a port):
  * NHWC layout end-to-end; the 128-channel conv stacks land on the MXU.
  * Functional core: params are pytrees, spectral-norm power iteration is an
    explicit pure update on weights, RNG is threaded `jax.random` keys.
  * Time is `lax.scan`, the MPC beam is `vmap`+`scan`, synthetic environments
    are pure `step(state, action, key)` functions that compile on-device.
  * Scale-out via `jax.sharding.Mesh` ('data', 'model') + jit sharding
    annotations; XLA inserts the ICI collectives.
"""

__version__ = "0.1.0"

from scmgan_tpu.config import Config  # noqa: F401
