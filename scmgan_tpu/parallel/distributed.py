"""Multi-host initialization and process-level sharding helpers.

The reference has no distributed story at all (single `.cuda()` device,
SURVEY §2.7).  The TPU-native equivalent (SURVEY §5): `jax.distributed`
for multi-host pods, a global mesh spanning all processes' devices, and a
per-process slice of the input batch (each host's envs feed its local
shard; the mesh's 'data' axis stitches them over ICI/DCN).

Single-process usage is a no-op — everything degrades gracefully so the
same training script runs unchanged on one chip, one host with many
chips, or a multi-host pod launched with coordinator env vars.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host.

    Resolution order: explicit args, then the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also
    honoring COORDINATOR_ADDRESS).  Returns True when distributed mode was
    initialized, False for the single-process no-op.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS")
                           or os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    process_id = (process_id if process_id is not None
                  else int(os.environ.get("JAX_PROCESS_ID", "-1")))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=None if process_id < 0 else process_id,
    )
    return True


def process_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(local_batch, offset) for this process's shard of a global batch.

    Each host's environment actors produce only its slice; placing the
    slices with a 'data'-sharded NamedSharding forms the global batch
    without any host gathering the whole thing.
    """
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} must divide over {n} processes")
    local = global_batch // n
    return local, jax.process_index() * local


def local_device_count() -> int:
    return jax.local_device_count()
