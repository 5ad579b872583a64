from scmgan_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    leaf_spec,
    param_shardings,
    batch_shardings,
    shard_pytree,
    shard_train_step,
)
