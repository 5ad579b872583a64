from scmgan_tpu.parallel.mesh import (  # noqa: F401
    spatial_activation_sharding,
    make_mesh,
    leaf_spec,
    param_shardings,
    batch_shardings,
    shard_pytree,
    shard_train_step,
)
