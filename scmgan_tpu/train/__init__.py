from scmgan_tpu.train.losses import world_model_loss  # noqa: F401
from scmgan_tpu.train.trainer import (  # noqa: F401
    TrainState,
    init_train_state,
    make_train_step,
    train,
)
