from scmgan_tpu.models.world_model import (  # noqa: F401
    WorldModel,
    init_world_model,
    encode,
    decode,
    decode_fused,
    transition,
    predict_reward,
    discriminate,
)
