"""TPU-native neural-net ops: functional conv layers, spectral norm as
explicit state, straight-through Bernoulli sampling, coordconv, gaussian
smoothing, and a scan-based convolutional spatial RNN."""

from scmgan_tpu.ops.conv import (  # noqa: F401
    conv2d_init,
    conv2d,
    conv_transpose2d_init,
    conv_transpose2d,
    linear_init,
    linear,
    circular_pad,
    leaky_relu,
)
from scmgan_tpu.ops.spectral_norm import (  # noqa: F401
    sn_init,
    sn_weight,
    sn_power_iteration,
    update_spectral_norms,
)
from scmgan_tpu.ops.stochastic import st_bernoulli, hard_threshold  # noqa: F401
from scmgan_tpu.ops.coordconv import coord_channels, coordconv2d  # noqa: F401
from scmgan_tpu.ops.smoothing import gaussian_kernel1d, gaussian_smooth2d  # noqa: F401
