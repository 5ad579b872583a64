from scmgan_tpu.analysis.mse import measure_prediction_mse  # noqa: F401
from scmgan_tpu.analysis.evaluate import evaluate  # noqa: F401
