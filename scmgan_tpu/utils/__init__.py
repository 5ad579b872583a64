from scmgan_tpu.utils.timeseries import TimeSeries, sparkline  # noqa: F401
