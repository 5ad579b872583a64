from scmgan_tpu.data.datasource import Datasource, allocate_datasource  # noqa: F401
