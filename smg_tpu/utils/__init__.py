from smg_tpu.utils import config, logger  # noqa: F401
