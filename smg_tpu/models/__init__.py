from smg_tpu.models import affordance, densenet  # noqa: F401
