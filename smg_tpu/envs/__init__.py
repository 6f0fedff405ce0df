from smg_tpu.envs import primitives, smg_env  # noqa: F401
