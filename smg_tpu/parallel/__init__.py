from smg_tpu.parallel import mesh, sharded  # noqa: F401
