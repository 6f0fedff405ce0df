from smg_tpu.train import checkpoints, losses, trainer  # noqa: F401
