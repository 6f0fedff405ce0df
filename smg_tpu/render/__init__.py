from smg_tpu.render import ortho, persp, raycast  # noqa: F401
