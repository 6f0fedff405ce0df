from smg_tpu.core import camera, homography, rotation, tendon  # noqa: F401
