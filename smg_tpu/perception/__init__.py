from smg_tpu.perception import minrect, nms, segment  # noqa: F401
