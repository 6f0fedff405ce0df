from smg_tpu.policy import action_geom, arbitrate  # noqa: F401
