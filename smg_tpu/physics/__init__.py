from smg_tpu.physics import contact, gripper, scene, shapes, state, stepper  # noqa: F401
