from smg_tpu.ops import contact_pallas  # noqa: F401
