from foundationpose_tpu.ops import image  # noqa: F401
