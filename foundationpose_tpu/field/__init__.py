from foundationpose_tpu.field import bounds, encoders, losses, meshing, nerf, sampling  # noqa: F401
