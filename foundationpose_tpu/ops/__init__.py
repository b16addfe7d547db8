from foundationpose_tpu.ops import image, raster  # noqa: F401
