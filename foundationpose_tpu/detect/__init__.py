from foundationpose_tpu.detect.pipeline import AutoMasker  # noqa: F401
