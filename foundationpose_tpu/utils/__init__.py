from foundationpose_tpu.utils import vis  # noqa: F401
