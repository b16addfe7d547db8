from foundationpose_tpu.slam.reconstruction import run_neural_object_field  # noqa: F401
