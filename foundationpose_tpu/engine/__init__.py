from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU  # noqa: F401
