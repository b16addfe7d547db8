from foundationpose_tpu.core import geometry, icosphere, meshio, metrics, poses  # noqa: F401
