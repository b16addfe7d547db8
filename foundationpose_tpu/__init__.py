"""foundationpose_tpu — a TPU-native 6D object pose estimation and object-SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SavaRobotics/FoundationPose (see SURVEY.md at the repo root):

- ``core``     : pure-jnp geometry, pose math, metrics, mesh IO (no torch, no GL).
- ``ops``      : the compute kernels — batched crop-space rasterizer, depth
                 stencils, perspective crop-warp, instant-NGP hash grid — written
                 against XLA/Pallas instead of CUDA.
- ``models``   : RefineNet / ScoreNet (flax), behavioral parity with
                 learning/models/{refine,score}_network.py in the reference.
- ``engine``   : the FoundationPose estimator API (register / track_one) as
                 jitted pipelines over a sharded hypothesis axis.
- ``field``    : neural object field (BundleSDF half): SDF NeRF with hash-grid
                 encoding, occupancy-guided sampling, joint pose optimization.
- ``io``       : dataset readers (BOP suite, YCBInEOAT), robot I/O.
- ``parallel`` : device-mesh construction and sharding helpers.
"""

__version__ = "0.1.0"

import jax as _jax

# On TPU, f32 matmuls default to fast bf16 MXU passes (~0.4% relative error).
# Every f32 matmul in this framework is camera/pose geometry where that error
# is centimeters at scene scale (the ICP solver, crop projections, barycentric
# setup). Model code computes in bf16 explicitly and is unaffected by this.
_jax.config.update("jax_default_matmul_precision", "highest")

from foundationpose_tpu.core import geometry  # noqa: F401
