"""API-boundary input validation (the reference's CHECK_* macro analog,
common.h:17-19, gridencoder.cu:15-18 + runtime guards estimater.py:185-189)."""

import numpy as np
import pytest

from foundationpose_tpu.core import validate


def test_intrinsics_checks():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    validate.check_intrinsics(K)
    with pytest.raises(ValueError, match="3,3"):
        validate.check_intrinsics(np.eye(4))
    with pytest.raises(ValueError, match="focal"):
        validate.check_intrinsics(np.diag([-1.0, 1.0, 1.0]))
    bad = K.copy(); bad[2, 2] = 2.0
    with pytest.raises(ValueError, match="bottom row"):
        validate.check_intrinsics(bad)
    nanK = K.copy(); nanK[0, 0] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        validate.check_intrinsics(nanK)


def test_rgbd_checks(caplog):
    rgb = np.zeros((24, 32, 3), np.uint8)
    depth = np.full((24, 32), 0.5, np.float32)
    validate.check_rgbd(rgb, depth)
    with pytest.raises(ValueError, match="sizes differ"):
        validate.check_rgbd(rgb, np.zeros((10, 10), np.float32))
    with pytest.raises(ValueError, match=r"\(H,W,3\)"):
        validate.check_rgbd(np.zeros((24, 32)), depth)
    with pytest.raises(ValueError, match="non-finite"):
        validate.check_rgbd(rgb, np.full_like(depth, np.nan))
    import logging
    with caplog.at_level(logging.WARNING):
        validate.check_rgbd(rgb, np.full_like(depth, 500.0))
    assert any("millimeters" in r.message for r in caplog.records)


def test_mask_and_pose_checks():
    validate.check_mask(np.ones((4, 5)), (4, 5))
    with pytest.raises(ValueError, match="does not match"):
        validate.check_mask(np.ones((4, 4)), (4, 5))
    p = np.eye(4)
    validate.check_pose(p)
    bad = p.copy(); bad[:3, :3] *= 2.0
    with pytest.raises(ValueError, match="orthonormal"):
        validate.check_pose(bad)


def test_estimator_rejects_bad_inputs():
    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
    from foundationpose_tpu.engine.geometric import (
        GeometricConfig, GeometricRefiner, GeometricScorer,
    )

    mesh = meshio.make_box((0.05, 0.05, 0.05))
    est = FoundationPoseTPU(
        mesh, config=EstimatorConfig(min_n_views=12, inplane_step=120),
        refiner=GeometricRefiner(GeometricConfig(input_size=32)),
        scorer=GeometricScorer(GeometricConfig(input_size=32)),
    )
    rgb = np.zeros((24, 32, 3), np.uint8)
    depth = np.full((24, 32), 0.5, np.float32)
    with pytest.raises(ValueError):
        est.register(np.eye(4), rgb, depth, np.ones((24, 32)))
    with pytest.raises(ValueError):
        est.register(np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]]),
                     rgb, np.zeros((8, 8), np.float32), np.ones((24, 32)))
