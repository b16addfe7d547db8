"""Hypothesis-axis sharded registration: the full register() pipeline run
SPMD over a device mesh must match the single-device result.

This is the primary pod-slice scaling axis (SURVEY.md section 2.3): the
reference chunks 252 hypotheses through sequential CUDA launches
(predict_pose_refine.py:38,167); here the hypothesis axis is sharded over a
``jax.sharding.Mesh`` and XLA inserts the collectives.
"""

import jax
import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio, metrics
from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
from foundationpose_tpu.engine.geometric import (
    GeometricConfig,
    GeometricRefiner,
    GeometricScorer,
)
from foundationpose_tpu.ops import raster
from foundationpose_tpu.parallel.mesh import make_device_mesh

# compile-heavy 8-device SPMD register: >10 min on a small CPU host (fast on TPU); the quick
# pyramid lives in the unit-test files
pytestmark = pytest.mark.slow

K = np.array([[250.0, 0, 80], [0, 250.0, 60], [0, 0, 1]])
HW = (120, 160)


def _mesh_obj():
    a = meshio.make_box((0.12, 0.04, 0.04))
    b = meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0])
    verts = np.concatenate([a.vertices, b.vertices])
    faces = np.concatenate([a.faces, b.faces + len(a.vertices)])
    m = meshio.Mesh(verts, faces)
    m.vertex_colors = np.full((len(verts), 3), 180, dtype=np.uint8)
    return m


def _make_est(device_mesh=None):
    gcfg = GeometricConfig(input_size=64)
    cfg = EstimatorConfig(min_n_views=12, inplane_step=120, register_iterations=6)
    return FoundationPoseTPU(
        _mesh_obj(), config=cfg,
        refiner=GeometricRefiner(gcfg), scorer=GeometricScorer(gcfg),
        device_mesh=device_mesh,
    )


def test_sharded_register_matches_single_device():
    mesh_obj = _mesh_obj()
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.3, -0.2, 0.5))[:3, :3]
    gt[:3, 3] = [0.01, -0.02, 0.55]
    mt = raster.make_mesh_tensors(mesh_obj)
    out = raster.render_full_frame(mt, gt[None], K, HW)
    rgb = np.asarray(out["rgb"][0]) * 255.0
    depth = np.asarray(out["depth"][0])
    mask = np.asarray(out["mask"][0])

    dmesh = make_device_mesh(len(jax.devices()), axis_names=("batch",))
    est_sh = _make_est(device_mesh=dmesh)
    n_grid = len(est_sh.rot_grid)
    pose_sh = est_sh.register(K, rgb, depth, mask)
    assert len(est_sh.poses) == n_grid and len(est_sh.scores) == n_grid

    est_1 = _make_est(device_mesh=None)
    pose_1 = est_1.register(K, rgb, depth, mask)

    # both recover the GT pose; sharded == unsharded up to collective reorder
    for pose in (pose_sh, pose_1):
        err = float(metrics.adds_err(pose, gt, mesh_obj.vertices))
        assert err < 0.1 * est_sh.diameter
    np.testing.assert_allclose(pose_sh, pose_1, atol=1e-3)

    # sharding pads (duplicates of hypothesis 0) are forced to the sort tail
    # inside the fused program, so the kept top-n_grid entries must be exactly
    # the real hypotheses: every score finite, and the whole ranked
    # (pose, score) list matches the unsharded run — not just the argmax
    assert np.isfinite(est_sh.scores).all()
    np.testing.assert_allclose(est_sh.scores, est_1.scores, atol=1e-3)
    np.testing.assert_allclose(est_sh.poses, est_1.poses, atol=1e-3)


def test_sharded_register_funnel_pads_excluded():
    """With funnel_top_k set, pad hypotheses must not consume fine-pass
    slots: the sharded funnel run keeps the same ranked list as unsharded."""
    import dataclasses

    mesh_obj = _mesh_obj()
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(-0.2, 0.4, 0.1))[:3, :3]
    gt[:3, 3] = [0.0, 0.01, 0.5]
    mt = raster.make_mesh_tensors(mesh_obj)
    out = raster.render_full_frame(mt, gt[None], K, HW)
    rgb = np.asarray(out["rgb"][0]) * 255.0
    depth = np.asarray(out["depth"][0])
    mask = np.asarray(out["mask"][0])

    gcfg = GeometricConfig(input_size=64)

    def make(device_mesh):
        cfg = EstimatorConfig(
            min_n_views=12, inplane_step=120, register_iterations=6,
            funnel_top_k=8, funnel_coarse_iterations=2,
        )
        return FoundationPoseTPU(
            _mesh_obj(), config=cfg,
            refiner=GeometricRefiner(gcfg), scorer=GeometricScorer(gcfg),
            device_mesh=device_mesh,
        )

    dmesh = make_device_mesh(len(jax.devices()), axis_names=("batch",))
    est_sh = make(dmesh)
    # require a non-divisible grid so pads actually exist
    assert len(est_sh.rot_grid) % len(jax.devices()) != 0
    pose_sh = est_sh.register(K, rgb, depth, mask)
    est_1 = make(None)
    pose_1 = est_1.register(K, rgb, depth, mask)

    assert np.isfinite(est_sh.scores).all()
    # exactly funnel_top_k entries carry the +100 winner lift, none of them pads
    assert int(np.sum(est_sh.scores >= 100.0 + est_sh.scores.min())) >= 1
    np.testing.assert_allclose(est_sh.scores, est_1.scores, atol=1e-3)
    np.testing.assert_allclose(pose_sh, pose_1, atol=1e-3)
    err = float(metrics.adds_err(pose_sh, gt, mesh_obj.vertices))
    assert err < 0.1 * est_sh.diameter
