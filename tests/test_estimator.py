"""End-to-end registration/tracking on a synthetic scene.

The learned RefineNet/ScoreNet have no distributed weights (same as the
reference snapshot), so the E2E oracle uses the geometric refiner/scorer —
the full register() pipeline (depth preprocess, hypothesis grid, crop/render
batches, refinement, scoring, ranking) is identical.
"""

import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core import meshio, metrics
from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
from foundationpose_tpu.engine.geometric import (
    GeometricConfig,
    GeometricRefiner,
    GeometricScorer,
)
from foundationpose_tpu.ops import raster

K = np.array([[250.0, 0, 80], [0, 250.0, 60], [0, 0, 1]])
HW = (120, 160)


def asymmetric_mesh():
    """An L-shaped chiral object — depth-asymmetric from every view, so the
    geometric scorer can disambiguate orientation."""
    a = meshio.make_box((0.12, 0.04, 0.04))
    b = meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0])
    c = meshio.make_box((0.04, 0.04, 0.07)).translated([-0.04, 0.0, 0.055])
    meshes = [a, b, c]
    verts = np.concatenate([m.vertices for m in meshes])
    offs = np.cumsum([0] + [len(m.vertices) for m in meshes[:-1]])
    faces = np.concatenate([m.faces + o for m, o in zip(meshes, offs)])
    m = meshio.Mesh(verts, faces)
    m.vertex_colors = np.full((len(verts), 3), 180, dtype=np.uint8)
    return m


def render_scene(mesh, pose):
    mt = raster.make_mesh_tensors(mesh)
    out = raster.render_full_frame(mt, pose[None], K, HW)
    rgb = np.asarray(out["rgb"][0]) * 255.0
    depth = np.asarray(out["depth"][0])
    mask = np.asarray(out["mask"][0])
    return rgb, depth, mask


@pytest.fixture(scope="module")
def estimator():
    mesh = asymmetric_mesh()
    gcfg = GeometricConfig(input_size=64)
    cfg = EstimatorConfig(
        min_n_views=12, inplane_step=120, register_iterations=10,
        final_refine_iterations=8,
    )
    est = FoundationPoseTPU(
        mesh,
        config=cfg,
        refiner=GeometricRefiner(gcfg),
        scorer=GeometricScorer(gcfg),
    )
    return est


def test_register_recovers_pose(estimator):
    mesh = estimator.mesh_ori
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.3, -0.2, 0.5))[:3, :3]
    gt[:3, 3] = [0.01, -0.02, 0.55]
    rgb, depth, mask = render_scene(mesh, gt)
    assert mask.sum() > 300

    pose = estimator.register(K, rgb, depth, mask)
    diameter = estimator.diameter
    err = float(metrics.adds_err(pose, gt, mesh.vertices))
    assert err < 0.1 * diameter, f"ADD-S {err} vs diameter {diameter}"
    # translation within 2 cm
    np.testing.assert_allclose(pose[:3, 3], gt[:3, 3], atol=0.02)


def test_track_one_follows_motion(estimator):
    mesh = estimator.mesh_ori
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.3, -0.2, 0.5))[:3, :3]
    gt[:3, 3] = [0.01, -0.02, 0.55]
    rgb, depth, mask = render_scene(mesh, gt)
    estimator.register(K, rgb, depth, mask)

    # move the object slightly and track
    gt2 = gt.copy()
    gt2[:3, 3] += [0.008, -0.004, 0.01]
    gt2[:3, :3] = np.asarray(geo.euler_matrix(0.05, 0, 0))[:3, :3] @ gt2[:3, :3]
    rgb2, depth2, _ = render_scene(mesh, gt2)
    pose2 = estimator.track_one(rgb2, depth2, K, iteration=5)
    err = float(metrics.adds_err(pose2, gt2, mesh.vertices))
    assert err < 0.1 * estimator.diameter


def test_register_empty_mask(estimator):
    rgb = np.zeros((*HW, 3), np.float32)
    depth = np.zeros(HW, np.float32)
    mask = np.zeros(HW, bool)
    pose = estimator.register(K, rgb, depth, mask)
    # translation-only fallback (reference estimater.py:185-189)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], 0.0, atol=1e-6)


def test_scorer_prefers_true_pose(estimator):
    mesh = estimator.mesh_ori
    gt = np.eye(4)
    gt[:3, 3] = [0.0, 0.0, 0.5]
    rgb, depth, mask = render_scene(mesh, gt)
    centered_gt = gt.copy()
    centered_gt[:3, 3] = gt[:3, 3] + gt[:3, :3] @ estimator.model_center
    wrong = centered_gt.copy()
    wrong[:3, :3] = np.asarray(geo.euler_matrix(0.0, np.pi / 2, 0.0))[:3, :3] @ wrong[:3, :3]
    import jax.numpy as jnp

    from foundationpose_tpu.core.geometry import depth2xyzmap

    xyz_map = np.asarray(depth2xyzmap(depth, K))
    scores = np.asarray(
        estimator.scorer.predict(
            estimator.mesh_tensors, rgb, xyz_map, K,
            np.stack([centered_gt, wrong]).astype(np.float32), estimator.diameter,
        )
    )
    assert scores[0] > scores[1]
