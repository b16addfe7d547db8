"""Multi-hypothesis tracking vs the projective-ICP null space.

Projective (same-pixel) association on a fronto-parallel flat face has an
EXACT null space under tangential slides: render xyz and observed xyz agree
at every pixel (same z, same backprojection), so both the point-to-plane and
point-to-point ICP terms are zero and a slid chain pose never recovers —
this is the round-4 tracking drift on boxes/cylinders (scene AUCs 0.46-0.52).
The multi-hypothesis fan + edge-aligned scorer must pull it back.
"""

import numpy as np

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
from foundationpose_tpu.engine.geometric import (
    GeometricConfig, GeometricRefiner, GeometricScorer,
)
from foundationpose_tpu.ops import raster

K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])
HW = (120, 160)


def _setup(track_hypotheses):
    mesh = meshio.make_box((0.12, 0.10, 0.04))
    mesh.vertex_colors = np.full((len(mesh.vertices), 3), 150, np.uint8)
    gcfg = GeometricConfig(input_size=64, use_pallas=False)
    est = FoundationPoseTPU(
        mesh,
        config=EstimatorConfig(
            track_iterations=2, track_hypotheses=track_hypotheses,
            track_crop_size=0,
        ),
        refiner=GeometricRefiner(gcfg),
        scorer=GeometricScorer(gcfg),
    )
    # flat face towards the camera (slight tilt so it's realistic)
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.06, -0.04, 0.1))[:3, :3]
    gt[:3, 3] = [0.0, 0.0, 0.5]
    mt = raster.make_mesh_tensors(est.mesh)
    out = raster.render_full_frame(mt, gt[None].astype(np.float32), K, HW)
    depth = np.asarray(out["depth"][0]).astype(np.float32)
    rgb = (np.asarray(out["rgb"][0]) * 255).astype(np.float32)
    return est, gt, rgb, depth


def _terr(est, gt):
    return float(np.linalg.norm(est.pose_last[:3, 3] - gt[:3, 3]))


def _run(track_hypotheses, slide=0.006, frames=4):
    est, gt, rgb, depth = _setup(track_hypotheses)
    start = gt.copy()
    start[:3, 3] = gt[:3, 3] + np.array([slide, 0, 0])  # tangential slide
    est.pose_last = start
    for _ in range(frames):
        est.track_one(rgb, depth, K)
    return _terr(est, gt)


def test_single_hypothesis_stuck_in_null_space():
    """Baseline: refine-only tracking cannot remove a tangential slide on a
    flat face (documents the failure mode the fan exists for)."""
    err = _run(track_hypotheses=1)
    assert err > 0.004, f"expected the slide to persist, got {err * 1000:.1f} mm"


def test_multi_hypothesis_recovers_slide():
    err = _run(track_hypotheses=8)
    assert err < 0.002, f"fan failed to re-center: {err * 1000:.1f} mm left"


def test_multi_hypothesis_stable_at_truth():
    """The fan must not jitter a correct chain away from the truth."""
    est, gt, rgb, depth = _setup(8)
    est.pose_last = gt
    for _ in range(3):
        est.track_one(rgb, depth, K)
    assert _terr(est, gt) < 0.0015
