"""Discrimination tests for the geometric scorer's cross-check terms.

The round-4 register ceiling (0.846 overall ADD-S AUC) traced to the
depth-only scorer: wrong-basin hypotheses whose z-maps agree with the
observation (flipped compounds, tangentially slid boxes) tied with the true
pose. The normal-agreement and edge-alignment terms must break those ties.
"""

import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.engine.geometric import GeometricConfig, GeometricScorer
from foundationpose_tpu.ops import raster

K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])
HW = (120, 160)


def _compound():
    a = meshio.make_box((0.12, 0.04, 0.04))
    b = meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0])
    c = meshio.make_box((0.04, 0.04, 0.07)).translated([-0.04, 0.0, 0.055])
    meshes = [a, b, c]
    verts = np.concatenate([m.vertices for m in meshes])
    offs = np.cumsum([0] + [len(m.vertices) for m in meshes[:-1]])
    faces = np.concatenate([m.faces + o for m, o in zip(meshes, offs)])
    m = meshio.Mesh(verts, faces)
    m.vertex_colors = np.full((len(verts), 3), 180, np.uint8)
    return m


def _observed(mt, gt):
    out = raster.render_full_frame(mt, gt[None].astype(np.float32), K, HW)
    depth = np.asarray(out["depth"][0])
    rgb = np.asarray(out["rgb"][0]) * 255.0
    xyz = np.asarray(geo.depth2xyzmap(depth, K))
    xyz = np.where((depth > 0)[..., None], xyz, 0.0)
    return rgb.astype(np.float32), xyz.astype(np.float32)


@pytest.fixture(scope="module")
def scene():
    mesh = _compound()
    bounds = mesh.bounds
    centered = mesh.translated(-(bounds[0] + bounds[1]) / 2)
    mt = raster.make_mesh_tensors(centered)
    diameter = meshio.compute_mesh_diameter(mesh=centered)
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.4, -0.3, 0.2))[:3, :3]
    gt[:3, 3] = [0.01, -0.01, 0.55]
    rgb, xyz = _observed(mt, gt)
    return mt, diameter, gt, rgb, xyz


def _perturbed(gt, euler=(0, 0, 0), dt=(0, 0, 0)):
    p = gt.copy()
    dR = np.asarray(geo.euler_matrix(*euler))[:3, :3]
    p[:3, :3] = dR @ p[:3, :3]
    p[:3, 3] = p[:3, 3] + np.asarray(dt)
    return p


def test_scorer_separates_wrong_basins(scene):
    """GT must outrank 180-deg flips, 90-deg rotations, and tangential
    slides — the exact ties the depth-only scorer could not break."""
    mt, diameter, gt, rgb, xyz = scene
    hyps = np.stack([
        gt,
        _perturbed(gt, euler=(np.pi, 0, 0)),        # flip about x
        _perturbed(gt, euler=(0, np.pi, 0)),        # flip about y
        _perturbed(gt, euler=(0, 0, np.pi / 2)),    # quarter turn
        _perturbed(gt, dt=(0.02, 0, 0)),            # tangential slide 2 cm
        _perturbed(gt, dt=(0, 0.02, 0)),
    ]).astype(np.float32)
    scorer = GeometricScorer(GeometricConfig(input_size=64, use_pallas=False))
    s = np.asarray(scorer.predict(mt, rgb, xyz, K, hyps, diameter))
    assert s.argmax() == 0, f"GT not top: scores {s}"
    # decisive margin over every wrong basin
    assert (s[0] - s[1:] > 0.05).all(), f"weak separation: {s}"


def test_edge_term_feels_small_slides(scene):
    """The edge-alignment term must produce a monotone penalty for small
    tangential slides (the tracking-drift direction that depth inliers are
    blind to on flat surfaces)."""
    mt, diameter, gt, rgb, xyz = scene
    slides = [0.0, 0.004, 0.008, 0.016]
    hyps = np.stack(
        [_perturbed(gt, dt=(s, 0, 0)) for s in slides]
    ).astype(np.float32)
    scorer = GeometricScorer(GeometricConfig(input_size=64, use_pallas=False))
    s = np.asarray(scorer.predict(mt, rgb, xyz, K, hyps, diameter))
    assert s.argmax() == 0, f"GT not top under slides: {s}"
    # strictly decreasing with slide distance (allowing tiny numeric slack)
    assert (np.diff(s) < 1e-4).all(), f"not monotone: {s}"
