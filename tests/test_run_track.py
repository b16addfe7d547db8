"""End-to-end video tracking driver on a synthetic YCBInEOAT-style sequence:
render an object moving over 4 frames, write the reader's on-disk layout
(rgb/, depth/ mm png, masks/, annotated_poses/, cam_K.txt), then run
apps.run_track.track_video and check the tracked poses against GT."""

import os

import cv2
import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.ops import raster

# compile-heavy E2E video tracking: >10 min on a small CPU host (fast on TPU); the quick
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


def test_track_video_synthetic(tmp_path):
    mesh = _mesh_obj()
    mt = raster.make_mesh_tensors(mesh)
    for sub in ("rgb", "depth", "masks", "annotated_poses"):
        os.makedirs(tmp_path / sub)
    np.savetxt(tmp_path / "cam_K.txt", K)

    gts = []
    pose = np.eye(4)
    pose[:3, :3] = np.asarray(geo.euler_matrix(0.3, -0.2, 0.5))[:3, :3]
    pose[:3, 3] = [0.01, -0.02, 0.55]
    for i in range(4):
        p = pose.copy()
        p[:3, 3] += np.array([0.004, -0.002, 0.005]) * i
        out = raster.render_full_frame(mt, p[None], K, HW)
        rgb = (np.asarray(out["rgb"][0]) * 255).astype(np.uint8)
        depth_mm = (np.asarray(out["depth"][0]) * 1000).astype(np.uint16)
        mask = (np.asarray(out["mask"][0]) * 255).astype(np.uint8)
        name = f"{i:04d}.png"
        cv2.imwrite(str(tmp_path / "rgb" / name), rgb[..., ::-1])
        cv2.imwrite(str(tmp_path / "depth" / name), depth_mm)
        cv2.imwrite(str(tmp_path / "masks" / name), mask)
        np.savetxt(tmp_path / "annotated_poses" / f"{i:04d}.txt", p)
        gts.append(p)

    from foundationpose_tpu.apps.run_track import track_video
    from foundationpose_tpu.io.datareader import YcbineoatReader

    reader = YcbineoatReader(str(tmp_path))
    assert len(reader) == 4
    results, summary = track_video(reader, mesh=mesh, mode="geometric")
    assert summary["frames"] == 4
    assert summary["adds_mean"] is not None
    assert summary["ate_rmse"] is not None and summary["ate_rmse"] < 0.02
    diameter = meshio.compute_mesh_diameter(mesh=mesh)
    for r in results:
        assert r["adds"] < 0.12 * diameter, (r["i"], r["adds"])
