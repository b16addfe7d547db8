"""Online model-free tracking + reconstruction on a synthetic sequence."""

import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio, metrics
from foundationpose_tpu.field.runner import FieldConfig
from foundationpose_tpu.ops import raster
from foundationpose_tpu.slam.online import (
    ModelFreeTracker,
    OnlineConfig,
    depth_map_mesh,
)

K = np.array([[300.0, 0, 80], [0, 300.0, 60], [0, 0, 1]])
HW = (120, 160)


def l_mesh():
    boxes = [
        meshio.make_box((0.12, 0.04, 0.04)),
        meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0]),
        meshio.make_box((0.04, 0.04, 0.07)).translated([-0.04, 0.0, 0.055]),
    ]
    verts = np.concatenate([m.vertices for m in boxes])
    offs = np.cumsum([0] + [len(m.vertices) for m in boxes[:-1]])
    faces = np.concatenate([m.faces + o for m, o in zip(boxes, offs)])
    m = meshio.Mesh(verts, faces)
    m.vertex_colors = ((np.abs(verts) / np.abs(verts).max()) * 255).astype(np.uint8)
    return m


def test_depth_map_mesh():
    mesh = meshio.make_box((0.1, 0.1, 0.1))
    mt = raster.make_mesh_tensors(mesh)
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.5]
    out = raster.render_full_frame(mt, pose[None].astype(np.float32), K, HW)
    depth = np.asarray(out["depth"][0])
    mask = np.asarray(out["mask"][0])
    dm = depth_map_mesh(depth, mask, K, stride=2)
    assert len(dm.faces) > 100
    # vertices lie on the observed surface
    np.testing.assert_allclose(dm.vertices[:, 2].min(), 0.45, atol=0.01)
    # all faces reference valid vertices
    assert dm.faces.max() < len(dm.vertices)


def test_online_smoke():
    """Default-suite mechanical smoke of the online model-free tracker
    (round-4 ask #9): init + 2 steps + finalize on a tiny field config.
    Guards the wiring; the drift/reconstruction accuracy statement lives in
    the slow test below."""
    mesh = l_mesh()
    mt = raster.make_mesh_tensors(mesh)

    def render_at(ob_in_cam):
        out = raster.render_full_frame(
            mt, ob_in_cam[None].astype(np.float32), K, HW
        )
        return (
            (np.asarray(out["rgb"][0]) * 255).astype(np.float32),
            np.asarray(out["depth"][0]).astype(np.float32),
            np.asarray(out["mask"][0]).astype(np.uint8),
        )

    cfg = OnlineConfig(
        keyframe_min_rot_deg=1.0, keyframe_min_trans=0.005,
        retrain_every_keyframes=100, track_iterations=2, mesh_stride=4,
        field=FieldConfig(
            n_step=10, n_rand=256, n_samples=8, n_samples_around_depth=8,
            num_levels=2, log2_hashmap_size=10, base_res=8, finest_res=16,
            triplane_resolutions=(8, 16), triplane_channels=2,
            trunc=0.02, occ_resolution=16, mask_dilate_first=8,
            mask_dilate=6, mesh_resolution=0.02,
        ),
    )
    tracker = ModelFreeTracker(K, cfg)
    pose0 = np.eye(4)
    pose0[:3, 3] = [0.0, 0.0, 0.45]
    rgb, depth, mask = render_at(pose0)
    tracker.init(rgb, depth, mask)
    for i in (1, 2):
        p = pose0.copy()
        p[:3, :3] = np.asarray(geo.euler_matrix(0.0, 0.04 * i, 0.0))[:3, :3]
        rgb, depth, mask = render_at(p)
        tracker.step(rgb, depth, mask=mask)
        assert np.isfinite(tracker.cam_in_ob).all()
    mesh_rec, optimized = tracker.finalize(bake=False)
    assert len(mesh_rec.faces) > 0
    assert len(tracker.keyframes) >= 1


@pytest.mark.slow
def test_online_tracking_loop():
    mesh = l_mesh()
    mt = raster.make_mesh_tensors(mesh)

    # object fixed at the origin; camera orbits (cam_in_ob changes per frame)
    def render_from(cam_in_ob):
        ob_in_cam = np.linalg.inv(cam_in_ob)
        out = raster.render_full_frame(
            mt, ob_in_cam[None].astype(np.float32), K, HW
        )
        return (
            (np.asarray(out["rgb"][0]) * 255).astype(np.float32),
            np.asarray(out["depth"][0]).astype(np.float32),
            np.asarray(out["mask"][0]).astype(np.uint8),
        )

    # trajectory: start in front, rotate around y in small steps
    cam0 = np.eye(4)
    cam0[:3, 3] = [0.0, 0.0, -0.45]  # camera 0.45 m in front (object z=0)
    traj = [cam0]
    for i in range(1, 8):
        ang = 0.035 * i
        R = np.asarray(geo.euler_matrix(0.0, ang, 0.012 * i))[:3, :3]
        c = np.eye(4)
        c[:3, :3] = R
        c[:3, 3] = R @ cam0[:3, 3]
        traj.append(c)

    cfg = OnlineConfig(
        keyframe_min_rot_deg=3.0,
        keyframe_min_trans=0.01,
        retrain_every_keyframes=100,  # retrain only at finalize
        track_iterations=6,
        mesh_stride=2,
        field=FieldConfig(
            n_step=120, n_rand=1024, n_samples=24, n_samples_around_depth=24,
            num_levels=4, log2_hashmap_size=14, base_res=8, finest_res=48,
            triplane_resolutions=(8, 16, 32), triplane_channels=2,
            trunc=0.02, occ_resolution=32, mask_dilate_first=8, mask_dilate=6,
            mesh_resolution=0.02,
        ),
    )
    tracker = ModelFreeTracker(K, cfg)
    rgb, depth, mask = render_from(traj[0])
    tracker.init(rgb, depth, mask)

    errs = []
    inv_cam0 = np.linalg.inv(traj[0])
    for cam in traj[1:]:
        rgb, depth, mask = render_from(cam)
        tracker.step(rgb, depth, mask=mask)
        # the tracker's object frame is camera-0's frame, so the expected
        # camera pose is cam expressed relative to frame 0
        expected = inv_cam0 @ cam
        est = tracker.cam_in_ob
        dt = np.linalg.norm(est[:3, 3] - expected[:3, 3])
        dr = float(
            geo.rotation_geodesic_distance(est[:3, :3], expected[:3, :3])
        )
        errs.append((dt, np.degrees(dr)))

    dts = np.array([e[0] for e in errs])
    drs = np.array([e[1] for e in errs])
    # tracking stays locked: < 2 cm translation, < 8 deg rotation drift
    assert dts.max() < 0.02, f"translation drift {dts}"
    assert drs.max() < 8.0, f"rotation drift {drs}"
    assert len(tracker.keyframes) >= 3

    mesh_rec, optimized = tracker.finalize(bake=False)
    assert len(mesh_rec.faces) > 50
    # reconstructed geometry (tracker frame = camera-0 frame) -> mesh frame
    rec_in_world = np.asarray(
        geo.transform_pts(mesh_rec.vertices, traj[0])
    )
    # distance from reconstructed surface to the GT surface: sample GT faces
    from scipy.spatial import cKDTree

    gt_samples = mesh.vertices[mesh.faces].mean(axis=1)  # face centroids
    tree = cKDTree(np.concatenate([mesh.vertices, gt_samples]))
    dd, _ = tree.query(rec_in_world[:: max(1, len(rec_in_world) // 500)], k=1)
    assert np.median(dd) < 0.03, f"reconstruction error {np.median(dd)}"
