import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from foundationpose_tpu.core import geometry as geo


def random_rotations(n, seed=0):
    return Rotation.random(n, rng=np.random.default_rng(seed)).as_matrix()


def test_to_homo_and_transform_pts():
    pts = np.random.default_rng(0).normal(size=(10, 3))
    tf = np.eye(4)
    tf[:3, 3] = [1, 2, 3]
    out = np.asarray(geo.transform_pts(pts, tf))
    np.testing.assert_allclose(out, pts + np.array([1, 2, 3]), atol=1e-6)

    # batched tf broadcast over points (reference Utils.py:534 rule)
    tfs = np.tile(np.eye(4)[None], (5, 1, 1))
    tfs[:, :3, 3] = np.arange(15).reshape(5, 3)
    out = np.asarray(geo.transform_pts(pts, tfs))
    assert out.shape == (5, 10, 3)
    np.testing.assert_allclose(out[2], pts + tfs[2, :3, 3], atol=1e-6)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(32, 3))
    R = np.asarray(geo.so3_exp_map(w))
    R_ref = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    w_back = np.asarray(geo.so3_log_map(R))
    # log is defined up to 2*pi wraps; inputs here have |w| < pi mostly
    small = np.linalg.norm(w, axis=-1) < np.pi
    np.testing.assert_allclose(w_back[small], w[small], atol=1e-4)


def test_so3_exp_small_angle():
    w = np.array([[1e-9, 0, 0], [0, 0, 0]])
    R = np.asarray(geo.so3_exp_map(w))
    np.testing.assert_allclose(R, np.tile(np.eye(3)[None], (2, 1, 1)), atol=1e-6)


def test_se3_exp_map():
    rng = np.random.default_rng(2)
    xi = rng.normal(size=(8, 6)) * 0.5
    T = np.asarray(geo.se3_exp_map(xi))
    # rotation block matches Rodrigues; T is a valid rigid transform
    np.testing.assert_allclose(
        T[:, :3, :3], Rotation.from_rotvec(xi[:, 3:]).as_matrix(), atol=1e-5
    )
    np.testing.assert_allclose(T[:, 3], np.tile([0, 0, 0, 1], (8, 1)), atol=1e-6)
    # pure translation
    T2 = np.asarray(geo.se3_exp_map(np.array([[1.0, 2.0, 3.0, 0, 0, 0]])))
    np.testing.assert_allclose(T2[0, :3, 3], [1, 2, 3], atol=1e-6)


def test_rotation_6d():
    rng = np.random.default_rng(3)
    R = random_rotations(16, seed=3)
    d6 = R[:, :2, :].reshape(16, 6)  # first two ROWS
    R_rec = np.asarray(geo.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(R_rec, R, atol=1e-5)


def test_euler_matrix_matches_scipy_sxyz():
    rng = np.random.default_rng(4)
    for _ in range(5):
        a, b, c = rng.uniform(-np.pi, np.pi, size=3)
        T = np.asarray(geo.euler_matrix(a, b, c))
        R_ref = Rotation.from_euler("xyz", [a, b, c]).as_matrix()  # extrinsic
        np.testing.assert_allclose(T[:3, :3], R_ref, atol=1e-5)


def test_geodesic_distance():
    R1 = np.eye(3)
    R2 = Rotation.from_rotvec([0, 0, np.pi / 4]).as_matrix()
    d = float(geo.rotation_geodesic_distance(R1, R2))
    assert abs(d - np.pi / 4) < 1e-5


def test_egocentric_delta_roundtrip():
    rng = np.random.default_rng(5)
    A = np.tile(np.eye(4)[None], (6, 1, 1))
    A[:, :3, :3] = random_rotations(6, seed=5)
    A[:, :3, 3] = rng.normal(size=(6, 3))
    B = np.tile(np.eye(4)[None], (6, 1, 1))
    B[:, :3, :3] = random_rotations(6, seed=6)
    B[:, :3, 3] = rng.normal(size=(6, 3))
    dt, dR = geo.pose_to_egocentric_delta_pose(A, B)
    B_rec = np.asarray(geo.egocentric_delta_pose_to_pose(A, dt, dR))
    np.testing.assert_allclose(B_rec, B, atol=1e-5)


def test_project_pts():
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    pts = np.array([[0.0, 0.0, 2.0], [0.1, -0.1, 1.0]])
    uv = np.asarray(geo.project_pts(pts, K))
    np.testing.assert_allclose(uv[0], [64, 48], atol=1e-5)
    np.testing.assert_allclose(uv[1], [74, 38], atol=1e-5)


def test_crop_window_tf():
    K = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1]])
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 1.0]
    tf = np.asarray(
        geo.compute_crop_window_tf_batch(pose[None], K, 1.2, 0.2, (160, 160))
    )[0]
    # object center projects to principal point -> maps to crop center
    center = tf @ np.array([320, 240, 1.0])
    np.testing.assert_allclose(center[:2], [80, 80], atol=1.5)
    # a point radius away in x maps to the crop border
    r_pix = 300 * (0.2 * 1.2 / 2) / 1.0
    edge = tf @ np.array([320 + r_pix, 240, 1.0])
    np.testing.assert_allclose(edge[0], 160, atol=2.0)


def test_depth2xyzmap():
    K = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = np.full((48, 64), 2.0, dtype=np.float32)
    depth[0, 0] = 0.0  # invalid
    xyz = np.asarray(geo.depth2xyzmap(depth, K))
    assert xyz.shape == (48, 64, 3)
    np.testing.assert_allclose(xyz[24, 32], [0, 0, 2.0], atol=1e-5)
    np.testing.assert_allclose(xyz[0, 0], [0, 0, 0], atol=1e-6)
    # pixel (v=24, u=42): x = (42-32)*2/100 = 0.2
    np.testing.assert_allclose(xyz[24, 42], [0.2, 0, 2.0], atol=1e-5)


def test_normalize_rotation():
    pose = np.eye(4)
    pose[:3, :3] *= 3.0
    out = np.asarray(geo.normalize_rotation(pose))
    np.testing.assert_allclose(out[:3, :3], np.eye(3), atol=1e-6)


def test_trajectory_metrics():
    """ATE is alignment-invariant (a rigidly transformed trajectory scores
    ~0) and RPE measures per-step drift."""
    from foundationpose_tpu.core import metrics

    rng = np.random.default_rng(0)
    n = 20
    gt = np.tile(np.eye(4)[None], (n, 1, 1))
    for i in range(n):
        th = 0.1 * i
        gt[i, :3, :3] = np.array(
            [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
        )
        gt[i, :3, 3] = [np.cos(th), np.sin(th), 0.1 * i]

    # rigidly transformed copy: ATE ~ 0 after alignment
    T = np.eye(4)
    T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    T[:3, 3] = [0.5, -0.2, 0.3]
    pred = np.einsum("ij,njk->nik", T, gt)
    assert metrics.ate_rmse(pred, gt) < 1e-9
    assert metrics.ate_rmse(pred, gt, align=False) > 0.1

    # noisy trajectory: ATE ~ noise scale; RPE rotation ~ 0 for pure trans noise
    noisy = gt.copy()
    noisy[:, :3, 3] += rng.normal(0, 0.01, (n, 3))
    ate = metrics.ate_rmse(noisy, gt)
    assert 0.003 < ate < 0.05, ate
    t_err, r_err = metrics.rpe(noisy, gt)
    assert t_err > 0.005 and r_err < 1e-6
