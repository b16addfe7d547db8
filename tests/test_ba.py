"""Schur-complement Gauss-Newton bundle adjustment (slam/ba.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.slam.ba import (
    BAConfig,
    _ba_iteration,
    bundle_adjust,
    build_ba_problem,
    pose_graph_ba,
)


def make_problem(K_poses=5, L=60, noise=0.0, pose_err=0.0, seed=0):
    """Cameras on an arc looking at landmarks near the origin."""
    rng = np.random.default_rng(seed)
    X_gt = rng.uniform(-0.1, 0.1, size=(L, 3))
    poses_gt = []
    for k in range(K_poses):
        ang = 0.25 * (k - K_poses / 2)
        R = np.asarray(geo.euler_matrix(0.0, ang, 0.0))[:3, :3]
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = [0.02 * k, -0.01 * k, 0.6]
        poses_gt.append(T)
    poses_gt = np.stack(poses_gt)

    obs_kf = np.tile(np.arange(K_poses, dtype=np.int32)[None], (L, 1))
    pts = np.einsum("kij,lj->lki", poses_gt[:, :3, :3], X_gt) + poses_gt[:, :3, 3][None]
    obs_pt = pts + rng.normal(0, noise, size=pts.shape)
    obs_w = np.ones((L, K_poses), np.float32)

    poses_init = poses_gt.copy()
    if pose_err > 0:
        for k in range(1, K_poses):
            d = np.eye(4)
            d[:3, :3] = np.asarray(
                geo.euler_matrix(*rng.normal(0, pose_err, 3))
            )[:3, :3]
            d[:3, 3] = rng.normal(0, pose_err * 0.1, 3)
            poses_init[k] = d @ poses_gt[k]
    X_init = X_gt + rng.normal(0, pose_err * 0.05, size=X_gt.shape)
    return poses_gt, X_gt, poses_init, X_init, obs_kf, obs_pt.astype(np.float32), obs_w


def test_zero_residual_is_fixed_point():
    poses_gt, X_gt, *_, obs_kf, obs_pt, obs_w = make_problem()
    poses, X, costs = bundle_adjust(
        poses_gt, X_gt, obs_kf, obs_pt, obs_w, config=BAConfig(n_iters=2)
    )
    np.testing.assert_allclose(np.asarray(poses), poses_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(X), X_gt, atol=1e-5)
    assert float(costs[-1]) < 1e-8


def test_recovers_perturbed_poses():
    poses_gt, X_gt, poses_init, X_init, obs_kf, obs_pt, obs_w = make_problem(
        pose_err=0.08, seed=1
    )
    err0 = np.linalg.norm(poses_init[:, :3, 3] - poses_gt[:, :3, 3], axis=1).max()
    poses, X, costs = bundle_adjust(
        poses_init, X_init, obs_kf, obs_pt, obs_w,
        config=BAConfig(n_iters=10, scale=0.05),
    )
    poses = np.asarray(poses)
    # pose 0 pinned: others must align to GT in ITS gauge
    terr = np.linalg.norm(poses[:, :3, 3] - poses_gt[:, :3, 3], axis=1).max()
    rerr = max(
        float(geo.rotation_geodesic_distance(poses[k, :3, :3], poses_gt[k, :3, :3]))
        for k in range(len(poses))
    )
    assert terr < 1e-4, (err0, terr)
    assert rerr < 1e-4
    assert float(costs[-1]) < float(costs[0]) * 1e-3
    np.testing.assert_allclose(np.asarray(X), X_gt, atol=1e-4)


def test_gauge_pose_fixed():
    _, _, poses_init, X_init, obs_kf, obs_pt, obs_w = make_problem(pose_err=0.05, seed=2)
    poses, _, _ = bundle_adjust(
        poses_init, X_init, obs_kf, obs_pt, obs_w, config=BAConfig(n_iters=4)
    )
    np.testing.assert_allclose(np.asarray(poses)[0], poses_init[0], atol=1e-6)


def test_schur_matches_dense_solve():
    """The Schur-reduced update must equal directly solving the full
    (6K+3L) normal equations."""
    poses_gt, X_gt, poses_init, X_init, obs_kf, obs_pt, obs_w = make_problem(
        K_poses=3, L=8, pose_err=0.03, seed=3
    )
    cfg = BAConfig(n_iters=1, damping=0.0, huber_delta_rel=1e9)  # pure GN, no robust
    poses1, X1, _ = bundle_adjust(
        poses_init, X_init, obs_kf, obs_pt, obs_w, config=cfg
    )

    # dense reference solve in numpy
    Kp, L = 3, 8
    R = poses_init[:, :3, :3]
    t = poses_init[:, :3, 3]
    H = np.zeros((6 * Kp + 3 * L, 6 * Kp + 3 * L))
    g = np.zeros(6 * Kp + 3 * L)
    for l in range(L):
        for m in range(Kp):
            k = obs_kf[l, m]
            p = R[k] @ X_init[l] + t[k]
            r = p - obs_pt[l, m]
            skew = np.array(
                [[0, -p[2], p[1]], [p[2], 0, -p[0]], [-p[1], p[0], 0]]
            )
            Jp = np.concatenate([-skew, np.eye(3)], axis=1)  # (3,6)
            Jl = R[k]
            ip = slice(6 * k, 6 * k + 6)
            il = slice(6 * Kp + 3 * l, 6 * Kp + 3 * l + 3)
            H[ip, ip] += Jp.T @ Jp
            H[il, il] += Jl.T @ Jl
            H[ip, il] += Jp.T @ Jl
            H[il, ip] += Jl.T @ Jp
            g[ip] -= Jp.T @ r
            g[il] -= Jl.T @ r
    # pin pose 0 (gauge)
    free = np.ones(6 * Kp + 3 * L)
    free[:6] = 0.0
    H = H * free[:, None] * free[None, :] + np.diag(1.0 - free)
    g = g * free
    # tiny regularizers matching the implementation (1e-9 on both blocks)
    H += 1e-9 * np.eye(len(H))
    for l in range(L):
        il = slice(6 * Kp + 3 * l, 6 * Kp + 3 * l + 3)
        H[il, il] += 1e-9 * np.eye(3)
    delta = np.linalg.solve(H, g)
    dxi = delta[: 6 * Kp].reshape(Kp, 6)
    dX = delta[6 * Kp :].reshape(L, 3)

    tw = np.concatenate([dxi[:, 3:], dxi[:, :3]], axis=-1)
    dT = np.asarray(geo.se3_exp_map(jnp.asarray(tw, jnp.float32)))
    poses_ref = dT @ poses_init
    X_ref = X_init + dX

    np.testing.assert_allclose(np.asarray(poses1), poses_ref, atol=5e-5)
    np.testing.assert_allclose(np.asarray(X1), X_ref, atol=5e-5)


def test_sharded_matches_single_device():
    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    from foundationpose_tpu.parallel.mesh import make_device_mesh

    poses_gt, X_gt, poses_init, X_init, obs_kf, obs_pt, obs_w = make_problem(
        K_poses=4, L=50, pose_err=0.05, seed=4
    )
    cfg = BAConfig(n_iters=5)
    p1, x1, c1 = bundle_adjust(poses_init, X_init, obs_kf, obs_pt, obs_w, config=cfg)
    mesh = make_device_mesh(jax.device_count())
    p2, x2, c2 = bundle_adjust(
        poses_init, X_init, obs_kf, obs_pt, obs_w, config=cfg, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-3, atol=1e-8)


def test_end_to_end_projective_association():
    """Render synthetic depth keyframes of an L-shaped object, perturb poses,
    BA must substantially reduce rotation error without degrading
    translation.

    Depth-only BA observability depends on object shape: a chiral compound
    of boxes (orthogonal faces at different offsets, creases) constrains all
    6 DoF well. Near-spherical and single-plane objects have genuine null
    spaces (see slam/ba.py pose_prior)."""
    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.ops import raster

    K = np.array([[300.0, 0, 80], [0, 300.0, 64], [0, 0, 1]])
    HW = (128, 160)
    a = meshio.make_box((0.12, 0.04, 0.04))
    b = meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0])
    c = meshio.make_box((0.04, 0.04, 0.07)).translated([-0.04, 0.0, 0.055])
    verts = np.concatenate([m.vertices for m in (a, b, c)])
    offs = np.cumsum([0, len(a.vertices), len(b.vertices)])
    faces = np.concatenate([m.faces + o for m, o in zip((a, b, c), offs)])
    mesh = meshio.Mesh(verts, faces)
    mt = raster.make_mesh_tensors(mesh)

    rng = np.random.default_rng(5)
    F = 5
    cams, depths, masks = [], [], []
    for f in range(F):
        ob_in_cam = np.eye(4)
        ob_in_cam[:3, :3] = np.asarray(
            geo.euler_matrix(0.5 + 0.25 * f, -0.3 - 0.1 * f, 0.1)
        )[:3, :3]
        ob_in_cam[:3, 3] = [0.01 * f, -0.005 * f, 0.5]
        out = raster.render_full_frame(mt, ob_in_cam[None].astype(np.float32), K, HW)
        depths.append(np.asarray(out["depth"][0]))
        masks.append(np.asarray(out["mask"][0]))
        cams.append(np.linalg.inv(ob_in_cam))
    depths = np.stack(depths)
    masks = np.stack(masks)
    cams_gt = np.stack(cams)

    cams_noisy = cams_gt.copy()
    for f in range(1, F):
        d = np.eye(4)
        d[:3, :3] = np.asarray(geo.euler_matrix(*rng.normal(0, 0.02, 3)))[:3, :3]
        d[:3, 3] = rng.normal(0, 0.004, 3)
        cams_noisy[f] = cams_gt[f] @ d

    def pose_err(cams):
        te = np.linalg.norm(cams[:, :3, 3] - cams_gt[:, :3, 3], axis=1).mean()
        re = np.mean(
            [
                float(geo.rotation_geodesic_distance(cams[f, :3, :3], cams_gt[f, :3, :3]))
                for f in range(F)
            ]
        )
        return te, re

    te0, re0 = pose_err(cams_noisy)
    refined, cost = pose_graph_ba(
        depths, masks, cams_noisy, K, n_landmarks=384,
        config=BAConfig(n_iters=8, scale=0.01), rounds=4,
    )
    te1, re1 = pose_err(refined)
    assert re1 < 0.5 * re0, (re0, re1)
    assert te1 < 2.0 * te0, (te0, te1)
