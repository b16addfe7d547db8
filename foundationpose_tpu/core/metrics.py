"""Pose-accuracy metrics: ADD, ADD-S, AUC.

Behavioral parity with the reference (src/Utils.py:232-266), with the KD-tree
nearest-neighbor of ``adds_err`` replaced by a chunked brute-force jnp
reduction that maps onto the MXU (distance matrices are matmuls) and works on
TPU without host round trips.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.core.geometry import transform_pts


def add_err(pred, gt, model_pts):
    """Mean L2 between corresponding transformed model points.
    (reference Utils.py:232-240)"""
    pred_pts = transform_pts(model_pts, pred)
    gt_pts = transform_pts(model_pts, gt)
    return jnp.linalg.norm(pred_pts - gt_pts, axis=-1).mean()


def adds_err(pred, gt, model_pts, chunk=2048):
    """Mean nearest-neighbor distance from GT-transformed points to
    pred-transformed points (symmetric-object metric, reference
    Utils.py:242-253). Brute-force chunked: for each chunk of gt points
    compute the (chunk, N) distance matrix and reduce."""
    pred_pts = jnp.asarray(transform_pts(model_pts, pred), dtype=jnp.float32)
    gt_pts = jnp.asarray(transform_pts(model_pts, gt), dtype=jnp.float32)
    n = gt_pts.shape[0]
    pred_sq = jnp.sum(pred_pts * pred_pts, axis=-1)  # (N,)
    mins = []
    for s in range(0, n, chunk):
        g = gt_pts[s : s + chunk]  # (C,3)
        d2 = (
            jnp.sum(g * g, axis=-1)[:, None]
            - 2.0 * g @ pred_pts.T
            + pred_sq[None, :]
        )
        mins.append(jnp.sqrt(jnp.maximum(d2.min(axis=-1), 0.0)))
    return jnp.concatenate(mins).mean()


def compute_auc(errs, max_val=0.1, step=0.001):
    """Accuracy-threshold AUC, identical to the reference's sklearn-based
    computation (Utils.py:255-266): recall curve over thresholds
    ``arange(0, max_val+step, step)``, trapezoid-integrated, early-stopped
    when recall hits 1, normalized by max_val."""
    errs = np.sort(np.asarray(errs))
    X = np.arange(0, max_val + step, step)
    Y = np.ones(len(X))
    for i, x in enumerate(X):
        y = (errs <= x).sum() / len(errs)
        Y[i] = y
        if y >= 1:
            break
    auc = np.trapezoid(Y, X) / max_val
    return float(auc)


# ---------------------------------------------------------------------------
# Trajectory metrics (the BundleSDF/object-SLAM evaluation surface; the
# driver-set north star pairs ADD-S AUC with tracking ATE, BASELINE.md).
# The reference snapshot ships no trajectory metrics — these follow the
# standard TUM-RGBD definitions (Sturm et al.).
# ---------------------------------------------------------------------------


def align_trajectory_se3(pred_t, gt_t):
    """Least-squares SE3 (no scale) aligning pred translations onto gt
    (Horn's method). pred_t/gt_t: (N,3). Returns (R (3,3), t (3,))."""
    pred_t = np.asarray(pred_t, np.float64)
    gt_t = np.asarray(gt_t, np.float64)
    mu_p = pred_t.mean(axis=0)
    mu_g = gt_t.mean(axis=0)
    H = (pred_t - mu_p).T @ (gt_t - mu_g)
    U, _, Vt = np.linalg.svd(H)
    S = np.eye(3)
    S[2, 2] = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ S @ U.T
    t = mu_g - R @ mu_p
    return R, t


def ate_rmse(pred_poses, gt_poses, align=True):
    """Absolute trajectory error: RMSE of translation residuals between the
    predicted and GT pose sequences (N,4,4), optionally after a global SE3
    alignment."""
    pred_t = np.asarray(pred_poses, np.float64)[:, :3, 3]
    gt_t = np.asarray(gt_poses, np.float64)[:, :3, 3]
    if align:
        R, t = align_trajectory_se3(pred_t, gt_t)
        pred_t = pred_t @ R.T + t
    return float(np.sqrt(((pred_t - gt_t) ** 2).sum(axis=-1).mean()))


def rpe(pred_poses, gt_poses, delta=1):
    """Relative pose error over frame gaps of ``delta``: mean translation
    drift (meters) and mean rotation drift (degrees) of
    inv(gt_i^-1 gt_{i+d}) (pred_i^-1 pred_{i+d})."""
    pred = np.asarray(pred_poses, np.float64)
    gt = np.asarray(gt_poses, np.float64)
    terrs, rerrs = [], []
    for i in range(len(pred) - delta):
        dp = np.linalg.inv(pred[i]) @ pred[i + delta]
        dg = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(dg) @ dp
        terrs.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
        rerrs.append(np.degrees(np.arccos(c)))
    return float(np.mean(terrs)), float(np.mean(rerrs))
