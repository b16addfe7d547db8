"""Pure-jnp geometry and pose math.

Covers the geometric surface of the reference's ``src/Utils.py`` (transform
helpers :511-546, crop-window transform :577-626, projection :752-802,
egocentric deltas :838-855, depth->xyz :399-438) and the SO3/SE3 maps the
reference imports from pytorch3d (``src/Utils.py:11``) — all in closed form so
they trace cleanly under jit and run on the VPU/MXU.

Conventions
-----------
* Column-vector convention: ``p_cam = T[:3,:3] @ p_obj + T[:3,3]``.
* OpenCV camera: +x right, +y down, +z forward. Pixel ``(row=v, col=u)`` has
  center at continuous coordinates ``(u + 0.5, v + 0.5)``. (The reference's GL
  clip-space path + Y-flips — Utils.py:159,216-218 — collapses to this.)
* All functions accept either numpy or jnp arrays and return jnp arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# OpenGL camera from OpenCV camera (reference Utils.py:68-71). Kept for
# interop with datasets / tools that use GL conventions; our rasterizer works
# directly in CV camera space and never needs it.
GLCAM_IN_CVCAM = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], dtype=np.float64
)


# ---------------------------------------------------------------------------
# Homogeneous helpers
# ---------------------------------------------------------------------------

def to_homo(pts):
    """Append a 1 to the last axis. (reference Utils.py:511-526)"""
    pts = jnp.asarray(pts)
    ones = jnp.ones((*pts.shape[:-1], 1), dtype=pts.dtype)
    return jnp.concatenate([pts, ones], axis=-1)


def transform_pts(pts, tf):
    """Transform 2D/3D points by homogeneous matrices.

    ``pts``: (..., N, D); ``tf``: (..., D+1, D+1) with broadcasting over the
    leading axes (reference Utils.py:529-536 — including its rule that a tf
    batch is unsqueezed over the points axis).
    """
    pts = jnp.asarray(pts)
    tf = jnp.asarray(tf)
    if tf.ndim >= 3 and tf.shape[-3] != pts.shape[-2]:
        tf = tf[..., None, :, :]
    return (tf[..., :-1, :-1] @ pts[..., None] + tf[..., :-1, -1:])[..., 0]


def transform_dirs(dirs, tf):
    """Rotate direction vectors (no translation). (reference Utils.py:539-546)"""
    dirs = jnp.asarray(dirs)
    tf = jnp.asarray(tf)
    if tf.ndim >= 3 and tf.shape[-3] != dirs.shape[-2]:
        tf = tf[..., None, :, :]
    return (tf[..., :3, :3] @ dirs[..., None])[..., 0]


def normalize(v, axis=-1, eps=1e-12):
    v = jnp.asarray(v)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


# ---------------------------------------------------------------------------
# SO(3) / SE(3) maps (closed-form; replaces pytorch3d imports Utils.py:11)
# ---------------------------------------------------------------------------

def hat(w):
    """(..., 3) axis-angle vector -> (..., 3, 3) skew-symmetric matrix."""
    w = jnp.asarray(w)
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def so3_exp_map(log_rot):
    """Rodrigues formula: (..., 3) -> (..., 3, 3), numerically stable near 0
    including gradients (the non-Taylor branch is evaluated on a safe theta so
    no NaN leaks through jnp.where in the backward pass)."""
    w = jnp.asarray(log_rot, dtype=jnp.float32)
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def so3_log_map(R):
    """(..., 3, 3) -> (..., 3) axis-angle, stable near identity."""
    R = jnp.asarray(R, dtype=jnp.float32)
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w_hat = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    small = theta < 1e-4
    theta_safe = jnp.where(small, 1.0, theta)
    # w_hat = 2 sin(theta) * axis  =>  log = theta/(2 sin theta) * w_hat
    scale = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta_safe / jnp.maximum(2.0 * jnp.sin(theta_safe), 1e-12),
    )
    return scale[..., None] * w_hat


def se3_exp_map(xi):
    """(..., 6) [v, w] -> (..., 4, 4) with the standard left-Jacobian V."""
    xi = jnp.asarray(xi, dtype=jnp.float32)
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / theta2_safe)
    K = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    R = eye + a[..., None, None] * K + b[..., None, None] * (K @ K)
    V = eye + b[..., None, None] * K + c[..., None, None] * (K @ K)
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], dtype=xi.dtype), (*top.shape[:-2], 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotation_6d_to_matrix(d6):
    """Zhou et al. 6D rotation -> (..., 3, 3) with b1/b2/b3 as matrix ROWS
    (pytorch3d-compatible; the reference transposes the result before use,
    predict_pose_refine.py:224)."""
    d6 = jnp.asarray(d6, dtype=jnp.float32)
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def euler_matrix(ai, aj, ak):
    """Static-frame xyz Euler angles -> 4x4 (matches transformations.euler_matrix
    'sxyz', used by the reference at estimater.py:113 and Utils.py:828):
    R = Rz(ak) @ Ry(aj) @ Rx(ai)."""
    ai, aj, ak = jnp.asarray(ai), jnp.asarray(aj), jnp.asarray(ak)
    ci, si = jnp.cos(ai), jnp.sin(ai)
    cj, sj = jnp.cos(aj), jnp.sin(aj)
    ck, sk = jnp.cos(ak), jnp.sin(ak)
    R = jnp.array(
        [
            [ck * cj, ck * sj * si - sk * ci, ck * sj * ci + sk * si],
            [sk * cj, sk * sj * si + ck * ci, sk * sj * ci - ck * si],
            [-sj, cj * si, cj * ci],
        ]
    )
    T = jnp.eye(4, dtype=R.dtype)
    return T.at[:3, :3].set(R)


def rotation_geodesic_distance(R1, R2):
    """arccos((tr(R1 R2^T) - 1)/2), broadcasting. (reference mycpp/src/Utils.cpp:21-26)"""
    R1, R2 = jnp.asarray(R1), jnp.asarray(R2)
    m = R1 @ jnp.swapaxes(R2, -1, -2)
    tr = jnp.trace(m, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))


def normalize_rotation(pose):
    """Remove per-column scale from the rotation block (reference Utils.py:270-276)."""
    pose = jnp.asarray(pose)
    scales = jnp.linalg.norm(pose[..., :3, :3], axis=-2, keepdims=True)
    return pose.at[..., :3, :3].set(pose[..., :3, :3] / scales)


# ---------------------------------------------------------------------------
# Egocentric pose deltas (refinement update rule, reference Utils.py:838-855)
# ---------------------------------------------------------------------------

def pose_to_egocentric_delta_pose(A_in_cam, B_in_cam):
    trans_delta = B_in_cam[..., :3, 3] - A_in_cam[..., :3, 3]
    rot_mat_delta = B_in_cam[..., :3, :3] @ jnp.swapaxes(A_in_cam[..., :3, :3], -1, -2)
    return trans_delta, rot_mat_delta


def egocentric_delta_pose_to_pose(A_in_cam, trans_delta, rot_mat_delta):
    A_in_cam = jnp.asarray(A_in_cam)
    B = jnp.broadcast_to(
        jnp.eye(4, dtype=A_in_cam.dtype), A_in_cam.shape
    )
    B = B.at[..., :3, 3].set(A_in_cam[..., :3, 3] + trans_delta)
    B = B.at[..., :3, :3].set(rot_mat_delta @ A_in_cam[..., :3, :3])
    return B


# ---------------------------------------------------------------------------
# Projection / crop windows
# ---------------------------------------------------------------------------

def project_pts(pts, K):
    """Project cam-space points (..., 3) to pixel coords (..., 2) via K (3,3)."""
    pts = jnp.asarray(pts)
    K = jnp.asarray(K, dtype=pts.dtype)
    uvw = pts @ K.T
    return uvw[..., :2] / jnp.maximum(uvw[..., 2:3], 1e-12)


def projection_matrix_from_intrinsics(K, height, width, znear, zfar):
    """OpenGL projection from a Hartley-Zisserman K ('y_down' branch of the
    reference, Utils.py:752-802). Kept for GL interop; not used by our raster."""
    K = np.asarray(K, dtype=np.float64)
    w, h = width, height
    depth = float(zfar - znear)
    q = -(zfar + znear) / depth
    qn = -2.0 * (zfar * znear) / depth
    return np.array(
        [
            [2 * K[0, 0] / w, -2 * K[0, 1] / w, (-2 * K[0, 2] + w) / w, 0],
            [0, 2 * K[1, 1] / h, (2 * K[1, 2] - h) / h, 0],
            [0, 0, q, qn],
            [0, 0, -1, 0],
        ]
    )


def compute_crop_window_tf_batch(poses, K, crop_ratio, mesh_diameter, out_size):
    """Per-hypothesis crop transform, 'box_3d' method of the reference
    (Utils.py:577-626): a square window around the projected object center with
    half-size = the max pixel deviation of center +/- (diameter*crop_ratio/2)
    offsets along camera x/y.

    ``poses``: (B,4,4); ``out_size``: (out_w, out_h).
    Returns (B,3,3) mapping original pixel coords -> crop pixel coords.
    """
    poses = jnp.asarray(poses, dtype=jnp.float32)
    K = jnp.asarray(K, dtype=jnp.float32)
    out_w, out_h = out_size
    r = mesh_diameter * crop_ratio / 2.0
    offsets = jnp.array(
        [[0, 0, 0], [r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0]], dtype=jnp.float32
    )
    pts = poses[:, None, :3, 3] + offsets[None]  # (B,5,3)
    uvs = project_pts(pts, K)  # (B,5,2)
    center = uvs[:, 0]  # (B,2)
    radius = jnp.max(
        jnp.abs(uvs - center[:, None, :]).reshape(poses.shape[0], -1), axis=-1
    )
    left = jnp.round(center[:, 0] - radius)
    right = jnp.round(center[:, 0] + radius)
    top = jnp.round(center[:, 1] - radius)
    bottom = jnp.round(center[:, 1] + radius)
    B = poses.shape[0]
    sx = out_w / (right - left)
    sy = out_h / (bottom - top)
    tf = jnp.zeros((B, 3, 3), dtype=jnp.float32)
    tf = tf.at[:, 0, 0].set(sx)
    tf = tf.at[:, 1, 1].set(sy)
    tf = tf.at[:, 0, 2].set(-left * sx)
    tf = tf.at[:, 1, 2].set(-top * sy)
    tf = tf.at[:, 2, 2].set(1.0)
    return tf


# ---------------------------------------------------------------------------
# Depth maps
# ---------------------------------------------------------------------------

def depth2xyzmap(depth, K, zfar=jnp.inf):
    """(H,W) depth -> (H,W,3) cam-space xyz; invalid (z<1mm or >zfar) -> 0.
    (reference Utils.py:399-417)"""
    depth = jnp.asarray(depth, dtype=jnp.float32)
    K = jnp.asarray(K, dtype=jnp.float32)
    H, W = depth.shape[-2:]
    us = jnp.arange(W, dtype=jnp.float32)[None, :]
    vs = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = (us - K[0, 2]) * depth / K[0, 0]
    ys = (vs - K[1, 2]) * depth / K[1, 1]
    xyz = jnp.stack([xs, ys, depth], axis=-1)
    invalid = (depth < 0.001) | (depth > zfar)
    return jnp.where(invalid[..., None], 0.0, xyz)


def depth2xyzmap_batch(depths, Ks, zfar=jnp.inf):
    """(B,H,W), (B,3,3) -> (B,H,W,3). (reference Utils.py:420-438)"""
    return jax.vmap(depth2xyzmap, in_axes=(0, 0, None))(depths, Ks, zfar)
