"""Unit tests for the deepim translation decode (predict_pose_refine.py:201-218).

The decode has clean closed forms that can be hand-computed:
- out.trans = (0, 0, 1): no uv offset, relative depth 1 -> zero delta.
- out.trans = (0, 0, rz): delta = (rz - 1) * t (pure depth scaling along the
  center ray).
- out.trans = (du, dv, 1): crop-pixel offset du*S maps to image pixels
  du*S/s (s = crop-tf scale), then to camera x by * z/fx.
"""

import numpy as np

import jax.numpy as jnp

from foundationpose_tpu.engine.refiner import RefinerConfig, decode_delta

K = np.array([[300.0, 0, 160], [0, 280.0, 120], [0, 0, 1]], np.float32)
S = 160


def _pose(t):
    p = np.eye(4, dtype=np.float32)
    p[:3, 3] = t
    return p[None]


def _tf(scale, cx, cy):
    return np.array([[scale, 0, cx], [0, scale, cy], [0, 0, 1]], np.float32)[None]


def _decode(out_trans, poses, tfs, normalize_xyz=False, diameter=0.2):
    cfg = RefinerConfig(trans_rep="deepim", normalize_xyz=normalize_xyz)
    out = {
        "trans": jnp.asarray(out_trans, jnp.float32).reshape(1, 3),
        "rot": jnp.zeros((1, 3)),
    }
    trans_delta, _ = decode_delta(
        out, cfg, diameter, poses=jnp.asarray(poses), K=jnp.asarray(K),
        tf_to_crops=jnp.asarray(tfs), input_size=S,
    )
    return np.asarray(trans_delta)[0]


def test_identity_output_gives_zero_delta():
    d = _decode([0.0, 0.0, 1.0], _pose([0.03, -0.02, 0.6]), _tf(0.8, 30, 40))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_pure_depth_scales_along_center_ray():
    t = np.array([0.05, -0.01, 0.5], np.float32)
    d = _decode([0.0, 0.0, 0.9], _pose(t), _tf(1.3, -20, 10))
    np.testing.assert_allclose(d, (0.9 - 1.0) * t, atol=1e-6)


def test_uv_offset_unprojects_through_crop_scale():
    t = np.array([0.0, 0.0, 0.8], np.float32)
    scale = 0.5
    du, dv = 0.05, -0.03
    d = _decode([du, dv, 1.0], _pose(t), _tf(scale, 12, -7))
    # crop offset du*S px -> image offset du*S/scale px -> camera du*S/scale*z/fx
    exp = np.array(
        [du * S / scale * t[2] / K[0, 0], dv * S / scale * t[2] / K[1, 1], 0.0]
    )
    np.testing.assert_allclose(d, exp, atol=1e-6)


def test_normalize_xyz_applies_reference_diameter_scaling():
    """The reference multiplies ALL trans reps by diameter/2 under
    normalize_xyz (predict_pose_refine.py:228-229) — deepim included."""
    t = np.array([0.02, 0.01, 0.7], np.float32)
    args = ([0.0, 0.0, 0.8], _pose(t), _tf(1.0, 0, 0))
    d_plain = _decode(*args, normalize_xyz=False)
    d_norm = _decode(*args, normalize_xyz=True, diameter=0.3)
    np.testing.assert_allclose(d_norm, d_plain * 0.15, atol=1e-7)
