"""Crop-batch construction for refinement and scoring.

One jitted pipeline replacing the reference's make_crop_data_batch
(predict_pose_refine.py:26-89, predict_score.py:57-114) + the test-time
normalization of learning/datasets/h5_dataset.py:79-127: per-hypothesis crop
transforms, rendering straight into the crop windows, perspective-warping the
observed rgb/xyz into the same windows, then centering the xyz maps on each
hypothesis translation and scaling by the mesh radius.

Whereas the reference round-trips through CUDA chunks (render bs=512, kornia
warps, torch dataset transform), here it is a single XLA program over the
whole hypothesis batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.ops import image as imops
from foundationpose_tpu.ops import raster


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_size", "normalize_xyz", "use_normal", "use_pallas", "backface_cull",
        "gate_px",
    ),
)
def make_crop_batch(
    mesh_tensors,
    poses,
    K,
    rgb,
    xyz_map,
    mesh_diameter,
    crop_ratio=1.2,
    out_size=160,
    normalize_xyz=True,
    z_invalid_thres=0.001,
    use_normal=False,
    use_pallas=False,
    backface_cull=False,
    gate_px=0,
):
    """Build network inputs for a batch of pose hypotheses.

    Args:
      mesh_tensors: from ``ops.raster.make_mesh_tensors``.
      poses: (N,4,4) hypotheses (object-in-camera, centered mesh frame).
      K: (3,3); rgb: (H,W,3) float in [0,255]; xyz_map: (H,W,3) cam-space.
      z_invalid_thres: 0.001 for the refiner path (PairH5Dataset
        h5_dataset.py:94), 0.1 for the scorer path (TripletH5Dataset
        h5_dataset.py:151).

    Returns dict with inputA/inputB (N,S,S,6) [rgb|xyz] network inputs plus
    the raw crops and crop transforms.
    """
    S = out_size
    poses = jnp.asarray(poses, dtype=jnp.float32)
    rgb = jnp.asarray(rgb, dtype=jnp.float32)
    xyz_map = jnp.asarray(xyz_map, dtype=jnp.float32)

    tfs = geo.compute_crop_window_tf_batch(poses, K, crop_ratio, mesh_diameter, (S, S))

    if use_pallas:
        from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

        # out_bf16 halves the kernel's output DMA. The plane-form kernel
        # emits per-pixel NUMERATOR/denominator channels in the output
        # dtype, so bf16 re-rounds them to ~2^-9 relative after the divide:
        # fine for xyz (planes are pose-centered, error stays sub-mm) and
        # rgb (<1/255), NOT fine for texture uv, where 2^-9 of a 2K texture
        # is ~4 texels — textured meshes keep the f32 output path.
        r = render_crops_pallas(
            mesh_tensors, poses, K, tfs, out_hw=(S, S), use_light=True,
            backface_cull=backface_cull, with_normal=use_normal,
            out_bf16=not use_normal and "tex" not in mesh_tensors,
        )
    else:
        r = raster.render_crops(
            mesh_tensors, poses, K, tfs, out_hw=(S, S), use_light=True,
            with_normal=use_normal,
        )
    rgbA = r["rgb"]  # already [0,1]
    xyzA = r["xyz"]

    t = poses[:, :3, 3]

    # crop tfs are scale+translate by construction -> separable MXU warp.
    # On the Pallas/TPU path the warps run in bf16 (single MXU pass vs the
    # package-default f32-highest 6-pass): rgb rounds ~0.4% (< 1/255), and
    # xyz is pre-centered on the mean hypothesis translation so the bf16
    # rounding is 0.4% of the RESIDUAL (~0.4 mm), not of the 0.5+ m camera
    # z; validity travels as its own exactly-warped 0/1 channel because the
    # centered invalid pixels no longer sit at z=0.
    wdt = jnp.bfloat16 if use_pallas else None
    rgbB = imops.warp_crop_affine(
        rgb, tfs, (S, S), mode="bilinear", compute_dtype=wdt
    ) / 255.0
    if use_pallas:
        c_bar = jnp.mean(t, axis=0)  # shared center: one warp for all poses
        valid_src = (xyz_map[..., 2:] >= z_invalid_thres).astype(jnp.float32)
        src = jnp.concatenate([xyz_map - c_bar[None, None], valid_src], -1)
        w = imops.warp_crop_affine(
            src, tfs, (S, S), mode="nearest", compute_dtype=wdt
        )
        xyzB = w[..., :3] + c_bar[None, None, None]
        validB = w[..., 3:] > 0.5
    else:
        xyzB = imops.warp_crop_affine(xyz_map, tfs, (S, S), mode="nearest")
        validB = xyzB[..., 2:3] >= z_invalid_thres

    if gate_px:
        # Per-hypothesis silhouette gating of the OBSERVED side: zero
        # observed pixels beyond ``gate_px`` of each hypothesis's rendered
        # mask. Tracking has no segmentation mask, and clutter abutting the
        # object pulls the refiner off it frame over frame (the chain ends
        # up ON the distractor); the candidate's own silhouette — dilated
        # for margin — is the best available object prior. Gated-away depth
        # reads as sensor holes, a trained condition.
        g = (
            jax.lax.reduce_window(
                r["mask"].astype(jnp.float32), 0.0, jax.lax.max,
                (1, 2 * gate_px + 1, 2 * gate_px + 1), (1, 1, 1), "SAME",
            )
            > 0.5
        )[..., None]
        rgbB = rgbB * g
        xyzB = jnp.where(g, xyzB, 0.0)
        validB = validB & g

    def normalize(xyz, thres, valid=None):
        invalid = xyz[..., 2:3] < thres  # (N,S,S,1)
        if valid is not None:
            invalid = invalid | ~valid
        centered = xyz - t[:, None, None, :]
        if not normalize_xyz:
            return centered
        radius = mesh_diameter / 2.0
        scaled = centered / radius
        bad = invalid | (jnp.abs(scaled) >= 2)  # per-channel, h5_dataset.py:98
        return jnp.where(bad, 0.0, scaled)

    xyzA_n = normalize(xyzA, z_invalid_thres)
    xyzB_n = normalize(xyzB, z_invalid_thres, valid=validB)

    out = {
        "inputA": jnp.concatenate([rgbA, xyzA_n], axis=-1),
        "inputB": jnp.concatenate([rgbB, xyzB_n], axis=-1),
        "rgbA": rgbA,
        "rgbB": rgbB,
        "depthA": r["depth"],
        "tf_to_crops": tfs,
        "mask": r["mask"],
        # exactly-warped observed-pixel validity. Consumers must use THIS
        # rather than re-thresholding xyzB z: on the bf16 warp path an
        # invalid (xyz=0) source pixel round-trips to z = c_bar.z rounding
        # error (up to ~2 mm), which can land on either side of any
        # z-threshold depending on where the scene sits on the bf16 grid.
        "validB": validB,
    }
    if use_normal:
        out["normalA"] = r["normal"]
    return out
