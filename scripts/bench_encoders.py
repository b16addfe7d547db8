"""Triplane-vs-hash field encoder benchmark: speed AND reconstruction quality.

The TPU-native triplane encoder is the default (field/runner.py) because the
instant-NGP hash grid's gather/scatter XLA lowering serializes on TPU; this
script backs that substitution with data on the same synthetic scene:

- training throughput (rays/s at equal budget),
- reconstruction quality: mesh surface error against the analytic sphere
  (mean |dist(vertex) - r|, a chamfer-to-surface stand-in with exact GT),
- SDF sign correctness across the surface,
- pose drift of the jointly-optimized PoseArray (frames have exact GT poses,
  so any drift is error — the ATE analog).

Usage: python scripts/bench_encoders.py [n_step]
Prints one JSON line per encoder.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from foundationpose_tpu.core.icosphere import sample_views_icosphere
from foundationpose_tpu.field import bounds as bounds_mod
from foundationpose_tpu.field.runner import FieldConfig, NeRFRunnerTPU
from foundationpose_tpu.utils.jaxcache import enable_persistent_cache

RADIUS = 0.5


def sphere_scene(n_views=8, H=60, W=80, cam_dist=1.8):
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    cams = sample_views_icosphere(n_views=12)[:n_views]
    cams[:, :3, 3] *= cam_dist
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    dirs_cam = np.stack(
        [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1], np.ones_like(us)], -1
    ).astype(np.float64)
    rgbs, depths, masks = [], [], []
    for cam in cams:
        o = cam[:3, 3]
        d_w = dirs_cam @ cam[:3, :3].T
        a = (d_w * d_w).sum(-1)
        b = 2 * (d_w * o).sum(-1)
        c = (o * o).sum() - RADIUS**2
        disc = b**2 - 4 * a * c
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a)
        depth = np.where(hit & (t > 0), t, 0.0)
        p = o[None, None] + d_w * t[..., None]
        color = np.where(hit[..., None], 0.5 + 0.5 * p / RADIUS, 0.0)
        rgbs.append((color * 255).astype(np.float32))
        depths.append(depth.astype(np.float32))
        masks.append(hit.astype(np.uint8))
    return K, cams, np.stack(rgbs), np.stack(depths), np.stack(masks)


def run(encoder, n_step):
    K, cams, rgbs, depths, masks = sphere_scene()
    translation, sc_factor, cluster = bounds_mod.compute_scene_bounds(
        depths, masks, K, cams, voxel=0.02
    )
    rgbs_n, depths_n, masks_n, poses_n = bounds_mod.preprocess_data(
        rgbs, depths, masks, cams, sc_factor, translation
    )
    occ_pts = (cluster + translation) * sc_factor
    cfg = FieldConfig(
        n_step=n_step, encoder=encoder,
        n_rand=1024, n_samples=24, n_samples_around_depth=24,
        num_levels=4, log2_hashmap_size=14, base_res=8, finest_res=48,
        triplane_resolutions=(8, 16, 32), triplane_channels=2,
        trunc=0.02, occ_resolution=32, mask_dilate_first=8, mask_dilate=6,
        mesh_resolution=0.02,
    )
    runner = NeRFRunnerTPU(
        cfg, rgbs_n, depths_n, masks_n, poses_n, K, occ_pts, sc_factor, translation
    )
    runner.train(n_step=5, log_every=1000)  # compile + warm
    t0 = time.perf_counter()
    runner.train(n_step=n_step, log_every=10**9)
    dt = time.perf_counter() - t0
    rays_per_s = n_step * cfg.n_rand / dt

    # surface error: extracted-mesh vertices against the analytic sphere
    mesh = runner.extract_mesh()
    mesh_real = runner.mesh_to_real_world(mesh)
    r = np.linalg.norm(mesh_real.vertices, axis=-1)
    surf_err_mm = float(np.abs(r - RADIUS).mean() * 1000)

    # SDF sign check in a band around the surface
    r_surf = RADIUS * sc_factor
    dirs = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0], [-1, 0, 0]])
    band = 0.03 * sc_factor
    sdf_out = np.asarray(runner.sdf_fn((r_surf + band) * dirs))
    sdf_in = np.asarray(runner.sdf_fn((r_surf - band) * dirs))
    sign_ok = float((sdf_out > 0).mean() * 0.5 + (sdf_in < 0).mean() * 0.5)

    # pose drift (GT poses are exact -> optimized deltas should stay ~0)
    from foundationpose_tpu.field.nerf import ObjectField

    tfs = np.asarray(runner.field.apply(
        runner.params, np.arange(runner.num_frames), method=ObjectField.pose_corrections
    ))
    drift_mm = float(
        np.linalg.norm(tfs[:, :3, 3], axis=-1).mean() / sc_factor * 1000
    )
    return {
        "encoder": encoder,
        "rays_per_s": round(rays_per_s, 0),
        "surface_err_mm": round(surf_err_mm, 2),
        "sdf_sign_ok": round(sign_ok, 3),
        "pose_drift_mm": round(drift_mm, 2),
        "n_verts": len(mesh.vertices),
        "train_s": round(dt, 1),
    }


def main():
    enable_persistent_cache()
    n_step = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for encoder in ("triplane", "hash"):
        print(json.dumps(run(encoder, n_step)), flush=True)


if __name__ == "__main__":
    main()
