"""Triplane-vs-hash field encoder benchmark: speed AND reconstruction
quality, over MULTIPLE scenes (VERDICT r3 item 8: the triplane-default
decision needs >=3-scene evidence, not one sphere).

The TPU-native triplane encoder is the default (field/runner.py) because the
instant-NGP hash grid's gather/scatter XLA lowering serializes on TPU; this
script backs that substitution with data on several scenes:

- "sphere": analytic checker-free sphere (exact GT surface),
- "box": a flat-colored box rendered by the framework's own rasterizer,
- "compound": the asymmetric box compound (concave corners — the hash
  grid's supposed advantage case),
- training throughput (rays/s at equal budget),
- reconstruction quality: chamfer distance from extracted-mesh vertices to
  the GT surface (analytic for the sphere, nearest-GT-vertex for meshes),
- SDF sign correctness across the surface,
- pose drift of the jointly-optimized PoseArray (frames have exact GT poses,
  so any drift is error — the ATE analog).

Usage: python scripts/bench_encoders.py [n_step]
Prints one JSON line per (scene, encoder); results recorded in
field/runner.py's encoder-default note.
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


def mesh_scene(mesh, n_views=8, H=60, W=80, cam_dist=None):
    """Posed RGB-D views of a mesh rendered by our own rasterizer. The mesh
    is scaled so its diameter matches the sphere scene's (extent 1.0) —
    equal normalized-resolution across scenes."""
    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.ops import raster

    diam = meshio.compute_mesh_diameter(mesh=mesh)
    mesh = mesh.copy()
    mesh.vertices = mesh.vertices * (1.0 / diam)
    cam_dist = cam_dist or 1.8
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    cams = sample_views_icosphere(n_views=12)[:n_views]
    cams[:, :3, 3] *= cam_dist
    mt = raster.make_mesh_tensors(mesh)
    rgbs, depths, masks = [], [], []
    for cam in cams:
        ob_in_cam = np.linalg.inv(cam)
        out = raster.render_full_frame(mt, ob_in_cam[None], K, (H, W))
        rgbs.append(np.asarray(out["rgb"][0]) * 255.0)
        depths.append(np.asarray(out["depth"][0]))
        masks.append(np.asarray(out["mask"][0]).astype(np.uint8))
    return (
        K, cams, np.stack(rgbs).astype(np.float32),
        np.stack(depths).astype(np.float32), np.stack(masks), mesh,
    )


def make_scenes():
    from foundationpose_tpu.core import meshio

    box = meshio.make_box((0.8, 0.5, 0.3))
    box.vertex_colors = np.full((len(box.vertices), 3), 170, np.uint8)
    a = meshio.make_box((0.6, 0.2, 0.2))
    b = meshio.make_box((0.2, 0.45, 0.2)).translated([0.2, 0.325, 0.0])
    c = meshio.make_box((0.2, 0.2, 0.35)).translated([-0.2, 0.0, 0.275])
    verts = np.concatenate([a.vertices, b.vertices, c.vertices])
    offs = [0, len(a.vertices), len(a.vertices) + len(b.vertices)]
    faces = np.concatenate([a.faces, b.faces + offs[1], c.faces + offs[2]])
    comp = meshio.Mesh(verts, faces)
    comp.vertex_colors = np.full((len(verts), 3), 190, np.uint8)
    return {"sphere": None, "box": box, "compound": comp}


def run(encoder, n_step, scene_name="sphere", scene_mesh=None):
    if scene_mesh is None:
        K, cams, rgbs, depths, masks = sphere_scene()
        gt_mesh = None
    else:
        K, cams, rgbs, depths, masks, gt_mesh = mesh_scene(scene_mesh)
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

    # surface error: extracted-mesh vertices against the GT surface
    # (analytic for the sphere; point-to-surface-sample chamfer for meshes)
    mesh = runner.extract_mesh()
    mesh_real = runner.mesh_to_real_world(mesh)
    if gt_mesh is None:
        r = np.linalg.norm(mesh_real.vertices, axis=-1)
        surf_err_mm = float(np.abs(r - RADIUS).mean() * 1000)
        # SDF sign check in a band around the surface
        r_surf = RADIUS * sc_factor
        probes = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0], [-1, 0, 0]])
        band = 0.03 * sc_factor
        surf_pts = r_surf * probes
        normals = probes
    else:
        gt_pts, gt_nrm = _surface_samples(gt_mesh, 20000)
        v = mesh_real.vertices
        d2 = (
            (v * v).sum(-1)[:, None]
            - 2.0 * v @ gt_pts.T
            + (gt_pts * gt_pts).sum(-1)[None]
        )
        surf_err_mm = float(np.sqrt(np.maximum(d2.min(axis=-1), 0)).mean() * 1000)
        sel = np.random.default_rng(0).integers(0, len(gt_pts), 64)
        surf_pts = (gt_pts[sel] + translation) * sc_factor
        normals = gt_nrm[sel]
        band = 0.05 * sc_factor
    sdf_out = np.asarray(runner.sdf_fn(surf_pts + band * normals))
    sdf_in = np.asarray(runner.sdf_fn(surf_pts - band * normals))
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
        "scene": scene_name,
        "encoder": encoder,
        "rays_per_s": round(rays_per_s, 0),
        "surface_err_mm": round(surf_err_mm, 2),
        "sdf_sign_ok": round(sign_ok, 3),
        "pose_drift_mm": round(drift_mm, 2),
        "n_verts": len(mesh.vertices),
        "train_s": round(dt, 1),
    }


def _surface_samples(mesh, n, seed=0):
    """Area-weighted surface point + normal samples of a mesh (the chamfer
    reference set). Host numpy."""
    rng = np.random.default_rng(seed)
    v = np.asarray(mesh.vertices)
    f = np.asarray(mesh.faces)
    tri = v[f]  # (F,3,3)
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = np.linalg.norm(nrm, axis=-1) / 2
    nrm = nrm / np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    idx = rng.choice(len(f), size=n, p=area / area.sum())
    u, w = rng.uniform(size=(2, n))
    flip = u + w > 1
    u, w = np.where(flip, 1 - u, u), np.where(flip, 1 - w, w)
    pts = (
        tri[idx, 0]
        + u[:, None] * (tri[idx, 1] - tri[idx, 0])
        + w[:, None] * (tri[idx, 2] - tri[idx, 0])
    )
    return pts, nrm[idx]


def main():
    enable_persistent_cache()
    n_step = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    for scene_name, scene_mesh in make_scenes().items():
        for encoder in ("triplane", "hash"):
            print(json.dumps(run(encoder, n_step, scene_name, scene_mesh)),
                  flush=True)


if __name__ == "__main__":
    main()
