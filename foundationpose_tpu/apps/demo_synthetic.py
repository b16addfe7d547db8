"""Self-contained synthetic demo: render a scene, write the inputs to disk,
then run the full single-frame CLI on them (register + track a short motion).

Usage: python -m foundationpose_tpu.apps.demo_synthetic [--out-dir DIR] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    from foundationpose_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--out-dir", default="/tmp/fp_tpu_demo")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--frames", type=int, default=5, help="tracking frames after register")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from foundationpose_tpu.core import geometry as geo, meshio, metrics
    from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
    from foundationpose_tpu.engine.geometric import (
        GeometricConfig,
        GeometricRefiner,
        GeometricScorer,
    )
    from foundationpose_tpu.ops import raster
    from foundationpose_tpu.utils.vis import draw_posed_3d_box, draw_xyz_axis

    os.makedirs(args.out_dir, exist_ok=True)
    K = np.array([[420.0, 0, 160], [0, 420.0, 120], [0, 0, 1]])
    HW = (240, 320)

    # chiral L-shaped object
    boxes = [
        meshio.make_box((0.12, 0.04, 0.04)),
        meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0]),
        meshio.make_box((0.04, 0.04, 0.07)).translated([-0.04, 0.0, 0.055]),
    ]
    verts = np.concatenate([m.vertices for m in boxes])
    offs = np.cumsum([0] + [len(m.vertices) for m in boxes[:-1]])
    faces = np.concatenate([m.faces + o for m, o in zip(boxes, offs)])
    mesh = meshio.Mesh(verts, faces)
    mesh.vertex_colors = np.full((len(verts), 3), 170, np.uint8)
    mesh_path = os.path.join(args.out_dir, "object.obj")
    meshio.save_obj(mesh_path, mesh)

    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.4, -0.25, 0.6))[:3, :3]
    gt[:3, 3] = [0.01, -0.02, 0.55]
    mt = raster.make_mesh_tensors(mesh)
    out = raster.render_full_frame(mt, gt[None], K, HW)
    rgb = (np.asarray(out["rgb"][0]) * 255).astype(np.uint8)
    depth = np.asarray(out["depth"][0]).astype(np.float32)
    mask = np.asarray(out["mask"][0]).astype(np.uint8) * 255

    Image.fromarray(rgb).save(os.path.join(args.out_dir, "rgb.png"))
    np.save(os.path.join(args.out_dir, "depth.npy"), depth)
    Image.fromarray(mask).save(os.path.join(args.out_dir, "mask.png"))
    np.savetxt(os.path.join(args.out_dir, "cam_K.txt"), K)
    np.savetxt(os.path.join(args.out_dir, "gt_pose.txt"), gt)

    gcfg = GeometricConfig(input_size=96)
    cfg = EstimatorConfig(
        min_n_views=12, inplane_step=120, register_iterations=10,
        final_refine_iterations=8,
    )
    est = FoundationPoseTPU(
        mesh, config=cfg, refiner=GeometricRefiner(gcfg), scorer=GeometricScorer(gcfg)
    )

    t0 = time.perf_counter()
    pose = est.register(K, rgb.astype(np.float32), depth, mask)
    t_reg = time.perf_counter() - t0
    err = float(metrics.adds_err(pose, gt, mesh.vertices))
    print(f"register: {t_reg:.2f}s  ADD-S error {err*1000:.1f} mm "
          f"(diameter {est.diameter*1000:.0f} mm)")

    center_pose = pose  # original-mesh frame
    vis = draw_posed_3d_box(K, rgb, center_pose, mesh.bounds)
    vis = draw_xyz_axis(vis, center_pose, scale=0.08, K=K)
    Image.fromarray(vis).save(os.path.join(args.out_dir, "vis_register.png"))

    # track a short motion
    cur_gt = gt.copy()
    for f in range(args.frames):
        cur_gt = cur_gt.copy()
        cur_gt[:3, 3] += [0.004, -0.002, 0.005]
        cur_gt[:3, :3] = (
            np.asarray(geo.so3_exp_map(np.array([[0.03, 0.02, -0.02]])))[0]
            @ cur_gt[:3, :3]
        )
        out = raster.render_full_frame(mt, cur_gt[None], K, HW)
        rgb_f = (np.asarray(out["rgb"][0]) * 255).astype(np.float32)
        depth_f = np.asarray(out["depth"][0]).astype(np.float32)
        t0 = time.perf_counter()
        pose_f = est.track_one(rgb_f, depth_f, K, iteration=4)
        dt = time.perf_counter() - t0
        err_f = float(metrics.adds_err(pose_f, cur_gt, mesh.vertices))
        print(f"track frame {f}: {dt*1000:.0f} ms  ADD-S {err_f*1000:.1f} mm")

    print(f"artifacts in {args.out_dir}")
    return err


if __name__ == "__main__":
    main()
