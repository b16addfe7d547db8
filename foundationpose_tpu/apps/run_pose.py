"""Single-frame 6D pose estimation CLI.

Counterpart of the reference main.py (call stack SURVEY.md 3.1): load RGB +
depth + intrinsics + mesh, obtain the object mask (file / interactive /
auto-detect), run registration, save the pose + a visualization, optionally
convert to 6D robot coordinates and publish to NetworkTables.

Unlike the reference (hardcoded paths, main.py:30-32), everything is argparse
flags; the readme-documented surface (--est-refine-iter, --debug, --prompt,
--nt-server, readme.md:89-120) is implemented.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="TPU-native FoundationPose: single-frame registration")
    p.add_argument("--rgb", required=True, help="path to rgb image (png/jpg)")
    p.add_argument("--depth", required=True, help="path to depth (npy meters or png mm)")
    p.add_argument("--intrinsics", required=True, help="cam_K.txt (3x3 or ZED conf format)")
    p.add_argument("--mesh", required=True, help="object mesh (.obj/.ply)")
    p.add_argument("--mask", default=None, help="object mask file; omit for --manual-mask or --prompt")
    p.add_argument("--manual-mask", action="store_true", help="paint the mask interactively")
    p.add_argument("--prompt", default=None, help="text prompt for detector+segmenter auto-masking")
    p.add_argument("--est-refine-iter", type=int, default=5)
    p.add_argument("--mode", choices=["learned", "geometric"], default="geometric",
                   help="refiner/scorer backend; 'learned' needs trained weights (--weights)")
    p.add_argument("--weights", default=None, help="orbax checkpoint dir with refiner/scorer params")
    p.add_argument("--out-dir", default="./pose_out")
    p.add_argument("--debug", type=int, default=1)
    p.add_argument("--nt-server", default=None, help="publish pose to this NetworkTables server")
    p.add_argument("--to-inches", action="store_true", default=True)
    return p


def main(argv=None):
    from foundationpose_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    logging.basicConfig(level=logging.INFO, format="[%(funcName)s()] %(message)s")

    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
    from foundationpose_tpu.io.file_loader import FileLoader
    from foundationpose_tpu.io.pose6d import PoseTransformer

    loader = FileLoader()
    rgb = loader.load_rgb_image_from_file(args.rgb)
    depth = loader.load_depth_from_file(args.depth)
    K = loader.load_camera_intrinsics(args.intrinsics)
    if rgb is None or depth is None or K is None:
        raise SystemExit("failed to load inputs")
    mesh = meshio.load_mesh(args.mesh)

    if args.mask:
        from foundationpose_tpu.io.masking import load_mask

        mask = load_mask(args.mask, shape=depth.shape)
    elif args.manual_mask:
        from foundationpose_tpu.io.masking import MaskingTool

        mask = MaskingTool().run(rgb, os.path.join(args.out_dir, "mask.png"))
        if mask is None:
            raise SystemExit("masking aborted")
    elif args.prompt:
        from foundationpose_tpu.detect.pipeline import AutoMasker

        mask = AutoMasker().mask_from_prompt(rgb, args.prompt)
    else:
        raise SystemExit("provide --mask, --manual-mask, or --prompt")

    if args.mode == "geometric":
        from foundationpose_tpu.engine.geometric import (
            GeometricConfig,
            GeometricRefiner,
            GeometricScorer,
        )

        refiner = GeometricRefiner(GeometricConfig())
        scorer = GeometricScorer(GeometricConfig())
        cfg = EstimatorConfig(register_iterations=args.est_refine_iter * 2,
                              final_refine_iterations=8)
    else:
        refiner = scorer = None
        cfg = EstimatorConfig(register_iterations=args.est_refine_iter)
        # default learned weights: the shipped object-agnostic checkpoint
        # (ONE RefineNet/ScoreNet pair for any mesh) + the hybrid
        # geometric-veto scorer — the configuration ACCURACY_r05 measured
        # at 0.926 register / 0.916 track ADD-S AUC. --weights overrides
        # with an imported torch/orbax checkpoint.
        agn_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "weights", "agnostic",
        )
        if args.weights is None and os.path.isdir(agn_dir):
            from foundationpose_tpu.engine.scorer import HybridScorer
            from foundationpose_tpu.models import agnostic

            refiner, learned_scorer, _ = agnostic.load_agnostic(agn_dir)
            scorer = HybridScorer(learned_scorer)
            logging.info("learned mode: agnostic checkpoint %s + hybrid "
                         "scorer", agn_dir)

    est = FoundationPoseTPU(mesh, config=cfg, refiner=refiner, scorer=scorer)
    if args.weights and args.mode == "learned":
        from foundationpose_tpu.models.weights import load_engine_params

        load_engine_params(est, args.weights)

    pose = est.register(K, rgb.astype(np.float32), depth, mask,
                        iteration=None if args.mode == "geometric" else args.est_refine_iter)
    np.savetxt(os.path.join(args.out_dir, "pose.txt"), pose)
    logging.info("pose:\n%s", pose)

    if args.debug >= 1:
        from foundationpose_tpu.utils.vis import draw_posed_3d_box, draw_xyz_axis
        from PIL import Image

        # center_pose = pose wrt the centered-mesh frame (reference main.py:67)
        center_pose = pose @ np.linalg.inv(est.get_tf_to_centered_mesh())
        vis = draw_posed_3d_box(K, rgb, center_pose, est.mesh.bounds)
        vis = draw_xyz_axis(vis, center_pose, scale=0.1, K=K)
        Image.fromarray(vis).save(os.path.join(args.out_dir, "vis.png"))
        logging.info("visualization saved to %s/vis.png", args.out_dir)

    transformer = PoseTransformer(to_inches=args.to_inches)
    center_pose = pose @ np.linalg.inv(est.get_tf_to_centered_mesh())
    pose_6d = transformer.transform_pose(center_pose)

    if args.nt_server:
        from foundationpose_tpu.io.nt import PosePublisher

        PosePublisher(server=args.nt_server).publish_pose(pose_6d)
    return pose


if __name__ == "__main__":
    main()
