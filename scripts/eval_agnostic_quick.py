"""Fast spot-check of an object-agnostic checkpoint: register a few
full-resolution suite scenes with the ONE net pair and print ADD-S.

    cd /root/repo && timeout 1800 python scripts/eval_agnostic_quick.py \
        --ckpt /tmp/agn_cal --scenes box_gray,compound_asym

(Full evidence comes from accuracy.py; this is the cheap go/no-go gate
between training and the full suite run.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="weights/agnostic")
    ap.add_argument("--scenes", default="box_gray,compound_asym,sphere_tex")
    ap.add_argument("--n-poses", type=int, default=2)
    ap.add_argument("--track-frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.core import metrics
    from foundationpose_tpu.engine.estimator import (
        EstimatorConfig, FoundationPoseTPU,
    )
    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
    from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig
    from foundationpose_tpu.evalsuite import scenes as es
    from foundationpose_tpu.models import agnostic

    _, _, meta = agnostic.load_agnostic(args.ckpt)
    px = int(meta["input_size"])
    params_r = agnostic.load_params_npz(
        f"{args.ckpt}/refiner.npz", PoseRefiner(RefinerConfig(input_size=px)).params
    )
    params_s = agnostic.load_params_npz(
        f"{args.ckpt}/scorer.npz",
        PoseScorer(ScorerConfig(input_size=px, norm="group",
                                residual_attn=True)).params,
    )
    want = set(args.scenes.split(","))
    suite = [s for s in es.build_suite() if s.name in want]
    t0 = time.time()
    for spec in suite:
        r = es.SceneRenderer(spec)
        est = FoundationPoseTPU(
            spec.mesh, symmetry_tfs=spec.symmetry_tfs,
            config=EstimatorConfig(register_iterations=5),
            refiner=PoseRefiner(RefinerConfig(input_size=px, dtype="bfloat16"),
                                params=params_r),
            scorer=PoseScorer(ScorerConfig(input_size=px, dtype="bfloat16",
                                           norm="group", residual_attn=True),
                              params=params_s),
        )
        for i, gt in enumerate(r.register_poses()[: args.n_poses]):
            rgb, depth, vis, _ = r.render(gt)
            pose = est.register(r.K, rgb, depth, vis)
            adds = metrics.adds_err(pose, gt, spec.mesh.vertices)
            terr = np.linalg.norm(pose[:3, 3] - gt[:3, 3])
            print(f"[+{time.time()-t0:5.0f}s] {spec.name}[{i}] "
                  f"adds={adds*1000:.1f}mm t_err={terr*1000:.1f}mm "
                  f"(diam {est.diameter*1000:.0f}mm)", flush=True)
        if args.track_frames:
            traj = r.track_trajectory()[: args.track_frames]
            rgb, depth, vis, _ = r.render(traj[0])
            est.register(r.K, rgb, depth, vis)
            errs = []
            for gt in traj[1:]:
                rgb, depth, _, _ = r.render(gt)
                pose = est.track_one(rgb, depth, r.K)
                errs.append(metrics.adds_err(pose, gt, spec.mesh.vertices))
            print(f"[+{time.time()-t0:5.0f}s] {spec.name} track "
                  f"adds mean={np.mean(errs)*1000:.1f}mm "
                  f"max={np.max(errs)*1000:.1f}mm", flush=True)


if __name__ == "__main__":
    main()
