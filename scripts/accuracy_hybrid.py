"""Evaluate the learned_hybrid mode (agnostic nets + geometric score veto)
on the full accuracy suite: register full/funnel + 60-frame track.

Writes/updates a standalone {"modes": {"learned_hybrid": ...}} artifact for
scripts/merge_accuracy.py. Blocks save incrementally; rerun with
--skip-register to resume at track after a tunnel wedge.

    python scripts/accuracy_hybrid.py --out ACC_r05_hybrid.json
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ACC_r05_hybrid.json")
    ap.add_argument("--ckpt", default="weights/agnostic")
    ap.add_argument("--weight", type=float, default=2.0)
    ap.add_argument("--skip-register", action="store_true")
    ap.add_argument("--skip-track", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, format="[%(funcName)s] %(message)s")

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.engine.estimator import (
        EstimatorConfig, FoundationPoseTPU,
    )
    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
    from foundationpose_tpu.engine.scorer import (
        HybridScorer, PoseScorer, ScorerConfig,
    )
    from foundationpose_tpu.evalsuite import scenes as scenes_mod
    from foundationpose_tpu.evalsuite.harness import (
        _register_block, _track_block,
    )
    from foundationpose_tpu.models import agnostic

    _, _, meta = agnostic.load_agnostic(args.ckpt)
    px = int(meta["input_size"])
    params_r = agnostic.load_params_npz(
        f"{args.ckpt}/refiner.npz",
        PoseRefiner(RefinerConfig(input_size=px)).params,
    )
    params_s = agnostic.load_params_npz(
        f"{args.ckpt}/scorer.npz",
        PoseScorer(ScorerConfig(input_size=px, norm="group",
                                residual_attn=True)).params,
    )

    def make_est(spec, cfg):
        scorer = HybridScorer(
            PoseScorer(
                ScorerConfig(input_size=px, dtype="bfloat16", norm="group",
                             residual_attn=True),
                params=params_s,
            ),
            weight=args.weight,
        )
        return FoundationPoseTPU(
            spec.mesh, symmetry_tfs=spec.symmetry_tfs, config=cfg,
            refiner=PoseRefiner(
                RefinerConfig(input_size=px, dtype="bfloat16"),
                params=params_r,
            ),
            scorer=scorer,
        )

    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    else:
        results = {"modes": {"learned_hybrid": {
            "meta": {"px": px, "checkpoint": args.ckpt,
                     "object_agnostic": True, "hybrid_scorer": True,
                     "hybrid_weight": args.weight},
            "register": {},
        }}}
    block = results["modes"]["learned_hybrid"]

    suite = scenes_mod.build_suite()
    renderers = {s.name: scenes_mod.SceneRenderer(s) for s in suite}
    est_cfg = EstimatorConfig(register_iterations=5)

    def save():
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    if not args.skip_register:
        _register_block(
            suite, renderers, make_est, est_cfg,
            {"full": {},
             "funnel": dict(funnel_top_k=64, funnel_coarse_iterations=1)},
            progress_cb=save, out=block["register"],
        )
        save()
    if not args.skip_track:
        block["track"] = _track_block(suite, renderers, make_est, est_cfg)
        save()
    print(json.dumps({
        "register": {k: v.get("overall_auc_adds")
                     for k, v in block["register"].items()},
        "track": block.get("track", {}).get("overall_auc_adds"),
        "track_median_ate_m": block.get("track", {}).get("median_ate_m"),
    }))


if __name__ == "__main__":
    main()
