"""Resume driver: the learned-mode coarse112 register block + track block.

The remote-TPU tunnel wedges sporadically on ~40-min processes; the full
learned accuracy run completed its full/funnel register blocks (saved
incrementally to ACC_r05_learned.json) before wedging. This runs the two
remaining blocks in a fresh process and folds them into the same artifact.

    python scripts/accuracy_learned_rest.py --io ACC_r05_learned.json
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--io", default="ACC_r05_learned.json")
    ap.add_argument("--ckpt", default="weights/agnostic")
    ap.add_argument("--skip-coarse112", action="store_true")
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
    from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig
    from foundationpose_tpu.evalsuite import scenes as scenes_mod
    from foundationpose_tpu.evalsuite.harness import (
        _register_block, _schedules, _track_block,
    )
    from foundationpose_tpu.models import agnostic

    with open(args.io) as f:
        results = json.load(f)

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

    def make_learned(spec, cfg):
        return FoundationPoseTPU(
            spec.mesh, symmetry_tfs=spec.symmetry_tfs, config=cfg,
            refiner=PoseRefiner(
                RefinerConfig(input_size=px, dtype="bfloat16"),
                params=params_r,
            ),
            scorer=PoseScorer(
                ScorerConfig(input_size=px, dtype="bfloat16",
                             norm="group", residual_attn=True),
                params=params_s,
            ),
        )

    suite = scenes_mod.build_suite()
    renderers = {
        s.name: scenes_mod.SceneRenderer(s) for s in suite
    }
    est_cfg = EstimatorConfig(register_iterations=5)
    block = results["modes"]["learned"]

    def save():
        with open(args.io, "w") as f:
            json.dump(results, f, indent=1)

    if not args.skip_coarse112:
        sched = {"coarse112": _schedules(px)["coarse112"]}
        _register_block(
            suite, renderers, make_learned, est_cfg, sched,
            progress_cb=save, out=block["register"],
        )
        save()
    if not args.skip_track:
        block["track"] = _track_block(
            suite, renderers, make_learned, est_cfg
        )
        save()
    print(json.dumps({k: v.get("overall_auc_adds")
                      for k, v in block["register"].items()
                      if isinstance(v, dict)}))


if __name__ == "__main__":
    main()
