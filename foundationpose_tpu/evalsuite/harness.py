"""Standing accuracy harness: ADD-S / ADD AUC + tracking ATE over the fixed
synthetic scene suite, in geometric and learned modes, across register
schedules (full / funnel / coarse-funnel).

Protocol parity: the reference evaluates register/track against BOP GT with
ADD / ADD-S / AUC (src/Utils.py:232-266) and per-frame reader GT
(src/datareader.py:265-377); here the scenes are synthetic-with-exact-GT
(zero-egress host — see evalsuite/scenes.py) and the AUC threshold sweep is
identical (0..0.1 m). Output is one JSON written next to BENCH_r*.json so
accuracy is tracked across rounds the way speed already is.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time

import numpy as np

from foundationpose_tpu.core import metrics
from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
from foundationpose_tpu.engine.geometric import (
    GeometricConfig, GeometricRefiner, GeometricScorer,
)
from foundationpose_tpu.evalsuite import scenes as scenes_mod


def _schedules(input_size):
    """Register schedules under evaluation. The coarse pass of the third
    schedule runs at 112 px for 160-px nets (scaled proportionally for
    smaller inputs) — the TPU-optimized funnel the bench reports."""
    coarse = 112 if input_size >= 160 else max(32, int(input_size * 0.7))
    return {
        "full": {},
        "funnel": dict(funnel_top_k=64, funnel_coarse_iterations=1),
        "coarse112": dict(funnel_top_k=64, funnel_coarse_iterations=1,
                          funnel_coarse_size=coarse),
    }


def _auc(errs, max_val=0.1):
    return round(metrics.compute_auc(np.asarray(errs), max_val=max_val), 4)


def _register_block(suite, renderers, make_estimator, est_cfg, schedules,
                    scene_filter=None, progress_cb=None, out=None):
    out = {} if out is None else out  # filled in place so incremental
    for sched_name, sched_kw in schedules.items():  # checkpoints see it
        cfg = dataclasses.replace(est_cfg, **sched_kw)
        per_scene = {}
        pooled_adds, pooled_add = [], []
        for spec in suite:
            if scene_filter and not scene_filter(spec):
                continue
            r = renderers[spec.name]
            est = make_estimator(spec, cfg)
            adds_l, add_l, terr_l, vis_l = [], [], [], []
            for gt in r.register_poses():
                rgb, depth, vis_mask, vis_frac = r.render(gt)
                t0 = time.perf_counter()
                pose = est.register(r.K, rgb, depth, vis_mask)
                dt = time.perf_counter() - t0
                adds = float(metrics.adds_err(pose, gt, spec.mesh.vertices))
                add = float(metrics.add_err(pose, gt, spec.mesh.vertices))
                # symmetric objects: ADD is only meaningful up to the
                # symmetry group — take the min over symmetry_tfs like the
                # BOP protocol pairs ADD-S with symmetric classes
                if spec.symmetry_tfs is not None:
                    add = min(
                        float(metrics.add_err(pose, gt @ s, spec.mesh.vertices))
                        for s in spec.symmetry_tfs
                    )
                adds_l.append(adds)
                add_l.append(add)
                terr_l.append(float(np.linalg.norm(pose[:3, 3] - gt[:3, 3])))
                vis_l.append(round(vis_frac, 3))
                logging.info(
                    "[%s/%s] adds=%.4f add=%.4f visib=%.2f %.2fs",
                    sched_name, spec.name, adds, add, vis_frac, dt,
                )
            pooled_adds += adds_l
            if spec.pool_add:
                pooled_add += add_l
            per_scene[spec.name] = {
                "adds": [round(x, 5) for x in adds_l],
                "add": [round(x, 5) for x in add_l],
                "t_err": [round(x, 5) for x in terr_l],
                "visib_frac": vis_l,
                "auc_adds": _auc(adds_l),
                "auc_add": _auc(add_l),
                "adds_mean": round(float(np.mean(adds_l)), 5),
            }
            if not spec.pool_add:
                # continuous full symmetry (spheres): ADD is meaningless,
                # reported per-scene for completeness but excluded from the
                # pooled number (round-4 verdict weak #8)
                per_scene[spec.name]["add_pooled"] = False
        out[sched_name] = {
            "scenes": per_scene,
            "overall_auc_adds": _auc(pooled_adds),
            # pooled ADD over scenes where ADD is meaningful only
            "overall_auc_add": _auc(pooled_add) if pooled_add else None,
        }
        if progress_cb:
            progress_cb()
    return out


def _track_block(suite, renderers, make_estimator, est_cfg, scene_filter=None):
    per_scene = {}
    pooled_adds = []
    ates = []
    for spec in suite:
        if scene_filter and not scene_filter(spec):
            continue
        r = renderers[spec.name]
        est = make_estimator(spec, est_cfg)
        traj = r.track_trajectory()
        rgb, depth, vis_mask, _ = r.render(traj[0])
        est.register(r.K, rgb, depth, vis_mask)
        pred = [est.pose_last @ est.get_tf_to_centered_mesh()]
        adds_l = [float(metrics.adds_err(pred[0], traj[0], spec.mesh.vertices))]
        for gt in traj[1:]:
            rgb, depth, _, _ = r.render(gt)
            pose = est.track_one(rgb, depth, r.K)
            pred.append(pose)
            adds_l.append(float(metrics.adds_err(pose, gt, spec.mesh.vertices)))
        pred = np.stack(pred)
        ate = metrics.ate_rmse(pred, traj, align=False)
        rpe_t, rpe_r = metrics.rpe(pred, traj)
        pooled_adds += adds_l
        ates.append(ate)
        per_scene[spec.name] = {
            "ate_m": round(ate, 5),
            "rpe_t_m": round(rpe_t, 5),
            "rpe_r_deg": round(rpe_r, 3),
            "auc_adds": _auc(adds_l),
            "adds_mean": round(float(np.mean(adds_l)), 5),
            "n_frames": len(traj),
        }
        logging.info("[track/%s] ate=%.4f auc=%.3f", spec.name,
                     ate, per_scene[spec.name]["auc_adds"])
    return {
        "scenes": per_scene,
        "median_ate_m": round(float(np.median(ates)), 5) if ates else None,
        "overall_auc_adds": _auc(pooled_adds) if pooled_adds else None,
    }


def run_accuracy(out_path=None, quick=False, modes=("geometric", "learned"),
                 input_size=160, learned_px=64, learned_steps=(2000, 4000),
                 hyp_grid=None, track=True, agnostic_dir=None,
                 scene_names=None):
    """Run the whole suite; returns (and optionally writes) the results dict.

    quick=True: 2 scenes, 2 register poses, 6 track frames, small grids —
    the CPU smoke configuration used by tests.

    ``scene_names``: optional subset of scene names to run (full resolution,
    full protocol) — for re-measuring specific scenes after a targeted fix;
    pooled numbers then cover only the subset.

    ``agnostic_dir``: an object-agnostic checkpoint directory
    (scripts/train_agnostic.py). When given, learned mode evaluates that ONE
    RefineNet/ScoreNet pair on ALL scenes at the checkpoint's native
    resolution — the reference's single-checkpoint protocol
    (predict_pose_refine.py:93-147). Without it, learned mode falls back to
    the round-4 per-scene synthetic training (3 scenes, ``learned_px``).
    """
    import jax

    suite = scenes_mod.build_suite(quick=quick)
    if scene_names:
        suite = [s for s in suite if s.name in set(scene_names)]
    # quick mode renders at quarter resolution (the XLA raster on a CPU test
    # host is minutes per 640x480 frame; geometry/protocol are unchanged)
    K_s, hw_s = (scenes_mod.K_DEFAULT, scenes_mod.HW_DEFAULT)
    if quick:
        K_s = scenes_mod.K_DEFAULT.copy()
        K_s[:2] *= 0.25
        hw_s = (120, 160)
    renderers = {
        s.name: scenes_mod.SceneRenderer(s, K=K_s, hw=hw_s) for s in suite
    }
    if hyp_grid is None:
        hyp_grid = dict(min_n_views=12, inplane_step=120) if quick else {}
    est_cfg = EstimatorConfig(register_iterations=5, **hyp_grid)
    schedules = _schedules(input_size)

    results = {
        "meta": {
            "quick": bool(quick),
            "n_scenes": len(suite),
            "scenes": [s.name for s in suite],
            "input_size": input_size,
            "auc_max_m": 0.1,
            "device": str(jax.devices()[0]),
            "protocol": "ADD/ADD-S per register trial pooled per scene and "
            "overall; AUC threshold sweep 0..0.1 m (Utils.py:255-266 "
            "semantics); track: ATE/RPE + per-frame ADD-S",
        },
        "modes": {},
    }

    def checkpoint():
        # incremental write: a partially-complete run still leaves a valid
        # artifact if the driver cuts the round mid-suite
        if out_path:
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)

    # ---- geometric mode: shared projective-ICP refiner/scorer ----
    if "geometric" in modes:
        gcfg = GeometricConfig(input_size=input_size)
        g_ref, g_sco = GeometricRefiner(gcfg), GeometricScorer(gcfg)

        def make_geo(spec, cfg):
            return FoundationPoseTPU(
                spec.mesh, symmetry_tfs=spec.symmetry_tfs, config=cfg,
                refiner=g_ref, scorer=g_sco,
            )

        block = {"register": {}}
        results["modes"]["geometric"] = block
        # coarse112 is IDENTICAL to funnel in geometric mode: the ICP
        # refiner ignores the coarse crop resolution (geometric.py
        # traced_refine). Re-running it would record bit-identical numbers
        # that read as independent evidence — mark it instead of measuring.
        geo_schedules = {k: v for k, v in schedules.items() if k != "coarse112"}
        _register_block(
            suite, renderers, make_geo, est_cfg, geo_schedules,
            progress_cb=checkpoint, out=block["register"])
        if "coarse112" in schedules:
            block["register"]["coarse112"] = {
                "equivalent_to": "funnel",
                "note": "ICP ignores crop resolution; see funnel for numbers",
            }
        checkpoint()
        if track:
            block["track"] = _track_block(suite, renderers, make_geo, est_cfg)
            checkpoint()

    # ---- learned mode (agnostic): ONE net pair for every scene ----
    # "learned" = pure ScoreNet ranking; "learned_hybrid" = ScoreNet +
    # geometric depth-consistency veto (engine.scorer.HybridScorer) — the
    # shipping default, robust to clutter/occlusion where the pure net
    # mis-ranks distractor-aligned hypotheses
    if ({"learned", "learned_hybrid"} & set(modes)) and agnostic_dir:
        import os

        from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
        from foundationpose_tpu.engine.scorer import (
            HybridScorer, PoseScorer, ScorerConfig,
        )
        from foundationpose_tpu.models import agnostic

        if not os.path.isdir(agnostic_dir):
            raise FileNotFoundError(
                f"agnostic checkpoint dir not found: {agnostic_dir} "
                "(run scripts/train_agnostic.py first)"
            )
        _, _, meta = agnostic.load_agnostic(agnostic_dir)
        px = int(meta["input_size"])
        params_r = agnostic.load_params_npz(
            f"{agnostic_dir}/refiner.npz",
            PoseRefiner(RefinerConfig(input_size=px)).params,
        )
        params_s = agnostic.load_params_npz(
            f"{agnostic_dir}/scorer.npz",
            PoseScorer(ScorerConfig(input_size=px, norm="group",
                                    residual_attn=True)).params,
        )

        def make_maker(hybrid):
            def make_learned(spec, cfg):
                # fresh predictor objects per estimator (the estimator
                # mutates predictor configs for backface culling), SHARED
                # params
                scorer = PoseScorer(
                    ScorerConfig(input_size=px, dtype="bfloat16",
                                 norm="group", residual_attn=True),
                    params=params_s,
                )
                if hybrid:
                    scorer = HybridScorer(scorer)
                return FoundationPoseTPU(
                    spec.mesh, symmetry_tfs=spec.symmetry_tfs, config=cfg,
                    refiner=PoseRefiner(
                        RefinerConfig(input_size=px, dtype="bfloat16"),
                        params=params_r,
                    ),
                    scorer=scorer,
                )
            return make_learned

        for mode_name in ("learned", "learned_hybrid"):
            if mode_name not in modes:
                continue
            maker = make_maker(hybrid=mode_name == "learned_hybrid")
            block = {"meta": {"px": px, "checkpoint": agnostic_dir,
                              "object_agnostic": True,
                              "hybrid_scorer": mode_name == "learned_hybrid",
                              "train": {k: meta.get(k) for k in
                                        ("n_meshes", "refiner", "scorer")}}}
            results["modes"][mode_name] = block
            block["register"] = {}
            _register_block(
                suite, renderers, maker, est_cfg, _schedules(px),
                progress_cb=checkpoint, out=block["register"])
            checkpoint()
            if track:
                block["track"] = _track_block(suite, renderers, maker,
                                              est_cfg)
                checkpoint()

    # ---- learned mode (fallback): per-mesh synthetically-trained nets ----
    elif "learned" in modes:
        from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
        from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig
        from foundationpose_tpu.models import datagen

        steps_r, steps_s = learned_steps
        learned_nets = {}
        for spec in suite:
            if not spec.learned:
                continue
            t0 = time.perf_counter()
            _, params_r, losses_r = datagen.train_refiner_synthetic(
                spec.mesh, scenes_mod.K_DEFAULT, steps=steps_r, batch=16,
                input_size=learned_px, lr=3e-4,
            )
            _, params_s, losses_s = datagen.train_scorer_synthetic(
                spec.mesh, scenes_mod.K_DEFAULT, steps=steps_s, n_hyp=8,
                input_size=learned_px, lr=1e-3,
            )
            learned_nets[spec.name] = (params_r, params_s)
            logging.info(
                "learned[%s]: trained in %.0fs (refine loss %.3f->%.3f, "
                "score %.3f->%.3f)", spec.name, time.perf_counter() - t0,
                np.mean(losses_r[:10]), np.mean(losses_r[-10:]),
                np.mean(losses_s[:10]), np.mean(losses_s[-10:]),
            )

        def make_learned(spec, cfg):
            params_r, params_s = learned_nets[spec.name]
            return FoundationPoseTPU(
                spec.mesh, symmetry_tfs=spec.symmetry_tfs, config=cfg,
                refiner=PoseRefiner(
                    RefinerConfig(input_size=learned_px, dtype="float32"),
                    params=params_r,
                ),
                scorer=PoseScorer(
                    ScorerConfig(input_size=learned_px, dtype="float32",
                                 norm="group", residual_attn=True),
                    params=params_s,
                ),
            )

        sel = lambda spec: spec.learned
        block = {"meta": {"px": learned_px, "steps": list(learned_steps)}}
        results["modes"]["learned"] = block
        block["register"] = {}
        _register_block(
            suite, renderers, make_learned, est_cfg,
            _schedules(learned_px), scene_filter=sel, progress_cb=checkpoint,
            out=block["register"])
        checkpoint()
        if track:
            block["track"] = _track_block(
                suite, renderers, make_learned, est_cfg, scene_filter=sel)
            checkpoint()

    # ---- headline comparisons the VERDICT asks for ----
    summary = {}
    if "geometric" in results["modes"]:
        reg = results["modes"]["geometric"]["register"]
        summary["geometric_full_auc_adds"] = reg["full"]["overall_auc_adds"]
        summary["funnel_vs_full_auc_delta"] = round(
            reg["funnel"]["overall_auc_adds"] - reg["full"]["overall_auc_adds"], 4
        )
        if "overall_auc_adds" in reg.get("coarse112", {}):
            summary["coarse112_vs_full_auc_delta"] = round(
                reg["coarse112"]["overall_auc_adds"]
                - reg["full"]["overall_auc_adds"], 4
            )
    if "learned" in results["modes"] and "geometric" in results["modes"]:
        g = results["modes"]["geometric"]["register"]["full"]["scenes"]
        l = results["modes"]["learned"]["register"]["full"]["scenes"]
        common = sorted(set(g) & set(l))
        summary["learned_vs_geometric_adds_mean"] = {
            k: {"geometric": g[k]["adds_mean"], "learned": l[k]["adds_mean"]}
            for k in common
        }
    results["summary"] = summary

    if out_path:
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        logging.info("wrote %s", out_path)
    return results
