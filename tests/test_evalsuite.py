"""Standing accuracy suite (foundationpose_tpu/evalsuite): scene compositing
correctness in the default suite; the quick end-to-end harness as slow."""

import numpy as np
import pytest

from foundationpose_tpu.evalsuite import scenes as scenes_mod
from foundationpose_tpu.evalsuite.harness import run_accuracy

QK = scenes_mod.K_DEFAULT.copy()
QK[:2] *= 0.25
QHW = (120, 160)


def test_suite_is_fixed_and_diverse():
    suite = scenes_mod.build_suite()
    names = [s.name for s in suite]
    assert len(suite) >= 10 and len(set(names)) == len(names)
    # the coverage classes the VERDICT asks for
    assert any(s.mesh.texture is not None for s in suite)  # textured
    assert any(s.mesh.texture is None for s in suite)  # vertex-color/flat
    assert any(s.symmetry_tfs is not None for s in suite)  # symmetric
    assert any(s.distractors for s in suite)  # occlusion/clutter
    assert any(s.backdrop for s in suite)  # cluttered background
    assert sum(s.learned for s in suite) >= 3  # learned-mode subset


def test_scene_render_composes_occlusion():
    """The occluded scene's visible mask is the z-composited subset of the
    object mask, and rgb/depth carry the occluder where it wins."""
    suite = scenes_mod.build_suite()
    spec = [s for s in suite if s.name == "sphere_occluded"][0]
    r = scenes_mod.SceneRenderer(spec, K=QK, hw=QHW)
    gt = r.register_poses()[0]
    rgb, depth, vis, frac = r.render(gt)
    assert rgb.shape == (120, 160, 3) and depth.shape == (120, 160)
    assert 0.3 < frac < 0.95, f"occluder should hide part of the object ({frac})"
    # visible pixels carry the object depth near z0
    zs = depth[vis > 0]
    assert 0.35 < np.median(zs) < 0.8
    # occluder pixels exist in the depth map closer than the object
    assert (depth[(vis == 0) & (depth > 0)] < np.median(zs)).any()


def test_scene_render_backdrop_and_clutter():
    suite = scenes_mod.build_suite()
    spec = [s for s in suite if s.name == "compound_clutter"][0]
    r = scenes_mod.SceneRenderer(spec, K=QK, hw=QHW)
    gt = r.register_poses()[1]
    rgb, depth, vis, frac = r.render(gt)
    # backdrop fills every non-object pixel with BACKDROP_Z or nearer clutter
    assert (depth > 0).all()
    assert depth.max() <= scenes_mod.BACKDROP_Z + 1e-5
    # clutter occupies pixels outside the object at other depths
    clutter_px = (vis == 0) & (depth < scenes_mod.BACKDROP_Z - 1e-3)
    assert clutter_px.sum() > 100
    # trajectory is smooth: per-frame translation steps are small
    traj = r.track_trajectory()
    steps = np.linalg.norm(np.diff(traj[:, :3, 3], axis=0), axis=-1)
    assert steps.max() < 0.02


@pytest.mark.slow
def test_quick_harness_end_to_end(tmp_path):
    """The quick (CPU) configuration of the full harness: 2 scenes with
    occlusion/clutter, register across all three schedules + a short track,
    geometric mode. Pins the ACCURACY_r*.json contract."""
    out = tmp_path / "acc.json"
    res = run_accuracy(out_path=str(out), quick=True, modes=("geometric",),
                       input_size=48)
    assert out.exists()
    reg = res["modes"]["geometric"]["register"]
    assert set(reg) == {"full", "funnel", "coarse112"}
    for sched in reg.values():
        assert 0.0 <= sched["overall_auc_adds"] <= 1.0
        assert len(sched["scenes"]) == 2
    # quarter-res quick scenes still register: ADD-S AUC well above chance
    assert reg["full"]["overall_auc_adds"] > 0.5
    trk = res["modes"]["geometric"]["track"]
    assert trk["median_ate_m"] is not None and trk["median_ate_m"] < 0.1
    assert "funnel_vs_full_auc_delta" in res["summary"]
