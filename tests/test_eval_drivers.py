"""End-to-end coverage of the evaluation/reconstruction drivers on a RENDERED
synthetic BOP scene (VERDICT r2 items 5/6): apps/eval_bop.evaluate_scene must
produce a real ADD-S AUC report from disk (register + track protocols), and
apps/run_field must reconstruct a mesh from the same tree.

Unlike test_datareader.py's flat-image trees, the rgb/depth/mask here are
actual renders of the model at the GT poses, so the registered poses are
meaningful and the asserted AUC is a real accuracy statement.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from foundationpose_tpu.core import geometry as geo, meshio  # noqa: E402
from foundationpose_tpu.ops import raster  # noqa: E402

H, W = 120, 160
K = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]])


def _l_mesh_mm():
    """Asymmetric L-shaped object in mm (BOP models are mm); flat-face-only
    cubes under-constrain the geometric refiner."""
    a = meshio.make_box((120.0, 40.0, 40.0))
    b = meshio.make_box((40.0, 90.0, 40.0)).translated([40.0, 65.0, 0.0])
    c = meshio.make_box((40.0, 40.0, 70.0)).translated([-40.0, 0.0, 55.0])
    meshes = [a, b, c]
    verts = np.concatenate([m.vertices for m in meshes])
    offs = np.cumsum([0] + [len(m.vertices) for m in meshes[:-1]])
    faces = np.concatenate([m.faces + o for m, o in zip(meshes, offs)])
    m = meshio.Mesh(verts, faces)
    m.vertex_colors = np.full((len(verts), 3), 180, dtype=np.uint8)
    return m


def _gt_pose(i):
    """Object-in-camera pose for frame i: fixed distance, slow orbit."""
    p = np.eye(4)
    p[:3, :3] = np.asarray(geo.euler_matrix(0.4 + 0.12 * i, -0.3 + 0.1 * i, 0.2))[:3, :3]
    p[:3, 3] = [0.01, -0.01, 0.5]
    return p


def _write_rendered_scene(root, n_frames, depth_scale=1.0):
    """YCBV-layout tree whose frames are renders of obj_000001 at _gt_pose."""
    scene = os.path.join(root, "test", "000048")
    for sub in ("rgb", "depth", "mask_visib", "mask"):
        os.makedirs(os.path.join(scene, sub), exist_ok=True)
    models = os.path.join(root, "ycbv_models", "models")
    os.makedirs(models, exist_ok=True)

    mesh_mm = _l_mesh_mm()
    diameter_mm = float(meshio.compute_mesh_diameter(mesh=mesh_mm))
    # YcbVideoReader enumerates the full fixed YCB-V id list; give every id a
    # model entry (frames only ever reference obj 1)
    for ob_id in range(1, 22):
        meshio.save_ply(os.path.join(models, f"obj_{ob_id:06d}.ply"), mesh_mm)
    with open(os.path.join(models, "models_info.json"), "w") as f:
        json.dump({str(i): {"diameter": diameter_mm} for i in range(1, 22)}, f)

    mesh_m = meshio.Mesh(
        mesh_mm.vertices / 1000.0, mesh_mm.faces, vertex_colors=mesh_mm.vertex_colors
    )
    mt = raster.make_mesh_tensors(mesh_m)
    cam, gt = {}, {}
    for i in range(1, n_frames + 1):
        pose = _gt_pose(i)
        out = raster.render_full_frame(mt, pose[None].astype(np.float32), K, (H, W))
        rgb = (np.asarray(out["rgb"][0]) * 255).astype(np.uint8)
        depth_m = np.asarray(out["depth"][0])
        mask = (np.asarray(out["mask"][0]) > 0).astype(np.uint8) * 255
        # BOP: depth_png * depth_scale = depth in mm
        depth_png = (depth_m * 1000.0 / depth_scale).astype(np.uint16)
        cv2.imwrite(os.path.join(scene, "rgb", f"{i:06d}.png"), rgb[..., ::-1])
        cv2.imwrite(os.path.join(scene, "depth", f"{i:06d}.png"), depth_png)
        for sub in ("mask_visib", "mask"):
            cv2.imwrite(os.path.join(scene, sub, f"{i:06d}_000000.png"), mask)
        cam[str(i)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": depth_scale}
        gt[str(i)] = [{
            "obj_id": 1,
            "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
            "cam_t_m2c": (pose[:3, 3] * 1000.0).tolist(),
        }]
    with open(os.path.join(scene, "scene_camera.json"), "w") as f:
        json.dump(cam, f)
    with open(os.path.join(scene, "scene_gt.json"), "w") as f:
        json.dump(gt, f)
    return scene


@pytest.fixture(scope="module")
def rendered_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bop") / "ycbv")
    return _write_rendered_scene(root, n_frames=3)


def _small_configs():
    from foundationpose_tpu.engine.estimator import EstimatorConfig
    from foundationpose_tpu.engine.geometric import GeometricConfig

    return (
        EstimatorConfig(min_n_views=12, inplane_step=120, register_iterations=8,
                        final_refine_iterations=4),
        GeometricConfig(input_size=64),
    )


def test_eval_bop_smoke(rendered_scene):
    """Default-suite mechanical smoke of the BOP eval driver (round-4 ask
    #9): register + track 2 frames at a tiny grid/resolution. Guards the
    driver wiring (reader -> estimator -> metrics -> summary); the accuracy
    statement lives in the slow test below."""
    from foundationpose_tpu.apps.eval_bop import evaluate_scene
    from foundationpose_tpu.engine.estimator import EstimatorConfig
    from foundationpose_tpu.engine.geometric import GeometricConfig
    from foundationpose_tpu.io.datareader import get_bop_reader

    reader = get_bop_reader(rendered_scene)
    summary = evaluate_scene(
        reader, 1, mode="geometric", track=True, max_frames=2,
        estimator_config=EstimatorConfig(
            min_n_views=4, inplane_step=180, register_iterations=2,
            track_iterations=1,
        ),
        geometric_config=GeometricConfig(input_size=32),
    )
    assert summary["n_frames"] == 2
    assert 0.0 <= summary["adds_auc"] <= 1.0
    assert all(np.isfinite(r["adds"]) for r in summary["frames"])
    assert all(np.isfinite(r["add"]) for r in summary["frames"])


@pytest.mark.slow
def test_eval_bop_register_and_track(rendered_scene):
    """evaluate_scene end-to-end: register frame 0, track frames 1-2; the
    reported ADD-S errors must beat 10%-of-diameter and the AUC be real."""
    from foundationpose_tpu.apps.eval_bop import evaluate_scene
    from foundationpose_tpu.io.datareader import get_bop_reader

    reader = get_bop_reader(rendered_scene)
    ecfg, gcfg = _small_configs()
    summary = evaluate_scene(
        reader, 1, mode="geometric", track=True, max_frames=3,
        estimator_config=ecfg, geometric_config=gcfg,
    )
    assert summary["n_frames"] == 3
    diameter_m = meshio.compute_mesh_diameter(mesh=_l_mesh_mm()) / 1000.0
    assert summary["adds_mean"] < 0.1 * diameter_m, summary
    assert 0.0 < summary["adds_auc"] <= 1.0
    assert all(np.isfinite(r["add"]) for r in summary["frames"])


@pytest.mark.slow
def test_run_field_cli_reconstructs_mesh(rendered_scene, tmp_path):
    """apps/run_field end-to-end from the CLI surface: tiny config via YAML,
    reconstruct from the rendered BOP scene, leave a mesh on disk."""
    from foundationpose_tpu.apps import run_field

    cfg_path = str(tmp_path / "tiny.yml")
    with open(cfg_path, "w") as f:
        f.write(
            "n_step: 12\nn_rand: 256\nn_samples: 16\nn_samples_around_depth: 16\n"
            "num_levels: 2\nlog2_hashmap_size: 10\nbase_res: 8\nfinest_res: 16\n"
            "triplane_resolutions: [8, 16]\ntriplane_channels: 2\n"
            "occ_resolution: 16\nmesh_resolution: 0.004\n"
        )
    save_dir = str(tmp_path / "field_out")
    run_field.main([
        "--video-dir", rendered_scene, "--ob-id", "1", "--cfg", cfg_path,
        "--n-frames", "3", "--save-dir", save_dir, "--tex-res", "64",
    ])
    meshes = [f for f in os.listdir(save_dir) if f.endswith((".obj", ".ply"))]
    assert meshes, f"no mesh written to {save_dir}: {os.listdir(save_dir)}"
    m = meshio.load_mesh(os.path.join(save_dir, meshes[0]))
    assert len(m.faces) > 0
