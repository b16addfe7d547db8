"""BOP dataset readers on synthetic on-disk scenes.

Builds miniature BOP-layout trees (rgb/, depth/, mask[_visib]/,
scene_camera.json, scene_gt.json, models dir with PLY + models_info.json)
and pins the reader behaviors of the reference src/datareader.py: factory
dispatch, per-frame K tables, depth unit conversion (png/1000 * depth_scale),
mask lookup by object id, IoU-disambiguated GT poses for multi-instance
scenes, mm->m mesh scaling, symmetry-tf expansion, and the YCB-V keyframe +
geometric-symmetry overrides.
"""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from foundationpose_tpu.core import meshio  # noqa: E402
from foundationpose_tpu.io import datareader as dr  # noqa: E402

H, W = 24, 32
K1 = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
K2 = np.array([[120.0, 0, 16], [0, 120.0, 12], [0, 0, 1]])


def _write_models(models_dir, ob_ids, with_info=True):
    os.makedirs(models_dir, exist_ok=True)
    mesh = meshio.make_box((40.0, 40.0, 40.0))  # mm, BOP convention
    for ob_id in ob_ids:
        meshio.save_ply(os.path.join(models_dir, f"obj_{ob_id:06d}.ply"), mesh)
    if with_info:
        info = {}
        for ob_id in ob_ids:
            entry = {"diameter": 69.28}
            if ob_id == 1:
                entry["symmetries_continuous"] = [
                    {"axis": [0, 0, 1], "offset": [0, 0, 0]}
                ]
            if ob_id == 2:
                entry["symmetries_discrete"] = (
                    np.eye(4).reshape(1, 16).tolist()
                )
            info[str(ob_id)] = entry
        with open(os.path.join(models_dir, "models_info.json"), "w") as f:
            json.dump(info, f)


def _write_scene(scene_dir, frames, depth_scale=0.1):
    """frames: list of per-frame instance lists [(ob_id, t_mm, mask_box)]."""
    for sub in ("rgb", "depth", "mask_visib", "mask"):
        os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)
    cam, gt = {}, {}
    for i, instances in enumerate(frames, start=1):
        K = K1 if i == 1 else K2
        cam[str(i)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": depth_scale}
        rgb = np.full((H, W, 3), 30, np.uint8)
        # depth png value 5000 -> 5000/1000*0.1 = 0.5 m
        depth = np.full((H, W), 5000, np.uint16)
        cv2.imwrite(os.path.join(scene_dir, "rgb", f"{i:06d}.png"), rgb)
        cv2.imwrite(os.path.join(scene_dir, "depth", f"{i:06d}.png"), depth)
        gt[str(i)] = []
        for pos, (ob_id, t_mm, box) in enumerate(instances):
            R = np.eye(3)
            gt[str(i)].append(
                {
                    "obj_id": int(ob_id),
                    "cam_R_m2c": R.reshape(-1).tolist(),
                    "cam_t_m2c": list(t_mm),
                }
            )
            m = np.zeros((H, W), np.uint8)
            v0, u0, v1, u1 = box
            m[v0:v1, u0:u1] = 255
            for sub in ("mask_visib", "mask"):
                cv2.imwrite(
                    os.path.join(scene_dir, sub, f"{i:06d}_{pos:06d}.png"), m
                )
    with open(os.path.join(scene_dir, "scene_camera.json"), "w") as f:
        json.dump(cam, f)
    with open(os.path.join(scene_dir, "scene_gt.json"), "w") as f:
        json.dump(gt, f)


@pytest.fixture
def ycbv_tree(tmp_path):
    root = tmp_path / "bop" / "ycbv"
    scene = root / "test" / "000048"
    # frame 1: two instances of object 5 (IoU disambiguation target) + obj 2;
    # frame 2: one instance of object 5
    _write_scene(
        str(scene),
        [
            [
                (5, [0.0, 0.0, 500.0], (2, 2, 10, 10)),
                (5, [100.0, 50.0, 700.0], (14, 18, 22, 30)),
                (2, [-40.0, 0.0, 600.0], (12, 2, 20, 8)),
            ],
            [(5, [10.0, -10.0, 550.0], (4, 4, 12, 12))],
        ],
    )
    _write_models(str(root / "ycbv_models" / "models"), list(range(1, 22)))
    # keyframe list two levels above the scene dir (base_dir/../../)
    with open(root / "keyframe.txt", "w") as f:
        f.write("0048/000002\n")
    return str(scene)


def test_factory_dispatch(ycbv_tree):
    reader = dr.get_bop_reader(ycbv_tree)
    assert isinstance(reader, dr.YcbVideoReader)
    assert reader.get_video_id() == 48


def test_frames_K_and_depth_units(ycbv_tree):
    reader = dr.YcbVideoReader(ycbv_tree)
    assert len(reader) == 2
    np.testing.assert_allclose(reader.get_K(0), K1)
    np.testing.assert_allclose(reader.get_K(1), K2)
    d = reader.get_depth(0)
    assert d.shape == (H, W)
    np.testing.assert_allclose(d, 0.5)  # 5000 * 1e-3 * 0.1
    rgb = reader.get_color(0)
    assert rgb.shape == (H, W, 3) and rgb.dtype == np.uint8
    xyz = reader.get_xyz_map(0)
    np.testing.assert_allclose(xyz[..., 2], 0.5, atol=1e-6)
    # zfar cutoff zeroes far depth
    assert (dr.YcbVideoReader(ycbv_tree, zfar=0.4).get_depth(0) == 0).all()


def test_instance_ids_and_masks(ycbv_tree):
    reader = dr.YcbVideoReader(ycbv_tree)
    ids = reader.get_instance_ids_in_image(0)
    assert sorted(ids.tolist()) == [2, 5, 5]
    m5 = reader.get_mask(0, ob_id=5)  # first instance of obj 5 (pos 0)
    assert m5.dtype == bool and m5[5, 5] and not m5[18, 25]
    m2 = reader.get_mask(0, ob_id=2)
    assert m2[15, 4] and not m2[5, 5]
    assert reader.get_mask(0, ob_id=7) is None  # absent object logs + None


def test_gt_pose_iou_disambiguation(ycbv_tree):
    reader = dr.YcbVideoReader(ycbv_tree)
    # no mask -> first matching instance
    p = reader.get_gt_pose(0, ob_id=5)
    np.testing.assert_allclose(p[:3, 3], [0.0, 0.0, 0.5])  # mm -> m
    # mask over the SECOND instance's box selects its pose
    query = np.zeros((H, W), bool)
    query[15:21, 19:29] = True
    p2 = reader.get_gt_pose(0, ob_id=5, mask=query)
    np.testing.assert_allclose(p2[:3, 3], [0.1, 0.05, 0.7])
    # get_gt_poses returns every instance
    assert reader.get_gt_poses(0, ob_id=5).shape == (2, 4, 4)
    assert reader.get_gt_poses(0, ob_id=9).shape == (0, 4, 4)


def test_mesh_scaling_symmetries_and_diameter(ycbv_tree):
    reader = dr.YcbVideoReader(ycbv_tree)
    mesh = reader.get_gt_mesh(5)
    # 40 mm box -> 0.04 m
    np.testing.assert_allclose(
        mesh.bounds[1] - mesh.bounds[0], [0.04, 0.04, 0.04], atol=1e-6
    )
    assert abs(reader.get_model_diameter(5) - 0.06928) < 1e-6
    # continuous z-axis symmetry expands at 5 degree steps (72 rotations)
    assert len(reader.symmetry_tfs[1]) >= 72
    assert len(reader.symmetry_tfs[5]) == 1  # no symmetry -> identity only
    # YCB-V geometric overrides: cylinders and boxes get extra symmetries
    assert "symmetries_continuous" in reader.geometry_symmetry_info_table[1]
    assert "symmetries_discrete" in reader.geometry_symmetry_info_table[2]


def test_keyframes(ycbv_tree):
    reader = dr.YcbVideoReader(ycbv_tree)
    assert not reader.is_keyframe(0)
    assert reader.is_keyframe(1)


def test_linemod_occlusion_reader(tmp_path, monkeypatch):
    root = tmp_path / "bop"
    scene = root / "lmo" / "lmo_test_bop19" / "test" / "000002"
    _write_scene(str(scene), [[(1, [0.0, 0.0, 400.0], (2, 2, 8, 8))]])
    _write_models(
        str(root / "lmo" / "models"), [1, 5, 6, 8, 9, 10, 11, 12]
    )
    monkeypatch.setattr(dr, "BOP_DIR", str(root))
    reader = dr.LinemodOcclusionReader(str(scene))
    assert reader.ob_ids == [1, 5, 6, 8, 9, 10, 11, 12]
    assert reader.ob_id_to_names[9] == "duck"
    p = reader.get_gt_pose(0, ob_id=1)
    np.testing.assert_allclose(p[:3, 3], [0, 0, 0.4])
    mesh = reader.get_gt_mesh(1)
    assert len(mesh.vertices) > 0


def test_readers_without_models_info(tmp_path):
    """Readers whose models dir is absent fall back to identity symmetries."""
    scene = tmp_path / "tudl" / "test" / "000001"
    _write_scene(str(scene), [[(1, [0.0, 0.0, 300.0], (2, 2, 8, 8))]])
    reader = dr.TudlReader(str(scene))
    assert reader.ob_ids == [1, 2, 3]
    for ob_id in reader.ob_ids:
        np.testing.assert_allclose(reader.symmetry_tfs[ob_id], np.eye(4)[None])


def test_tless_gray_mesh(tmp_path):
    scene = (
        tmp_path / "tless" / "tless_test_primesense_bop19"
        / "test_primesense" / "000003"
    )
    _write_scene(str(scene), [[(1, [0.0, 0.0, 300.0], (2, 2, 8, 8))]])
    _write_models(
        str(tmp_path / "tless" / "models_cad"), list(range(1, 31)),
        with_info=False,
    )
    reader = dr.get_bop_reader(str(scene))
    assert isinstance(reader, dr.TlessReader)
    mesh = reader.get_gt_mesh(1)
    assert (mesh.vertex_colors == 200).all()
