import dataclasses

import numpy as np
import pytest

import jax

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.engine.multi import MultiObjectTracker, stack_mesh_tensors
from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
from foundationpose_tpu.ops import raster
from foundationpose_tpu.utils import config as cfgmod


def test_stack_mesh_tensors_pads():
    meshes = [
        meshio.make_box((0.1, 0.1, 0.1)),
        meshio.make_icosphere_mesh(subdivisions=2, radius=0.05),
    ]
    stacked, diams, centers = stack_mesh_tensors(meshes)
    assert stacked["pos"].shape[0] == 2
    assert stacked["faces"].shape[1] >= 12
    assert stacked["pos"].shape[1] == max(8, 162)
    assert float(diams[0]) > 0.1 and float(diams[1]) > 0.09
    assert centers.shape == (2, 3)


def _zero_head_params(refiner):
    """Zero the output heads so the refiner is exactly identity."""
    import jax.numpy as jnp

    p = jax.device_get(refiner.params)
    for head in ("trans_out", "rot_out"):
        p["params"][head]["kernel"] = np.zeros_like(p["params"][head]["kernel"])
        p["params"][head]["bias"] = np.zeros_like(p["params"][head]["bias"])
    refiner.params = jax.tree.map(jnp.asarray, p)


def test_multi_object_track_runs():
    meshes = [
        meshio.make_box((0.08, 0.1, 0.06)),
        meshio.make_icosphere_mesh(subdivisions=2, radius=0.05),
    ]
    for m in meshes:
        m.vertex_colors = np.full((len(m.vertices), 3), 150, np.uint8)
    cfg = dataclasses.replace(RefinerConfig(), use_pallas=False, input_size=64)
    refiner = PoseRefiner(cfg)
    _zero_head_params(refiner)
    tracker = MultiObjectTracker(meshes, refiner=refiner)

    K = np.array([[250.0, 0, 80], [0, 250.0, 60], [0, 0, 1]])
    poses = np.tile(np.eye(4)[None], (2, 1, 1))
    poses[0, :3, 3] = [0.02, 0.0, 0.5]
    poses[1, :3, 3] = [-0.03, 0.01, 0.6]
    tracker.set_poses(poses)

    # observations: render each object in its own stream
    rgbs, depths = [], []
    for i, mesh in enumerate(meshes):
        mt = raster.make_mesh_tensors(mesh)
        out = raster.render_full_frame(mt, poses[i : i + 1].astype(np.float32), K, (120, 160))
        rgbs.append(np.asarray(out["rgb"][0]) * 255)
        depths.append(np.asarray(out["depth"][0]))
    Ks = np.stack([K, K])

    new_poses = tracker.track(np.stack(rgbs), np.stack(depths), Ks, iteration=2)
    assert new_poses.shape == (2, 4, 4)
    # identity refiner -> poses unchanged
    np.testing.assert_allclose(new_poses, poses, atol=1e-5)


def test_yaml_config_roundtrip(tmp_path):
    from foundationpose_tpu.field.runner import FieldConfig

    cfg = FieldConfig(n_step=123, n_rand=99)
    p = str(tmp_path / "cfg.yml")
    cfgmod.save_yaml(cfg, p)
    loaded = cfgmod.load_yaml(FieldConfig, p)
    assert loaded == cfg
    # overrides take precedence
    loaded2 = cfgmod.load_yaml(FieldConfig, p, overrides={"n_step": 7})
    assert loaded2.n_step == 7


def test_reference_style_field_yaml(tmp_path):
    """BundleSDF config_ycbv.yml-style keys are translated."""
    p = str(tmp_path / "ref.yml")
    with open(p, "w") as f:
        f.write(
            "n_step: 77\nN_rand: 512\nN_samples: 16\nfinest_res: 256\n"
            "trunc: 0.02\nmultires_views: 3\nunknown_key_xyz: 1\n"
        )
    cfg = cfgmod.load_field_config(p)
    assert cfg.n_step == 77
    assert cfg.n_rand == 512
    assert cfg.n_samples == 16
    assert cfg.finest_res == 256
    assert cfg.trunc == 0.02
