"""Pallas rasterizer vs the XLA reference implementation (interpret mode)."""

import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.ops import raster
from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

K = np.array([[200.0, 0, 32], [0, 200.0, 32], [0, 0, 1]])


def _compare(mesh, poses, out_hw=(64, 64), use_light=True, atol=None):
    # per-channel tolerances: the pallas fetch table is bf16-quantized, which
    # costs ~0.4% on rgb/normals (below the 1/255 color quantum) but keeps
    # depth/xyz at sub-mm precision via pose-centered storage
    atol = atol or {"depth": 2e-3, "xyz": 2e-3, "rgb": 6e-3, "normal": 9e-3}
    mt = raster.make_mesh_tensors(mesh)
    tfs = np.tile(np.eye(3)[None], (len(poses), 1, 1)).astype(np.float32)
    ref = raster.render_crops(
        mt, poses, K, tfs, out_hw=out_hw, use_light=use_light
    )
    fast = render_crops_pallas(
        mt, poses, K, tfs, out_hw=out_hw, use_light=use_light,
        interpret=True, tile_rows=8,
    )
    mref = np.asarray(ref["mask"])
    mfast = np.asarray(fast["mask"])
    # masks identical
    assert (mref == mfast).mean() > 0.999
    both = mref & mfast
    for k in ("depth", "xyz", "rgb", "normal"):
        a = np.asarray(ref[k])[both]
        b = np.asarray(fast[k])[both]
        tol = atol[k] if isinstance(atol, dict) else atol
        assert np.abs(a - b).max() < tol, f"{k}: max diff {np.abs(a-b).max()}"


def test_pallas_matches_xla_cube():
    mesh = meshio.make_box((0.1, 0.1, 0.1))
    mesh.vertex_colors = np.random.default_rng(0).integers(
        0, 255, (8, 3)
    ).astype(np.uint8)
    pose = np.eye(4)
    pose[:3, :3] = np.asarray(geo.euler_matrix(0.3, 0.5, 0.2))[:3, :3]
    pose[:3, 3] = [0.01, -0.01, 0.5]
    _compare(mesh, pose[None].astype(np.float32))


def test_pallas_matches_xla_sphere_batch():
    mesh = meshio.make_icosphere_mesh(subdivisions=2, radius=0.05)
    mesh.vertex_colors = (np.abs(mesh.vertices) / 0.05 * 255).astype(np.uint8)
    poses = np.tile(np.eye(4)[None], (3, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = [0.4, 0.5, 0.6]
    poses[1, :3, :3] = np.asarray(geo.euler_matrix(0.2, 0.1, 0.9))[:3, :3]
    _compare(mesh, poses)


def test_pallas_textured():
    mesh = meshio.make_box((0.1, 0.1, 0.1))
    mesh.uv = np.random.default_rng(1).uniform(0.1, 0.9, (8, 2))
    tex = np.zeros((16, 16, 3), np.uint8)
    tex[:, :8, 0] = 255
    tex[:, 8:, 1] = 255
    mesh.texture = tex
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.5]
    _compare(mesh, pose[None].astype(np.float32), use_light=False, atol=5e-3)


def test_pallas_compact_profile_matches_xla():
    """with_normal=False on a vertex-color mesh selects the compact kernel
    (8-wide rows, in-kernel lighting): rgb/depth/xyz/mask must still match
    the XLA reference; the normal output is intentionally dropped."""
    mesh = meshio.make_icosphere_mesh(subdivisions=2, radius=0.05)
    mesh.vertex_colors = (np.abs(mesh.vertices) / 0.05 * 255).astype(np.uint8)
    poses = np.tile(np.eye(4)[None], (2, 1, 1)).astype(np.float32)
    poses[:, 2, 3] = [0.4, 0.55]
    poses[1, :3, :3] = np.asarray(geo.euler_matrix(0.2, 0.1, 0.9))[:3, :3]
    mt = raster.make_mesh_tensors(mesh)
    tfs = np.tile(np.eye(3)[None], (2, 1, 1)).astype(np.float32)
    ref = raster.render_crops(mt, poses, K, tfs, out_hw=(64, 64))
    fast = render_crops_pallas(
        mt, poses, K, tfs, out_hw=(64, 64), interpret=True, tile_rows=8,
        with_normal=False,
    )
    assert "normal" not in fast
    mref = np.asarray(ref["mask"])
    mfast = np.asarray(fast["mask"])
    assert (mref == mfast).mean() > 0.999
    both = mref & mfast
    for k, tol in (("depth", 2e-3), ("xyz", 2e-3), ("rgb", 6e-3)):
        a = np.asarray(ref[k])[both]
        b = np.asarray(fast[k])[both]
        assert np.abs(a - b).max() < tol, f"{k}: max diff {np.abs(a-b).max()}"


def test_pallas_empty_when_behind():
    mesh = meshio.make_box((0.1, 0.1, 0.1))
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, -0.5]
    mt = raster.make_mesh_tensors(mesh)
    tfs = np.eye(3)[None].astype(np.float32)
    out = render_crops_pallas(
        mt, pose[None].astype(np.float32), K, tfs, out_hw=(64, 64),
        interpret=True, tile_rows=8,
    )
    assert not np.asarray(out["mask"]).any()
    assert np.isfinite(np.asarray(out["rgb"])).all()


def test_backface_cull_matches_for_closed_mesh():
    mesh = meshio.make_icosphere_mesh(subdivisions=2, radius=0.05)
    mesh.vertex_colors = (np.abs(mesh.vertices) / 0.05 * 255).astype(np.uint8)
    assert meshio.is_watertight(mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(geo.euler_matrix(0.4, -0.2, 0.7))[:3, :3]
    pose[2, 3] = 0.5
    mt = raster.make_mesh_tensors(mesh)
    tfs = np.eye(3, dtype=np.float32)[None]
    a = render_crops_pallas(mt, pose[None], K, tfs, out_hw=(64, 64),
                            interpret=True, backface_cull=False)
    b = render_crops_pallas(mt, pose[None], K, tfs, out_hw=(64, 64),
                            interpret=True, backface_cull=True)
    assert (np.asarray(a["mask"]) == np.asarray(b["mask"])).all()
    np.testing.assert_allclose(
        np.asarray(a["depth"]), np.asarray(b["depth"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["rgb"]), np.asarray(b["rgb"]), atol=1e-5
    )
