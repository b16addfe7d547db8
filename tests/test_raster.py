import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core import meshio
from foundationpose_tpu.ops import raster
from foundationpose_tpu.ops import image as imops


K = np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]])


def cube_at(z=0.6, extent=0.1):
    mesh = meshio.make_box((extent, extent, extent))
    mesh.vertex_colors = np.full((8, 3), 127, dtype=np.uint8)
    mt = raster.make_mesh_tensors(mesh)
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, z]
    return mesh, mt, pose


def test_cube_depth_and_xyz():
    mesh, mt, pose = cube_at()
    out = raster.render_full_frame(mt, pose[None], K, (64, 64), use_light=False)
    depth = np.asarray(out["depth"][0])
    xyz = np.asarray(out["xyz"][0])
    mask = np.asarray(out["mask"][0])
    # center pixel: front face of the cube at z = 0.6 - 0.05
    assert mask[32, 32]
    np.testing.assert_allclose(depth[32, 32], 0.55, atol=1e-3)
    np.testing.assert_allclose(xyz[32, 32, 2], 0.55, atol=1e-3)
    # projected half-size in pixels: 120 * 0.05 / 0.55 = 10.9
    area = mask.sum()
    np.testing.assert_allclose(area, (2 * 120 * 0.05 / 0.55) ** 2, rtol=0.1)
    # xyz at an off-center hit pixel obeys the pinhole relation
    vs, us = np.where(mask)
    for v, u in [(vs[0], us[0]), (vs[-1], us[-1])]:
        x_expect = (u - K[0, 2]) * depth[v, u] / K[0, 0]
        np.testing.assert_allclose(xyz[v, u, 0], x_expect, atol=2e-3)
    # background zeros
    assert depth[0, 0] == 0 and not mask[0, 0]


def test_cube_color_and_lighting():
    mesh, mt, pose = cube_at()
    flat = raster.render_full_frame(mt, pose[None], K, (64, 64), use_light=False)
    rgb = np.asarray(flat["rgb"][0])
    np.testing.assert_allclose(rgb[32, 32], 127 / 255.0, atol=1e-3)
    lit = raster.render_full_frame(mt, pose[None], K, (64, 64), use_light=True)
    rgb_lit = np.asarray(lit["rgb"][0])
    # Gouraud shading (Utils.py:201-212): corner-averaged vertex normals give
    # diffuse in (0,1) on the front face -> brighter than ambient-only but
    # below the full 0.8+0.5 factor.
    base = 127 / 255.0
    assert base * 0.8 < rgb_lit[32, 32, 0] < base * 1.3 + 1e-3
    assert rgb_lit[32, 32, 0] > rgb[32, 32, 0] * 0.9
    nrm = np.asarray(lit["normal"][0])
    assert nrm[32, 32, 2] < -0.5  # facing the camera


def test_sphere_silhouette():
    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.05)
    mt = raster.make_mesh_tensors(mesh)
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.5]
    out = raster.render_full_frame(mt, pose[None], K, (64, 64), use_light=False)
    depth = np.asarray(out["depth"][0])
    mask = np.asarray(out["mask"][0])
    np.testing.assert_allclose(depth[32, 32], 0.45, atol=2e-3)
    area = mask.sum()
    r_pix = 120 * 0.05 / np.sqrt(0.5**2 - 0.05**2)  # exact sphere silhouette
    np.testing.assert_allclose(area, np.pi * r_pix**2, rtol=0.08)


def test_crop_render_matches_warped_full_frame():
    mesh, mt, pose = cube_at(z=0.7)
    rot = np.asarray(geo.euler_matrix(0.4, 0.3, 0.2))
    pose = pose @ rot
    diameter = meshio.compute_mesh_diameter(mesh=mesh)
    tf = geo.compute_crop_window_tf_batch(pose[None], K, 1.2, diameter, (48, 48))
    crop = raster.render_crops(mt, pose[None], K, tf, out_hw=(48, 48), use_light=False)
    full = raster.render_full_frame(mt, pose[None], K, (64, 64), use_light=False)
    warped = np.asarray(
        imops.warp_perspective(np.asarray(full["xyz"][0]), tf, (48, 48), mode="nearest")
    )[0]
    direct = np.asarray(crop["xyz"][0])
    both = (np.abs(warped[..., 2]) > 0) & (np.abs(direct[..., 2]) > 0)
    assert both.sum() > 100
    # interior agreement (borders differ by sampling)
    diff = np.abs(warped[both] - direct[both])
    assert np.median(diff) < 5e-3
    # masks agree to within a thin border
    mism = (np.abs(warped[..., 2]) > 0) != (np.abs(direct[..., 2]) > 0)
    assert mism.mean() < 0.12


def test_behind_camera_empty():
    mesh, mt, pose = cube_at(z=-0.5)
    out = raster.render_full_frame(mt, pose[None], K, (64, 64))
    assert not np.asarray(out["mask"][0]).any()
    assert np.isfinite(np.asarray(out["rgb"][0])).all()


def test_batched_poses():
    mesh, mt, _ = cube_at()
    poses = np.tile(np.eye(4)[None], (5, 1, 1))
    poses[:, 2, 3] = np.linspace(0.4, 0.8, 5)
    out = raster.render_full_frame(mt, poses, K, (64, 64), use_light=False)
    depth = np.asarray(out["depth"])
    assert depth.shape == (5, 64, 64)
    np.testing.assert_allclose(depth[:, 32, 32], poses[:, 2, 3] - 0.05, atol=2e-3)


def test_textured_render():
    mesh = meshio.make_box((0.1, 0.1, 0.1))
    # uv all pointing at a red texel
    mesh.uv = np.full((8, 2), 0.25)
    tex = np.zeros((8, 8, 3), dtype=np.uint8)
    tex[:, :, 0] = 255
    mesh.texture = tex
    mt = raster.make_mesh_tensors(mesh)
    assert "tex" in mt
    pose = np.eye(4)
    pose[:3, 3] = [0, 0, 0.6]
    out = raster.render_full_frame(mt, pose[None], K, (64, 64), use_light=False)
    rgb = np.asarray(out["rgb"][0])
    np.testing.assert_allclose(rgb[32, 32], [1.0, 0.0, 0.0], atol=1e-3)
