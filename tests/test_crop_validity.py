"""Regression tests for crop-batch validity and texture precision on the
bf16 (TPU/Pallas) path.

Round-4 advisor finding (high): with ``use_pallas=True`` the observed-side
crop warp runs in bf16 on xyz centered at the mean hypothesis translation,
so invalid (xyz=0) source pixels round-trip to z = c_bar.z's bf16 rounding
error — up to ~2 mm — and a ``z > 0.001`` re-threshold classifies them as
VALID. The fix: ``make_crop_batch`` returns the exactly-warped 0/1 validity
channel (``validB``) and the ICP/scorer consume it instead of re-thresholding.
"""

import functools

import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.engine import crop as crop_mod
from foundationpose_tpu.ops import raster

K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])
HW = (120, 160)


def _scene(z0=0.83):
    """Mesh + pose + full-frame observed rgb/xyz with DELIBERATE depth holes
    inside the object's crop window."""
    mesh = meshio.make_box((0.1, 0.08, 0.06))
    mesh.vertex_colors = np.full((len(mesh.vertices), 3), 150, np.uint8)
    mt = raster.make_mesh_tensors(mesh)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(geo.euler_matrix(0.4, 0.3, 0.2))[:3, :3]
    pose[:3, 3] = [0.01, -0.02, z0]

    out = raster.render_full_frame(mt, pose[None], K, HW)
    depth = np.asarray(out["depth"][0])
    rgb = np.asarray(out["rgb"][0]) * 255.0
    # punch holes: stripes of invalid depth across the object
    holes = np.zeros(HW, bool)
    holes[::7] = True
    depth = np.where(holes, 0.0, depth)
    xyz = np.asarray(geo.depth2xyzmap(depth, K))
    xyz = np.where((depth > 0)[..., None], xyz, 0.0)
    diameter = meshio.compute_mesh_diameter(mesh=mesh)
    return mt, pose, rgb.astype(np.float32), xyz.astype(np.float32), diameter


@pytest.fixture()
def interpret_pallas(monkeypatch):
    """Route make_crop_batch's pallas renderer through interpret mode (CPU)."""
    from foundationpose_tpu.ops import raster_pallas

    orig = raster_pallas.render_crops_pallas
    monkeypatch.setattr(
        raster_pallas, "render_crops_pallas",
        functools.partial(orig, interpret=True),
    )


def test_bf16_validB_is_exact(interpret_pallas):
    """The returned validB channel must equal the true source validity —
    while a z re-threshold on the bf16-warped xyz provably does not."""
    mt, pose, rgb, xyz, diameter = _scene()
    poses = np.tile(pose[None], (2, 1, 1))

    data = crop_mod.make_crop_batch(
        mt, poses, K, rgb, xyz, diameter, out_size=64,
        normalize_xyz=False, use_normal=True, use_pallas=True,
    )
    ref = crop_mod.make_crop_batch(
        mt, poses, K, rgb, xyz, diameter, out_size=64,
        normalize_xyz=False, use_normal=True, use_pallas=False,
    )
    vB = np.asarray(data["validB"])[..., 0]
    vB_ref = np.asarray(ref["validB"])[..., 0]
    assert (vB == vB_ref).all(), "bf16-path validB differs from f32 path"
    # there are both valid and invalid pixels inside the crop
    assert vB.any() and (~vB).any()

    # the failure mode this guards: re-thresholding warped z classifies the
    # hole pixels by bf16 rounding luck. Centered z at invalid pixels is
    # -c_bar.z + bf16 error, so after un-centering z ~= rounding error; the
    # documented case (z0=0.83) rounds POSITIVE and passes z > 0.001.
    t = poses[:, 2, 3][:, None, None]
    zB = np.asarray(data["inputB"][..., 5]) + t
    rethresh = zB > 0.001
    leaked = rethresh & ~vB_ref
    assert leaked.any(), (
        "expected the z re-threshold to misclassify bf16-rounded invalid "
        "pixels (the advisor's repro); if this stops reproducing, the warp "
        "path changed and this test needs a new anchor z"
    )


def test_textured_crop_keeps_f32_uv(monkeypatch):
    """Textured meshes must keep the f32 kernel output: the plane-form
    kernel emits the uv NUMERATOR in the output dtype, so bf16 re-rounds uv
    to ~2^-9 relative — multiple texels on a 2K texture. Assert the
    mechanism (out_bf16 is forced off when a texture is present) and a
    coarse numeric bound on a ramp texture."""
    from foundationpose_tpu.ops import raster_pallas

    seen = {}
    orig = raster_pallas.render_crops_pallas

    def spy(*args, **kw):
        seen["out_bf16"] = kw.get("out_bf16")
        return orig(*args, interpret=True, **kw)

    monkeypatch.setattr(raster_pallas, "render_crops_pallas", spy)

    mesh = meshio.make_box((0.1, 0.08, 0.06))
    n = 512
    ramp = np.linspace(0, 255, n).astype(np.uint8)
    tex = np.stack(np.broadcast_arrays(
        ramp[:, None], ramp[None, :], np.full((n, n), 128, np.uint8)
    ), axis=-1)
    mesh.uv = np.clip(mesh.vertices[:, :2] * 4 + 0.5, 0, 1)
    mesh.texture = np.ascontiguousarray(tex)
    mt = raster.make_mesh_tensors(mesh)
    assert "tex" in mt

    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.asarray(geo.euler_matrix(0.3, 0.2, 0.1))[:3, :3]
    pose[:3, 3] = [0.0, 0.0, 0.6]
    poses = pose[None]
    diameter = meshio.compute_mesh_diameter(mesh=mesh)
    rgb = np.zeros((*HW, 3), np.float32)
    xyz = np.zeros((*HW, 3), np.float32)

    fast = crop_mod.make_crop_batch(
        mt, poses, K, rgb, xyz, diameter, out_size=64, use_pallas=True,
    )
    assert seen["out_bf16"] is False, (
        "textured mesh must not use the bf16 kernel output path"
    )
    ref = crop_mod.make_crop_batch(
        mt, poses, K, rgb, xyz, diameter, out_size=64, use_pallas=False,
    )
    m = np.asarray(fast["mask"]) & np.asarray(ref["mask"])
    a = np.asarray(fast["rgbA"])[m]
    b = np.asarray(ref["rgbA"])[m]
    # ramp texture: rgb error ~ uv error; f32 output keeps it to the bf16
    # fetch-table floor (<1%), bf16 output would add texel-scale error
    assert np.abs(a - b).max() < 0.02, f"max diff {np.abs(a - b).max()}"


def test_face_cap_validation():
    """EstimatorConfig.max_render_faces beyond the Pallas packed-window
    budget must fail at construction, not deep in the kernel."""
    from foundationpose_tpu.engine.estimator import (
        EstimatorConfig, FoundationPoseTPU,
    )
    from foundationpose_tpu.ops import raster_pallas as rp

    cap = rp.FC * (1 << (rp.PACK_BITS - 7))
    mesh = meshio.make_box((0.1, 0.1, 0.1))
    mesh.vertex_colors = np.full((len(mesh.vertices), 3), 128, np.uint8)
    with pytest.raises(ValueError, match="packed-window budget"):
        FoundationPoseTPU(
            mesh, config=EstimatorConfig(max_render_faces=cap + 128)
        )
