import numpy as np
import pytest

from foundationpose_tpu.core import geometry as geo, meshio
from foundationpose_tpu.core.icosphere import sample_views_icosphere
from foundationpose_tpu.field.texture import bake_texture, unwrap_triangle_atlas
from foundationpose_tpu.ops import raster

# compile-heavy field reconstruction: >10 min on a small CPU host (fast on TPU); the quick
# pyramid lives in the unit-test files
pytestmark = pytest.mark.slow

K = np.array([[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]])
HW = (128, 128)


def test_unwrap_triangle_atlas():
    box = meshio.make_box((0.1, 0.1, 0.1))
    un = unwrap_triangle_atlas(box, tex_res=256)
    assert len(un.faces) == len(box.faces)
    assert len(un.vertices) == 3 * len(box.faces)  # split per face
    assert un.uv.shape == (len(un.vertices), 2)
    assert un.uv.min() >= 0 and un.uv.max() <= 1
    # all triangles keep their geometry
    np.testing.assert_allclose(
        un.vertices[un.faces], box.vertices[box.faces], atol=1e-12
    )


def test_bake_texture_recovers_color():
    # colored sphere: position-coded vertex colors
    mesh = meshio.make_icosphere_mesh(subdivisions=2, radius=0.06)
    mesh.vertex_colors = (
        (mesh.vertices / 0.06 * 0.5 + 0.5) * 255
    ).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh)

    cams = sample_views_icosphere(n_views=12)
    cams[:, :3, 3] *= 0.5  # 0.5 m away
    images, masks = [], []
    for cam in cams:
        ob_in_cam = np.linalg.inv(cam)
        out = raster.render_full_frame(
            mt, ob_in_cam[None].astype(np.float32), K, HW, use_light=False
        )
        images.append(np.asarray(out["rgb"][0]) * 255)
        masks.append(np.asarray(out["mask"][0]))
    textured = bake_texture(
        mesh, np.stack(images), np.stack(masks), cams, K, tex_res=512
    )
    assert textured.texture is not None
    assert textured.uv is not None

    # re-render the textured mesh and compare against the original
    mt2 = raster.make_mesh_tensors(textured)
    assert "tex" in mt2
    cam = cams[3]
    ob_in_cam = np.linalg.inv(cam).astype(np.float32)
    ref = raster.render_full_frame(mt, ob_in_cam[None], K, HW, use_light=False)
    new = raster.render_full_frame(mt2, ob_in_cam[None], K, HW, use_light=False)
    m = np.asarray(ref["mask"][0]) & np.asarray(new["mask"][0])
    a = np.asarray(ref["rgb"][0])[m]
    b = np.asarray(new["rgb"][0])[m]
    err = np.abs(a - b).mean()
    assert err < 0.08, f"mean color error {err}"
