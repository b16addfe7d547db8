"""Texture baking: project training images onto the reconstructed mesh.

Counterpart of the reference's ``mesh_texture_from_train_images``
(bundlesdf/nerf_runner.py:1122-1232), redesigned around this framework's own
rasterizer instead of pyrender + trimesh.proximity + the CUDA uv kernel
(common.cu rayColorToTextureImageCUDA :187-253):

1. UV atlas: xatlas-style unwrapping is replaced by a per-triangle atlas —
   triangle pairs packed into square cells of a regular grid (vertices are
   split per-face so uvs are face-varying).
2. Visibility: render the mesh from every (optimized) camera with
   ``ops.raster``; each hit pixel yields the face id + perspective-correct
   barycentrics directly — no closest-point queries.
3. Blending: scatter-accumulate ``color * cos(incidence)^4`` into the atlas
   (the cosine-power weighting replaces the reference's discrete top-4-view
   selection per triangle :1151-1179), normalize, nearest-fill empty texels
   (:1225-1229).
"""

from __future__ import annotations

import logging
import math

import numpy as np

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core.meshio import Mesh, compute_face_normals
from foundationpose_tpu.ops import raster


def unwrap_triangle_atlas(mesh: Mesh, tex_res=1024, inset=1.5):
    """Split vertices per-face and assign each triangle a half-cell of a
    regular grid atlas. Returns a new Mesh with per-vertex uv in [0,1]."""
    F = len(mesh.faces)
    cells = (F + 1) // 2
    grid = int(math.ceil(math.sqrt(cells)))
    cell = tex_res / grid

    verts = mesh.vertices[mesh.faces].reshape(-1, 3)  # (F*3,3)
    faces = np.arange(F * 3, dtype=np.int32).reshape(-1, 3)
    uv = np.zeros((F * 3, 2))
    for f in range(F):
        c = f // 2
        gx, gy = c % grid, c // grid
        x0, y0 = gx * cell, gy * cell
        if f % 2 == 0:  # lower-left triangle of the cell
            corners = np.array(
                [[x0 + inset, y0 + inset],
                 [x0 + cell - 2 * inset, y0 + inset],
                 [x0 + inset, y0 + cell - 2 * inset]]
            )
        else:  # upper-right
            corners = np.array(
                [[x0 + cell - inset, y0 + cell - inset],
                 [x0 + 2 * inset, y0 + cell - inset],
                 [x0 + cell - inset, y0 + 2 * inset]]
            )
        uv[3 * f : 3 * f + 3] = corners / tex_res
    out = Mesh(verts, faces)
    # uv here is in image coords with v increasing downward (texture ROW) —
    # store flipped so Mesh.uv keeps the OBJ bottom-left convention
    out.uv = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=-1)
    return out


def bake_texture(mesh: Mesh, images, masks, cam_in_obs, K, tex_res=1024,
                 depth_tol=0.01, cos_power=4.0, min_cos=0.2):
    """Bake ``images`` (N,H,W,3 in [0,1] or [0,255]) seen from ``cam_in_obs``
    (N,4,4) onto ``mesh`` (object frame). Returns a new unwrapped Mesh with
    ``texture`` filled.
    """
    images = np.asarray(images, dtype=np.float64)
    if images.max() <= 1.0 + 1e-6:
        images = images * 255.0
    H, W = images.shape[1:3]
    un = unwrap_triangle_atlas(mesh, tex_res=tex_res)
    mt = raster.make_mesh_tensors(un)
    # face-corner uv in texture-image ROW coords
    uv_img = np.stack([un.uv[:, 0], 1.0 - un.uv[:, 1]], axis=-1) * tex_res
    face_uv = uv_img[un.faces]  # (F,3,2)
    fnormals = compute_face_normals(un.vertices, un.faces)
    fnormals = fnormals / np.maximum(
        np.linalg.norm(fnormals, axis=-1, keepdims=True), 1e-12
    )

    acc = np.zeros((tex_res, tex_res, 3))
    wacc = np.zeros((tex_res, tex_res))

    for i in range(len(images)):
        ob_in_cam = np.linalg.inv(cam_in_obs[i])
        out = raster.render_full_frame(
            mt, ob_in_cam[None].astype(np.float32), K, (H, W), use_light=False
        )
        tri = np.asarray(out["tri"][0])
        bary = np.asarray(out["bary"][0])
        mask_r = np.asarray(out["mask"][0])
        valid = mask_r & (np.asarray(masks[i]) > 0)
        vs, us = np.nonzero(valid)
        if len(vs) == 0:
            continue
        t = tri[vs, us]
        b = bary[vs, us]  # (P,3)
        uv = np.einsum("pk,pkj->pj", b, face_uv[t])  # (P,2) texture coords
        # incidence weighting: normal vs ray direction in cam frame
        n_cam = fnormals[t] @ ob_in_cam[:3, :3].T
        xyz = np.asarray(out["xyz"][0])[vs, us]
        ray = xyz / np.maximum(np.linalg.norm(xyz, axis=-1, keepdims=True), 1e-12)
        cosv = np.clip((n_cam * -ray).sum(-1), 0.0, 1.0)
        w = np.where(cosv > min_cos, cosv**cos_power, 0.0)
        colors = images[i][vs, us]

        xi = np.clip(np.round(uv[:, 0]).astype(np.int64), 0, tex_res - 1)
        yi = np.clip(np.round(uv[:, 1]).astype(np.int64), 0, tex_res - 1)
        np.add.at(acc, (yi, xi), colors * w[:, None])
        np.add.at(wacc, (yi, xi), w)

    filled = wacc > 1e-8
    tex = np.zeros((tex_res, tex_res, 3), np.float64)
    tex[filled] = acc[filled] / wacc[filled][:, None]
    tex = nearest_fill(tex, filled)
    un.texture = np.clip(tex, 0, 255).astype(np.uint8)
    logging.info("baked texture: %.1f%% texels observed", 100.0 * filled.mean())
    return un


def nearest_fill(tex, filled):
    """Fill unobserved texels from the nearest observed one (replaces the
    reference's scipy griddata nearest interpolation, Utils.py:886-900)."""
    if filled.all() or not filled.any():
        return tex
    from scipy import ndimage

    idx = ndimage.distance_transform_edt(
        ~filled, return_distances=False, return_indices=True
    )
    return tex[idx[0], idx[1]]
