"""Pallas TPU rasterizer — the hot-path renderer for hypothesis crops.

Same math as ops/raster.py (the XLA reference implementation, kept for CPU
tests and for paths that need tri/bary outputs), restructured so the
pixel x face work never leaves VMEM:

- grid (pose, pixel-tile); the per-pose face tables (barycentric coefficient
  matrix, per-corner 1/z, per-corner attributes) are VMEM-resident blocks;
- per face-chunk: the three barycentric components for a whole pixel tile are
  three (Pt,3) @ (3,Fc) MXU matmuls; inside-test + running z-argmax on the
  VPU (structure-of-arrays — Mosaic has no cheap lane regrouping, so nothing
  is ever reshaped);
- the winning face's per-corner attributes are selected with one-hot
  (Pt,Fc) @ (Fc,A) MXU matmuls — no gathers anywhere;
- perspective-correct interpolation from the carried corner attributes after
  the loop.

Replaces the reference's nvdiffrast CUDA rasterizer (consumed at
src/Utils.py:133-219) for the refine/score render path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foundationpose_tpu.ops.raster import _bary_coeffs, _signed_area2, ZNEAR

# attribute layout per face corner (A_DIM columns):
# 0: 1/z   1-3: xyz_cam   4-6: normal_cam   7-9: rgb (or uv,pad)   10: diffuse
A_DIM = 16  # padded for lane alignment of slices
FC = 128  # face chunk (lane dimension of the bary matmuls)


def _raster_kernel(pix_ref, coeff_ref, invz_ref, attr_ref, active_ref, out_ref):
    """One (pose, pixel-tile) cell.

    pix_ref:    (Pt, 3)            pixel homogeneous coords
    coeff_ref:  (1, 9, F)          rows 3k..3k+2 = coeff rows of bary comp k
    invz_ref:   (1, 3, F)          per-corner 1/z
    attr_ref:   (1, 3, F, A_DIM)   per-corner attributes
    active_ref: (1, T, Cp)         face-chunk x tile overlap (culling mask)
    out_ref:    (1, Pt, A_DIM)     interpolated attrs; col 11 = hit mask
    """
    Pt = pix_ref.shape[0]
    F = coeff_ref.shape[2]
    n_chunks = F // FC
    tile = pl.program_id(1)

    px = pix_ref[:, 0:1]  # (Pt,1)
    py = pix_ref[:, 1:2]

    def body(c, carry):
        # tile culling: skip chunks whose faces' y-extent misses this tile
        return jax.lax.cond(
            active_ref[0, tile, c] != 0,
            lambda cy: _chunk_step(c, cy),
            lambda cy: cy,
            carry,
        )

    def _chunk_step(c, carry):
        best_score, bary, attrs = carry
        ds = pl.ds(c * FC, FC)
        # exact-f32 barycentrics on the VPU (bary decides visibility and
        # sub-pixel interpolation; bf16 MXU passes cost ~1 cm depth error)
        w = [
            px * coeff_ref[0, 3 * k : 3 * k + 1, ds]
            + py * coeff_ref[0, 3 * k + 1 : 3 * k + 2, ds]
            + coeff_ref[0, 3 * k + 2 : 3 * k + 3, ds]
            for k in range(3)
        ]  # 3 x (Pt,FC)
        inside = (w[0] >= -1e-6) & (w[1] >= -1e-6) & (w[2] >= -1e-6)
        pix_invz = (
            w[0] * invz_ref[0, 0:1, ds]
            + w[1] * invz_ref[0, 1:2, ds]
            + w[2] * invz_ref[0, 2:3, ds]
        )
        score = jnp.where(inside, pix_invz, -1.0)

        c_best = jnp.max(score, axis=-1, keepdims=True)  # (Pt,1)
        c_idx = jnp.argmax(score, axis=-1, keepdims=True)  # (Pt,1)
        improved = c_best > best_score

        iota_f = jax.lax.broadcasted_iota(jnp.int32, (Pt, FC), 1)
        onehot = ((iota_f == c_idx) & improved).astype(jnp.float32)

        new_bary = [
            jnp.where(improved, jnp.sum(onehot * w[k], axis=-1, keepdims=True), bary[k])
            for k in range(3)
        ]
        new_attrs = [
            jnp.where(
                improved,
                jnp.dot(onehot, attr_ref[0, k, ds, :],
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST),
                attrs[k],
            )
            for k in range(3)
        ]
        best_score = jnp.where(improved, c_best, best_score)
        return best_score, tuple(new_bary), tuple(new_attrs)

    init = (
        jnp.full((Pt, 1), -1.0, jnp.float32),
        tuple(jnp.zeros((Pt, 1), jnp.float32) for _ in range(3)),
        tuple(jnp.zeros((Pt, A_DIM), jnp.float32) for _ in range(3)),
    )
    best_score, bary, attrs = jax.lax.fori_loop(0, n_chunks, body, init)

    hit = best_score > 0.0  # (Pt,1)
    pw = [bary[k] * attrs[k][:, 0:1] for k in range(3)]  # (Pt,1) x3
    s = jnp.maximum(pw[0] + pw[1] + pw[2], 1e-12)
    interp = (pw[0] * attrs[0] + pw[1] * attrs[1] + pw[2] * attrs[2]) / s
    interp = jnp.where(hit, interp, 0.0)
    # stash the hit mask in padding column 11 (unused by the attribute layout)
    mask_col = jax.lax.broadcasted_iota(jnp.int32, (Pt, A_DIM), 1) == 11
    interp = jnp.where(mask_col, hit.astype(jnp.float32), interp)
    out_ref[0, :, :] = interp


@functools.partial(
    jax.jit,
    static_argnames=("out_hw", "use_light", "interpret", "tile_rows"),
)
def render_crops_pallas(
    mesh_tensors,
    poses,
    K,
    crop_tfs,
    out_hw=(160, 160),
    use_light=True,
    w_ambient=0.8,
    w_diffuse=0.5,
    light_dir=(0.0, 0.0, 1.0),
    interpret=False,
    tile_rows=8,
):
    """Pallas fast path: same contract as ops.raster.render_crops minus the
    tri/bary debug outputs. Vertex-color and textured meshes supported (uv
    interpolated in-kernel, texture sampled outside). Pixel tiles are bands of
    ``tile_rows`` rows so face chunks can be culled against a tile's y-range."""
    H, W = out_hw
    poses = jnp.asarray(poses, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    B = poses.shape[0]
    crop_tfs = jnp.asarray(crop_tfs, jnp.float32)

    verts = mesh_tensors["pos"]
    faces = mesh_tensors["faces"]
    vnormals = mesh_tensors["vnormals"]
    has_tex = "tex" in mesh_tensors
    F = faces.shape[0]
    Fp = ((F + FC - 1) // FC) * FC
    if Fp != F:
        faces = jnp.concatenate(
            [faces, jnp.zeros((Fp - F, 3), faces.dtype)], axis=0
        )
    light = jnp.asarray(light_dir, jnp.float32)
    light = light / jnp.maximum(jnp.linalg.norm(light), 1e-12)

    # ---- per-pose face tables (XLA prep; all fused elementwise/matmul) ----
    def prep(pose, crop_tf):
        R, t = pose[:3, :3], pose[:3, 3]
        v_cam = verts @ R.T + t
        z = v_cam[:, 2]
        uvw = v_cam @ K.T
        uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-12)
        uv_crop = uv @ crop_tf[:2, :2].T + crop_tf[:2, 2]
        tri_xy = uv_crop[faces]  # (Fp,3,2)
        tri_z = z[faces]
        det = _signed_area2(tri_xy)
        coeff = _bary_coeffs(tri_xy, det)  # (Fp,3,3) [row: px,py,1][col: w_k]
        valid = (jnp.abs(det) > 1e-12) & (tri_z > ZNEAR).all(axis=-1)
        if F != Fp:
            valid = valid & (jnp.arange(Fp) < F)
        # invalid faces can never win: constant row -> -1e9
        coeff = jnp.where(valid[:, None, None], coeff, 0.0)
        coeff = coeff.at[:, 2, :].set(
            jnp.where(valid[:, None], coeff[:, 2, :], -1e9)
        )
        # (9, Fp): rows 3k..3k+2 are (px,py,1) coefficients of bary comp k
        coeffT = coeff.transpose(2, 1, 0).reshape(9, Fp)
        invz = (1.0 / jnp.maximum(tri_z, ZNEAR)).T  # (3, Fp)

        n_cam = vnormals @ R.T
        diffuse = jnp.clip(jnp.sum(n_cam * (-light)[None], axis=-1), 0.0, 1.0)
        if has_tex:
            col_or_uv = jnp.concatenate(
                [mesh_tensors["uv"], jnp.zeros((verts.shape[0], 1))], axis=-1
            )
        else:
            col_or_uv = mesh_tensors["vertex_color"]
        vert_attr = jnp.concatenate(
            [
                jnp.zeros((verts.shape[0], 1)),  # invz placeholder (per corner)
                v_cam,
                n_cam,
                col_or_uv,
                diffuse[:, None],
                jnp.zeros((verts.shape[0], A_DIM - 11)),  # pad (col 11 = mask)
            ],
            axis=-1,
        )  # (V, A_DIM)
        attr = vert_attr[faces]  # (Fp,3,A_DIM)
        attr = attr.at[:, :, 0].set(1.0 / jnp.maximum(tri_z, ZNEAR))
        attr = attr.transpose(1, 0, 2)  # (3, Fp, A_DIM)

        # per-face y-extent for tile culling (invalid faces never overlap)
        y = tri_xy[..., 1]  # (Fp,3)
        ymin = jnp.where(valid, y.min(axis=-1), jnp.inf)
        ymax = jnp.where(valid, y.max(axis=-1), -jnp.inf)
        return coeffT, invz, attr, ymin, ymax

    coeffT, invz, attr, ymin, ymax = jax.vmap(prep)(poses, crop_tfs)

    # ---- pixel grid: row bands of tile_rows rows ----
    P = H * W
    Pt = tile_rows * W
    Hp = ((H + tile_rows - 1) // tile_rows) * tile_rows
    Pp = Hp * W
    jj, ii = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32), jnp.arange(Hp, dtype=jnp.float32)
    )
    pix = jnp.stack(
        [jj.reshape(-1), ii.reshape(-1), jnp.ones(Pp, jnp.float32)], axis=-1
    )
    n_tiles = Pp // Pt

    # chunk-vs-tile overlap: does any face in the chunk span this row band?
    C = Fp // FC
    cy_min = ymin.reshape(B, C, FC).min(axis=-1)  # (B,C)
    cy_max = ymax.reshape(B, C, FC).max(axis=-1)
    r0 = jnp.arange(n_tiles, dtype=jnp.float32) * tile_rows - 1.0
    r1 = r0 + tile_rows + 2.0
    active = (
        (cy_min[:, None, :] <= r1[None, :, None])
        & (cy_max[:, None, :] >= r0[None, :, None])
    ).astype(jnp.int32)  # (B, T, C)
    # pad the chunk axis to the 128-lane tile so the block is aligned
    Cp = ((C + 127) // 128) * 128
    if Cp != C:
        active = jnp.concatenate(
            [active, jnp.zeros((B, n_tiles, Cp - C), jnp.int32)], axis=-1
        )

    out = pl.pallas_call(
        _raster_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((Pt, 3), lambda b, t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, Fp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Fp), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, Fp, A_DIM), lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            # SMEM: the culling bitmap is read one scalar at a time with a
            # dynamic chunk index, which VMEM lane addressing cannot do
            pl.BlockSpec((1, n_tiles, Cp), lambda b, t: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Pt, A_DIM), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Pp, A_DIM), jnp.float32),
        interpret=interpret,
        **(
            {}
            if interpret
            else {
                "compiler_params": pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                )
            }
        ),
    )(pix, coeffT, invz, attr, active)

    out = out[:, :P].reshape(B, H, W, A_DIM)
    xyz = out[..., 1:4]
    normal = out[..., 4:7]
    mask = out[..., 11] > 0.5
    depth = out[..., 3] * mask
    if has_tex:
        from foundationpose_tpu.ops.raster import _sample_texture

        uvt = out[..., 7:9].reshape(-1, 2)
        color = _sample_texture(mesh_tensors["tex"], uvt).reshape(B, H, W, 3)
    else:
        color = out[..., 7:10]
    if use_light:
        diffuse = out[..., 10:11]
        color = color * w_ambient + diffuse * color * w_diffuse
    color = jnp.clip(color, 0.0, 1.0) * mask[..., None]
    nrm = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
    )
    return {
        "rgb": color,
        "depth": depth,
        "xyz": xyz * mask[..., None],
        "normal": nrm * mask[..., None],
        "mask": mask,
    }
