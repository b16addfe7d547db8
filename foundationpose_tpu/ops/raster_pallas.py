"""Pallas TPU rasterizer — the hot-path renderer for hypothesis crops.

Same math as ops/raster.py (the XLA reference implementation, kept for CPU
tests and for paths that need tri/bary outputs), restructured so the
pixel x face work never leaves VMEM and the inner loop touches each
pixel x face pair with the minimum possible VPU work:

- grid: ONE cell per pose; the kernel loops over 2-row pixel bands
  internally with per-band chunk ranges from SMEM, deriving pixel
  coordinates from iota; per-pose face tables are VMEM-resident blocks;
- faces are SORTED by their crop-space y-extent at prep time (invalid /
  culled faces to the end), so the per-(band, face-chunk) overlap range
  actually culls, and bands overlapping no face skip all work and write
  zeros;
- pass 1 (z-test) carries ONE packed int32 per (pixel, lane): the f32
  inverse-depth score with the lane id and window index packed into its 12
  low mantissa bits, so the per-window update is a single integer max and
  the winner extraction one cross-lane max;
- pass 2 fetches the winner's table row with a one-hot (Pt,128) @ (128,T)
  bf16 MXU matmul over the active chunk(s) — exact, because a 0/1 one-hot
  times a bf16 table reproduces the stored row bit-for-bit;
- interpolation is PLANE-FORM: perspective-correct interpolation of any
  vertex attribute is numerator(px,py) / denominator(px,py) with BOTH
  affine in pixel coords, so prep bakes each face's per-channel numerator
  planes (A, B, C) and the kernel evaluates
      value = (dx*A + dy*B + C_hi + C_lo) * (1 / denominator)
  where the denominator (sum_k w_k * invz_k) is exactly the pass-1 score,
  recovered by UNPACKING the winner's packed int32 (the 12 clobbered
  mantissa bits cost 2^-11 relative — invisible against bf16 tables).
  This removes the per-corner barycentric reconstruction chain (a dozen
  (Pt,1)-shaped VPU ops per band) entirely.
- numerator planes are anchored at the face centroid (dx = px - x0 is
  O(face size)) and C is stored as a bf16 hi + bf16 residual pair, so the
  bf16 table costs ~2^-16 relative on the anchor value and ~0.4% of the
  within-face variation — sub-mm xyz, sub-quantum rgb.

The crop path (make_crop_batch) opts out of the normal-image channels
(``with_normal=False``: 8-wide output rows, T=40 tables) and can write the
kernel output in bfloat16 (``out_bf16=True``) — the output stream is one of
the larger DMAs and the values are bf16-precision anyway.

Optional backface culling (valid for closed, consistently CCW-wound meshes
— the estimator enables it automatically for watertight meshes) removes
~half the face chunks before they are ever touched.

Replaces the reference's nvdiffrast CUDA rasterizer (consumed at
src/Utils.py:133-219) for the refine/score render path.

NOTE on benchmarking this file: poses/tfs must be TRACED ARGUMENTS of the
timed jit. With them closed over as constants XLA constant-folds the whole
program — pallas call included — and every variant measures the same ~20 ms
(this produced bogus tuning numbers in round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foundationpose_tpu.ops.raster import _bary_coeffs, _signed_area2, ZNEAR

FC = 128      # face chunk (lane dimension of the chunk loop)
PACK_BITS = 12  # low mantissa bits of the packed score: 7 lane + 5 window


def _make_raster_kernel(Pt, N8, T, out_dtype=jnp.float32, W=160, tile_rows=2,
                        n_tiles=80, n_out=16, n_ch=7, variant=None):
    """Kernel factory. ``N8``: channel-block width inside the fetch table
    (A/B/C_hi/C_lo each N8 lanes, 8-aligned); ``T = 8 + 4*N8``: table row
    width; ``n_out``: output row width holding ``n_ch`` numerator channels,
    the denominator, the hit mask, and lane padding."""

    def kernel(coeff_ref, table_ref, ranges_ref, out_ref):
        """One pose.

        coeff_ref:  (1, 9, F) f32      rows 0-2/3-5: affine coeffs [a,b,c] of
                                       barycentrics w0/w1 (w2 = 1 - w0 - w1:
                                       the coeffs are det-normalized so they
                                       partition unity); rows 6-8: the
                                       inverse-depth screen plane [pa,pb,pc]
                                       (1/z is affine in pixel coords, so the
                                       z-test needs no per-corner invz at all)
        table_ref:  (1, F, T) bf16     fetch rows (sorted face order):
                                       [x0,y0,pad(6), A(N8), B(N8),
                                        C_hi(N8), C_lo(N8)]
        ranges_ref: (1, Tn, 2) SMEM    [lo, hi) face-chunk range per band
                                       (faces are y-sorted, so the overlapping
                                       chunks are a contiguous run — dynamic
                                       loop bounds replace a per-chunk
                                       lax.cond)
        out_ref:    (1, Pp, n_out)     plane-form interpolated channels +
                                       hit mask in the last column
        """
        # static per-band pixel pattern: pixel i of a band is at
        # (x = i % W, y = band*tile_rows + i // W)
        flat = jax.lax.broadcasted_iota(jnp.int32, (Pt, 1), 0)
        px0 = jnp.mod(flat, W).astype(jnp.float32)
        py0 = (flat // W).astype(jnp.float32)

        def band_body(tile, _):
            f_lo = ranges_ref[0, tile, 0]
            f_hi = ranges_ref[0, tile, 1]

            # bands whose rows overlap no face write zeros and skip both
            # passes + the interpolation epilogue entirely
            @pl.when(f_hi <= f_lo)
            def _():
                out_ref[0, pl.ds(tile * Pt, Pt), :] = jnp.zeros(
                    (Pt, n_out), out_dtype
                )

            @pl.when(f_hi > f_lo)
            def _():
                _raster_band(
                    coeff_ref, table_ref, out_ref, tile, f_lo, f_hi,
                    px0, py0 + tile.astype(jnp.float32) * float(tile_rows),
                )

            return 0

        jax.lax.fori_loop(0, n_tiles, band_body, 0)

    def _raster_band(coeff_ref, table_ref, out_ref, tile, f_lo, f_hi, px, py):
        # hoist the lane-broadcast of the pixel coords out of the chunk loop
        pxb = jnp.broadcast_to(px, (Pt, FC))
        pyb = jnp.broadcast_to(py, (Pt, FC))
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (Pt, FC), 1)
        lane_rev = FC - 1 - lane_iota  # tie-break: prefer the LOWEST lane

        # chunk windows: [f_lo, f_hi) in CHUNK units; lane-dim slice starts
        # must be provable multiples of 128, so windows are chunk-aligned
        n_win = f_hi - f_lo

        # ---- pass 1: per-lane best over the face range, ONE int32 carry ----
        # The carry is an order-preserving int32 packing of the f32 score
        # with (window << 7 | lane) in the low 12 mantissa bits: the
        # per-window update is a single integer max, and one cross-lane max
        # recovers the winner's score (= the interpolation denominator),
        # lane, and window at once. Clobbering 12 mantissa bits costs 2^-11
        # relative z-resolution — far below visible z-fighting — and the
        # plain bitcast is order-preserving on the score domain
        # {-1.0} u (0, inf).
        def body(w, packed_best):
            ds = pl.ds((f_lo + w) * FC, FC)
            # exact-f32 barycentrics on the VPU (bary decides visibility;
            # single-pass bf16 MXU costs ~1 cm depth error). Only w0/w1 are
            # evaluated; w2 falls out of partition-of-unity (invalid faces
            # carry c0=c1=-1e9, so their min stays negative).
            w0, w1, pix_invz = [
                pxb * coeff_ref[0, 3 * k : 3 * k + 1, ds]
                + pyb * coeff_ref[0, 3 * k + 1 : 3 * k + 2, ds]
                + coeff_ref[0, 3 * k + 2 : 3 * k + 3, ds]
                for k in range(3)
            ]  # 3 x (Pt,FC); k=2 is the inverse-depth plane, not a bary
            w2 = 1.0 - w0 - w1
            inside = jnp.minimum(w0, jnp.minimum(w1, w2)) >= -1e-6
            score = jnp.where(inside, pix_invz, -1.0)
            packed = (
                jax.lax.bitcast_convert_type(score, jnp.int32)
                & ~jnp.int32((1 << PACK_BITS) - 1)
            ) | (lane_rev + (w << 7))
            return jnp.maximum(packed_best, packed)

        init = jnp.full(
            (Pt, FC),
            np.int32(
                (np.float32(-1.0).view(np.int32) & ~((1 << PACK_BITS) - 1))
            ),
            jnp.int32,
        )
        packed_best = jax.lax.fori_loop(0, n_win, body, init)

        # ---- winner extraction: ONE cross-lane reduction per pixel ----
        packed_top = jnp.max(packed_best, axis=-1, keepdims=True)  # (Pt,1)
        hit = packed_top > 0
        low = packed_top & jnp.int32((1 << PACK_BITS) - 1)
        win_lane = (FC - 1) - (low & jnp.int32(FC - 1))  # (Pt,1)
        win_w = low >> 7  # (Pt,1) window offset of the winner

        if variant == "pass1":
            # probe: skip the fetch + interpolation epilogue entirely
            out_ref[0, pl.ds(tile * Pt, Pt), :] = jnp.broadcast_to(
                packed_top.astype(jnp.float32), (Pt, n_out)
            ).astype(out_dtype)
            return

        # ---- pass 2: fetch winner rows from active windows via MXU ----
        lane_eq = lane_iota == win_lane  # (Pt,FC)

        def fetch1(w, masked):
            ds = pl.ds((f_lo + w) * FC, FC)
            sel = lane_eq if not masked else (lane_eq & (win_w == w))
            # one bf16 MXU pass: sel is exact 0/1 and the table is bf16, so
            # the fetch reproduces the stored rows exactly (Mosaic requires
            # a 32-bit matmul accumulator, so the carry stays f32)
            return jax.lax.dot_general(
                sel.astype(jnp.bfloat16), table_ref[0, ds, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        row = jax.lax.fori_loop(
            0, n_win,
            lambda w, row: row + fetch1(w, True),
            jnp.zeros((Pt, T), jnp.float32),
        )

        if variant == "fetch":
            # probe: fetched rows written raw, interpolation skipped
            out_ref[0, pl.ds(tile * Pt, Pt), :] = row[:, :n_out].astype(
                out_dtype
            )
            return

        # ---- plane-form perspective-correct NUMERATORS ----
        # numerator = dx*A + dy*B + C_hi + C_lo; the denominator (the pass-1
        # winner score, mantissa low bits zeroed) is written as its own
        # channel and the division happens in the XLA epilogue at full lane
        # width (an in-kernel (Pt,1) divide measured ~5 ms over the scene)
        denom = jax.lax.bitcast_convert_type(
            packed_top & ~jnp.int32((1 << PACK_BITS) - 1), jnp.float32
        )
        dx = px - row[:, 0:1]
        dy = py - row[:, 1:2]
        num = (
            dx * row[:, 8 : 8 + N8]
            + dy * row[:, 8 + N8 : 8 + 2 * N8]
            + row[:, 8 + 2 * N8 : 8 + 3 * N8]
            + row[:, 8 + 3 * N8 : 8 + 4 * N8]
        )  # (Pt, N8)

        hitf = hit.astype(jnp.float32)
        # channels: [0, n_ch) numerators, n_ch = denominator, n_ch+1 = mask
        out_ref[0, pl.ds(tile * Pt, Pt), :] = (
            jnp.concatenate(
                [
                    num[:, :n_ch],
                    denom,
                    hitf,
                    jnp.zeros((Pt, n_out - n_ch - 2), jnp.float32),
                ],
                axis=-1,
            )
            * hitf
        ).astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "out_hw", "use_light", "interpret", "tile_rows", "backface_cull",
        "with_normal", "w_ambient", "w_diffuse", "out_bf16", "_variant",
    ),
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
    # 2-row bands measured fastest at 160px crops — re-confirmed round 5
    # on the plane-form kernel (54.6 ms vs 59.5 / 67.5 / 78.2 for
    # tile_rows 1/4/8; 252 poses, 1536-face bucket, bf16 out, cull, v5e,
    # honest traced-args timing, scripts/probe_crop.py). The per-iteration
    # crop cost is kernel-bound (the observed-side warps are ~7 ms
    # combined and already fused into the same program); halving it
    # further needs a kernel rearchitecture that amortizes per-band fixed
    # work across MULTIPLE poses per invocation — recorded as future work.
    tile_rows=2,
    backface_cull=False,
    with_normal=True,
    out_bf16=False,
    # "pass1" = z-test-only probe kernel (scripts/probe_pass_split.py);
    # None = production path.
    _variant=None,
):
    """Pallas fast path: same contract as ops.raster.render_crops minus the
    tri/bary debug outputs. Vertex-color and textured meshes supported (uv
    interpolated in-kernel, texture sampled outside). Pixel tiles are bands of
    ``tile_rows`` rows so face chunks can be culled against a tile's y-range;
    faces are y-sorted per pose so the culling is tight.

    ``with_normal=False`` (the crop path) drops the normal channels: 8-wide
    output rows and T=40 fetch tables instead of 16/72.
    ``out_bf16=True`` writes the kernel output in bfloat16; the interpolants
    carry bf16-table precision anyway, so this costs ~1 ulp (xyz stays
    sub-mm because the planes are anchored and pose-centered).

    ``backface_cull=True`` additionally drops camera-facing-away triangles —
    exact for closed, consistently CCW-wound meshes (the visible surface of a
    closed mesh is always front-facing), wrong for open meshes.
    """
    H, W = out_hw
    poses = jnp.asarray(poses, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    B = poses.shape[0]
    crop_tfs = jnp.asarray(crop_tfs, jnp.float32)

    verts = mesh_tensors["pos"]
    faces = mesh_tensors["faces"]
    vnormals = mesh_tensors["vnormals"]
    has_tex = "tex" in mesh_tensors
    # channel layout: [xyz(3), rgb-or-uv(3), diffuse] (+ normal(3))
    N_CH = 10 if with_normal else 7
    N8 = ((N_CH + 7) // 8) * 8         # A/B/C block width (8-aligned)
    T_DIM = 8 + 4 * N8                 # [x0,y0,pad6, A,B,C_hi,C_lo]
    N_OUT = N_CH + 2                   # + denominator + hit-mask columns
    N_OUT = ((N_OUT + 7) // 8) * 8     # lane-pad the output row
    F = faces.shape[0]
    Fp = ((F + FC - 1) // FC) * FC
    # the packed-score layout reserves 5 bits for the window index
    assert Fp // FC <= (1 << (PACK_BITS - 7)), (
        f"{F} faces exceed the packed-window budget "
        f"({FC * (1 << (PACK_BITS - 7))}); split the mesh or raise PACK_BITS"
    )
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
        tri_cam = v_cam[faces]  # (Fp,3,3)
        det = _signed_area2(tri_xy)
        coeff = _bary_coeffs(tri_xy, det)  # (Fp,3,3) [row: px,py,1][col: w_k]
        valid = (jnp.abs(det) > 1e-12) & (tri_z > ZNEAR).all(axis=-1)
        if F != Fp:
            valid = valid & (jnp.arange(Fp) < F)
        if backface_cull:
            # outward-CCW convention: geometric normal vs. the view ray
            nf = jnp.cross(
                tri_cam[:, 1] - tri_cam[:, 0], tri_cam[:, 2] - tri_cam[:, 0]
            )
            valid = valid & (jnp.sum(nf * tri_cam.mean(axis=1), axis=-1) < 0.0)
        # invalid faces can never win: constant row -> -1e9
        coeff = jnp.where(valid[:, None, None], coeff, 0.0)
        coeff = coeff.at[:, 2, :].set(
            jnp.where(valid[:, None], coeff[:, 2, :], -1e9)
        )
        invz = 1.0 / jnp.maximum(tri_z, ZNEAR)  # (Fp,3)
        # pass-1 rows: [a0,b0,c0, a1,b1,c1, pa,pb,pc] — w0/w1 affine coeffs
        # plus the inverse-depth screen plane sum_k w_k(px,py) * invz_k,
        # itself affine in (px,py) since the w_k are
        coeffT2 = coeff.transpose(0, 2, 1).reshape(Fp, 9)
        plane = jnp.einsum("frk,fk->fr", coeff, invz)  # (Fp,3) [pa,pb,pc]
        coeff9 = jnp.concatenate([coeffT2[:, :6], plane], axis=-1)

        # per-corner channel attributes (N_CH wide)
        n_cam = vnormals @ R.T
        diffuse = jnp.clip(jnp.sum(n_cam * (-light)[None], axis=-1), 0.0, 1.0)
        V = verts.shape[0]
        if has_tex:
            col_or_uv = jnp.concatenate(
                [mesh_tensors["uv"], jnp.zeros((V, 1))], axis=-1
            )
        else:
            col_or_uv = mesh_tensors["vertex_color"]
        parts = [
            v_cam - t[None],  # pose-centered: bf16 planes keep sub-mm
            col_or_uv,
            diffuse[:, None],
        ]
        if with_normal:
            parts.append(n_cam)
        vert_attr = jnp.concatenate(parts, axis=-1)  # (V, N_CH)
        attr = vert_attr[faces]  # (Fp,3,N_CH)

        # plane-form numerators: num_j(p) = sum_k w_k(p) * invz_k * attr_kj
        # is affine in pixel coords; A/B are its x/y gradients and C its
        # value at the (bf16-exact) anchor
        wk = coeff * invz[:, None, :]  # (Fp,3,3): [row a,b,c][col k] * invz_k
        A = jnp.einsum("fk,fkn->fn", wk[:, 0, :], attr)  # (Fp,N_CH)
        Bc = jnp.einsum("fk,fkn->fn", wk[:, 1, :], attr)
        C0 = jnp.einsum("fk,fkn->fn", wk[:, 2, :], attr)
        anchor = tri_xy.mean(axis=1)  # (Fp,2)
        anchor = anchor.astype(jnp.bfloat16).astype(jnp.float32)
        C = A * anchor[:, 0:1] + Bc * anchor[:, 1:2] + C0
        C_hi = C.astype(jnp.bfloat16).astype(jnp.float32)
        C_lo = C - C_hi

        def pad8(x):
            return jnp.concatenate(
                [x, jnp.zeros((Fp, N8 - N_CH))], axis=-1
            ) if N8 != N_CH else x

        table = jnp.concatenate(
            [
                anchor,                      # 0,1
                jnp.zeros((Fp, 6)),          # 2-7
                pad8(A), pad8(Bc), pad8(C_hi), pad8(C_lo),
            ],
            axis=-1,
        )  # (Fp, T_DIM)

        # per-face y-extent for tile culling (invalid faces never overlap)
        y = tri_xy[..., 1]  # (Fp,3)
        ymin = jnp.where(valid, y.min(axis=-1), jnp.inf)
        ymax = jnp.where(valid, y.max(axis=-1), -jnp.inf)

        combined = jnp.concatenate(
            [coeff9, ymin[:, None], ymax[:, None], table], axis=-1
        )  # (Fp, 11 + T_DIM)
        # sort faces by ymin (invalid last) so chunk y-extents are tight and
        # whole chunks of culled faces disappear from the overlap ranges
        perm = jnp.argsort(ymin)
        return jnp.take(combined, perm, axis=0)

    combined = jax.vmap(prep)(poses, crop_tfs)  # (B, Fp, 11+T)
    coeffT = combined[:, :, :9].transpose(0, 2, 1)  # (B, 9, Fp)
    ymin = combined[:, :, 9]
    ymax = combined[:, :, 10]
    # bf16 fetch table: the one-pass MXU one-hot fetch reproduces the stored
    # values exactly, and bf16 halves both the DMA and the MXU pass count
    table = combined[:, :, 11:].astype(jnp.bfloat16)  # (B, Fp, T_DIM)

    # ---- pixel grid: row bands of tile_rows rows (coords from iota
    # in-kernel; no pixel-coordinate input) ----
    P = H * W
    Pt = tile_rows * W
    Hp = ((H + tile_rows - 1) // tile_rows) * tile_rows
    Pp = Hp * W
    n_tiles = Pp // Pt

    # chunk-vs-band overlap: does any face in the chunk span this row band?
    # Faces are y-sorted, so the overlapping chunks form (conservatively) a
    # contiguous run — pass [lo, hi) chunk bounds instead of a bitmap
    C = Fp // FC
    cy_min = ymin.reshape(B, C, FC).min(axis=-1)  # (B,C)
    cy_max = ymax.reshape(B, C, FC).max(axis=-1)
    r0 = jnp.arange(n_tiles, dtype=jnp.float32) * tile_rows - 1.0
    r1 = r0 + tile_rows + 2.0
    active = (cy_min[:, None, :] <= r1[None, :, None]) & (
        cy_max[:, None, :] >= r0[None, :, None]
    )  # (B, T, C)
    any_active = active.any(axis=-1)
    c_lo = jnp.argmax(active, axis=-1).astype(jnp.int32)
    c_hi = C - jnp.argmax(active[:, :, ::-1], axis=-1).astype(jnp.int32)
    c_lo = jnp.where(any_active, c_lo, 0)
    c_hi = jnp.where(any_active, c_hi, 0)
    ranges = jnp.stack([c_lo, c_hi], axis=-1)  # (B, T, 2) int32

    out_dtype = jnp.bfloat16 if out_bf16 else jnp.float32
    kernel = _make_raster_kernel(
        Pt, N8, T_DIM, out_dtype=out_dtype, W=W, tile_rows=tile_rows,
        n_tiles=n_tiles, n_out=N_OUT, n_ch=N_CH, variant=_variant,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 9, Fp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, T_DIM), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # SMEM: per-band chunk-range scalars feed the dynamic loop bounds
            pl.BlockSpec((1, n_tiles, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, Pp, N_OUT), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Pp, N_OUT), out_dtype),
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
    )(coeffT, table, ranges)

    if _variant == "pass1":  # probe-only: z-test output, no attributes
        junk = out[:, :P].reshape(B, H, W, N_OUT).astype(jnp.float32)
        z = jnp.zeros((B, H, W))
        return {"rgb": junk[..., :3], "depth": z, "xyz": junk[..., :3],
                "mask": z > 1}

    out = out[:, :P].reshape(B, H, W, N_OUT).astype(jnp.float32)
    t_b = poses[:, None, None, :3, 3]
    mask = out[..., N_CH + 1] > 0.5
    # perspective divide at full XLA lane width (numerator channels over the
    # pass-1 denominator), then un-center: the planes store xyz relative to
    # each pose translation
    out = out[..., :N_CH] / jnp.where(mask, out[..., N_CH], 1.0)[..., None]
    xyz = (out[..., 0:3] + t_b) * mask[..., None]
    depth = xyz[..., 2] * mask
    if has_tex:
        from foundationpose_tpu.ops.raster import _sample_texture

        uvt = out[..., 3:5].reshape(-1, 2)
        color = _sample_texture(mesh_tensors["tex"], uvt).reshape(B, H, W, 3)
    else:
        color = out[..., 3:6]
    if use_light:
        diffuse = out[..., 6:7]
        color = color * w_ambient + diffuse * color * w_diffuse
    color = jnp.clip(color, 0.0, 1.0) * mask[..., None]
    result = {
        "rgb": color,
        "depth": depth,
        "xyz": xyz,  # already masked above
        "mask": mask,
    }
    if with_normal:
        normal = out[..., 7:10]
        nrm = normal / jnp.maximum(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12
        )
        result["normal"] = nrm * mask[..., None]
    return result
