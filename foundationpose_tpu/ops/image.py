"""Image-space ops: depth-map stencils and perspective crop-warps.

TPU-native equivalents of the reference's NVIDIA-warp CUDA kernels
(``erode_depth_kernel`` src/Utils.py:359-384, ``bilateral_filter_depth_kernel``
src/Utils.py:304-343) and of kornia's ``warp_perspective``
(predict_pose_refine.py:63-76, predict_score.py:89-101). The stencils are
expressed as static 5x5 shift stacks — XLA fuses them into a handful of VPU
passes — and the warp is a vectorized bilinear/nearest gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _shifted(img, dv, du, fill=0.0):
    """Shift img by (dv, du) with `fill` outside, plus an in-bounds mask."""
    H, W = img.shape
    padded = jnp.pad(img, ((abs(dv), abs(dv)), (abs(du), abs(du))), constant_values=fill)
    out = jax.lax.dynamic_slice(padded, (abs(dv) + dv, abs(du) + du), (H, W))
    ones = jnp.pad(
        jnp.ones((H, W), dtype=jnp.float32),
        ((abs(dv), abs(dv)), (abs(du), abs(du))),
    )
    mask = jax.lax.dynamic_slice(ones, (abs(dv) + dv, abs(du) + du), (H, W))
    return out, mask


@functools.partial(jax.jit, static_argnames=("radius",))
def dilate_mask(mask, radius=10):
    """Binary mask dilation by a (2r+1)^2 square element (windowed max —
    XLA lowers it to two separable pooling passes). Used to gate observed
    rgb/depth to a margin around the segmentation mask at register time."""
    m = jnp.asarray(mask).astype(jnp.float32)
    return (
        jax.lax.reduce_window(
            m, 0.0, jax.lax.max,
            (2 * radius + 1, 2 * radius + 1), (1, 1), "SAME",
        )
        > 0.5
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def erode_depth(depth, radius=2, depth_diff_thres=0.001, ratio_thres=0.8, zfar=100.0):
    """Zero a pixel when >ratio_thres of its in-bounds (2r+1)^2 neighborhood is
    invalid or differs from it by more than depth_diff_thres.
    (parity with reference Utils.py:359-395)"""
    depth = jnp.asarray(depth, dtype=jnp.float32)
    d = depth
    bad = jnp.zeros_like(d)
    total = jnp.zeros_like(d)
    for dv in range(-radius, radius + 1):
        for du in range(-radius, radius + 1):
            nb, mask = _shifted(d, dv, du)
            is_bad = (nb < 0.001) | (nb >= zfar) | (jnp.abs(nb - d) > depth_diff_thres)
            bad = bad + mask * is_bad.astype(jnp.float32)
            total = total + mask
    center_invalid = (d < 0.001) | (d >= zfar)
    out = jnp.where((bad / total > ratio_thres) | center_invalid, 0.0, d)
    return out


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_filter_depth(depth, radius=2, zfar=100.0, sigma_d=2.0, sigma_r=100000.0):
    """Mean-gated bilateral depth filter (parity with reference
    Utils.py:304-356): neighborhood mean over valid depths; contributions only
    from neighbors valid and within 0.01 m of the mean; Gaussian space x range
    weights."""
    depth = jnp.asarray(depth, dtype=jnp.float32)
    d = depth
    mean_sum = jnp.zeros_like(d)
    mean_cnt = jnp.zeros_like(d)
    shifts = []
    for dv in range(-radius, radius + 1):
        for du in range(-radius, radius + 1):
            nb, mask = _shifted(d, dv, du)
            valid = mask * ((nb >= 0.001) & (nb < zfar)).astype(jnp.float32)
            mean_sum = mean_sum + valid * nb
            mean_cnt = mean_cnt + valid
            shifts.append((dv, du, nb, valid))
    mean_depth = mean_sum / jnp.maximum(mean_cnt, 1.0)

    wsum = jnp.zeros_like(d)
    acc = jnp.zeros_like(d)
    for dv, du, nb, valid in shifts:
        near_mean = (jnp.abs(nb - mean_depth) < 0.01).astype(jnp.float32)
        w = jnp.exp(
            -(du * du + dv * dv) / (2.0 * sigma_d * sigma_d)
            - (d - nb) ** 2 / (2.0 * sigma_r * sigma_r)
        )
        w = w * valid * near_mean
        wsum = wsum + w
        acc = acc + w * nb
    out = jnp.where((wsum > 0) & (mean_cnt > 0), acc / jnp.maximum(wsum, 1e-12), 0.0)
    return out


# ---------------------------------------------------------------------------
# Perspective warp (crop resampling)
# ---------------------------------------------------------------------------

def _sample_bilinear(img, x, y):
    """img: (H,W,C); x,y continuous pixel-INDEX coords. Zero outside."""
    H, W = img.shape[:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = ((1 - tx) if dx == 0 else tx) * ((1 - ty) if dy == 0 else ty)
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
            val = img[yi_c, xi_c]
            out = out + jnp.where(inb[..., None], val, 0.0) * w[..., None]
    return out


def _sample_nearest(img, x, y):
    H, W = img.shape[:2]
    xi = jnp.round(x).astype(jnp.int32)
    yi = jnp.round(y).astype(jnp.int32)
    inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    xi_c = jnp.clip(xi, 0, W - 1)
    yi_c = jnp.clip(yi, 0, H - 1)
    return jnp.where(inb[..., None], img[yi_c, xi_c], 0.0)


@functools.partial(jax.jit, static_argnames=("out_size", "mode"))
def warp_perspective(img, tf, out_size, mode="bilinear"):
    """Resample ``img`` (H,W,C) under 3x3 transforms ``tf`` (B,3,3) that map
    SOURCE pixel coords to DESTINATION pixel coords (the crop transforms from
    ``compute_crop_window_tf_batch``). Output (B, out_h, out_w, C).

    Integer pixel-center convention (consistent with the rasterizer and
    depth2xyzmap): output pixel (i,j) samples the source at
    ``tf^-1 @ (j, i, 1)`` in index space. Out-of-bounds reads are zero.
    """
    img = jnp.asarray(img)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    tf = jnp.asarray(tf, dtype=jnp.float32)
    single = tf.ndim == 2
    if single:
        tf = tf[None]
    out_h, out_w = out_size
    inv = jnp.linalg.inv(tf)  # dest->src
    jj, ii = jnp.meshgrid(
        jnp.arange(out_w, dtype=jnp.float32), jnp.arange(out_h, dtype=jnp.float32)
    )
    dst = jnp.stack([jj, ii, jnp.ones_like(jj)], axis=-1)  # (h,w,3)

    def one(tf_inv):
        src = dst @ tf_inv.T
        sx = src[..., 0] / jnp.maximum(jnp.abs(src[..., 2]), 1e-12) * jnp.sign(src[..., 2])
        sy = src[..., 1] / jnp.maximum(jnp.abs(src[..., 2]), 1e-12) * jnp.sign(src[..., 2])
        x = sx
        y = sy
        if mode == "bilinear":
            return _sample_bilinear(img.astype(jnp.float32), x, y)
        return _sample_nearest(img.astype(jnp.float32), x, y)

    out = jax.vmap(one)(inv)
    if squeeze:
        out = out[..., 0]
    return out[0] if single else out


def _axis_weights(pos, size, mode):
    """Interpolation-weight matrix for one axis.

    pos: (B, out) continuous source index per output pixel. Returns
    (B, out, size) with bilinear taps (or a one-hot row for nearest);
    out-of-bounds positions get all-zero rows (zero padding semantics).
    """
    grid = jnp.arange(size, dtype=jnp.float32)  # (size,)
    if mode == "nearest":
        idx = jnp.round(pos)
        inb = (idx >= 0) & (idx <= size - 1)
        w = (grid[None, None, :] == idx[..., None]).astype(jnp.float32)
        return w * inb[..., None]
    p0 = jnp.floor(pos)
    frac = pos - p0
    d = grid[None, None, :] - p0[..., None]  # (B,out,size)
    w = jnp.where(d == 0.0, 1.0 - frac[..., None], 0.0) + jnp.where(
        d == 1.0, frac[..., None], 0.0
    )
    # zero padding outside: a tap at a clipped index contributes nothing,
    # matching _sample_bilinear's per-tap in-bounds test
    return w


@functools.partial(jax.jit, static_argnames=("out_size", "mode", "compute_dtype"))
def warp_crop_affine(img, tf, out_size, mode="bilinear", compute_dtype=None):
    """Fast path of :func:`warp_perspective` for the crop transforms this
    framework produces (``compute_crop_window_tf_batch``): pure scale +
    translation, so the resample is separable and runs as two batched
    interpolation-weight matmuls on the MXU instead of 26M scalar gathers
    (the gather path costs ~240 ms for 252x160x160 on a v5e chip; this is
    ~3 ms). Semantics match warp_perspective for axis-aligned ``tf``.

    img: (H,W,C) or (H,W); tf: (B,3,3) source->dest with tf[:,0,1] ==
    tf[:,1,0] == 0. Output (B,out_h,out_w,C) float32.

    ``compute_dtype=jnp.bfloat16`` runs the two weight matmuls in bf16
    (single MXU pass instead of the 6-pass f32-highest the package default
    demands, and half the intermediate HBM traffic). Nearest-mode weights
    are exact 0/1 in bf16, so a nearest warp then only rounds the VALUES
    (~0.4% relative); bilinear additionally rounds the taps. Callers must
    pre-center large-magnitude channels (see engine.crop) so 0.4% is
    sub-noise.
    """
    img = jnp.asarray(img, jnp.float32)
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    H, W, C = img.shape
    tf = jnp.asarray(tf, jnp.float32)
    single = tf.ndim == 2
    if single:
        tf = tf[None]
    out_h, out_w = out_size
    # invert via linalg.inv exactly like warp_perspective so the sample
    # positions are bit-identical (nearest-mode .5 ties resolve the same way;
    # crop windows routinely land on exact half-pixel centers)
    inv = jnp.linalg.inv(tf)  # dest->src
    xs = (
        jnp.arange(out_w, dtype=jnp.float32)[None] * inv[:, 0:1, 0]
        + inv[:, 0:1, 2]
    )
    ys = (
        jnp.arange(out_h, dtype=jnp.float32)[None] * inv[:, 1:2, 1]
        + inv[:, 1:2, 2]
    )
    Wy = _axis_weights(ys, H, mode)  # (B,out_h,H)
    Wx = _axis_weights(xs, W, mode)  # (B,out_w,W)
    prec = None
    if compute_dtype is not None:
        Wy = Wy.astype(compute_dtype)
        Wx = Wx.astype(compute_dtype)
        img = img.astype(compute_dtype)
        # the package pins default_matmul_precision=highest (multi-pass);
        # explicitly request the single-pass mode for the bf16 fast path
        prec = jax.lax.Precision.DEFAULT
    tmp = jnp.einsum("bih,hwc->biwc", Wy, img, precision=prec)
    out = jnp.einsum(
        "biwc,bjw->bijc", tmp, Wx, preferred_element_type=jnp.float32,
        precision=prec,
    )
    if squeeze:
        out = out[..., 0]
    return out[0] if single else out
