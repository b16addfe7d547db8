"""Direction/position encoders for the neural object field.

Parity with the reference bundlesdf/nerf_helpers.py: analytic real spherical
harmonics to degree 4 (SHEncoder :68-151) and NeRF frequency embedding
(Embedder :154-185). Pure jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_encode(dirs, degree=3):
    """Real SH basis of unit directions. (..., 3) -> (..., degree^2)."""
    assert 1 <= degree <= 5
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [jnp.full(x.shape, _C0, dirs.dtype)]
    if degree > 1:
        out += [-_C1 * y, _C1 * z, -_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if degree > 3:
        out += [
            _C3[0] * y * (3 * xx - yy),
            _C3[1] * xy * z,
            _C3[2] * y * (4 * zz - xx - yy),
            _C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            _C3[4] * x * (4 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3 * yy),
        ]
    if degree > 4:
        out += [
            _C4[0] * xy * (xx - yy),
            _C4[1] * yz * (3 * xx - yy),
            _C4[2] * xy * (7 * zz - 1),
            _C4[3] * yz * (7 * zz - 3),
            _C4[4] * (zz * (35 * zz - 30) + 3),
            _C4[5] * xz * (7 * zz - 3),
            _C4[6] * (xx - yy) * (7 * zz - 1),
            _C4[7] * xz * (xx - 3 * yy),
            _C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    return jnp.stack(out, axis=-1)


def sh_out_dim(degree):
    return degree**2


def freq_encode(x, num_freqs, include_input=True):
    """NeRF positional encoding with log-sampled frequencies 2^0..2^(n-1)."""
    outs = [x] if include_input else []
    for i in range(num_freqs):
        f = 2.0**i
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def freq_out_dim(num_freqs, d=3, include_input=True):
    return d * (2 * num_freqs + (1 if include_input else 0))


# ---------------------------------------------------------------------------
# MXU-native positional encoder (no gather/scatter anywhere)
# ---------------------------------------------------------------------------
#
# The reference's instant-ngp hash grid (bundlesdf/mycuda/torch_ngp_grid_
# encoder) is a GPU-shaped structure: its forward is 8 random gathers per
# point per level and its backward is an atomic scatter-add. On TPU both are
# serial-memory operations (~10-100 ns per element through XLA) and dominate
# the field training step by 100x. The TPU-native replacement trades memory
# irregularity for MXU FLOPs: multi-resolution TRIPLANES (TensoRF-style)
# queried with chained interpolation-weight matmuls —
#
#     out[n,c] = sum_ij  Wx[n,i] * Wy[n,j] * plane[i,j,c]
#              = einsum("nj,njc->nc", Wy, einsum("ni,ijc->njc", Wx, plane))
#
# where Wx/Wy are the 2-tap linear-interpolation weight rows. Every op is a
# dense matmul, so the BACKWARD is also matmuls (the plane gradient is
# Wx^T @ (Wy * g) — the scatter-add becomes an MXU contraction for free via
# autodiff). A small dense 3D level (one-hot over the flattened finest axis
# pair) would work the same way; triplanes give finer resolution for the
# same FLOPs.

import flax.linen as nn


def _axis_taps(x01, R):
    """x01 in [0,1] -> (N, R+1) linear-interpolation weight rows (2 taps)."""
    g = jnp.clip(x01, 0.0, 1.0) * R
    i0 = jnp.floor(jnp.minimum(g, R - 1e-6))
    f = g - i0
    grid = jnp.arange(R + 1, dtype=jnp.float32)
    d = grid[None, :] - i0[:, None]  # (N, R+1)
    return jnp.where(d == 0.0, 1.0 - f[:, None], 0.0) + jnp.where(
        d == 1.0, f[:, None], 0.0
    )


def _axis_dtaps(x01, R):
    """d(_axis_taps)/d(x01): (N, R+1) rows with -R at tap i0 and +R at
    i0+1 (zero outside [0,1], matching the clip)."""
    inside = ((x01 >= 0.0) & (x01 <= 1.0)).astype(jnp.float32) * R
    g = jnp.clip(x01, 0.0, 1.0) * R
    i0 = jnp.floor(jnp.minimum(g, R - 1e-6))
    grid = jnp.arange(R + 1, dtype=jnp.float32)
    d = grid[None, :] - i0[:, None]
    return (
        jnp.where(d == 0.0, -1.0, 0.0) + jnp.where(d == 1.0, 1.0, 0.0)
    ) * inside[:, None]


_DOT_KW = dict(
    preferred_element_type=jnp.float32,
)


def _plane_combo_fwd(Wa, Wb, p, R, C):
    """(Wa @ p) ⊙ Wb summed over the b-axis -> (N, C). DEFAULT precision:
    learned features, not geometry (the package-wide "highest" pin costs 6
    MXU passes)."""
    t = jnp.dot(
        Wa, p.reshape(R + 1, (R + 1) * C),
        precision=jax.lax.Precision.DEFAULT, **_DOT_KW,
    ).reshape(-1, R + 1, C)
    return (t * Wb[:, :, None]).sum(axis=1), t


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _triplane_eval(planes, pts, resolutions, channels):
    out, _ = _triplane_eval_fwd(planes, pts, resolutions, channels)
    return out


def _triplane_eval_fwd(planes, pts, resolutions, channels):
    """planes: tuple of (3, R+1, R+1, C) per level; pts (N,3) in [-1,1].
    Returns (N, L*C)."""
    x01 = (pts + 1.0) * 0.5
    outs = []
    for p, R in zip(planes, resolutions):
        Wx = _axis_taps(x01[:, 0], R)
        Wy = _axis_taps(x01[:, 1], R)
        Wz = _axis_taps(x01[:, 2], R)
        level = 0.0
        for (Wa, Wb, pl) in ((Wx, Wy, p[0]), (Wx, Wz, p[1]), (Wy, Wz, p[2])):
            o, _ = _plane_combo_fwd(Wa, Wb, pl, R, channels)
            level = level + o
        outs.append(level)
    return jnp.concatenate(outs, axis=-1), (planes, pts)


def _triplane_eval_bwd(resolutions, channels, res, g):
    """Analytic VJP. The autodiff input-grad path materializes several
    (N, R+1, C) intermediates through the tap-construction `where`s and
    costs ~4x the forward on TPU; here both the plane gradient and the
    point gradient are the same interpolation-matmul chains as the forward
    (plane grad: Waᵀ @ (Wb ⊙ g); point grad: derivative taps D in place of
    W), ~2-3x the forward total."""
    planes, pts = res
    C = channels
    x01 = (pts + 1.0) * 0.5
    g_planes = []
    g_pts = jnp.zeros_like(pts)
    off = 0
    for p, R in zip(planes, resolutions):
        gl = g[:, off : off + C]  # (N,C)
        off += C
        taps = [_axis_taps(x01[:, a], R) for a in range(3)]
        dtaps = [_axis_dtaps(x01[:, a], R) for a in range(3)]
        gp_level = []
        for (a, b, pl) in ((0, 1, p[0]), (0, 2, p[1]), (1, 2, p[2])):
            Wa, Wb, Da, Db = taps[a], taps[b], dtaps[a], dtaps[b]
            # plane grad: gP[i,j,c] = sum_n Wa[n,i] Wb[n,j] gl[n,c]
            M = (Wb[:, :, None] * gl[:, None, :]).reshape(-1, (R + 1) * C)
            gP = jnp.dot(
                Wa.T, M, precision=jax.lax.Precision.DEFAULT, **_DOT_KW
            ).reshape(R + 1, R + 1, C)
            gp_level.append(gP)
            # point grads via derivative taps
            oa, _ = _plane_combo_fwd(Da, Wb, pl, R, C)  # d out / d x01[a]
            ob, _ = _plane_combo_fwd(Wa, Db, pl, R, C)  # d out / d x01[b]
            ga = (oa * gl).sum(-1) * 0.5  # d x01/d pts = 0.5
            gb = (ob * gl).sum(-1) * 0.5
            g_pts = g_pts.at[:, a].add(ga).at[:, b].add(gb)
        g_planes.append(jnp.stack(gp_level))
    return tuple(g_planes), g_pts


_triplane_eval.defvjp(_triplane_eval_fwd, _triplane_eval_bwd)


class TriplaneEncoder(nn.Module):
    """Multi-resolution triplane features via interpolation-weight matmuls.

    Query cost per level is N*(R+1)^2*C MACs per plane — pure MXU work, ~1 ms
    for 200k points at R=128 — and the gradient to the planes is the
    transposed matmul (no scatter). Output: concat over levels of the
    3-plane SUM (TensoRF decomposition), (N, len(resolutions)*channels).
    """

    resolutions: tuple = (16, 32, 64, 128)
    channels: int = 2
    init_scale: float = 1e-2

    @nn.compact
    def __call__(self, pts):
        """pts: (N,3) in [-1,1] -> (N, L*C)."""
        planes = tuple(
            self.param(
                f"planes_{R}",
                nn.initializers.normal(self.init_scale),
                (3, R + 1, R + 1, self.channels),
            )
            for R in self.resolutions
        )
        return _triplane_eval(
            planes, pts, tuple(self.resolutions), self.channels
        )


def triplane_out_dim(resolutions, channels):
    return len(resolutions) * channels
