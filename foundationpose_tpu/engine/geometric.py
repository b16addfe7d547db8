"""Geometry-only refinement and scoring (no learned weights required).

The reference pipeline depends on pretrained RefineNet/ScoreNet checkpoints
that are not distributed with the code (.gitignore:22; predict_pose_refine.py
:100). This module provides drop-in geometric counterparts sharing the same
crop/render pipeline so the engine is fully functional standalone:

- :class:`GeometricRefiner` — projective ICP: per-crop-pixel data association
  between the rendered hypothesis xyz map and the observed xyz map, robust
  weights, batched closed-form Kabsch (Horn quaternion / eigh) delta update.
- :class:`GeometricScorer` — depth-consistency score: inlier fraction minus
  free-space-violation fraction over the rendered silhouette.

Both are jitted over the full hypothesis batch and are also used as verifiable
oracles in tests (a learned net can't be exercised without its weights).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.engine.crop import make_crop_batch


def _kabsch_delta(src, dst, w):
    """Weighted rigid transform Δ minimizing Σ w |Δ·src − dst|².

    src/dst: (P,3); w: (P,). Returns (4,4). Horn's quaternion method: largest
    eigenvector of the 4x4 correlation matrix (TPU-friendly, no 3x3 SVD).
    """
    wsum = jnp.maximum(w.sum(), 1e-6)
    cs = (w[:, None] * src).sum(0) / wsum
    cd = (w[:, None] * dst).sum(0) / wsum
    s = src - cs
    d = dst - cd
    H = (w[:, None, None] * (s[:, :, None] * d[:, None, :])).sum(0)  # Σ w s dᵀ
    Sxx, Sxy, Sxz = H[0, 0], H[0, 1], H[0, 2]
    Syx, Syy, Syz = H[1, 0], H[1, 1], H[1, 2]
    Szx, Szy, Szz = H[2, 0], H[2, 1], H[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[:, -1]  # (w,x,y,z) of the max eigenvalue
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    R = jnp.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ]
    )
    # degenerate (no inliers): identity
    ok = wsum > 10.0
    R = jnp.where(ok, R, jnp.eye(3))
    t = jnp.where(ok, cd - R @ cs, jnp.zeros(3))
    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


@dataclasses.dataclass(frozen=True)
class GeometricConfig:
    crop_ratio: float = 1.2
    input_size: int = 160
    tau_rel: float = 0.05  # inlier threshold as a fraction of mesh diameter
    # starting (coarse) inlier threshold of the anneal, as a fraction of the
    # diameter. Must cover the translation-guess bias: the guess seeds z at
    # the MEDIAN MASKED DEPTH (the visible front surface, estimater.py:137-156
    # semantics), which for a convex object sits ~D/4 in front of the center —
    # a 0.1*D start (the old 2*tau_rel) left zero inliers on spheres and the
    # ICP stuck at the seed
    tau0_rel: float = 0.3
    # scorer cross-check weights (see _geo_score): normal agreement breaks
    # flipped-face ties, edge alignment breaks tangential-slide ties
    w_normal: float = 0.3
    w_edge: float = 0.3
    # raster backend: None = auto (Pallas on TPU, XLA elsewhere)
    use_pallas: bool | None = None
    # drop camera-facing-away triangles (exact for closed CCW meshes)
    backface_cull: bool = False


def _resolve(config: GeometricConfig) -> GeometricConfig:
    if config.use_pallas is None:
        config = dataclasses.replace(
            config, use_pallas=jax.default_backend() != "cpu"
        )
    return config


class GeometricRefiner:
    """Projective-ICP refiner with the PoseRefiner.predict interface."""

    def __init__(self, config: GeometricConfig = GeometricConfig()):
        self.cfg = _resolve(config)

    def predict(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter, iteration=5):
        return _icp_refine(
            self.cfg,
            mesh_tensors,
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(rgb, jnp.float32),
            jnp.asarray(xyz_map, jnp.float32),
            float(mesh_diameter),
            int(iteration),
        )

    def traced_refine(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter,
                      iteration, out_size=None):
        """Traceable body for fusing into a larger jitted program.
        ``out_size`` (the funnel coarse-resolution hint) is accepted for
        interface parity with PoseRefiner and ignored — ICP samples model
        points, not crop pixels."""
        return _icp_refine(self.cfg, mesh_tensors, poses, K, rgb, xyz_map,
                           mesh_diameter, int(iteration))

    # -- shared fused-program protocol (see PoseRefiner.program_key) --
    @property
    def program_key(self):
        return (GeometricRefiner, self.cfg)

    @property
    def program_params(self):
        return ()

    @staticmethod
    def traced_body_fn(key):
        _, cfg = key

        def fn(params, mesh_tensors, rgb, xyz_map, K, poses, diameter,
               iteration, out_size=None, gate_px=0):
            return _icp_refine(cfg, mesh_tensors, poses, K, rgb, xyz_map,
                               diameter, int(iteration), gate_px=gate_px)

        return fn


def _point_to_plane_delta(p, q, n, w, mu=0.2, damping=1e-6):
    """One linearized ICP step: Δ = exp([t, θ]) minimizing

        Σ w (n·(p + θ×p + t − q))²  +  μ Σ w |p + θ×p + t − q|²

    The point-to-point term (μ) removes the tangential null space that pure
    point-to-plane has on flat surfaces (boxes). p/q/n: (P,3); w: (P,).
    Returns (4,4)."""
    # point-to-plane block
    r = jnp.sum(n * (p - q), axis=-1)  # (P,)
    Jr = jnp.cross(p, n)  # d r / d θ
    J = jnp.concatenate([Jr, n], axis=-1)  # (P,6): [θ, t]
    A = (w[:, None, None] * (J[:, :, None] * J[:, None, :])).sum(0)
    b = -(w[:, None] * r[:, None] * J).sum(0)

    # point-to-point block: residual p + θ×p + t − q, J3 = [−[p]× | I]
    r3 = p - q  # (P,3)
    skew = jnp.stack(
        [
            jnp.stack([jnp.zeros_like(p[:, 0]), p[:, 2], -p[:, 1]], axis=-1),
            jnp.stack([-p[:, 2], jnp.zeros_like(p[:, 0]), p[:, 0]], axis=-1),
            jnp.stack([p[:, 1], -p[:, 0], jnp.zeros_like(p[:, 0])], axis=-1),
        ],
        axis=-2,
    )  # (P,3,3) = −[p]× (rows: d residual_i / d θ)
    eye3 = jnp.broadcast_to(jnp.eye(3), skew.shape)
    J3 = jnp.concatenate([skew, eye3], axis=-1)  # (P,3,6)
    A = A + mu * jnp.einsum("p,pik,pil->kl", w, J3, J3)
    b = b - mu * jnp.einsum("p,pik,pi->k", w, J3, r3)

    A = A + damping * jnp.trace(A) / 6.0 * jnp.eye(6) + 1e-9 * jnp.eye(6)
    x = jnp.linalg.solve(A, b)
    ok = w.sum() > 10.0
    theta, t = x[:3], x[3:]
    T = geo.se3_exp_map(jnp.concatenate([t, theta])[None])[0]
    return jnp.where(ok, T, jnp.eye(4))


@functools.partial(jax.jit, static_argnames=("cfg", "iteration", "gate_px"))
def _icp_refine(cfg, mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
                iteration, gate_px=0):
    """Projective point-to-plane ICP over the hypothesis batch with an
    ADAPTIVE per-hypothesis inlier threshold (trimmed-ICP style): tau scales
    with the current mean association error, so a register seed sitting a
    quarter-diameter off (the median-depth z bias) still captures inliers,
    while a tracking correction of a millimetre associates tightly from the
    first iteration. A fixed global anneal cannot do both: 0.1*D starts
    below the register bias (zero inliers -> stuck), 0.3*D starts far above
    a tracking residual (sloppy association -> drift)."""

    def one_iter(poses, _):
        data = make_crop_batch(
            mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
            crop_ratio=cfg.crop_ratio, out_size=cfg.input_size,
            normalize_xyz=False, z_invalid_thres=0.001, use_normal=True,
            use_pallas=bool(cfg.use_pallas), backface_cull=cfg.backface_cull,
            gate_px=int(gate_px),
        )
        # un-center the crop xyz maps (normalize_xyz=False still subtracts t)
        t = poses[:, :3, 3][:, None, None, :]
        xyzA = data["inputA"][..., 3:] + t  # rendered, cam space
        xyzB = data["inputB"][..., 3:] + t  # observed, cam space
        nrmA = data["normalA"]
        validA = data["mask"][..., None] & (xyzA[..., 2:3] > 0.001)
        # the exactly-warped validity channel — NOT a z re-threshold, which
        # the bf16 warp path breaks (invalid pixels round-trip to
        # z = mean-translation rounding error, see crop.py)
        validB = data["validB"]
        err = jnp.linalg.norm(xyzA - xyzB, axis=-1, keepdims=True)
        valid = (validA & validB).astype(jnp.float32)
        # per-hypothesis adaptive threshold: 2x the tau0-capped mean error
        # of valid associations, clipped to [tau1, tau0] (outliers beyond
        # tau0 — background, occluders — can't inflate the cap)
        n_valid = jnp.maximum(valid.sum(axis=(1, 2, 3)), 1.0)  # (B,)
        e_mean = (valid * jnp.minimum(err, tau0)).sum(axis=(1, 2, 3)) / n_valid
        tau = jnp.clip(2.0 * e_mean, tau1, tau0)[:, None, None, None]
        w = (valid * (err < tau))[..., 0]

        def solve(xa, xb, nn, ww):
            return _point_to_plane_delta(
                xa.reshape(-1, 3), xb.reshape(-1, 3), nn.reshape(-1, 3), ww.reshape(-1)
            )

        deltas = jax.vmap(solve)(xyzA, xyzB, nrmA, w)  # (B,4,4)
        return deltas @ poses

    tau0 = cfg.tau0_rel * mesh_diameter
    tau1 = 0.5 * cfg.tau_rel * mesh_diameter

    return jax.lax.fori_loop(0, iteration, lambda i, p: one_iter(p, i), poses)


class GeometricScorer:
    """Depth-consistency scorer with the PoseScorer.predict interface."""

    def __init__(self, config: GeometricConfig = GeometricConfig()):
        self.cfg = _resolve(config)

    def traced_score(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter,
                     out_size=None):
        """Traceable body for fusing into a larger jitted program (``out_size``
        accepted for interface parity with PoseScorer; ignored)."""
        return _geo_score(self.cfg, mesh_tensors, poses, K, rgb, xyz_map,
                          mesh_diameter)

    # -- shared fused-program protocol (see PoseRefiner.program_key) --
    @property
    def program_key(self):
        return (GeometricScorer, self.cfg)

    @property
    def program_params(self):
        return ()

    @staticmethod
    def traced_body_fn(key):
        _, cfg = key

        def fn(params, mesh_tensors, rgb, xyz_map, K, poses, diameter,
               out_size=None, gate_px=0):
            return _geo_score(cfg, mesh_tensors, poses, K, rgb, xyz_map,
                              diameter, gate_px=gate_px)

        return fn

    def predict(self, mesh_tensors, rgb, xyz_map, K, poses, mesh_diameter):
        return _geo_score(
            self.cfg,
            mesh_tensors,
            jnp.asarray(poses, jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(rgb, jnp.float32),
            jnp.asarray(xyz_map, jnp.float32),
            float(mesh_diameter),
        )


def _normals_from_xyz(xyz, valid):
    """Per-pixel surface normals of an organized xyz map by central
    differences + cross product. Returns (..., H, W, 3) unit normals and a
    validity mask (all four neighbours valid). Orientation: flipped to face
    the camera (n_z < 0), matching rendered normals of visible surfaces."""
    dx = jnp.roll(xyz, -1, axis=-2) - jnp.roll(xyz, 1, axis=-2)  # d/du
    dy = jnp.roll(xyz, -1, axis=-3) - jnp.roll(xyz, 1, axis=-3)  # d/dv
    vx = jnp.roll(valid, -1, axis=-2) & jnp.roll(valid, 1, axis=-2)
    vy = jnp.roll(valid, -1, axis=-3) & jnp.roll(valid, 1, axis=-3)
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # camera-facing: visible surfaces have normals with negative z in cam
    n = jnp.where(n[..., 2:3] > 0, -n, n)
    return n, valid & vx & vy


def _edge_map(mask):
    """Boolean boundary map of a (..., H, W) mask (4-neighbour erosion)."""
    interior = (
        mask
        & jnp.roll(mask, 1, axis=-1) & jnp.roll(mask, -1, axis=-1)
        & jnp.roll(mask, 1, axis=-2) & jnp.roll(mask, -1, axis=-2)
    )
    return mask & ~interior


def _dilate(mask, r=1):
    """(..., H, W) boolean dilation by a (2r+1) box."""
    out = mask
    for ax in (-1, -2):
        for s in range(1, r + 1):
            out = out | jnp.roll(out, s, axis=ax) | jnp.roll(out, -s, axis=ax)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "gate_px"))
def _geo_score(cfg, mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
               gate_px=0):
    """Depth-consistency + normal-agreement + silhouette-edge score.

    The depth terms alone cannot separate wrong-basin hypotheses whose
    z-maps agree with the observation (flipped boxes, slid cylinders — the
    round-4 register ceiling). Two geometric cross-checks break those ties,
    mirroring the discriminative power the reference gets from its trained
    scorer (predict_score.py:160-226):

    - normal agreement: mean cosine between rendered normals and
      central-difference normals of the observed xyz crop, over depth
      inliers. A flipped face matches in z but not in orientation.
    - edge alignment: fraction of rendered-silhouette-boundary pixels lying
      within 1 px of an observed depth-discontinuity or validity edge. A
      tangentially slid hypothesis keeps interior depth agreement but its
      silhouette rim no longer lands on the observed rim.
    """
    tau = cfg.tau_rel * mesh_diameter * 0.5
    data = make_crop_batch(
        mesh_tensors, poses, K, rgb, xyz_map, mesh_diameter,
        crop_ratio=cfg.crop_ratio, out_size=cfg.input_size,
        normalize_xyz=False, z_invalid_thres=0.001, use_normal=True,
        use_pallas=bool(cfg.use_pallas), backface_cull=cfg.backface_cull,
        gate_px=int(gate_px),
    )
    t = poses[:, :3, 3][:, None, None, :]
    xyzB = data["inputB"][..., 3:] + t
    zA = data["inputA"][..., 5] + t[..., 2]
    zB = xyzB[..., 2]
    validA = data["mask"] & (zA > 0.001)
    validB = data["validB"][..., 0]  # exactly-warped validity (see crop.py)
    both = validA & validB
    inlier = both & (jnp.abs(zA - zB) < tau)
    # observed surface clearly in front of the render: hypothesis occupies
    # observed free space
    violation = both & (zB < zA - tau)
    # hypothesis renders where the observation has no surface at all
    # (protrudes outside the observed silhouette); weighted below a hard
    # violation since real depth maps have holes
    silhouette_miss = validA & ~validB
    nA = jnp.maximum(validA.sum(axis=(1, 2)), 1)
    depth_score = (
        inlier.sum(axis=(1, 2))
        - violation.sum(axis=(1, 2))
        - 0.5 * silhouette_miss.sum(axis=(1, 2))
    ) / nA

    # normal agreement over depth inliers
    nB, nB_valid = _normals_from_xyz(xyzB, validB)
    cosine = jnp.sum(data["normalA"] * nB, axis=-1)
    n_ok = inlier & nB_valid
    cos_mean = (cosine * n_ok).sum(axis=(1, 2)) / jnp.maximum(
        n_ok.sum(axis=(1, 2)), 1
    )

    # silhouette-edge alignment: rendered rim vs observed structure edges
    # (depth discontinuity > tau between 4-neighbours, or validity edge)
    edgeA = _edge_map(validA)
    zB_safe = jnp.where(validB, zB, 0.0)
    jump = jnp.zeros_like(validB)
    for ax, s in ((-1, 1), (-1, -1), (-2, 1), (-2, -1)):
        nb_z = jnp.roll(zB_safe, s, axis=ax)
        nb_v = jnp.roll(validB, s, axis=ax)
        jump = jump | (nb_v & (jnp.abs(zB_safe - nb_z) > tau)) | ~nb_v
    edgeB = _dilate(validB & jump, r=1)
    edge_hit = (edgeA & edgeB).sum(axis=(1, 2)) / jnp.maximum(
        edgeA.sum(axis=(1, 2)), 1
    )

    return depth_score + cfg.w_normal * cos_mean + cfg.w_edge * edge_hit
