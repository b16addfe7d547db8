"""Distributed Gauss-Newton bundle adjustment with Schur-complement reduction.

The reference's only bundle adjustment is gradient descent: per-frame SE(3)
deltas (``PoseArray``, bundlesdf/nerf_helpers.py:44-64) jointly Adam-optimized
with the neural field (bundlesdf/nerf_runner.py:769-771). This module adds the
explicit second-order pose-graph mode the north star asks for (BASELINE.json):
keyframe poses + 3D landmarks solved by damped Gauss-Newton, with the landmark
block eliminated by a Schur complement and the reduced camera system formed by
an XLA ``psum`` over a landmark-sharded device mesh — bundle adjustment whose
distribution rides the TPU's collectives rather than a sparse solver.

Problem
-------
Poses ``T_k`` (object -> camera, (K,4,4)) and landmarks ``X_l`` (object frame,
(L,3)). Observation m of landmark l in keyframe ``k = obs_kf[l,m]`` is a 3D
camera-space point ``y`` (depth-backprojected). Residual

    r_{lm} = R_k X_l + t_k - y_{lm}                         (3-vector)

minimized over left-multiplicative pose updates ``T_k <- exp([w, v]) T_k`` and
landmark updates ``X_l <- X_l + dX`` with per-observation Huber IRLS weights:

    J_pose = [ -[p]x | I3 ]   with p = R_k X_l + t_k        (3,6)
    J_lm   = R_k                                            (3,3)

Normal equations (U = pose blocks, A = landmark blocks, W = coupling):

    [ U   W ] [ dxi ]   [ b_p ]
    [ W^T A ] [ dX  ] = [ b_l ]

A is 3x3 block-diagonal -> eliminate:  S = U - W A^-1 W^T (6K,6K),
rhs = b_p - W A^-1 b_l;  solve S dxi = rhs;  back-substitute
dX = A^-1 (b_l - W^T dxi).

Distribution: every quantity above is a sum of independent per-landmark
terms. Landmarks are sharded over the mesh's ``batch`` axis; each device
accumulates its partial (S, rhs), one ``psum`` forms the global reduced
system, and the small dense (6K,6K) solve is replicated. Back-substitution is
per-landmark and stays sharded. Gauge freedom is removed by pinning
``fixed_mask`` poses (identity rows/cols in S).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.core import geometry as geo


@dataclasses.dataclass(frozen=True)
class BAConfig:
    n_iters: int = 8
    damping: float = 1e-4          # initial LM lambda (adapted per iteration)
    damping_max: float = 1e2
    huber_delta_rel: float = 1.0   # Huber delta as a multiple of `scale`
    scale: float = 0.01            # residual scale (m); sets the IRLS knee
    min_obs: int = 2               # landmarks with fewer valid obs are dropped
    # per-iteration trust region — the same guard the reference puts on its
    # per-frame pose deltas (config_ycbv.yml:95-96: max_trans 0.02, max_rot
    # 10 deg). Projective re-association only heals within this radius, so an
    # unclipped GN step that jumps basins can never be walked back.
    max_rot_step: float = 0.15     # rad
    max_trans_step: float = 0.02   # m
    # prior anchoring each pose at its INITIAL value (weight per unit of
    # rot[rad]/trans[m] squared error). Depth-only BA has genuine null
    # spaces for symmetric-ish shapes (orbiting a spherical cap, sliding
    # along a plane); the prior bounds drift along them while leaving
    # well-observed directions effectively untouched. 0 disables.
    pose_prior: float = 0.0
    # point-to-point weight when per-observation normals are given. Depth-map
    # observations are projectively associated, so the point-to-point residual
    # has the ICP aperture problem on flat surfaces (tangential sliding);
    # the point-to-plane term carries the real constraint and mu only damps
    # the in-plane null space. Without normals the residual is pure
    # point-to-point (mu ignored).
    mu: float = 0.1


def _skew(p):
    """(...,3) -> (...,3,3) cross-product matrices."""
    z = jnp.zeros_like(p[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -p[..., 2], p[..., 1]], axis=-1),
            jnp.stack([p[..., 2], z, -p[..., 0]], axis=-1),
            jnp.stack([-p[..., 1], p[..., 0], z], axis=-1),
        ],
        axis=-2,
    )


def _huber_weight(r_norm, delta):
    """IRLS weight for the Huber kernel: 1 inside, delta/|r| outside."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-12))


def _landmark_terms(poses, X, obs_kf, obs_pt, obs_w, obs_n, K_poses, huber_delta, mu):
    """Per-landmark-shard contributions to the reduced camera system.

    poses: (K,4,4); X: (Ls,3); obs_kf: (Ls,M) int32; obs_pt: (Ls,M,3);
    obs_w: (Ls,M) base weights (0 = padding); obs_n: (Ls,M,3) observed surface
    normals or None. With normals the residual is point-to-plane
    ``n.(p - y)`` plus ``mu`` x point-to-point; without, pure point-to-point.
    Returns (S_part (K,6,K,6), rhs_part (K,6), A (Ls,3,3), b_l (Ls,3),
    Wd (Ls,K,6,3), cost_part ()). All per-landmark sums — psum-able across
    shards.
    """
    R = poses[:, :3, :3]  # (K,3,3)
    t = poses[:, :3, 3]  # (K,3)
    Rk = R[obs_kf]  # (Ls,M,3,3)
    tk = t[obs_kf]  # (Ls,M,3)
    p = jnp.einsum("lmij,lj->lmi", Rk, X) + tk  # (Ls,M,3)
    r = p - obs_pt  # (Ls,M,3)

    r_norm = jnp.linalg.norm(r, axis=-1)
    w = obs_w * _huber_weight(r_norm, huber_delta)  # (Ls,M)

    # J_pose = [-[p]x | I]: (Ls,M,3,6); J_lm = Rk: (Ls,M,3,3)
    Jp = jnp.concatenate(
        [-_skew(p), jnp.broadcast_to(jnp.eye(3), p.shape[:-1] + (3, 3))], axis=-1
    )
    Jl = Rk

    if obs_n is not None:
        # row weights: plane rows get w where a normal exists, point rows mu*w
        has_n = (jnp.linalg.norm(obs_n, axis=-1) > 0.5).astype(w.dtype)
        w_pt = w * jnp.where(has_n > 0, mu, 1.0)  # (Ls,M)
        w_pl = w * has_n
        rn = jnp.einsum("lmi,lmi->lm", obs_n, r)  # (Ls,M)
        Jpn = jnp.einsum("lmi,lmij->lmj", obs_n, Jp)  # (Ls,M,6)
        Jln = jnp.einsum("lmi,lmij->lmj", obs_n, Jl)  # (Ls,M,3)
    else:
        w_pt = w
        w_pl = jnp.zeros_like(w)
        rn = jnp.zeros_like(w)
        Jpn = jnp.zeros(Jp.shape[:2] + (6,), Jp.dtype)
        Jln = jnp.zeros(Jl.shape[:2] + (3,), Jl.dtype)

    # landmark (A, b_l): 3x3 per landmark
    A = jnp.einsum("lm,lmri,lmrj->lij", w_pt, Jl, Jl) + jnp.einsum(
        "lm,lmi,lmj->lij", w_pl, Jln, Jln
    )  # (Ls,3,3)
    b_l = -jnp.einsum("lm,lmri,lmr->li", w_pt, Jl, r) - jnp.einsum(
        "lm,lmi,lm->li", w_pl, Jln, rn
    )  # (Ls,3)

    # pose blocks, scattered over the (small) K axis via one-hot
    onehot = jax.nn.one_hot(obs_kf, K_poses, dtype=poses.dtype)  # (Ls,M,K)
    U = jnp.einsum("lm,lmk,lmri,lmrj->kij", w_pt, onehot, Jp, Jp) + jnp.einsum(
        "lm,lmk,lmi,lmj->kij", w_pl, onehot, Jpn, Jpn
    )  # (K,6,6)
    b_p = -jnp.einsum("lm,lmk,lmri,lmr->ki", w_pt, onehot, Jp, r) - jnp.einsum(
        "lm,lmk,lmi,lm->ki", w_pl, onehot, Jpn, rn
    )  # (K,6)

    # coupling W: (Ls,K,6,3)
    Wd = jnp.einsum("lm,lmk,lmri,lmrj->lkij", w_pt, onehot, Jp, Jl) + jnp.einsum(
        "lm,lmk,lmi,lmj->lkij", w_pl, onehot, Jpn, Jln
    )

    # Schur pieces
    Ainv = jnp.linalg.inv(A + 1e-9 * jnp.eye(3))  # (Ls,3,3)
    WAinv = jnp.einsum("lkij,ljn->lkin", Wd, Ainv)  # (Ls,K,6,3)
    S_corr = jnp.einsum("lkin,lqjn->kiqj", WAinv, Wd)  # (K,6,K,6)
    rhs_corr = jnp.einsum("lkin,ln->ki", WAinv, b_l)  # (K,6)

    S_part = jnp.zeros((K_poses, 6, K_poses, 6), poses.dtype)
    kk = jnp.arange(K_poses)
    S_part = S_part.at[kk, :, kk, :].set(U) - S_corr
    rhs_part = b_p - rhs_corr

    cost_part = jnp.sum(w_pt * r_norm**2) + jnp.sum(w_pl * rn**2)
    return S_part, rhs_part, A, b_l, Wd, cost_part


def _apply_pose_update(poses, dxi):
    """Left-multiplicative SE(3) update: T <- exp([w,v]) T. dxi: (K,6) as
    [w(3), v(3)]."""
    # geo.se3_exp_map takes [v, w] (translation first)
    tw = jnp.concatenate([dxi[:, 3:], dxi[:, :3]], axis=-1)
    dT = geo.se3_exp_map(tw)  # (K,4,4)
    return dT @ poses


def _cost_only(poses, X, obs_kf, obs_pt, obs_w, obs_n, huber_delta, mu):
    """Robust cost at (poses, X) — per-landmark sum, psum-able."""
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    p = jnp.einsum("lmij,lj->lmi", R[obs_kf], X) + t[obs_kf]
    r = p - obs_pt
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = obs_w * _huber_weight(r_norm, huber_delta)
    if obs_n is not None:
        has_n = (jnp.linalg.norm(obs_n, axis=-1) > 0.5).astype(w.dtype)
        w_pt = w * jnp.where(has_n > 0, mu, 1.0)
        w_pl = w * has_n
        rn = jnp.einsum("lmi,lmi->lm", obs_n, r)
        return jnp.sum(w_pt * r_norm**2) + jnp.sum(w_pl * rn**2)
    return jnp.sum(w * r_norm**2)


def _prior_eta(poses, poses_init):
    """Per-pose prior residual eta_k = log(T_k T0_k^-1) as [w, v] (small-angle
    v approximation — the prior is a soft regularizer)."""
    D = poses @ jnp.linalg.inv(poses_init)
    w = geo.so3_log_map(D[:, :3, :3])  # (K,3)
    v = D[:, :3, 3]
    return jnp.concatenate([w, v], axis=-1)  # (K,6)


@functools.partial(
    jax.jit, static_argnames=("cfg", "axis_name")
)
def _ba_iteration(poses, X, obs_kf, obs_pt, obs_w, obs_n, fixed_mask, lam,
                  poses_init, cfg, axis_name=None):
    """One damped-GN iteration. When ``axis_name`` is set the landmark axis is
    assumed sharded under shard_map and the reduced system is psum-ed.

    ``lam`` is the CURRENT LM lambda (traced; adapted by the host loop).
    Returns (poses_new, X_new, cost_old, cost_new) — the host accepts the
    step only when cost_new < cost_old.
    """
    K_poses = poses.shape[0]
    huber_delta = cfg.huber_delta_rel * cfg.scale
    S, rhs, A, b_l, Wd, cost = _landmark_terms(
        poses, X, obs_kf, obs_pt, obs_w, obs_n, K_poses, huber_delta, cfg.mu
    )
    if axis_name is not None:
        S = jax.lax.psum(S, axis_name)
        rhs = jax.lax.psum(rhs, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    if cfg.pose_prior > 0:
        eta = _prior_eta(poses, poses_init)  # (K,6)
        kk = jnp.arange(K_poses)
        S = S.at[kk, :, kk, :].add(cfg.pose_prior * jnp.eye(6))
        rhs = rhs - cfg.pose_prior * eta
        cost = cost + cfg.pose_prior * jnp.sum(eta**2)

    S2 = S.reshape(6 * K_poses, 6 * K_poses)
    rhs2 = rhs.reshape(6 * K_poses)

    # gauge fixing: identity rows/cols + zero rhs for pinned poses
    free = jnp.repeat(~fixed_mask, 6).astype(poses.dtype)  # (6K,)
    S2 = S2 * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
    rhs2 = rhs2 * free

    # LM damping on the diagonal
    S2 = S2 + lam * jnp.diag(jnp.diag(S2)) + 1e-9 * jnp.eye(6 * K_poses)

    dxi = jnp.linalg.solve(S2, rhs2).reshape(K_poses, 6)
    # trust region: scale each pose's step so |rot| and |trans| stay bounded
    rot_n = jnp.linalg.norm(dxi[:, :3], axis=-1, keepdims=True)
    tr_n = jnp.linalg.norm(dxi[:, 3:], axis=-1, keepdims=True)
    s = jnp.minimum(
        jnp.minimum(1.0, cfg.max_rot_step / jnp.maximum(rot_n, 1e-12)),
        jnp.minimum(1.0, cfg.max_trans_step / jnp.maximum(tr_n, 1e-12)),
    )
    dxi = dxi * s
    poses_new = _apply_pose_update(poses, dxi)

    # back-substitution (per-landmark, stays sharded)
    Ainv = jnp.linalg.inv(A + 1e-9 * jnp.eye(3))
    dX = jnp.einsum("lij,lj->li", Ainv, b_l - jnp.einsum("lkij,ki->lj", Wd, dxi))
    X_new = X + dX

    cost_new = _cost_only(poses_new, X_new, obs_kf, obs_pt, obs_w, obs_n,
                          huber_delta, cfg.mu)
    if axis_name is not None:
        cost_new = jax.lax.psum(cost_new, axis_name)
    if cfg.pose_prior > 0:
        eta_new = _prior_eta(poses_new, poses_init)
        cost_new = cost_new + cfg.pose_prior * jnp.sum(eta_new**2)
    return poses_new, X_new, cost, cost_new


def bundle_adjust(
    poses,
    landmarks,
    obs_kf,
    obs_pt,
    obs_w,
    obs_n=None,
    fixed_mask=None,
    config: BAConfig | None = None,
    mesh=None,
    poses_init=None,
):
    """Damped Gauss-Newton BA. Arguments:

    poses: (K,4,4) object->camera; landmarks: (L,3) object frame;
    obs_kf: (L,M) keyframe index per observation; obs_pt: (L,M,3) observed
    camera-space points; obs_w: (L,M) weights, 0 = padding; obs_n: optional
    (L,M,3) observed surface normals (camera frame) enabling point-to-plane
    residuals; fixed_mask: (K,) bool, True = pose pinned (defaults to pinning
    pose 0).

    ``mesh``: optional ``jax.sharding.Mesh`` with a ``batch`` axis — landmarks
    are sharded over it and the reduced camera system is formed with psum
    (pads L up to a multiple of the axis size with zero-weight landmarks).

    Returns (poses (K,4,4), landmarks (L,3), costs (n_iters,)).
    """
    cfg = config or BAConfig()
    poses = jnp.asarray(poses, jnp.float32)
    X = jnp.asarray(landmarks, jnp.float32)
    obs_kf = jnp.asarray(obs_kf, jnp.int32)
    obs_pt = jnp.asarray(obs_pt, jnp.float32)
    obs_w = jnp.asarray(obs_w, jnp.float32)
    if obs_n is not None:
        obs_n = jnp.asarray(obs_n, jnp.float32)
    K_poses = poses.shape[0]
    if fixed_mask is None:
        fixed_mask = np.zeros(K_poses, bool)
        fixed_mask[0] = True
    fixed_mask = jnp.asarray(fixed_mask, bool)
    poses_init = poses if poses_init is None else jnp.asarray(poses_init, jnp.float32)

    # drop under-observed landmarks (their A would be singular)
    n_obs = (obs_w > 0).sum(axis=1)
    keep = n_obs >= cfg.min_obs
    obs_w = obs_w * keep[:, None]

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.shape["batch"]
        L = X.shape[0]
        pad = (-L) % n_dev

        def padl(x):
            if not pad:
                return x
            return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])

        X, obs_kf, obs_pt, obs_w = padl(X), padl(obs_kf), padl(obs_pt), padl(obs_w)
        if obs_n is not None:
            obs_n = padl(obs_n)

        shard = NamedSharding(mesh, P("batch"))
        repl = NamedSharding(mesh, P())
        X = jax.device_put(X, shard)
        obs_kf = jax.device_put(obs_kf, shard)
        obs_pt = jax.device_put(obs_pt, shard)
        obs_w = jax.device_put(obs_w, shard)
        if obs_n is not None:
            obs_n = jax.device_put(obs_n, shard)
        poses = jax.device_put(poses, repl)

        from jax import shard_map

        n_spec = P() if obs_n is None else P("batch")
        step = shard_map(
            functools.partial(_ba_iteration, cfg=cfg, axis_name="batch"),
            mesh=mesh,
            in_specs=(P(), P("batch"), P("batch"), P("batch"), P("batch"),
                      n_spec, P(), P(), P()),
            out_specs=(P(), P("batch"), P(), P()),
            check_vma=False,
        )
        poses, X, costs = _lm_loop(step, poses, X, obs_kf, obs_pt, obs_w,
                                   obs_n, fixed_mask, poses_init, cfg)
        if pad:
            X = X[:-pad]
        return poses, X, costs

    return _lm_loop(
        functools.partial(_ba_iteration, cfg=cfg),
        poses, X, obs_kf, obs_pt, obs_w, obs_n, fixed_mask, poses_init, cfg,
    )


def _lm_loop(step, poses, X, obs_kf, obs_pt, obs_w, obs_n, fixed_mask,
             poses_init, cfg):
    """Host-side Levenberg-Marquardt control: accept a step only when the
    robust cost decreases; otherwise revert and raise lambda."""
    lam = cfg.damping
    costs = []
    for _ in range(cfg.n_iters):
        lam_arr = jnp.asarray(lam, jnp.float32)
        poses_new, X_new, cost, cost_new = step(
            poses, X, obs_kf, obs_pt, obs_w, obs_n, fixed_mask, lam_arr,
            poses_init,
        )
        costs.append(cost)
        if float(cost_new) <= float(cost):
            poses, X = poses_new, X_new
            lam = max(lam * 0.5, 1e-6)
        else:
            lam = min(lam * 10.0, cfg.damping_max)
    return poses, X, jnp.stack([jnp.asarray(c) for c in costs])


# ---------------------------------------------------------------------------
# Problem construction from keyframes (projective data association)
# ---------------------------------------------------------------------------

def _normal_maps(depths, K):
    """Camera-space surface normals from depth maps by central differences of
    the backprojected xyz map; zero where invalid. depths: (F,H,W)."""
    F, H, W = depths.shape
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    x = (us - K[0, 2]) / K[0, 0] * depths
    y = (vs - K[1, 2]) / K[1, 1] * depths
    xyz = np.stack([x, y, depths], axis=-1)  # (F,H,W,3)
    du = np.zeros_like(xyz)
    dv = np.zeros_like(xyz)
    du[:, :, 1:-1] = xyz[:, :, 2:] - xyz[:, :, :-2]
    dv[:, 1:-1, :] = xyz[:, 2:, :] - xyz[:, :-2, :]
    n = np.cross(du, dv)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-12)
    # orient toward the camera (points have +z; camera at origin)
    flip = (np.sum(n * xyz, axis=-1, keepdims=True) > 0)
    n = np.where(flip, -n, n)
    valid = (depths > 0.001)[..., None] & (norm > 1e-9)
    # a normal from differencing across a depth edge is garbage: require the
    # neighbors used to be close in depth
    edge = np.zeros_like(depths, bool)
    edge[:, :, 1:-1] |= np.abs(depths[:, :, 2:] - depths[:, :, :-2]) > 0.02
    edge[:, 1:-1, :] |= np.abs(depths[:, 2:, :] - depths[:, :-2, :]) > 0.02
    edge |= depths <= 0.001
    return np.where(valid & ~edge[..., None], n, 0.0).astype(np.float32)


def build_ba_problem(
    depths,
    masks,
    cam_in_obs,
    K,
    n_landmarks=512,
    max_obs=None,
    assoc_tau=0.015,
    seed=0,
    use_normals=True,
    crease_w=0.2,
):
    """Build a 3D-point BA problem from keyframe depth maps by projective
    association (the depth-only analog of feature matching, which the
    reference snapshot does not ship — SURVEY.md note 4).

    Landmark candidates are sampled from every keyframe's masked depth,
    backprojected into the object frame with the CURRENT pose estimates; an
    observation exists in keyframe k when the landmark projects inside k's
    mask and the observed depth at that (bilinear-sampled) subpixel agrees
    within ``assoc_tau``. Surface normals from the depth map make the
    residuals point-to-plane — projective association slides on flat
    surfaces otherwise.

    depths: (F,H,W); masks: (F,H,W); cam_in_obs: (F,4,4); K: (3,3).
    Returns dict(poses_ob_in_cam (F,4,4), landmarks (L,3), obs_kf (L,M),
    obs_pt (L,M,3), obs_w (L,M), obs_n (L,M,3)).
    """
    depths = np.asarray(depths, np.float32)
    masks = np.asarray(masks) > 0
    cam_in_obs = np.asarray(cam_in_obs, np.float64)
    K = np.asarray(K, np.float64)
    F, H, W = depths.shape
    max_obs = max_obs or F
    rng = np.random.default_rng(seed)
    Kinv = np.linalg.inv(K)
    normals = _normal_maps(depths, K) if use_normals else None

    # sample candidates round-robin across frames. Pixels WITHOUT a clean
    # normal (creases, silhouette-adjacent) are kept: their observations
    # become point-to-point rows, which carry the in-plane information a
    # plane-only system lacks (a single visible face constrains just 3 DoF).
    per_frame = int(np.ceil(n_landmarks / F))
    lm_obj = []
    lm_n_obj = []
    for f in range(F):
        ok = masks[f] & (depths[f] > 0.001)
        vs, us = np.where(ok)
        if len(us) == 0:
            continue
        sel = rng.choice(len(us), size=min(per_frame, len(us)), replace=False)
        u, v = us[sel], vs[sel]
        z = depths[f][v, u]
        pc = (Kinv @ np.stack([u * z, v * z, z])).T  # cam points (n,3)
        po = (cam_in_obs[f] @ np.concatenate([pc, np.ones((len(pc), 1))], 1).T).T[:, :3]
        lm_obj.append(po)
        if normals is not None:
            lm_n_obj.append(normals[f][v, u] @ cam_in_obs[f][:3, :3].T)
    if not lm_obj:
        raise ValueError("no valid landmark candidates (empty masks/depths)")
    lm_obj = np.concatenate(lm_obj)[:n_landmarks]
    lm_n_obj = np.concatenate(lm_n_obj)[:n_landmarks] if lm_n_obj else None
    L = len(lm_obj)

    ob_in_cams = np.linalg.inv(cam_in_obs)  # (F,4,4)

    # project every landmark into every frame (F x L, both small)
    pts_h = np.concatenate([lm_obj, np.ones((L, 1))], axis=1)  # (L,4)
    cam_pts = np.einsum("fij,lj->fli", ob_in_cams, pts_h)[..., :3]  # (F,L,3)
    z = cam_pts[..., 2]
    uv = np.einsum("ij,flj->fli", K, cam_pts)  # (F,L,3)
    u = uv[..., 0] / np.maximum(uv[..., 2], 1e-9)
    v = uv[..., 1] / np.maximum(uv[..., 2], 1e-9)

    # bilinear depth at the exact subpixel; valid only when all four taps
    # exist and agree (no sampling across depth edges)
    u0 = np.floor(u).astype(np.int64)
    v0 = np.floor(v).astype(np.int64)
    fu = (u - u0).astype(np.float32)
    fv = (v - v0).astype(np.float32)
    inb = (z > 0.001) & (u0 >= 0) & (u0 < W - 1) & (v0 >= 0) & (v0 < H - 1)
    u0c = np.clip(u0, 0, W - 2)
    v0c = np.clip(v0, 0, H - 2)
    fidx = np.arange(F)[:, None]
    d00 = depths[fidx, v0c, u0c]
    d01 = depths[fidx, v0c, u0c + 1]
    d10 = depths[fidx, v0c + 1, u0c]
    d11 = depths[fidx, v0c + 1, u0c + 1]
    taps = np.stack([d00, d01, d10, d11])
    taps_ok = (taps > 0.001).all(0) & (taps.max(0) - taps.min(0) < assoc_tau)
    d_obs = (
        d00 * (1 - fu) * (1 - fv)
        + d01 * fu * (1 - fv)
        + d10 * (1 - fu) * fv
        + d11 * fu * fv
    )
    m_obs = masks[fidx, v0c, u0c]
    valid = inb & taps_ok & m_obs & (np.abs(d_obs - z) < assoc_tau)

    # observed camera point at the exact subpixel
    y = np.stack(
        [
            (u - K[0, 2]) / K[0, 0] * d_obs,
            (v - K[1, 2]) / K[1, 1] * d_obs,
            d_obs,
        ],
        axis=-1,
    )  # (F,L,3)
    if normals is not None:
        n_obs_map = normals[fidx, np.round(v).astype(np.int64).clip(0, H - 1),
                            np.round(u).astype(np.int64).clip(0, W - 1)]  # (F,L,3)
        lm_n_cam = np.einsum("fij,lj->fli", ob_in_cams[:, :3, :3], lm_n_obj)
        has_lm_n = np.linalg.norm(lm_n_obj, axis=-1) > 0.5  # (L,)
        has_obs_n = np.linalg.norm(n_obs_map, axis=-1) > 0.5  # (F,L)
        agree = np.sum(n_obs_map * lm_n_cam, axis=-1)  # (F,L)
        # both normals clean + agree (~20 deg): plane observation.
        # either side crease-like: point observation (obs_n zeroed below).
        # both clean but DISAGREEING: a mis-association across surfaces - drop.
        plane_obs = has_lm_n[None] & has_obs_n & (agree > 0.94)
        mismatch = has_lm_n[None] & has_obs_n & (agree <= 0.94)
        valid &= ~mismatch
        n_obs_map = np.where(plane_obs[..., None], n_obs_map, 0.0)
        # crease/silhouette point observations: down-weighted anchors for the
        # in-plane null space (their projective association is biased by the
        # local kink, so they must not dominate the plane constraints)
        w_map = np.where(plane_obs, 1.0, crease_w).astype(np.float32)
    else:
        w_map = np.ones((F, L), np.float32)

    # pack to (L, max_obs)
    obs_kf = np.zeros((L, max_obs), np.int32)
    obs_pt = np.zeros((L, max_obs, 3), np.float32)
    obs_w = np.zeros((L, max_obs), np.float32)
    obs_n = np.zeros((L, max_obs, 3), np.float32)
    for l in range(L):
        fs = np.where(valid[:, l])[0][:max_obs]
        obs_kf[l, : len(fs)] = fs
        obs_pt[l, : len(fs)] = y[fs, l]
        obs_w[l, : len(fs)] = w_map[fs, l]
        if normals is not None:
            obs_n[l, : len(fs)] = n_obs_map[fs, l]

    return dict(
        poses_ob_in_cam=ob_in_cams.astype(np.float32),
        landmarks=lm_obj.astype(np.float32),
        obs_kf=obs_kf,
        obs_pt=obs_pt,
        obs_w=obs_w,
        obs_n=obs_n if normals is not None else None,
    )


def pose_graph_ba(
    depths, masks, cam_in_obs, K,
    n_landmarks=512, config: BAConfig | None = None, mesh=None, rounds=3,
):
    """End-to-end pose-graph BA over keyframes: ``rounds`` outer loops of
    [projective re-association -> Schur-complement GN] (re-association per
    round is what lets wrong initial correspondences heal, exactly as in
    ICP). Returns refined ``cam_in_obs`` (F,4,4) and the final cost."""
    # NOTE pose_prior (off by default) anchors poses at the tracked
    # initialization: useful when the object is near-symmetric at the sensor
    # resolution (sphere-like: orbital null space; single plane: in-plane
    # null space), where depth-only BA cannot observe some directions and
    # would drift along them. It also damps legitimate corrections, so keep
    # it 0 for well-structured objects.
    cfg = config or BAConfig()
    cams = np.asarray(cam_in_obs, np.float64).copy()
    poses_anchor = np.linalg.inv(cams).astype(np.float32)
    cost = float("nan")
    for r in range(rounds):
        prob = build_ba_problem(depths, masks, cams, K, n_landmarks=n_landmarks)
        poses, _, costs = bundle_adjust(
            prob["poses_ob_in_cam"], prob["landmarks"], prob["obs_kf"],
            prob["obs_pt"], prob["obs_w"], obs_n=prob["obs_n"],
            config=cfg, mesh=mesh, poses_init=poses_anchor,
        )
        cams = np.linalg.inv(np.asarray(poses, np.float64))
        cost = float(np.asarray(costs)[-1])
    return cams, cost
