"""Synthetic render-and-compare training data.

The reference trains its networks from pre-rendered H5 archives
(learning/datasets/h5_dataset.py) that are not distributed. This module
generates equivalent training pairs on the fly with the framework's own
renderer — fully on device, one jitted program:

- sample ground-truth object poses in the camera frustum;
- 'observed' crop B = render at the GT pose; 'hypothesis' crop A = render at
  a perturbed pose (perturbations bounded by the refiner normalizers, the
  distribution TrainRefinerConfig implies);
- both rendered straight into the crop window of the PERTURBED pose and
  normalized exactly like the test-time pipeline (engine/crop.py), so
  train/test inputs match by construction;
- targets are the egocentric deltas the refiner must predict, or the ADD
  ranking the scorer must respect.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.ops import raster
from foundationpose_tpu.ops.raster_pallas import render_crops_pallas


def _sample_poses(key, batch, z_range=(0.4, 1.0), xy_frac=0.25):
    """Random rotations + translations in the frustum."""
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (batch, 3)) * 2.0
    R = geo.so3_exp_map(w)
    z = jax.random.uniform(k2, (batch, 1), minval=z_range[0], maxval=z_range[1])
    xy = jax.random.uniform(k3, (batch, 2), minval=-xy_frac, maxval=xy_frac) * z
    t = jnp.concatenate([xy, z], axis=-1)
    poses = jnp.zeros((batch, 4, 4)).at[:, 3, 3].set(1.0)
    poses = poses.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return poses


def _perturb(key, poses, trans_scale, rot_scale):
    k1, k2 = jax.random.split(key)
    dt = jax.random.uniform(k1, (poses.shape[0], 3), minval=-1, maxval=1) * trans_scale
    dw = jax.random.uniform(k2, (poses.shape[0], 3), minval=-1, maxval=1) * rot_scale
    dR = geo.so3_exp_map(dw)
    return geo.egocentric_delta_pose_to_pose(poses, dt, dR)


def _augment_observed(key, rgb, xyz, mask, t, radius):
    """Domain randomization of the OBSERVED crop (B side) so training
    matches test conditions, where the crop window contains background,
    clutter, sensor holes and occluders rather than a black void:

    - background: random per-sample base color + pixel noise for rgb —
      half the samples get a random CHECKERBOARD instead (structured
      backgrounds like tabletops/backdrops must not read as object
      texture) — and random 3D points near/behind the object for xyz
      (teaches the nets to ignore arbitrary off-object geometry — the
      normalize step only zeroes points beyond 2 radii, so near-clutter
      survives exactly like at test);
    - depth holes: coarse random dropout of xyz validity (sensor holes);
    - occluder: a random rectangle IN FRONT of the object (rgb + xyz
      replaced), the visible-mask occlusion case;
    - rgb noise on every pixel.

    rgb in [0,1]; xyz cam-space with invalid = 0. Returns (rgb, xyz)."""
    B, S = rgb.shape[0], rgb.shape[1]
    keys = jax.random.split(key, 12)
    valid = xyz[..., 2:3] > 0.001

    # background rgb: per-sample base color + noise, or a random checker
    bg_col = jax.random.uniform(keys[0], (B, 1, 1, 3))
    bg_rgb = jnp.clip(
        bg_col + 0.15 * jax.random.normal(keys[1], (B, S, S, 3)), 0, 1
    )
    cell = jax.random.randint(keys[10], (B, 1, 1), 4, 40)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, S, S), 2)
    board = ((ii // cell + jj // cell) % 2)[..., None].astype(jnp.float32)
    col2 = jax.random.uniform(keys[11], (B, 1, 1, 3))
    checker_rgb = bg_col * board + col2 * (1.0 - board)
    use_checker = jax.random.bernoulli(keys[10], 0.5, (B, 1, 1, 1))
    bg_rgb = jnp.where(use_checker, checker_rgb, bg_rgb)
    rgb = jnp.where(mask[..., None], rgb, bg_rgb)

    # background xyz: random points around the object at depth offsets
    # U(0.03, 0.5) behind the surface, half the samples inside the 2-radius
    # normalization shell (surviving clutter), half beyond (zeroed)
    dz = jax.random.uniform(keys[2], (B, S, S, 1), minval=0.03, maxval=0.5)
    dxy = jax.random.uniform(
        keys[3], (B, S, S, 2), minval=-2.0, maxval=2.0
    ) * radius
    bg_xyz = jnp.concatenate([t[:, None, None, :2] + dxy,
                              t[:, None, None, 2:] + dz], axis=-1)
    bg_on = jax.random.bernoulli(
        keys[4], jax.random.uniform(keys[5], (B, 1, 1, 1), minval=0.3,
                                    maxval=1.0), (B, S, S, 1)
    )
    xyz = jnp.where(valid, xyz, jnp.where(bg_on, bg_xyz, 0.0))

    # sensor holes: coarse 8x8-block dropout of xyz
    hole_p = jax.random.uniform(keys[6], (B, 1, 1), maxval=0.15)
    hole = jax.random.bernoulli(keys[7], hole_p, (B, S // 8, S // 8))
    hole = jnp.repeat(jnp.repeat(hole, 8, axis=1), 8, axis=2)[..., None]
    xyz = jnp.where(hole, 0.0, xyz)

    # occluder rectangle in front (prob 0.5 per sample)
    u0 = jax.random.uniform(keys[8], (B, 4))  # cx, cy, w, h in [0,1]
    ii = jax.lax.broadcasted_iota(jnp.float32, (B, S, S), 1) / S
    jj = jax.lax.broadcasted_iota(jnp.float32, (B, S, S), 2) / S
    half_w = 0.05 + 0.15 * u0[:, 2:3, None]
    half_h = 0.05 + 0.15 * u0[:, 3:4, None]
    inside = (
        (jnp.abs(ii - u0[:, 1:2, None]) < half_h)
        & (jnp.abs(jj - u0[:, 0:1, None]) < half_w)
    )
    occ_keys = jax.random.split(keys[9], 3)
    occ_on = jax.random.bernoulli(occ_keys[0], 0.5, (B, 1, 1))
    inside = (inside & occ_on)[..., None]
    occ_col = jax.random.uniform(occ_keys[1], (B, 1, 1, 3))
    occ_z = t[:, None, None, 2:] - jax.random.uniform(
        occ_keys[2], (B, 1, 1, 1), minval=0.05, maxval=0.25
    )
    occ_xyz = jnp.concatenate(
        [jnp.broadcast_to(t[:, None, None, :2], (B, S, S, 2)),
         jnp.broadcast_to(occ_z, (B, S, S, 1))], axis=-1
    )
    rgb = jnp.where(inside, occ_col, rgb)
    xyz = jnp.where(inside, occ_xyz, xyz)

    rgb = jnp.clip(rgb + 0.02 * jax.random.normal(keys[1], rgb.shape), 0, 1)
    return rgb, xyz


def _composite_distractor(key, render_fn, mesh_tensors, K, tfs, gt_poses,
                          mesh_diameter, rgbB, xyzB, maskB):
    """Render the SAME mesh at a second nearby pose and z-composite it into
    the observed crops (prob 0.6 per sample). This is the hardest clutter
    negative there is — an identical-looking object 0.7-1.6 diameters away,
    sometimes partially occluding the target — and exactly the eval-suite
    condition the r5 nets failed on (coherent distractor objects in the
    crop pulled refined hypotheses 30 cm off; random-noise backgrounds
    never taught the nets to ignore coherent geometry)."""
    B = gt_poses.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    w = jax.random.normal(k1, (B, 3)) * 2.0
    dR = geo.so3_exp_map(w)
    direction = jax.random.normal(k2, (B, 3)) * jnp.array([1.0, 1.0, 0.35])
    direction = direction / jnp.maximum(
        jnp.linalg.norm(direction, axis=-1, keepdims=True), 1e-9
    )
    dist = jax.random.uniform(k3, (B, 1), minval=0.7, maxval=1.6)
    dpose = gt_poses.at[:, :3, :3].set(dR)
    dpose = dpose.at[:, :3, 3].add(direction * dist * mesh_diameter)
    rD = render_fn(mesh_tensors, dpose, K, tfs)
    on = jax.random.bernoulli(k2, 0.6, (B, 1, 1, 1))
    oz = xyzB[..., 2:3]
    dz = rD["xyz"][..., 2:3]
    front = rD["mask"][..., None] & ((oz <= 0.001) | (dz < oz)) & on
    rgb = jnp.where(front, rD["rgb"], rgbB)
    xyz = jnp.where(front, rD["xyz"], xyzB)
    return rgb, xyz, maskB | front[..., 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "input_size", "normalize_xyz", "use_pallas", "augment",
    ),
)
def make_refine_batch(
    key,
    mesh_tensors,
    K,
    mesh_diameter,
    batch=32,
    input_size=160,
    crop_ratio=1.2,
    trans_scale=0.02,
    rot_scale=0.3490658503988659,  # 20 deg
    normalize_xyz=True,
    use_pallas=False,
    augment=False,
):
    """Returns dict: A (B,S,S,6) hypothesis crops, B (B,S,S,6) observed crops,
    trans_gt (B,3), rot_gt (B,3,3) — the egocentric deltas A->B.
    ``augment=True`` domain-randomizes the observed side (background,
    holes, occluders — see _augment_observed)."""
    S = input_size
    kp, kd, ka = jax.random.split(key, 3)
    gt = _sample_poses(kp, batch)
    hyp = _perturb(kd, gt, trans_scale, rot_scale)

    tfs = geo.compute_crop_window_tf_batch(hyp, K, crop_ratio, mesh_diameter, (S, S))
    render = render_crops_pallas if use_pallas else raster.render_crops
    rA = render(mesh_tensors, hyp, K, tfs, out_hw=(S, S), use_light=True)
    rB = render(mesh_tensors, gt, K, tfs, out_hw=(S, S), use_light=True)

    t = hyp[:, :3, 3]
    rgbB, xyzB = rB["rgb"], rB["xyz"]
    if augment:
        ka_d, ka_o = jax.random.split(ka)
        rgbB, xyzB, maskB = _composite_distractor(
            ka_d,
            lambda mt, p, k, tf: render(mt, p, k, tf, out_hw=(S, S),
                                        use_light=True),
            mesh_tensors, K, tfs, gt, mesh_diameter, rgbB, xyzB, rB["mask"],
        )
        rgbB, xyzB = _augment_observed(
            ka_o, rgbB, xyzB, maskB, t, mesh_diameter / 2.0
        )

    def norm(xyz):
        invalid = xyz[..., 2:3] < 0.001
        c = xyz - t[:, None, None, :]
        if not normalize_xyz:
            return c
        scaled = c / (mesh_diameter / 2.0)
        bad = invalid | (jnp.abs(scaled) >= 2)
        return jnp.where(bad, 0.0, scaled)

    A = jnp.concatenate([rA["rgb"], norm(rA["xyz"])], axis=-1)
    B = jnp.concatenate([rgbB, norm(xyzB)], axis=-1)
    trans_gt, rot_gt = geo.pose_to_egocentric_delta_pose(hyp, gt)
    return {"A": A, "B": B, "trans_gt": trans_gt, "rot_gt": rot_gt,
            "poseA": hyp, "poseB": gt}


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_hyp", "input_size", "normalize_xyz", "use_pallas", "augment",
    ),
)
def make_score_batch(
    key,
    mesh_tensors,
    K,
    mesh_diameter,
    model_pts,
    n_hyp=16,
    input_size=160,
    crop_ratio=1.2,
    trans_scale=0.04,
    rot_scale=0.9,
    normalize_xyz=True,
    use_pallas=False,
    augment=False,
):
    """One frame with ``n_hyp`` perturbed hypotheses of one GT pose, plus
    their ADD errors (ranking supervision, TrainingConfig 'pairwise_valid').
    ``augment=True``: the shared observed frame gets ONE domain
    randomization (same background/holes/occluder across the hypothesis
    set, like a real frame)."""
    S = input_size
    kp, kd, ka = jax.random.split(key, 3)
    gt = _sample_poses(kp, 1)
    gt = jnp.repeat(gt, n_hyp, axis=0)
    hyp = _perturb(kd, gt, trans_scale, rot_scale)

    tfs = geo.compute_crop_window_tf_batch(hyp, K, crop_ratio, mesh_diameter, (S, S))
    render = render_crops_pallas if use_pallas else raster.render_crops
    rA = render(mesh_tensors, hyp, K, tfs, out_hw=(S, S), use_light=True)
    rB = render(mesh_tensors, gt, K, tfs, out_hw=(S, S), use_light=True)

    t = hyp[:, :3, 3]
    rgbB, xyzB = rB["rgb"], rB["xyz"]
    if augment:
        # note: randomization is per-crop, not per-frame — crops of one
        # hypothesis set see different backgrounds/occluders. Harsher than
        # test conditions (scores must be background-invariant regardless),
        # and much simpler than frame-coordinate-consistent noise.
        ka_d, ka_o = jax.random.split(ka)
        rgbB, xyzB, maskB = _composite_distractor(
            ka_d,
            lambda mt, p, k, tf: render(mt, p, k, tf, out_hw=(S, S),
                                        use_light=True),
            mesh_tensors, K, tfs, gt, mesh_diameter, rgbB, xyzB, rB["mask"],
        )
        rgbB, xyzB = _augment_observed(
            ka_o, rgbB, xyzB, maskB, t, mesh_diameter / 2.0
        )

    def norm(xyz):
        invalid = xyz[..., 2:3] < 0.1
        c = xyz - t[:, None, None, :]
        if not normalize_xyz:
            return c
        scaled = c / (mesh_diameter / 2.0)
        bad = invalid | (jnp.abs(scaled) >= 2)
        return jnp.where(bad, 0.0, scaled)

    A = jnp.concatenate([rA["rgb"], norm(rA["xyz"])], axis=-1)
    B = jnp.concatenate([rgbB, norm(xyzB)], axis=-1)
    pts_h = geo.transform_pts(model_pts, hyp)
    pts_g = geo.transform_pts(model_pts, gt)
    adds = jnp.linalg.norm(pts_h - pts_g, axis=-1).mean(axis=-1)  # ADD per hyp
    return {"A": A, "B": B, "adds": adds}


def train_scorer_synthetic(mesh, K, steps=200, n_hyp=8, input_size=64,
                           seed=0, lr=1e-3, log_every=50, norm="group",
                           loss_mode="listwise"):
    """Small end-to-end training driver: ScoreNetMultiPair on on-the-fly
    synthetic hypothesis sets ranked by ADD (the supervision surface of
    training_config.py:51; the reference trainer itself is absent).
    ``norm="group"`` by default: training the norm-free inference
    architecture from scratch collapses (the deep conv stack's pooled
    features barely separate hypotheses at init); checkpoint IMPORT still
    uses the norm-free net with folded BN. Returns (net, params, losses)."""
    import logging

    import optax

    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.models import training
    from foundationpose_tpu.models.score_net import ScoreNetMultiPair

    bounds = mesh.bounds
    centered = mesh.translated(-(bounds[0] + bounds[1]) / 2)
    mt = raster.make_mesh_tensors(centered)
    diameter = meshio.compute_mesh_diameter(mesh=centered)
    model_pts = jnp.asarray(centered.vertices, jnp.float32)

    net = ScoreNetMultiPair(c_in=6, dtype=jnp.float32, norm=norm,
                            residual_attn=True)
    dummy = jnp.zeros((2, input_size, input_size, 6))
    params = net.init(jax.random.PRNGKey(seed), dummy, dummy, 2)
    # validated from-scratch recipe: warmup -> cosine decay + gradient clip
    # (a flat adam at this depth is NaN-prone early and plateau-prone late)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, min(300, max(steps // 10, 1)), steps, lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(seed + 1)
    losses = []  # device arrays; synced only at log points + the end
    for it in range(steps):
        key, kb = jax.random.split(key)
        data = make_score_batch(
            kb, mt, jnp.asarray(K, jnp.float32), diameter, model_pts,
            n_hyp=n_hyp, input_size=input_size,
        )
        params, opt_state, loss = training.scorer_train_step(
            net, tx, params, opt_state,
            {"A": data["A"], "B": data["B"], "adds": data["adds"]},
            mode=loss_mode,
        )
        losses.append(loss)
        if it % log_every == 0:
            logging.info("scorer train step %d loss %.5f", it, float(loss))
    return net, params, [float(l) for l in losses]


def train_refiner_synthetic(mesh, K, steps=200, batch=16, input_size=64,
                            seed=0, lr=1e-4, log_every=50):
    """Small end-to-end training driver: RefineNet on on-the-fly synthetic
    pairs. Returns (net, params, losses)."""
    import logging

    import numpy as np
    import optax

    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.models import training
    from foundationpose_tpu.models.refine_net import RefineNet

    bounds = mesh.bounds
    centered = mesh.translated(-(bounds[0] + bounds[1]) / 2)
    mt = raster.make_mesh_tensors(centered)
    diameter = meshio.compute_mesh_diameter(mesh=centered)

    net = RefineNet(c_in=6, dtype=jnp.float32)
    params, tx, opt_state = training.make_refiner_train_state(
        net, jax.random.PRNGKey(seed), input_size=input_size, lr=lr
    )
    key = jax.random.PRNGKey(seed + 1)
    losses = []
    for it in range(steps):
        key, kb = jax.random.split(key)
        data = make_refine_batch(
            kb, mt, jnp.asarray(K, jnp.float32), diameter,
            batch=batch, input_size=input_size,
        )
        batch_t = {
            "A": data["A"], "B": data["B"],
            "trans_gt": data["trans_gt"], "rot_gt": data["rot_gt"],
        }
        params, opt_state, loss = training.refiner_train_step(
            net, tx, params, opt_state, batch_t, mesh_diameter=float(diameter)
        )
        losses.append(loss)  # device array; sync only at log points + end
        if it % log_every == 0:
            logging.info("refiner train step %d loss %.5f", it, float(loss))
    return net, params, [float(l) for l in losses]
