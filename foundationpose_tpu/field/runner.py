"""Neural-object-field reconstruction runner: online SDF NeRF training with
joint per-frame pose optimization, mesh extraction, and rendering.

Behavioral counterpart of the reference NerfRunner (bundlesdf/nerf_runner.py:
ray building :248-318, train loop + losses :508-692, occupancy-guided
sampling :696-798, compositing :849-886, mesh extraction :1063-1119) —
re-architected for TPU:

- one jitted, donated train step (sampling + field query + all losses +
  Adam update) instead of chunked CUDA launches; the ray batch axis is the
  data-parallel axis over the device mesh;
- dense occupancy grid instead of the kaolin octree (field/sampling.py);
- OpenCV camera convention throughout (the reference converts to GL).

The per-frame PoseArray makes the training loop a gradient-based bundle
adjustment: poses and map (hash grid + MLP) are optimized jointly by Adam,
exactly like the reference couples them (nerf_runner.py:769-771).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from foundationpose_tpu.field import bounds as bounds_mod
from foundationpose_tpu.field import losses as losses_mod
from foundationpose_tpu.field import sampling
from foundationpose_tpu.field.meshing import extract_sdf_grid_mesh
from foundationpose_tpu.field.nerf import ObjectField


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Defaults = the reference BundleSDF YCB-V config (config_ycbv.yml)."""

    n_step: int = 1000
    n_rand: int = 2048
    lrate: float = 0.01
    lrate_pose: float = 0.01
    decay_rate: float = 0.1
    n_samples: int = 128
    n_samples_around_depth: int = 128
    # hierarchical importance sampling (reference N_importance,
    # nerf_runner.py:807-830): resample ``n_importance`` extra depths per ray
    # from the coarse pass's compositing weights (inverse-CDF sample_pdf,
    # nerf_helpers.py:358-385), query the field there too, and run every loss
    # over the union. 0 = off, like the reference default (config_ycbv.yml).
    n_importance: int = 0
    trunc: float = 0.01  # meters (scaled by sc_factor internally)
    sdf_lambda: float = 5.0
    neg_trunc_ratio: float = 1.0
    fs_sdf: float = 1.0
    near: float = 0.1  # meters
    far: float = 2.0  # meters
    rgb_weight: float = 100.0
    fs_weight: float = 100.0
    empty_weight: float = 1.0
    trunc_weight: float = 6000.0
    feature_reg_weight: float = 0.1
    pose_reg_weight: float = 0.0
    # optional regularizers, 0 by default like the reference
    # (config_ycbv.yml:75,84; nerf_runner.py:559-568)
    fs_rgb_weight: float = 0.0
    eikonal_weight: float = 0.0
    first_frame_weight: float = 1.0
    frame_features: int = 2
    optimize_poses: bool = True
    max_trans: float = 0.02  # meters
    max_rot: float = 10.0  # degrees
    num_levels: int = 16
    log2_hashmap_size: int = 22
    base_res: int = 32
    finest_res: int = 512
    feature_grid_dim: int = 2
    # positional encoder: "triplane" = TPU-native matmul-only encoder (see
    # field/encoders.py); "hash" = reference-parity instant-ngp grid
    # (gridencoder.cu:95-244 semantics), RETIRED as a production mode on
    # TPU — kept only as a numerical-parity reference. Evidence (recorded,
    # not revisable without new measurements): (a) 3-scene head-to-head
    # (scripts/bench_encoders.py --scenes 3, v5e, 1500 steps): triplane
    # ~486k rays/s vs hash ~46k (10.5x) at quality parity (surface error
    # within 3%, SDF sign correctness 1.0 both, comparable pose drift);
    # (b) at the reference's full 2048-ray x 256-sample budget the gap is
    # ~70x — 21.9k vs 311 rays/s steady-state (BENCH_r04) — because the
    # per-sample 128 random HBM gathers (16 levels x 8 corners) and the
    # scatter-add backward (XLA: sort + segment-sum over ~67M index/grad
    # pairs per step) have no efficient mapping onto the TPU memory system:
    # the 2^22-entry level tables exceed VMEM, so even a hand-written
    # Pallas kernel is bound by the same random-access HBM latency the XLA
    # lowering pays. The triplane encoder IS the TPU-native answer to the
    # same requirement (learned multiresolution spatial features): dense
    # regular-access arrays, MXU-friendly, autodiff backward is a dense
    # reduction. Selecting "hash" logs a warning pointing here.
    encoder: str = "triplane"
    triplane_resolutions: tuple = (16, 32, 64, 128)
    triplane_channels: int = 4
    triplane_freqs: int = 4
    sh_degree: int = 3  # multires_views
    occ_resolution: int = 64
    occ_dilate: int = 2
    mask_dilate_first: int = 50
    mask_dilate: int = 30
    rays_valid_depth_only: bool = True
    mesh_resolution: float = 0.003  # meters
    seed: int = 0
    # periodic artifact hooks (reference i_weights/i_img/i_mesh semantics,
    # nerf_runner.py:594-681 + config_ycbv.yml:35-41): every N steps dump a
    # checkpoint / rendered frame / extracted mesh under ``save_dir``.
    # 0 disables a hook; save_dir=None disables all three.
    i_weights: int = 0
    i_img: int = 0
    i_mesh: int = 0
    save_dir: str | None = None


class NeRFRunnerTPU:
    """Train a neural object field from posed RGB-D frames.

    Inputs are PRE-normalized (use ``field.bounds.compute_scene_bounds`` +
    ``preprocess_data``): rgbs (N,H,W,3) in [0,1] with masked pixels zeroed,
    depths (N,H,W) in normalized units (BAD_DEPTH sentinel for invalid),
    masks (N,H,W), poses (N,4,4) cam-in-object normalized (CV convention),
    K (3,3), occ_points (M,3) fused cloud in [-1,1].
    """

    def __init__(self, cfg: FieldConfig, rgbs, depths, masks, poses, K,
                 occ_points, sc_factor, translation):
        self.cfg = cfg
        if cfg.encoder == "hash":
            logging.warning(
                "FieldConfig.encoder='hash' is retired as a production mode "
                "on TPU (~70x slower than triplane at the reference budget, "
                "BENCH_r04; see the FieldConfig.encoder docstring for the "
                "recorded evidence). Use encoder='triplane' unless you need "
                "instant-ngp numerical parity."
            )
        self.sc_factor = float(sc_factor)
        self.translation = np.asarray(translation, dtype=np.float64)
        self.K = np.asarray(K, dtype=np.float64)
        self.poses = np.asarray(poses, dtype=np.float32)
        self.H, self.W = depths.shape[1:3]
        self.num_frames = len(rgbs)
        self.global_step = 0
        self.last_aux = {}  # loss-term dict from the last synced train step

        self.occ_grid = jnp.asarray(
            sampling.build_occupancy_grid(
                occ_points, resolution=cfg.occ_resolution, dilate=cfg.occ_dilate
            )
        )

        self.rays = self._build_rays(rgbs, depths, masks)
        logging.info("rays: %s", self.rays.shape)

        self.field = ObjectField(
            num_frames=self.num_frames,
            frame_features=cfg.frame_features,
            sh_degree=cfg.sh_degree,
            max_trans=cfg.max_trans * self.sc_factor,
            max_rot_deg=cfg.max_rot,
            num_levels=cfg.num_levels,
            level_dim=cfg.feature_grid_dim,
            base_resolution=cfg.base_res,
            desired_resolution=cfg.finest_res,
            log2_hashmap_size=cfg.log2_hashmap_size,
            optimize_poses=cfg.optimize_poses,
            encoder=cfg.encoder,
            triplane_resolutions=tuple(cfg.triplane_resolutions),
            triplane_channels=cfg.triplane_channels,
            triplane_freqs=cfg.triplane_freqs,
        )
        key = jax.random.PRNGKey(cfg.seed)
        self.params = self.field.init(
            key,
            jnp.zeros((2, 4, 3)),
            jnp.zeros((2, 3)),
            jnp.zeros((2,), jnp.int32),
        )

        # two optimizer groups: pose array at lrate_pose, everything else at
        # lrate; both Adam(eps=1e-15) with 0.1^(t/n) decay (nerf_runner
        # create_optimizer :379-391 + schedule_lr :425-429)
        def schedule(base):
            return lambda step: base * cfg.decay_rate ** (step / cfg.n_step)

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "pose"
                if any(getattr(p, "key", None) == "pose_array" for p in path)
                else "basic",
                params,
            )

        self.tx = optax.multi_transform(
            {
                "basic": optax.adam(schedule(cfg.lrate), eps=1e-15),
                "pose": optax.adam(schedule(cfg.lrate_pose), eps=1e-15),
            },
            label_fn,
        )
        self.opt_state = self.tx.init(self.params)
        self.c2w = jnp.asarray(self.poses)
        self._train_step = self._make_train_step()
        self._rng = jax.random.PRNGKey(cfg.seed + 1)

    # ------------------------------------------------------------------
    def _build_rays(self, rgbs, depths, masks):
        """Per-frame ray tensor (host): [dir(3) rgb(3) depth(1) mask(1)
        frame(1) type(1)] from mask-dilated pixels
        (reference make_frame_rays :248-318)."""
        import cv2

        cfg = self.cfg
        H, W, K = self.H, self.W, self.K
        us, vs = np.meshgrid(np.arange(W), np.arange(H))
        dirs = np.stack(
            [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1], np.ones_like(us)],
            axis=-1,
        ).astype(np.float32)
        near_n = cfg.near * self.sc_factor
        far_n = cfg.far * self.sc_factor
        all_rays = []
        for i in range(self.num_frames):
            mask = (np.asarray(masks[i]) > 0).astype(np.uint8)
            dil = cfg.mask_dilate_first if i == 0 else cfg.mask_dilate
            if dil > 0:
                mask_d = cv2.dilate(mask, np.ones((dil, dil), np.uint8))
            else:
                mask_d = mask
            depth = np.asarray(depths[i])
            invalid_depth = ((depth < near_n) | (depth > far_n)) & (mask > 0)
            ray_type = invalid_depth.astype(np.float32)
            sel = mask_d > 0
            if cfg.rays_valid_depth_only:
                sel &= ~invalid_depth
            rows = np.concatenate(
                [
                    dirs[sel],
                    np.asarray(rgbs[i])[sel].reshape(-1, 3),
                    depth[sel].reshape(-1, 1),
                    mask[sel].reshape(-1, 1).astype(np.float32),
                    np.full((sel.sum(), 1), i, np.float32),
                    ray_type[sel].reshape(-1, 1),
                ],
                axis=-1,
            )
            all_rays.append(rows.astype(np.float32))
        return jnp.asarray(np.concatenate(all_rays, axis=0))

    # ------------------------------------------------------------------
    def _make_train_step(self):
        cfg = self.cfg
        field = self.field
        occ = self.occ_grid
        c2w = self.c2w
        trunc = cfg.trunc * self.sc_factor
        near_n = cfg.near * self.sc_factor
        far_n = cfg.far * self.sc_factor
        tx = self.tx

        def loss_fn(params, batch, key):
            dirs_cam = batch[:, 0:3]
            target_rgb = batch[:, 3:6]
            target_d = batch[:, 6]
            frame_ids = batch[:, 8].astype(jnp.int32)
            ray_type = batch[:, 9]

            tf = field.apply(params, frame_ids, method=ObjectField.pose_corrections)
            tf = tf @ c2w[frame_ids]
            rays_o = tf[:, :3, 3]
            dirs_w = jnp.einsum("nij,nj->ni", tf[:, :3, :3], dirs_cam)
            viewdirs = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)

            key, k_imp = jax.random.split(key)
            z_vals, valid = sampling.sample_rays(
                key, rays_o, dirs_w, target_d, occ,
                cfg.n_samples, cfg.n_samples_around_depth,
                trunc, neg_trunc_ratio=cfg.neg_trunc_ratio, far_default=far_n,
                # train losses are per-sample order-free; sample_pdf's bins
                # need ascending z, so sort only when hierarchical sampling is on
                sort=cfg.n_importance > 0,
            )
            pts = rays_o[:, None, :] + dirs_w[:, None, :] * z_vals[..., None]
            inside = (jnp.abs(pts) <= 1.0).all(axis=-1)
            valid = valid & inside

            raw = field.apply(params, pts, viewdirs, frame_ids)

            if cfg.n_importance > 0:
                # hierarchical pass (nerf_runner.py:807-830): inverse-CDF
                # resample from the coarse compositing weights (detached),
                # query the field at the new depths, merge. No re-sort needed:
                # every downstream loss term is per-sample order-free.
                w_c = losses_mod.depth_band_weights(
                    z_vals, target_d, trunc, cfg.sdf_lambda, far_n,
                    cfg.neg_trunc_ratio,
                ) * valid
                z_mid = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
                z_imp = jax.lax.stop_gradient(
                    sampling.sample_pdf(
                        k_imp, z_mid, w_c[:, 1:-1], cfg.n_importance
                    )
                )
                pts_i = (
                    rays_o[:, None, :] + dirs_w[:, None, :] * z_imp[..., None]
                )
                valid_i = (
                    sampling.occupancy_lookup(occ, pts_i)
                    & (jnp.abs(pts_i) <= 1.0).all(axis=-1)
                    & valid.any(axis=-1, keepdims=True)
                )
                raw_i = field.apply(params, pts_i, viewdirs, frame_ids)
                z_vals = jnp.concatenate([z_vals, z_imp], axis=-1)
                valid = jnp.concatenate([valid, valid_i], axis=-1)
                raw = jnp.concatenate([raw, raw_i], axis=-2)

            sdf = raw[..., 3]

            valid_rays = valid.any(axis=-1) & (ray_type == 0)
            ray_w = jnp.where(frame_ids == 0, cfg.first_frame_weight, 1.0)
            ray_w = ray_w * valid_rays
            sample_w = ray_w[:, None] * valid

            weights = losses_mod.depth_band_weights(
                z_vals, target_d, trunc, cfg.sdf_lambda, far_n,
                cfg.neg_trunc_ratio,
            ) * valid
            rgb_map = losses_mod.render_rgb(raw, weights)
            rgb_loss = cfg.rgb_weight * jnp.mean(
                (rgb_map - target_rgb) ** 2 * ray_w[:, None]
            )

            fs, sdf_l, empty, front_m, _ = losses_mod.sdf_losses(
                z_vals, target_d, sdf, trunc, sample_w, near_n, far_n,
                cfg.neg_trunc_ratio, cfg.fs_sdf,
            )
            loss = (
                rgb_loss
                + cfg.fs_weight * fs
                + cfg.trunc_weight * sdf_l
                + cfg.empty_weight * empty
            )
            if cfg.fs_rgb_weight > 0:
                # free-space color pushed to white (nerf_runner.py:559-562)
                loss = loss + cfg.fs_rgb_weight * jnp.mean(
                    ((jax.nn.sigmoid(raw[..., :3]) - 1.0) * front_m[..., None])
                    ** 2
                    * sample_w[..., None]
                )
            if cfg.eikonal_weight > 0:
                # |grad sdf| -> 1 near the surface (nerf_runner.py:564-568);
                # per-point autodiff gradient (sdf at a point depends only on
                # that point, so grad-of-sum gives the per-sample gradient)
                g = jax.grad(
                    lambda p: field.apply(params, p, method=ObjectField.sdf)
                    .sum()
                )(pts.reshape(-1, 3)).reshape(pts.shape)
                near_surf = (sdf < 1.0) & valid
                gnorm = jnp.linalg.norm(g, axis=-1)
                loss = loss + cfg.eikonal_weight * (
                    jnp.sum((gnorm - 1.0) ** 2 * near_surf)
                    / jnp.maximum(near_surf.sum(), 1)
                )
            if cfg.frame_features > 0:
                loss = loss + cfg.feature_reg_weight * jnp.mean(
                    params["params"]["feature_array"] ** 2
                )
            if cfg.optimize_poses and cfg.pose_reg_weight > 0:
                loss = loss + cfg.pose_reg_weight * jnp.linalg.norm(
                    params["params"]["pose_array"][1:]
                )
            # the full loss-term dict (reference logs its 14-metric dict
            # every i_print, nerf_runner.py:623-651; terms that are disabled
            # by config are omitted — static under jit)
            aux = {
                "loss": loss,
                "rgb_loss": rgb_loss, "fs_loss": fs, "sdf_loss": sdf_l,
                "empty_loss": empty,
                "valid_rays": valid_rays.sum(), "valid_samples": valid.sum(),
            }
            return loss, aux

        @jax.jit
        def train_step(params, opt_state, key, batch):
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, key
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        n_rand = cfg.n_rand

        # one fused dispatch per step INCLUDING the ray-batch sampling, with
        # donated (params, opt_state). Steps are issued asynchronously and
        # only synced at log points, so the remote-TPU round trip (~29 ms)
        # overlaps across steps. (A multi-step lax.scan chunk was tried and
        # is pathological on this platform: ~18x slower per step, and the
        # donated scan crashes the TPU worker outright at length >= 10.)
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step_sampled(params, opt_state, key, rays):
            key, k_ids, k_step = jax.random.split(key, 3)
            ids = jax.random.randint(k_ids, (n_rand,), 0, rays.shape[0])
            batch = rays[ids]
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batch, k_step
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, key, loss, aux

        self._train_step_sampled = train_step_sampled
        return train_step

    # ------------------------------------------------------------------
    def train(self, n_step=None, log_every=100):
        n_step = n_step or self.cfg.n_step
        last_loss = 0.0
        loss = aux = None
        for it in range(n_step):
            self.params, self.opt_state, self._rng, loss, aux = (
                self._train_step_sampled(
                    self.params, self.opt_state, self._rng, self.rays
                )
            )
            self.global_step += 1
            if it % log_every == 0:
                # sync point: pull the whole loss-term dict, not just the total
                self.last_aux = {k: float(v) for k, v in aux.items()}
                last_loss = self.last_aux["loss"]
                logging.info(
                    "step %d %s", self.global_step - 1,
                    " ".join(f"{k}={v:.4f}" for k, v in self.last_aux.items()),
                )
            self._artifact_hooks()
        if loss is not None:
            last_loss = float(loss)
            self.last_aux = {k: float(v) for k, v in aux.items()}
        return last_loss

    def _artifact_hooks(self):
        """Periodic checkpoint / rendered-frame / mesh dumps (reference
        nerf_runner.py:594-681 i_weights/i_img/i_mesh), gated by config."""
        cfg = self.cfg
        if not cfg.save_dir:
            return
        step = self.global_step
        import os

        if cfg.i_weights and step % cfg.i_weights == 0:
            os.makedirs(os.path.join(cfg.save_dir, "ckpt"), exist_ok=True)
            self.save(os.path.join(cfg.save_dir, "ckpt", "model_latest.npz"))
        if cfg.i_img and step % cfg.i_img == 0:
            os.makedirs(os.path.join(cfg.save_dir, "image_step"), exist_ok=True)
            rgb_img, _ = self.render_frame(0, stride=4)
            img = np.clip(np.asarray(rgb_img) * 255, 0, 255).astype(np.uint8)
            try:
                from PIL import Image

                Image.fromarray(img).save(
                    os.path.join(cfg.save_dir, "image_step", f"step_{step:07d}.png")
                )
            except Exception as e:  # artifact path must never break training
                logging.warning("i_img dump failed: %s", e)
        if cfg.i_mesh and step % cfg.i_mesh == 0:
            os.makedirs(os.path.join(cfg.save_dir, "mesh_step"), exist_ok=True)
            try:
                from foundationpose_tpu.core import meshio as meshio_mod

                mesh = self.extract_mesh()
                meshio_mod.save_obj(
                    os.path.join(cfg.save_dir, "mesh_step", f"step_{step:07d}.obj"),
                    mesh,
                )
            except Exception as e:
                logging.warning("i_mesh dump failed: %s", e)

    # ------------------------------------------------------------------
    def sdf_fn(self, pts):
        return self.field.apply(
            self.params, jnp.asarray(pts), method=ObjectField.sdf
        )

    def extract_mesh(self, voxel_size=None, isolevel=0.0):
        """Marching tetrahedra over the occupancy-masked SDF grid. Returns a
        Mesh in the NORMALIZED frame (like reference extract_mesh)."""
        voxel = (voxel_size or self.cfg.mesh_resolution) * self.sc_factor
        occ = np.asarray(self.occ_grid)

        def valid_fn(pts):
            return np.asarray(
                sampling.occupancy_lookup(self.occ_grid, jnp.asarray(pts))
            )

        return extract_sdf_grid_mesh(
            lambda p: self.sdf_fn(p),
            bounds=np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]]),
            voxel_size=voxel,
            iso=isolevel,
            valid_fn=valid_fn,
        )

    def mesh_to_real_world(self, mesh):
        """Normalized-frame mesh -> metric object frame, applying the frame-0
        pose correction offset (reference mesh_to_real_world + offset logic,
        nerf_helpers.py:215-250)."""
        mesh = mesh.copy()
        mesh.vertices = mesh.vertices / self.sc_factor - self.translation[None]
        return mesh

    def get_optimized_poses_in_real_world(self):
        """(N,4,4) optimized cam-in-object poses in metric units (CV)."""
        tf = np.asarray(
            self.field.apply(
                self.params,
                jnp.arange(self.num_frames),
                method=ObjectField.pose_corrections,
            )
        )
        optimized = tf @ self.poses
        optimized[:, :3, 3] /= self.sc_factor
        optimized[:, :3, 3] -= self.translation[None]
        return optimized

    # ------------------------------------------------------------------
    def render_frame(self, frame_id, stride=4, chunk=4096):
        """Render rgb+depth for one training frame (debug/eval)."""
        K, H, W = self.K, self.H, self.W
        us, vs = np.meshgrid(np.arange(0, W, stride), np.arange(0, H, stride))
        dirs = np.stack(
            [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1], np.ones_like(us)],
            axis=-1,
        ).reshape(-1, 3).astype(np.float32)
        n = len(dirs)
        fid = np.full((n,), frame_id, np.int32)
        cfg = self.cfg
        trunc = cfg.trunc * self.sc_factor
        far_n = cfg.far * self.sc_factor
        out_rgb = []
        out_depth = []
        key = jax.random.PRNGKey(0)
        for s in range(0, n, chunk):
            d = jnp.asarray(dirs[s : s + chunk])
            f = jnp.asarray(fid[s : s + chunk])
            tf = self.field.apply(
                self.params, f, method=ObjectField.pose_corrections
            ) @ self.c2w[f]
            rays_o = tf[:, :3, 3]
            dirs_w = jnp.einsum("nij,nj->ni", tf[:, :3, :3], d)
            viewdirs = dirs_w / jnp.linalg.norm(dirs_w, axis=-1, keepdims=True)
            tmin, tmax = sampling.ray_box_intersect(rays_o, dirs_w)
            hit = tmin >= 0
            z = sampling.stratified_samples(
                key,
                jnp.where(hit, tmin, 0.0)[:, None],
                jnp.where(hit, tmax, far_n)[:, None],
                cfg.n_samples,
            )
            pts = rays_o[:, None, :] + dirs_w[:, None, :] * z[..., None]
            valid = sampling.occupancy_lookup(self.occ_grid, pts) & hit[:, None]
            raw = self.field.apply(self.params, pts, viewdirs, f)
            sdf = raw[..., 3]
            # surface from SDF zero crossing (reference render_images :446-455)
            signs = sdf[:, 1:] * sdf[:, :-1]
            crossing = (signs < 0) & valid[:, 1:]
            idx = jnp.argmax(crossing, axis=-1)
            has = crossing.any(axis=-1)
            zc = jnp.take_along_axis(z, idx[:, None], axis=1)[:, 0]
            depth = jnp.where(has, zc, 0.0)
            w = losses_mod.depth_band_weights(
                z, depth, trunc, cfg.sdf_lambda, far_n
            ) * valid
            rgb = losses_mod.render_rgb(raw, w)
            out_rgb.append(np.asarray(rgb))
            out_depth.append(np.asarray(depth))
        h, w_ = us.shape
        return (
            np.concatenate(out_rgb).reshape(h, w_, 3),
            np.concatenate(out_depth).reshape(h, w_),
        )

    # ------------------------------------------------------------------
    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "params": jax.device_get(self.params),
                    "opt_state": jax.device_get(self.opt_state),
                    "global_step": self.global_step,
                    "cfg": dataclasses.asdict(self.cfg),
                    "sc_factor": self.sc_factor,
                    "translation": self.translation,
                },
                f,
            )

    def load(self, path):
        with open(path, "rb") as f:
            data = pickle.load(f)
        self.params = jax.device_put(data["params"])
        self.opt_state = jax.device_put(data["opt_state"])
        self.global_step = data["global_step"]
