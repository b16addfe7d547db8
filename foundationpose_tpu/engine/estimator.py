"""FoundationPoseTPU — the pose-engine API: global registration + tracking.

Behavioral counterpart of the reference's ``FoundationPose``
(src/estimater.py:18-268): mesh centering and diameter, icosphere x in-plane
rotation-hypothesis grid with symmetric clustering, translation guess from
the mask/depth, iterative render-and-compare refinement, cross-pose scoring,
and refine-only per-frame tracking — with every device-side stage a jitted
XLA program over the full hypothesis batch.
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core import meshio, poses as poses_mod
from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig
from foundationpose_tpu.ops import image as imops
from foundationpose_tpu.ops import raster


@jax.jit
def _preprocess_depth_jit(depth):
    d = imops.erode_depth(depth, radius=2)
    d = imops.bilateral_filter_depth(d, radius=2)
    return (d,)


@jax.jit
def _preprocess_jit(depth, K):
    d = imops.erode_depth(depth, radius=2)
    d = imops.bilateral_filter_depth(d, radius=2)
    xyz = geo.depth2xyzmap(d, K)
    return d, xyz


def _guess_translation_traced(depth, mask, K):
    """Device-side translation guess (reference estimater.py:137-156): mask
    bbox center ray x median masked depth. Returns (center (3,), n_valid)."""
    H, W = depth.shape
    m = mask > 0
    us = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    vs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    big = jnp.float32(1e9)
    u_min = jnp.min(jnp.where(m, us, big))
    u_max = jnp.max(jnp.where(m, us, -big))
    v_min = jnp.min(jnp.where(m, vs, big))
    v_max = jnp.max(jnp.where(m, vs, -big))
    uc = (u_min + u_max) / 2.0
    vc = (v_min + v_max) / 2.0

    valid = m & (depth >= 0.001)
    n_valid = valid.sum()
    # exact masked median with np.median semantics (mean of the two middle
    # elements for even counts): sort invalids to +inf, index dynamically
    flat = jnp.where(valid, depth, jnp.inf).ravel()
    s = jnp.sort(flat)
    lo = jnp.maximum((n_valid - 1) // 2, 0)
    hi = jnp.maximum(n_valid // 2, 0)
    zc = (s[lo] + s[hi]) / 2.0
    center = jnp.linalg.inv(K) @ jnp.stack([uc, vc, jnp.float32(1.0)]) * zc
    ok = (n_valid > 0) & m.any()
    return jnp.where(ok, center, 0.0), n_valid


@dataclasses.dataclass
class EstimatorConfig:
    min_n_views: int = 40
    inplane_step: int = 60
    cluster_angle_deg: float = 30.0
    register_iterations: int = 5
    track_iterations: int = 2
    max_render_faces: int = 4096  # static triangle-axis bound for the raster
    # optional hierarchical polish: re-refine the top-K scored hypotheses for
    # extra iterations, then re-score (off by default for reference parity)
    final_refine_iterations: int = 0
    final_refine_top_k: int = 8
    refiner: RefinerConfig = dataclasses.field(default_factory=RefinerConfig)
    scorer: ScorerConfig = dataclasses.field(default_factory=ScorerConfig)


class FoundationPoseTPU:
    """Register/track API. Usage:

    >>> est = FoundationPoseTPU(mesh, symmetry_tfs=None)
    >>> pose = est.register(K, rgb, depth, ob_mask)   # (4,4) original frame
    >>> pose = est.track_one(rgb, depth, K)
    """

    def __init__(
        self,
        mesh: meshio.Mesh,
        symmetry_tfs=None,
        config: EstimatorConfig | None = None,
        refiner: PoseRefiner | None = None,
        scorer: PoseScorer | None = None,
    ):
        self.cfg = config or EstimatorConfig()
        self._register_fused = None
        self._track_fused = None
        self.reset_object(mesh, symmetry_tfs)
        self.refiner = refiner or PoseRefiner(self.cfg.refiner)
        self.scorer = scorer or PoseScorer(self.cfg.scorer)
        if self.watertight:
            self._enable_backface_cull()
        self.pose_last = None
        self.scores = None
        self.poses = None

    def _enable_backface_cull(self):
        self.refiner.cfg = dataclasses.replace(self.refiner.cfg, backface_cull=True)
        self.scorer.cfg = dataclasses.replace(self.scorer.cfg, backface_cull=True)
        # the fused programs close over refiner/scorer configs at trace time
        self._register_fused = None
        self._track_fused = None

    # ------------------------------------------------------------------
    def reset_object(self, mesh: meshio.Mesh, symmetry_tfs=None):
        """Center the mesh, compute diameter, build mesh tensors + rotation
        grid (reference estimater.py:44-78, 106-124)."""
        bounds = mesh.bounds
        self.model_center = (bounds[0] + bounds[1]) / 2.0
        self.mesh_ori = mesh
        centered = mesh.translated(-self.model_center)
        self.mesh = centered
        self.diameter = meshio.compute_mesh_diameter(mesh=centered)
        if symmetry_tfs is None:
            symmetry_tfs = np.eye(4)[None]
        self.symmetry_tfs = np.asarray(symmetry_tfs, dtype=np.float64)
        self.mesh_tensors = raster.make_mesh_tensors(
            centered, max_faces=self.cfg.max_render_faces
        )
        self.rot_grid = poses_mod.make_rotation_grid(
            min_n_views=self.cfg.min_n_views,
            inplane_step=self.cfg.inplane_step,
            symmetry_tfs=self.symmetry_tfs,
            cluster_angle_deg=self.cfg.cluster_angle_deg,
        ).astype(np.float32)
        # backface culling is exact for closed CCW meshes and halves the
        # rasterizer's face work; enable it automatically when safe
        self.watertight = meshio.is_watertight(centered)
        if self.watertight and hasattr(self, "refiner"):
            self._enable_backface_cull()
        logging.info(
            "reset_object: diameter=%.4f rot_grid=%s render_faces=%d",
            self.diameter, self.rot_grid.shape, self.mesh_tensors["faces"].shape[0],
        )

    def get_tf_to_centered_mesh(self):
        tf = np.eye(4, dtype=np.float64)
        tf[:3, 3] = -self.model_center
        return tf

    # ------------------------------------------------------------------
    def guess_translation(self, depth, mask, K):
        """Mask bbox center ray x median masked depth (estimater.py:137-156)."""
        vs, us = np.where(mask > 0)
        if len(us) == 0:
            logging.info("mask is all zero")
            return np.zeros(3)
        uc = (us.min() + us.max()) / 2.0
        vc = (vs.min() + vs.max()) / 2.0
        valid = (np.asarray(mask) > 0) & (np.asarray(depth) >= 0.001)
        if not valid.any():
            logging.info("no valid depth within mask")
            return np.zeros(3)
        zc = np.median(np.asarray(depth)[valid])
        center = np.linalg.inv(K) @ np.array([uc, vc, 1.0]) * zc
        return center.reshape(3)

    def _preprocess_depth(self, depth):
        return _preprocess_depth_jit(jnp.asarray(depth, jnp.float32))[0]

    def _preprocess(self, depth, K):
        """One fused jitted call: erode + bilateral + xyz map (per-op eager
        dispatch is expensive on remote-attached TPUs)."""
        return _preprocess_jit(
            jnp.asarray(depth, jnp.float32), jnp.asarray(K, jnp.float32)
        )

    # ------------------------------------------------------------------
    # Fused single-dispatch programs. The TPU here is remote-attached: every
    # dispatch costs a ~29 ms round trip and host<->device bytes move at tens
    # of MB/s, so the whole register/track pipeline (depth preprocess,
    # translation guess, refine loop, scoring, ranking) runs as ONE jitted
    # program with uint8 RGB upload and one packed f32 download.
    def _make_register_fused(self):
        refiner, scorer, cfg = self.refiner, self.scorer, self.cfg

        @functools.partial(jax.jit, static_argnames=("iteration", "diameter"))
        def run(mesh_tensors, rot_grid, K, rgb_u8, depth, mask_u8, iteration,
                diameter):
            rgb = rgb_u8.astype(jnp.float32)
            d = imops.erode_depth(depth, radius=2)
            d = imops.bilateral_filter_depth(d, radius=2)
            xyz_map = geo.depth2xyzmap(d, K)
            center, n_valid = _guess_translation_traced(d, mask_u8, K)
            hyp = rot_grid.at[:, :3, 3].set(center[None])
            refined = refiner.traced_refine(
                mesh_tensors, rgb, xyz_map, K, hyp, diameter, iteration
            )
            scores = scorer.traced_score(
                mesh_tensors, rgb, xyz_map, K, refined, diameter
            )
            if cfg.final_refine_iterations > 0:
                k = min(cfg.final_refine_top_k, rot_grid.shape[0])
                top_i = jax.lax.top_k(scores, k)[1]
                top = refined[top_i]
                top = refiner.traced_refine(
                    mesh_tensors, rgb, xyz_map, K, top, diameter,
                    cfg.final_refine_iterations,
                )
                top_s = scorer.traced_score(
                    mesh_tensors, rgb, xyz_map, K, top, diameter
                )
                refined = refined.at[top_i].set(top)
                scores = scores.at[top_i].set(top_s + 100.0)
            order = jnp.argsort(-scores)
            refined = refined[order]
            scores = scores[order]
            # one packed download: poses | scores | center | n_valid
            packed = jnp.concatenate([
                refined.reshape(-1),
                scores.reshape(-1),
                center.reshape(-1),
                jnp.asarray(n_valid, jnp.float32).reshape(1),
            ])
            return packed

        return run

    def _make_track_fused(self):
        refiner = self.refiner

        @functools.partial(jax.jit, static_argnames=("iteration", "diameter"))
        def run(mesh_tensors, pose_last, K, rgb_u8, depth, iteration, diameter):
            rgb = rgb_u8.astype(jnp.float32)
            d = imops.erode_depth(depth, radius=2)
            d = imops.bilateral_filter_depth(d, radius=2)
            xyz_map = geo.depth2xyzmap(d, K)
            refined = refiner.traced_refine(
                mesh_tensors, rgb, xyz_map, K, pose_last, diameter, iteration
            )
            return refined

        return run

    @staticmethod
    def _as_u8(img):
        a = np.asarray(img)
        if a.dtype == np.uint8:
            return a
        return np.clip(a, 0, 255).astype(np.uint8)

    # ------------------------------------------------------------------
    def register(self, K, rgb, depth, ob_mask, iteration=None):
        """Global registration. Returns (4,4) pose of the ORIGINAL
        (uncentered) mesh in camera (reference estimater.py:159-240)."""
        iteration = iteration or self.cfg.register_iterations
        K = np.asarray(K, dtype=np.float64)
        if self._register_fused is None:
            self._register_fused = self._make_register_fused()

        n = len(self.rot_grid)
        packed = np.asarray(
            self._register_fused(
                self.mesh_tensors,
                jnp.asarray(self.rot_grid, jnp.float32),
                jnp.asarray(K, jnp.float32),
                jnp.asarray(self._as_u8(rgb)),
                jnp.asarray(depth, jnp.float32),
                jnp.asarray(np.asarray(ob_mask) > 0, jnp.uint8),
                iteration=int(iteration),
                diameter=float(self.diameter),
            )
        )
        refined = packed[: n * 16].reshape(n, 4, 4).astype(np.float64)
        scores = packed[n * 16 : n * 17]
        center = packed[n * 17 : n * 17 + 3]
        n_valid = int(packed[-1])

        if n_valid < 4:
            logging.info("valid pixel count < 4; returning translation-only pose")
            pose = np.eye(4)
            pose[:3, 3] = center
            return pose

        self.poses = refined
        self.scores = scores
        self.pose_last = self.poses[0]
        best = self.poses[0] @ self.get_tf_to_centered_mesh()
        return best

    # ------------------------------------------------------------------
    def track_one(self, rgb, depth, K, iteration=None):
        """Refine-only tracking from the last pose (estimater.py:250-268)."""
        if self.pose_last is None:
            raise RuntimeError("call register() before track_one()")
        iteration = iteration or self.cfg.track_iterations
        K = np.asarray(K, dtype=np.float64)
        if self._track_fused is None:
            self._track_fused = self._make_track_fused()
        refined = self._track_fused(
            self.mesh_tensors,
            jnp.asarray(self.pose_last.reshape(1, 4, 4), jnp.float32),
            jnp.asarray(K, jnp.float32),
            jnp.asarray(self._as_u8(rgb)),
            jnp.asarray(depth, jnp.float32),
            iteration=int(iteration),
            diameter=float(self.diameter),
        )
        self.pose_last = np.asarray(refined)[0].astype(np.float64)
        return self.pose_last @ self.get_tf_to_centered_mesh()
