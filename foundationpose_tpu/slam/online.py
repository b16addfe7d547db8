"""Online model-free tracking + reconstruction (BundleSDF-style loop).

The reference snapshot keeps only the neural-object-field half of BundleSDF
(SURVEY.md note 4 — no LoFTR matching / keyframe pose graph survives). This
module restores the ONLINE loop around our field, TPU-style:

- frame 0 defines the object frame; a mesh triangulated from the masked depth
  map bootstraps render-based tracking;
- each frame is tracked by the engine's projective point-to-plane ICP refiner
  against the current mesh (drop-in: the learned refiner works identically);
- frames that move far enough become keyframes;
- periodically (and at finalize) the neural field retrains on the keyframe
  set with joint pose refinement — the gradient-based bundle adjustment — and
  the extracted mesh replaces the tracking model.
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core.meshio import Mesh
from foundationpose_tpu.engine.geometric import GeometricConfig, GeometricRefiner
from foundationpose_tpu.field.runner import FieldConfig
from foundationpose_tpu.ops import raster


def depth_map_mesh(depth, mask, K, stride=2, max_edge=0.02):
    """Triangulate a masked depth map into a surface mesh (bootstrap model).
    Grid-connect neighboring valid pixels whose depths agree within
    ``max_edge``; vertices are cam-space points."""
    depth = np.asarray(depth)
    mask = np.asarray(mask) > 0
    H, W = depth.shape
    xyz = np.asarray(geo.depth2xyzmap(depth, K))
    vs = np.arange(0, H, stride)
    us = np.arange(0, W, stride)
    sub_xyz = xyz[np.ix_(vs, us)]  # (h,w,3)
    sub_valid = (mask & (depth > 0.001))[np.ix_(vs, us)]
    h, w = sub_valid.shape
    idx = -np.ones((h, w), np.int64)
    idx[sub_valid] = np.arange(sub_valid.sum())
    verts = sub_xyz[sub_valid]

    quads = []
    z = sub_xyz[..., 2]
    for dv, du in ((0, 0),):
        a = idx[:-1, :-1]
        b = idx[:-1, 1:]
        c = idx[1:, :-1]
        d = idx[1:, 1:]
        za, zb, zc, zd = z[:-1, :-1], z[:-1, 1:], z[1:, :-1], z[1:, 1:]
        ok = (a >= 0) & (b >= 0) & (c >= 0) & (d >= 0)
        flat = (
            (np.abs(za - zb) < max_edge)
            & (np.abs(za - zc) < max_edge)
            & (np.abs(zd - zb) < max_edge)
            & (np.abs(zd - zc) < max_edge)
        )
        ok &= flat
        quads.append(
            np.stack([a[ok], b[ok], c[ok], d[ok]], axis=-1)
        )
    q = np.concatenate(quads)
    faces = np.concatenate([q[:, [0, 2, 1]], q[:, [1, 2, 3]]], axis=0)
    return Mesh(verts, faces.astype(np.int32))


@dataclasses.dataclass
class OnlineConfig:
    keyframe_min_rot_deg: float = 10.0
    keyframe_min_trans: float = 0.02
    retrain_every_keyframes: int = 8
    max_keyframes: int = 40
    track_iterations: int = 4
    field: FieldConfig = dataclasses.field(default_factory=lambda: FieldConfig(
        n_step=300,
    ))
    mesh_stride: int = 2
    max_render_faces: int = 8192


class ModelFreeTracker:
    """Track an unknown object from a masked first frame, reconstructing its
    neural field online."""

    def __init__(self, K, config: OnlineConfig | None = None, refiner=None):
        self.K = np.asarray(K, np.float64)
        self.cfg = config or OnlineConfig()
        # wider ICP inlier gate than registration: inter-frame motion must
        # stay inside the association band or the solver returns identity
        self.refiner = refiner or GeometricRefiner(GeometricConfig(tau_rel=0.12))
        self.keyframes = []  # dicts: rgb, depth, mask, cam_in_ob
        self.cam_in_ob = None  # current camera pose in the object frame
        self.mesh = None
        self.mesh_tensors = None
        self.diameter = None
        self.runner = None
        self.frame_count = 0

    # ------------------------------------------------------------------
    def init(self, rgb, depth, mask):
        """Frame 0: the camera frame IS the object frame."""
        self.cam_in_ob = np.eye(4)
        self._set_mesh(depth_map_mesh(depth, mask, self.K, self.cfg.mesh_stride))
        self.keyframes = [dict(rgb=np.asarray(rgb), depth=np.asarray(depth),
                               mask=np.asarray(mask), cam_in_ob=np.eye(4))]
        self.frame_count = 1
        logging.info("online init: bootstrap mesh %d faces, diameter %.3f",
                     len(self.mesh.faces), self.diameter)
        return np.eye(4)

    def _set_mesh(self, mesh):
        """Center the tracking mesh (the crop-window projection needs the
        hypothesis translation at the object center, engine semantics)."""
        from foundationpose_tpu.core.meshio import compute_mesh_diameter

        bounds = mesh.bounds
        self.mesh_center = (bounds[0] + bounds[1]) / 2.0
        centered = mesh.translated(-self.mesh_center)
        self.mesh = mesh  # object frame (uncentered) — what callers see
        self.mesh_tensors = raster.make_mesh_tensors(
            centered, max_faces=self.cfg.max_render_faces
        )
        self.diameter = compute_mesh_diameter(mesh=centered)
        self._to_center = np.eye(4)
        self._to_center[:3, 3] = self.mesh_center
        self._from_center = np.eye(4)
        self._from_center[:3, 3] = -self.mesh_center

    # ------------------------------------------------------------------
    def step(self, rgb, depth, mask=None):
        """Track one frame; maybe keyframe; maybe retrain. Returns the
        object-in-camera pose (4,4)."""
        if self.cam_in_ob is None:
            raise RuntimeError("call init() first")
        from foundationpose_tpu.engine.estimator import _preprocess_jit

        _, xyz_map = _preprocess_jit(
            np.asarray(depth, np.float32), np.asarray(self.K, np.float32)
        )
        ob_in_cam = np.linalg.inv(self.cam_in_ob)
        # refine in the centered-mesh frame, convert back after
        ob_in_cam_c = ob_in_cam @ self._to_center
        refined_c = np.asarray(
            self.refiner.predict(
                self.mesh_tensors,
                np.asarray(rgb, np.float32),
                xyz_map,
                self.K,
                ob_in_cam_c[None].astype(np.float32),
                self.diameter,
                iteration=self.cfg.track_iterations,
            )
        )[0].astype(np.float64)
        refined = refined_c @ self._from_center
        self.cam_in_ob = np.linalg.inv(refined)
        self.frame_count += 1

        if mask is not None and self._is_keyframe(self.cam_in_ob):
            self.keyframes.append(
                dict(rgb=np.asarray(rgb), depth=np.asarray(depth),
                     mask=np.asarray(mask), cam_in_ob=self.cam_in_ob.copy())
            )
            logging.info("keyframe %d added (frame %d)",
                         len(self.keyframes), self.frame_count)
            if (
                len(self.keyframes) % self.cfg.retrain_every_keyframes == 0
                and len(self.keyframes) >= 4
            ):
                self.retrain()
        return refined

    def _is_keyframe(self, cam_in_ob):
        if len(self.keyframes) >= self.cfg.max_keyframes:
            return False
        for kf in self.keyframes:
            dr = float(
                geo.rotation_geodesic_distance(
                    cam_in_ob[:3, :3], kf["cam_in_ob"][:3, :3]
                )
            )
            dt = float(np.linalg.norm(cam_in_ob[:3, 3] - kf["cam_in_ob"][:3, 3]))
            if (
                np.degrees(dr) < self.cfg.keyframe_min_rot_deg
                and dt < self.cfg.keyframe_min_trans
            ):
                return False
        return True

    # ------------------------------------------------------------------
    def retrain(self, n_step=None):
        """(Re)train the neural field on the keyframes (joint pose
        refinement = online BA), refresh the tracking mesh, and propagate the
        keyframe pose corrections."""
        from foundationpose_tpu.slam.reconstruction import run_neural_object_field

        rgbs = np.stack([k["rgb"] for k in self.keyframes])
        depths = np.stack([k["depth"] for k in self.keyframes])
        masks = np.stack([k["mask"] for k in self.keyframes])
        poses = np.stack([k["cam_in_ob"] for k in self.keyframes])
        cfg = self.cfg.field
        if n_step is not None:
            cfg = dataclasses.replace(cfg, n_step=n_step)
        mesh, optimized, runner = run_neural_object_field(
            cfg, self.K, rgbs, depths, masks, poses, save_dir=None, bake=False
        )
        self.runner = runner
        if len(mesh.faces) > 50:
            self._set_mesh(mesh)
        for kf, p in zip(self.keyframes, optimized):
            kf["cam_in_ob"] = p
        # keep the live camera pose consistent with the refined map
        self.cam_in_ob = optimized[-1] @ np.linalg.inv(poses[-1]) @ self.cam_in_ob
        logging.info("retrained field on %d keyframes; mesh %d faces",
                     len(self.keyframes), len(self.mesh.faces))

    def run_pose_graph_ba(self, n_landmarks=512, config=None, mesh=None,
                          rounds=3):
        """Second-order keyframe refinement: Schur-complement Gauss-Newton
        pose-graph BA over the keyframe depth maps (slam/ba.py) — the explicit
        counterpart of the field's gradient-based joint pose optimization.
        Updates keyframe poses and the live camera pose in place."""
        from foundationpose_tpu.slam.ba import pose_graph_ba

        if len(self.keyframes) < 2:
            return 0.0
        depths = np.stack([k["depth"] for k in self.keyframes])
        masks = np.stack([k["mask"] for k in self.keyframes])
        cams = np.stack([k["cam_in_ob"] for k in self.keyframes])
        refined, cost = pose_graph_ba(
            depths, masks, cams, self.K, n_landmarks=n_landmarks,
            config=config, mesh=mesh, rounds=rounds,
        )
        for kf, p in zip(self.keyframes, refined):
            kf["cam_in_ob"] = p
        # keep the live pose consistent with the refined last keyframe
        self.cam_in_ob = refined[-1] @ np.linalg.inv(cams[-1]) @ self.cam_in_ob
        logging.info("pose-graph BA over %d keyframes: cost %.3e",
                     len(self.keyframes), cost)
        return cost

    def finalize(self, bake=True, tex_res=1024, n_step=None):
        """Final training pass + textured mesh + keyframe poses."""
        from foundationpose_tpu.field.texture import bake_texture
        from foundationpose_tpu.slam.reconstruction import run_neural_object_field

        rgbs = np.stack([k["rgb"] for k in self.keyframes])
        depths = np.stack([k["depth"] for k in self.keyframes])
        masks = np.stack([k["mask"] for k in self.keyframes])
        poses = np.stack([k["cam_in_ob"] for k in self.keyframes])
        cfg = self.cfg.field
        if n_step is not None:
            cfg = dataclasses.replace(cfg, n_step=n_step)
        mesh, optimized, runner = run_neural_object_field(
            cfg, self.K, rgbs, depths, masks, poses, save_dir=None, bake=False
        )
        self.runner = runner
        textured = mesh
        if bake and len(mesh.faces) > 0:
            textured = bake_texture(mesh, rgbs, masks, optimized, self.K,
                                    tex_res=tex_res)
        return textured, optimized
