"""Multi-object / multi-stream tracking.

BASELINE.json config #5: N objects tracked concurrently with their batches
sharded across the device mesh. The reference is strictly single-object
single-stream (estimater.py tracks one ``pose_last``); here the object axis
is a first-class batch axis:

- per-object mesh tensors are padded to common (V_max, F_max) and stacked;
- one jitted, vmapped refine step advances every object's pose against its
  own rgb-d stream (per-object K supported — true multi-camera);
- the object axis shards over the 'batch' mesh axis via
  ``parallel.shard_batch`` for pod-slice scaling.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.core import meshio
from foundationpose_tpu.engine.estimator import _preprocess_jit
from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig, refine_once
from foundationpose_tpu.ops import raster


def _vertex_colors_from_texture(mesh):
    """Sample the texture at vertex uvs -> vertex colors (multi-object stacks
    share one attribute layout, so textured meshes are baked per-vertex)."""
    if mesh.texture is None or mesh.uv is None:
        return mesh
    m = mesh.copy()
    H, W = mesh.texture.shape[:2]
    u = np.clip(mesh.uv[:, 0], 0, 1)
    v = np.clip(1.0 - mesh.uv[:, 1], 0, 1)
    xi = np.clip((u * (W - 1)).round().astype(int), 0, W - 1)
    yi = np.clip((v * (H - 1)).round().astype(int), 0, H - 1)
    m.vertex_colors = mesh.texture[yi, xi]
    m.texture = None
    m.uv = None
    return m


def stack_mesh_tensors(meshes, max_faces=4096):
    """Pad per-object meshes to common sizes and stack with a leading object
    axis. Returns (stacked mesh_tensors dict, diameters (O,), centers (O,3))."""
    prepped = []
    centers = []
    diameters = []
    for mesh in meshes:
        bounds = mesh.bounds
        center = (bounds[0] + bounds[1]) / 2
        centered = mesh.translated(-center)
        centered = _vertex_colors_from_texture(centered)
        centers.append(center)
        diameters.append(meshio.compute_mesh_diameter(mesh=centered))
        prepped.append(raster.make_mesh_tensors(centered, max_faces=max_faces))

    V = max(int(m["pos"].shape[0]) for m in prepped)
    F = max(int(m["faces"].shape[0]) for m in prepped)

    def pad_stack(key, n, fill=0.0):
        out = []
        for m in prepped:
            a = np.asarray(m[key])
            pad = n - a.shape[0]
            if pad > 0:
                a = np.concatenate(
                    [a, np.full((pad, *a.shape[1:]), fill, a.dtype)], axis=0
                )
            out.append(a)
        return jnp.asarray(np.stack(out))

    stacked = {
        "pos": pad_stack("pos", V),
        "faces": pad_stack("faces", F),  # pad faces -> vertex 0 (degenerate)
        "vnormals": pad_stack("vnormals", V),
        "vertex_color": pad_stack("vertex_color", V),
    }
    return stacked, jnp.asarray(diameters, jnp.float32), np.stack(centers)


class MultiObjectTracker:
    """Track N objects at once. Initialize each object's pose via a
    single-object ``FoundationPoseTPU.register`` (or provide poses), then
    call :meth:`track` once per frame set."""

    def __init__(self, meshes, refiner: PoseRefiner | None = None,
                 max_faces=4096):
        self.refiner = refiner or PoseRefiner(
            dataclasses.replace(RefinerConfig(), use_pallas=False)
        )
        self.mesh_tensors, self.diameters, self.centers = stack_mesh_tensors(
            meshes, max_faces=max_faces
        )
        self.n_objects = len(meshes)
        self.poses = None  # (O,4,4) centered-mesh obj-in-cam

    def set_poses(self, poses, centered=False):
        """poses: (O,4,4) object-in-camera of the ORIGINAL meshes (or the
        centered ones if centered=True)."""
        poses = np.asarray(poses, np.float64).copy()
        if not centered:
            for i in range(self.n_objects):
                t = np.eye(4)
                t[:3, 3] = self.centers[i]
                poses[i] = poses[i] @ t
        self.poses = poses.astype(np.float32)

    def get_poses(self):
        """(O,4,4) poses of the ORIGINAL meshes in camera."""
        out = []
        for i in range(self.n_objects):
            t = np.eye(4)
            t[:3, 3] = -self.centers[i]
            out.append(self.poses[i] @ t)
        return np.stack(out)

    def track(self, rgbs, depths, Ks, iteration=2):
        """rgbs: (O,H,W,3); depths: (O,H,W); Ks: (O,3,3) — one observation per
        object (streams may be distinct cameras)."""
        if self.poses is None:
            raise RuntimeError("set_poses() before track()")
        Ks = jnp.asarray(np.asarray(Ks), jnp.float32)
        rgbs = jnp.asarray(np.asarray(rgbs), jnp.float32)
        depths = jnp.asarray(np.asarray(depths), jnp.float32)
        refined = _multi_track_jit(
            self.refiner.net,
            self.refiner.cfg,
            self.refiner.params,
            self.mesh_tensors,
            jnp.asarray(self.poses),
            Ks,
            rgbs,
            depths,
            self.diameters,
            int(iteration),
        )
        self.poses = np.asarray(refined)
        return self.get_poses()


@functools.partial(jax.jit, static_argnames=("net", "cfg", "iteration"))
def _multi_track_jit(net, cfg, params, mesh_tensors, poses, Ks, rgbs, depths,
                     diameters, iteration):
    def one(mt, pose, K, rgb, depth, diameter):
        _, xyz = _preprocess_jit(depth, K)
        p = pose[None]
        for _ in range(iteration):
            p = refine_once(
                params, mt, p, K, rgb, xyz, diameter, net=net, cfg=cfg
            )
        return p[0]

    return jax.vmap(one)(mesh_tensors, poses, Ks, rgbs, depths, diameters)
