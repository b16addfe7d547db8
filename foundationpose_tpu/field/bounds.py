"""Scene-bounds estimation and data normalization for reconstruction.

Parity with the reference bundlesdf/tool.py (:17-130 — per-frame masked depth
clouds, voxel fusion, outlier rejection, DBSCAN biggest cluster,
translation + scale into [-1,1]) and nerf_helpers.preprocess_data (:252-274 —
BAD_DEPTH sentinel, mask zeroing, pose normalization).
"""

from __future__ import annotations

import logging

import numpy as np

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core.meshio import voxel_downsample

BAD_DEPTH = 99.0
BAD_COLOR = 0


def frame_cloud(depth, mask, K, pose, downsample=0.01, max_depth=2.0):
    """Masked depth -> world points for one frame. pose: cam_in_ob (4,4)."""
    xyz = np.asarray(geo.depth2xyzmap(depth, K))
    valid = (np.asarray(mask) > 0) & (depth > 0.001) & (depth < max_depth)
    pts = xyz[valid]
    if len(pts) == 0:
        return np.zeros((0, 3))
    if downsample:
        pts = voxel_downsample(pts, downsample)
    return np.asarray(geo.transform_pts(pts, pose))


def remove_outliers(pts, k=10, std_ratio=2.0):
    """Statistical outlier removal (replaces open3d's, tool.py:41-62)."""
    if len(pts) < k + 1:
        return pts
    from scipy.spatial import cKDTree

    tree = cKDTree(pts)
    dists, _ = tree.query(pts, k=k + 1)
    mean_d = dists[:, 1:].mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std()
    return pts[mean_d < thresh]


def biggest_cluster(pts, eps=0.06, min_samples=1):
    """DBSCAN biggest cluster (reference tool.py:17-24)."""
    from sklearn.cluster import DBSCAN

    if len(pts) == 0:
        return pts
    labels = DBSCAN(eps=eps, min_samples=min_samples).fit(pts).labels_
    ids, cnts = np.unique(labels[labels >= 0], return_counts=True)
    if len(ids) == 0:
        return pts
    return pts[labels == ids[np.argmax(cnts)]]


def compute_translation_scales(pts, max_dim=2.0, cluster=True, eps=0.06,
                               min_samples=1):
    """Normalization: translation centers the cluster; sc_factor fits it into
    0.9 x [-1,1] (reference tool.py:27-38)."""
    if cluster:
        pts = biggest_cluster(pts, eps=eps, min_samples=min_samples)
    mx = pts.max(axis=0)
    mn = pts.min(axis=0)
    center = (mx + mn) / 2
    sc_factor = max_dim / np.abs(mx - mn).max() * 0.9  # spare 0.1 padding
    translation_cvcam = -center
    return translation_cvcam, sc_factor, pts


def compute_scene_bounds(depths, masks, K, poses, voxel=0.01, eps=0.06,
                         min_samples=1):
    """Fuse all frames -> (translation, sc_factor, fused cluster points).
    (reference tool.py:65-130, minus the joblib thread pool — frames are
    cheap enough serially and the fusion is numpy-bound.)"""
    clouds = []
    for i in range(len(depths)):
        c = frame_cloud(depths[i], masks[i], K, poses[i], downsample=voxel)
        if len(c):
            clouds.append(c)
    pts = np.concatenate(clouds, axis=0)
    pts = voxel_downsample(pts, voxel)
    pts = remove_outliers(pts)
    translation, sc_factor, cluster_pts = compute_translation_scales(
        pts, eps=eps, min_samples=min_samples
    )
    logging.info("scene bounds: translation=%s sc_factor=%.4f pts=%d",
                 translation, sc_factor, len(cluster_pts))
    return translation, sc_factor, cluster_pts


def preprocess_data(rgbs, depths, masks, poses, sc_factor, translation):
    """Normalize data into the field's [-1,1] frame
    (reference nerf_helpers.py:252-274): invalid/masked depth -> BAD_DEPTH
    sentinel, masked color -> 0, rgb -> [0,1], depth and poses scaled."""
    rgbs = np.asarray(rgbs, dtype=np.float32).copy()
    depths = np.asarray(depths, dtype=np.float32).copy()
    poses = np.asarray(poses, dtype=np.float64).copy()
    depths[depths < 0.001] = BAD_DEPTH
    if masks is not None:
        masks = np.asarray(masks)
        rgbs[masks == 0] = BAD_COLOR
        depths[masks == 0] = BAD_DEPTH
    rgbs = rgbs / 255.0
    depths = depths * sc_factor
    poses[:, :3, 3] += np.asarray(translation)[None]
    poses[:, :3, 3] *= sc_factor
    return rgbs, depths, masks, poses
