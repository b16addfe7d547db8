"""Pose visualization helpers (host-side, cv2).

Parity surface with the reference debug drawing utilities: ``draw_xyz_axis``
(Utils.py:675-710), ``draw_posed_3d_box`` (Utils.py:713-749), ``depth_to_vis``
(Utils.py:456-479).
"""

from __future__ import annotations

import numpy as np


def project_3d_to_2d(pt, K, ob_in_cam):
    pt = np.append(np.asarray(pt, dtype=np.float64).reshape(3), 1.0)
    p = K @ (ob_in_cam @ pt)[:3]
    return (p[:2] / p[2]).round().astype(int)


def draw_xyz_axis(rgb, ob_in_cam, scale=0.1, K=np.eye(3), thickness=3):
    """Draw the object frame axes (x=red, y=green, z=blue) onto an RGB image."""
    import cv2

    img = np.ascontiguousarray(rgb).astype(np.uint8).copy()
    origin = tuple(project_3d_to_2d([0, 0, 0], K, ob_in_cam))
    colors = {"x": (255, 0, 0), "y": (0, 255, 0), "z": (0, 0, 255)}
    ends = {
        "x": [scale, 0, 0],
        "y": [0, scale, 0],
        "z": [0, 0, scale],
    }
    for axis, end in ends.items():
        tip = tuple(project_3d_to_2d(end, K, ob_in_cam))
        img = cv2.arrowedLine(
            img, origin, tip, color=colors[axis], thickness=thickness,
            line_type=cv2.LINE_AA,
        )
    return img


def draw_posed_3d_box(K, img, ob_in_cam, bbox, line_color=(0, 255, 0), linewidth=2):
    """Wireframe of an axis-aligned (object-frame) box. bbox: (2,3) min/max."""
    import cv2

    img = np.ascontiguousarray(img).astype(np.uint8).copy()
    mn = np.asarray(bbox).min(axis=0)
    mx = np.asarray(bbox).max(axis=0)
    corners = np.array(
        [[x, y, z] for x in (mn[0], mx[0]) for y in (mn[1], mx[1]) for z in (mn[2], mx[2])]
    )
    uv = np.stack([project_3d_to_2d(c, K, ob_in_cam) for c in corners])
    edges = [
        (0, 1), (2, 3), (4, 5), (6, 7),  # z edges
        (0, 2), (1, 3), (4, 6), (5, 7),  # y edges
        (0, 4), (1, 5), (2, 6), (3, 7),  # x edges
    ]
    for a, b in edges:
        img = cv2.line(
            img, tuple(uv[a]), tuple(uv[b]), color=line_color,
            thickness=linewidth, lineType=cv2.LINE_AA,
        )
    return img


def depth_to_vis(depth, zmin=None, zmax=None, mode="rgb", inverse=True):
    """Colorize a depth map (reference Utils.py:456-479)."""
    depth = np.asarray(depth, dtype=np.float64)
    zmin = depth.min() if zmin is None else zmin
    zmax = depth.max() if zmax is None else zmax
    if inverse:
        invalid = depth < 0.001
        vis = zmin / (depth + 1e-8)
        vis[invalid] = 0
    else:
        d = depth.clip(zmin, zmax)
        invalid = (d == zmin) | (d == zmax)
        vis = (d - zmin) / max(zmax - zmin, 1e-12)
        vis[invalid] = 1
    if mode == "gray":
        return (vis * 255).clip(0, 255).astype(np.uint8)
    if mode == "rgb":
        import cv2

        return cv2.applyColorMap((vis * 255).astype(np.uint8), cv2.COLORMAP_JET)[..., ::-1]
    raise ValueError(mode)


def make_grid_image(imgs, nrow, padding=5, pad_value=255):
    """Tile (B,H,W,C) images into a grid (reference Utils.py:293-300)."""
    imgs = [np.asarray(im).astype(np.uint8) for im in imgs]
    H = max(im.shape[0] for im in imgs)
    W = max(im.shape[1] for im in imgs)
    cells = []
    for im in imgs:
        if im.ndim == 2:
            im = np.tile(im[..., None], (1, 1, 3))
        canvas = np.full((H, W, 3), pad_value, np.uint8)
        canvas[: im.shape[0], : im.shape[1]] = im[..., :3]
        cells.append(canvas)
    rows = []
    for i in range(0, len(cells), nrow):
        row = cells[i : i + nrow]
        while len(row) < nrow:
            row.append(np.full((H, W, 3), pad_value, np.uint8))
        pad = np.full((H, padding, 3), pad_value, np.uint8)
        out = row[0]
        for c in row[1:]:
            out = np.concatenate([out, pad, c], axis=1)
        rows.append(out)
    padr = np.full((padding, rows[0].shape[1], 3), pad_value, np.uint8)
    grid = rows[0]
    for r in rows[1:]:
        grid = np.concatenate([grid, padr, r], axis=0)
    return grid


def make_comparison_strip(rendered, observed, scores=None, pad=2):
    """Side-by-side [render | observed] comparison rows, one per hypothesis —
    the canvas layout of the reference's refine/score debug dumps
    (predict_pose_refine.py:241-293, predict_score.py:27-52).

    rendered/observed: (N,H,W,3) float in [0,1]. Returns one uint8 canvas
    with hypothesis i on row i; ``scores`` annotates each row when cv2 is
    available."""
    rows = []
    for i in range(len(rendered)):
        r = (np.clip(np.asarray(rendered[i]), 0, 1) * 255).astype(np.uint8)
        o = (np.clip(np.asarray(observed[i]), 0, 1) * 255).astype(np.uint8)
        gap = np.full((r.shape[0], pad, 3), 255, np.uint8)
        row = np.concatenate([r, gap, o], axis=1)
        if scores is not None:
            try:
                import cv2

                cv2.putText(
                    row, f"{float(scores[i]):.2f}", (2, 12),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 255, 0), 1,
                )
            except Exception:
                pass
        rows.append(row)
    return make_grid_image(rows, nrow=1)
