"""Object-mask acquisition.

The reference ships an interactive cv2 paint tool (src/masking.py:5-68). A
GUI does not belong on a TPU host, so the primary path here is file-based,
with the interactive painter available when a display exists. The automatic
(detector+segmenter) path lives in ``foundationpose_tpu.detect``.
"""

from __future__ import annotations

import logging
import os

import numpy as np


def rle_to_mask(rle: dict):
    """Binary mask from an uncompressed RLE dict {'size': (h,w), 'counts':
    [...]} — SAM-style output (parity with reference Utils.py:442-453,
    including its column-major decode)."""
    h, w = rle["size"]
    mask = np.empty(h * w, dtype=bool)
    idx = 0
    parity = False
    for count in rle["counts"]:
        mask[idx : idx + count] = parity
        idx += count
        parity ^= True
    return mask.reshape(w, h).transpose()


def load_mask(mask_path, shape=None):
    """Load a binary mask png/npy; optionally validate the shape."""
    if not os.path.exists(mask_path):
        raise FileNotFoundError(mask_path)
    if mask_path.endswith(".npy"):
        mask = np.load(mask_path)
    else:
        from PIL import Image

        mask = np.asarray(Image.open(mask_path))
    if mask.ndim == 3:
        mask = mask[..., 0]
    mask = mask > 0
    if shape is not None and mask.shape != tuple(shape):
        raise ValueError(f"mask shape {mask.shape} != expected {shape}")
    return mask.astype(np.uint8)


class MaskingTool:
    """Interactive brush mask painter (parity with reference masking.py:5-68).
    Requires a display + cv2 GUI support; raises otherwise."""

    def __init__(self, brush_size=10):
        self.brush_size = brush_size
        self.drawing = False
        self.mask = None
        self.img = None

    def _on_mouse(self, event, x, y, flags, param):
        import cv2

        if event == cv2.EVENT_LBUTTONDOWN:
            self.drawing = True
        elif event == cv2.EVENT_LBUTTONUP:
            self.drawing = False
        if self.drawing and event in (cv2.EVENT_MOUSEMOVE, cv2.EVENT_LBUTTONDOWN):
            cv2.circle(self.mask, (x, y), self.brush_size, 255, -1)

    def run(self, rgb, mask_path=None):
        """Paint a mask over ``rgb``; 's' saves+returns, 'q' aborts,
        '+'/'-' adjust brush size."""
        import cv2

        self.img = rgb[..., ::-1].copy()  # display as BGR
        self.mask = np.zeros(rgb.shape[:2], dtype=np.uint8)
        win = "paint object mask  (s=save, q=quit, +/-=brush)"
        cv2.namedWindow(win)
        cv2.setMouseCallback(win, self._on_mouse)
        while True:
            overlay = self.img.copy()
            overlay[self.mask > 0] = (
                0.5 * overlay[self.mask > 0] + np.array([0, 0, 127])
            ).astype(np.uint8)
            cv2.imshow(win, overlay)
            key = cv2.waitKey(16) & 0xFF
            if key == ord("s"):
                if mask_path:
                    cv2.imwrite(mask_path, self.mask)
                    logging.info("mask saved to %s", mask_path)
                break
            if key == ord("q"):
                self.mask = None
                break
            if key == ord("+"):
                self.brush_size += 2
            if key == ord("-"):
                self.brush_size = max(2, self.brush_size - 2)
        cv2.destroyWindow(win)
        return None if self.mask is None else (self.mask > 0).astype(np.uint8)
