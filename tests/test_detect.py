"""Auto-masking pipeline (detect/pipeline.py).

The reference only declares the Grounding-DINO + SAM capability (readme.md:
9-11) with no code; our pipeline loads local HF checkpoints. These tests pin
the offline contract: clear constructor errors without checkpoints, and the
depth-box fallback heuristic used for fully-offline bring-up.
"""

import numpy as np
import pytest

from foundationpose_tpu.detect.pipeline import AutoMasker, depth_box_fallback


def test_automasker_missing_detector_raises():
    with pytest.raises(FileNotFoundError, match="Grounding-DINO"):
        AutoMasker(detector_path="/nonexistent/dino", segmenter_path="/tmp")


def test_automasker_missing_segmenter_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="SAM"):
        AutoMasker(detector_path=str(tmp_path), segmenter_path="/nonexistent/sam")


def test_depth_box_fallback_picks_largest_close_component():
    depth = np.zeros((60, 80), np.float32)
    depth[5:15, 5:15] = 0.5        # 100 px close blob
    depth[20:55, 30:70] = 0.8      # 1400 px close blob (winner)
    depth[0:60, 75:80] = 3.0       # far plane — outside z_range
    mask = depth_box_fallback(depth, z_range=(0.2, 1.5), min_area=50)
    assert mask.dtype == np.uint8
    assert mask[30, 50] == 1
    assert mask[10, 10] == 0  # smaller component not selected
    assert mask[30, 77] == 0  # far content excluded


def test_depth_box_fallback_empty_when_below_min_area():
    depth = np.zeros((40, 40), np.float32)
    depth[10:12, 10:12] = 0.5  # 4 px, below min_area
    mask = depth_box_fallback(depth, min_area=500)
    assert mask.sum() == 0
