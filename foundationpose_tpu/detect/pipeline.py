"""Text-prompted automatic object masking: open-vocabulary detection +
instance segmentation.

The reference declares this capability (readme.md:9-11: Grounding-DINO box
from a text prompt -> SAM2 mask; weights fetched in docker/run_container.sh:
33-35) but ships no code for it. Here it is a real pipeline built on the
HuggingFace ``transformers`` implementations of GroundingDINO and SAM,
loading from LOCAL checkpoints only (this host has zero egress):

    AutoMasker(detector_path=..., segmenter_path=...).mask_from_prompt(rgb, "mustard bottle")

Without checkpoints the class raises a clear error at construction;
``depth_box_fallback`` offers a heuristic mask (largest close-range
connected component) for fully-offline bring-up.
"""

from __future__ import annotations

import logging
import os

import numpy as np

DEFAULT_DETECTOR = os.getenv("GROUNDING_DINO_PATH", "")
DEFAULT_SEGMENTER = os.getenv("SAM_PATH", "")


class AutoMasker:
    def __init__(self, detector_path=None, segmenter_path=None, device="cpu",
                 box_threshold=0.35, text_threshold=0.25):
        self.detector_path = detector_path or DEFAULT_DETECTOR
        self.segmenter_path = segmenter_path or DEFAULT_SEGMENTER
        self.box_threshold = box_threshold
        self.text_threshold = text_threshold
        self.device = device
        if not self.detector_path or not os.path.exists(self.detector_path):
            raise FileNotFoundError(
                "Grounding-DINO checkpoint not found. Set GROUNDING_DINO_PATH "
                "or pass detector_path= (a local HF checkpoint directory for "
                "'IDEA-Research/grounding-dino-tiny'-style weights)."
            )
        if not self.segmenter_path or not os.path.exists(self.segmenter_path):
            raise FileNotFoundError(
                "SAM checkpoint not found. Set SAM_PATH or pass "
                "segmenter_path= (local HF checkpoint for 'facebook/sam-vit-base')."
            )
        from transformers import (
            AutoModelForZeroShotObjectDetection,
            AutoProcessor,
            SamModel,
            SamProcessor,
        )

        self.det_processor = AutoProcessor.from_pretrained(self.detector_path)
        self.detector = AutoModelForZeroShotObjectDetection.from_pretrained(
            self.detector_path
        ).to(device).eval()
        self.sam_processor = SamProcessor.from_pretrained(self.segmenter_path)
        self.segmenter = SamModel.from_pretrained(self.segmenter_path).to(device).eval()

    def detect_box(self, rgb, prompt):
        """Best box (x0,y0,x1,y1) for the prompt, or None."""
        import torch
        from PIL import Image

        image = Image.fromarray(np.asarray(rgb, dtype=np.uint8))
        text = prompt.strip().lower()
        if not text.endswith("."):
            text += "."
        inputs = self.det_processor(images=image, text=text, return_tensors="pt").to(
            self.device
        )
        with torch.no_grad():
            outputs = self.detector(**inputs)
        results = self.det_processor.post_process_grounded_object_detection(
            outputs,
            inputs["input_ids"],
            threshold=self.box_threshold,
            text_threshold=self.text_threshold,
            target_sizes=[image.size[::-1]],
        )[0]
        if len(results["boxes"]) == 0:
            return None, 0.0
        best = int(np.argmax(results["scores"].cpu().numpy()))
        return results["boxes"][best].cpu().numpy(), float(results["scores"][best])

    def segment_box(self, rgb, box):
        """SAM mask for a box prompt."""
        import torch
        from PIL import Image

        image = Image.fromarray(np.asarray(rgb, dtype=np.uint8))
        inputs = self.sam_processor(
            image, input_boxes=[[list(map(float, box))]], return_tensors="pt"
        ).to(self.device)
        with torch.no_grad():
            outputs = self.segmenter(**inputs)
        masks = self.sam_processor.image_processor.post_process_masks(
            outputs.pred_masks.cpu(),
            inputs["original_sizes"].cpu(),
            inputs["reshaped_input_sizes"].cpu(),
        )[0]
        scores = outputs.iou_scores.cpu().numpy().reshape(-1)
        best = int(np.argmax(scores))
        return np.asarray(masks[0, best]).astype(np.uint8)

    def mask_from_prompt(self, rgb, prompt):
        box, score = self.detect_box(rgb, prompt)
        if box is None:
            logging.warning("no detection for prompt %r", prompt)
            return np.zeros(np.asarray(rgb).shape[:2], np.uint8)
        logging.info("detected %r box=%s score=%.3f", prompt, box, score)
        return self.segment_box(rgb, box)


def depth_box_fallback(depth, z_range=(0.2, 1.5), min_area=500):
    """Heuristic auto-mask without any model: largest connected component of
    close-range depth. Offline bring-up aid, not a detector."""
    import cv2

    valid = ((depth > z_range[0]) & (depth < z_range[1])).astype(np.uint8)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(valid, connectivity=4)
    best, best_area = 0, 0
    for i in range(1, n):
        area = stats[i, cv2.CC_STAT_AREA]
        if area > best_area and area >= min_area:
            best, best_area = i, area
    return (labels == best).astype(np.uint8) if best > 0 else np.zeros_like(valid)
