"""Auto-masking pipeline (detect/pipeline.py).

The reference only declares the Grounding-DINO + SAM capability (readme.md:
9-11, weights fetched in docker/run_container.sh:33-35) with no code; our
pipeline loads local HF checkpoints. These tests pin the offline contract
(clear constructor errors without checkpoints), EXECUTE the real
detect -> segment -> register path on tiny random-weight checkpoints built
locally from configs (no egress needed — the weights are meaningless but the
plumbing is the real transformers GroundingDINO + SAM forward), and validate
the depth-box fallback heuristic on a rendered scene.
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


# ---------------------------------------------------------------------------
# tiny random-weight checkpoints, built locally from configs


def _build_tiny_grounding_dino(path):
    import torch
    from transformers import (
        BertConfig,
        BertTokenizerFast,
        GroundingDinoConfig,
        GroundingDinoForObjectDetection,
        GroundingDinoImageProcessor,
        GroundingDinoProcessor,
    )
    from transformers.models.swin import SwinConfig

    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "a", "the", "mustard", "bottle", "box", "red", "object", ".",
    ]
    vocab_file = path / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(vocab_file))
    swin = SwinConfig(
        embed_dim=16, depths=[1, 1, 1], num_heads=[1, 1, 1], image_size=64,
        out_features=["stage2", "stage3"], window_size=4,
    )
    bert = BertConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=37, vocab_size=len(vocab),
        max_position_embeddings=64,
    )
    cfg = GroundingDinoConfig(
        backbone_config=swin, text_config=bert, d_model=32,
        encoder_layers=1, decoder_layers=1, num_queries=10,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32, num_feature_levels=2,
        max_text_len=32,
    )
    torch.manual_seed(0)
    GroundingDinoForObjectDetection(cfg).save_pretrained(path)
    improc = GroundingDinoImageProcessor(
        size={"shortest_edge": 64, "longest_edge": 96}
    )
    GroundingDinoProcessor(image_processor=improc, tokenizer=tok).save_pretrained(path)


def _build_tiny_sam(path):
    import torch
    from transformers import SamConfig, SamImageProcessor, SamModel, SamProcessor

    scfg = SamConfig()
    v = scfg.vision_config
    v.hidden_size = 24
    v.num_hidden_layers = 1
    v.num_attention_heads = 2
    v.intermediate_size = 32
    v.image_size = 64
    v.patch_size = 8
    v.output_channels = 16
    v.num_pos_feats = 8  # positional-embedding dim = 2*num_pos_feats = 16
    m = scfg.mask_decoder_config
    m.hidden_size = 16
    m.num_hidden_layers = 1
    m.num_attention_heads = 2
    m.mlp_dim = 32
    m.iou_head_hidden_dim = 16
    p = scfg.prompt_encoder_config
    p.hidden_size = 16
    p.image_size = 64
    p.patch_size = 8
    p.image_embedding_size = 8
    torch.manual_seed(0)
    SamModel(scfg).save_pretrained(path)
    SamProcessor(
        SamImageProcessor(
            size={"longest_edge": 64}, pad_size={"height": 64, "width": 64}
        )
    ).save_pretrained(path)


@pytest.fixture(scope="module")
def masker(tmp_path_factory):
    det = tmp_path_factory.mktemp("dino")
    seg = tmp_path_factory.mktemp("sam")
    _build_tiny_grounding_dino(det)
    _build_tiny_sam(seg)
    # thresholds 0: random weights score arbitrarily; we test the machinery
    return AutoMasker(
        detector_path=str(det), segmenter_path=str(seg),
        box_threshold=0.0, text_threshold=0.0,
    )


def _rendered_scene():
    """A box on a far backdrop, rendered by our own rasterizer."""
    from foundationpose_tpu.core import geometry as geo, meshio
    from foundationpose_tpu.ops import raster

    K = np.array([[120.0, 0, 48.0], [0, 120.0, 36.0], [0, 0, 1.0]])
    HW = (72, 96)
    mesh = meshio.make_box((0.12, 0.08, 0.05))
    mesh.vertex_colors = np.full((len(mesh.vertices), 3), 200, np.uint8)
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.3, -0.2, 0.4))[:3, :3]
    gt[:3, 3] = [0.0, 0.0, 0.5]
    mt = raster.make_mesh_tensors(mesh)
    out = raster.render_full_frame(mt, gt[None], K, HW)
    rgb = np.asarray(out["rgb"][0]) * 255.0
    depth = np.asarray(out["depth"][0])
    gt_mask = np.asarray(out["mask"][0]).astype(np.uint8)
    # backdrop at 2.2 m (outside the fallback z-range)
    depth = np.where(gt_mask > 0, depth, 2.2).astype(np.float32)
    return K, mesh, gt, rgb, depth, gt_mask


def test_detect_segment_register_executes(masker):
    """The full prompt -> box -> mask -> register() chain runs mechanically
    (BASELINE config #2 surface). Random weights make the mask arbitrary, so
    the assertion is on execution + contract, not accuracy."""
    from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
    from foundationpose_tpu.engine.geometric import (
        GeometricConfig, GeometricRefiner, GeometricScorer,
    )

    K, mesh, gt, rgb, depth, gt_mask = _rendered_scene()
    box, score = masker.detect_box(rgb, "red box")
    assert box is None or (len(box) == 4 and np.isfinite(score))
    mask = masker.mask_from_prompt(rgb, "red box")
    assert mask.shape == depth.shape and mask.dtype == np.uint8

    if mask.sum() == 0:  # random weights may detect nothing; still mechanical
        mask = gt_mask
    gcfg = GeometricConfig(input_size=32)
    est = FoundationPoseTPU(
        mesh,
        config=EstimatorConfig(min_n_views=12, inplane_step=120,
                               register_iterations=2),
        refiner=GeometricRefiner(gcfg), scorer=GeometricScorer(gcfg),
    )
    pose = est.register(K, rgb, depth, mask)
    assert pose.shape == (4, 4) and np.isfinite(pose).all()


def test_depth_box_fallback_on_rendered_scene():
    """The offline fallback recovers the object mask from depth alone on a
    rendered frame: IoU vs the rasterizer's GT mask."""
    _, _, _, _, depth, gt_mask = _rendered_scene()
    mask = depth_box_fallback(depth, z_range=(0.2, 1.5), min_area=50)
    inter = ((mask > 0) & (gt_mask > 0)).sum()
    union = ((mask > 0) | (gt_mask > 0)).sum()
    assert inter / union > 0.95


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
