"""Object-agnostic pipeline machinery: corpus determinism + shared shape
buckets, checkpoint round trip, augmentation invariants, end-to-end loading
into the estimator. (The accuracy statement for the trained checkpoint lives
in ACCURACY_r*.json, produced on the TPU.)"""

import numpy as np
import pytest

import jax.numpy as jnp

from foundationpose_tpu.models import agnostic, corpus, datagen
from foundationpose_tpu.ops import raster

K = np.array([[300.0, 0, 80.0], [0, 300.0, 60.0], [0, 0, 1.0]])


def test_corpus_deterministic_and_varied():
    a = corpus.build_corpus(6, seed=3)
    b = corpus.build_corpus(6, seed=3)
    for ma, mb in zip(a, b):
        np.testing.assert_array_equal(ma.vertices, mb.vertices)
    # different seeds give different meshes
    c = corpus.build_corpus(6, seed=4)
    assert any(
        ma.vertices.shape != mc.vertices.shape
        or not np.allclose(ma.vertices, mc.vertices)
        for ma, mc in zip(a, c)
    )


def test_prepare_corpus_shared_buckets():
    prepped = agnostic.prepare_corpus(8, seed=1)
    vc = [p for p in prepped if not p["textured"]]
    tex = [p for p in prepped if p["textured"]]
    for group in (vc, tex):
        if len(group) < 2:
            continue
        s0 = {k: v.shape for k, v in group[0]["mt"].items()}
        for p in group[1:]:
            assert {k: v.shape for k, v in p["mt"].items()} == s0
    # vertex/face axes agree ACROSS groups too (a textured mesh must not
    # carry a larger vertex axis than the vertex-colored ones — the padding
    # bug the first calibration run hit)
    v0 = prepped[0]["mt"]["pos"].shape[0]
    f0 = prepped[0]["mt"]["faces"].shape[0]
    assert all(p["mt"]["pos"].shape[0] == v0 for p in prepped)
    assert all(p["mt"]["faces"].shape[0] == f0 for p in prepped)
    assert all(p["pts"].shape == (512, 3) for p in prepped)
    assert all(p["diameter"] > 0.02 for p in prepped)


def test_params_npz_roundtrip(tmp_path):
    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig

    r = PoseRefiner(RefinerConfig(input_size=32))
    path = str(tmp_path / "p.npz")
    agnostic.save_params_npz(path, r.params)
    restored = agnostic.load_params_npz(path, r.params)
    import jax

    for a, b in zip(jax.tree.leaves(r.params), jax.tree.leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_save_load_agnostic_into_estimator(tmp_path):
    """A saved checkpoint must load into working predictors for a mesh the
    corpus never saw, and run a register end to end."""
    from foundationpose_tpu.core import geometry as geo, meshio
    from foundationpose_tpu.engine.estimator import (
        EstimatorConfig, FoundationPoseTPU,
    )
    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
    from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig

    px = 32
    pr = PoseRefiner(RefinerConfig(input_size=px))
    ps = PoseScorer(ScorerConfig(input_size=px, norm="group",
                                 residual_attn=True))
    out = str(tmp_path / "ckpt")
    agnostic.save_agnostic(out, pr.params, ps.params, {"input_size": px})
    refiner, scorer, meta = agnostic.load_agnostic(out)
    assert meta["input_size"] == px

    mesh = meshio.make_box((0.1, 0.07, 0.05))
    mesh.vertex_colors = np.full((len(mesh.vertices), 3), 160, np.uint8)
    est = FoundationPoseTPU(
        mesh, config=EstimatorConfig(min_n_views=4, inplane_step=180,
                                     register_iterations=1,
                                     final_refine_iterations=0),
        refiner=refiner, scorer=scorer,
    )
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.3, 0.2, 0.1))[:3, :3]
    gt[:3, 3] = [0, 0, 0.5]
    mt = raster.make_mesh_tensors(est.mesh)
    r = raster.render_full_frame(mt, gt[None].astype(np.float32), K, (120, 160))
    depth = np.asarray(r["depth"][0]).astype(np.float32)
    rgb = (np.asarray(r["rgb"][0]) * 255).astype(np.float32)
    mask = (np.asarray(r["mask"][0]) > 0).astype(np.uint8)
    pose = est.register(K, rgb, depth, mask)
    assert np.isfinite(pose).all()


def test_augmented_batch_invariants():
    """Augmentation must not alter the supervision targets or the rendered
    (A) side, and must keep inputs in valid ranges."""
    prepped = agnostic.prepare_corpus(1, seed=2)
    p = prepped[0]
    import jax

    key = jax.random.PRNGKey(0)
    kwargs = dict(batch=4, input_size=32, use_pallas=False)
    clean = datagen.make_refine_batch(
        key, p["mt"], jnp.asarray(K, jnp.float32), p["diameter"],
        augment=False, **kwargs)
    aug = datagen.make_refine_batch(
        key, p["mt"], jnp.asarray(K, jnp.float32), p["diameter"],
        augment=True, **kwargs)
    np.testing.assert_allclose(
        np.asarray(clean["trans_gt"]), np.asarray(aug["trans_gt"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(clean["A"]), np.asarray(aug["A"]), atol=1e-6)
    B = np.asarray(aug["B"])
    assert np.isfinite(B).all()
    assert (B[..., :3] >= 0).all() and (B[..., :3] <= 1).all()
    assert np.abs(B[..., 3:]).max() < 2.0 + 1e-5
    # the background actually differs from the clean render
    assert np.abs(B - np.asarray(clean["B"])).max() > 0.05


def test_shipped_checkpoint_loads_and_runs():
    """The in-repo weights/agnostic artifact must stay loadable and produce
    finite outputs — guards against a corrupt or structure-drifted shipped
    checkpoint (the run_pose learned default depends on it)."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(root, "weights", "agnostic")
    if not os.path.isdir(ckpt):
        pytest.skip("no shipped checkpoint in this tree")
    refiner, scorer, meta = agnostic.load_agnostic(ckpt)
    assert meta["input_size"] == 160
    S = 160
    dummy = jnp.zeros((2, S, S, 6))
    out_r = refiner.net.apply(refiner.params, dummy, dummy)
    assert np.isfinite(np.asarray(out_r["trans"])).all()
    out_s = scorer.net.apply(scorer.params, dummy, dummy, 2)
    assert np.isfinite(np.asarray(out_s["score_logit"])).all()
