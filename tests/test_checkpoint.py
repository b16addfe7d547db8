import numpy as np
import pytest

from foundationpose_tpu.core import meshio
from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
from foundationpose_tpu.models import checkpoint as ckpt


def test_engine_checkpoint_roundtrip(tmp_path):
    import dataclasses

    import jax

    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
    from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig

    mesh = meshio.make_box((0.1, 0.1, 0.1))
    cfg = EstimatorConfig(min_n_views=12, inplane_step=180)
    rcfg = dataclasses.replace(RefinerConfig(), use_pallas=False, input_size=32)
    scfg = dataclasses.replace(ScorerConfig(), use_pallas=False, input_size=32)
    est = FoundationPoseTPU(
        mesh, config=cfg,
        refiner=PoseRefiner(rcfg, seed=1),
        scorer=PoseScorer(scfg, seed=2),
    )
    path = str(tmp_path / "engine_ckpt")
    ckpt.save_engine(est, path)

    est2 = FoundationPoseTPU(
        mesh, config=cfg,
        refiner=PoseRefiner(rcfg, seed=7),
        scorer=PoseScorer(scfg, seed=8),
    )
    before = jax.tree.leaves(est2.refiner.params)[0]
    ckpt.load_engine(est2, path)
    for a, b in zip(jax.tree.leaves(est.refiner.params), jax.tree.leaves(est2.refiner.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(est.scorer.params), jax.tree.leaves(est2.scorer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
