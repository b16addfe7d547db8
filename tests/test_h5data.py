import numpy as np
import pytest

from foundationpose_tpu.core import meshio
from foundationpose_tpu.models.h5data import PairH5Dataset, PairH5Writer, generate_dataset


def test_h5_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "pairs.h5")
    w = PairH5Writer(p, input_size=32)
    rng = np.random.default_rng(0)
    for _ in range(3):
        w.append({
            "A": rng.normal(size=(4, 32, 32, 6)).astype(np.float32),
            "B": rng.normal(size=(4, 32, 32, 6)).astype(np.float32),
            "trans_gt": rng.normal(size=(4, 3)).astype(np.float32),
            "rot_gt": np.tile(np.eye(3, dtype=np.float32)[None], (4, 1, 1)),
        })
    w.close()
    ds = PairH5Dataset(p)
    assert len(ds) == 12
    batch = ds.sample_batch(np.random.default_rng(1), 8)
    assert batch["A"].shape == (8, 32, 32, 6)
    assert batch["A"].dtype == np.float32
    assert batch["trans_gt"].shape == (8, 3)
    ds.close()


def test_generate_dataset(tmp_path):
    K = np.array([[120.0, 0, 16], [0, 120.0, 16], [0, 0, 1]])
    mesh = meshio.make_box((0.08, 0.1, 0.06))
    p = generate_dataset(
        str(tmp_path / "gen.h5"), mesh, K, n_batches=2, batch=4, input_size=32,
        with_scores=True,
    )
    ds = PairH5Dataset(p)
    assert len(ds) == 8
    b = ds.sample_batch(np.random.default_rng(0), 4)
    assert "adds" in b
    assert (b["adds"] >= 0).all()
    assert np.abs(b["A"]).sum() > 0
    ds.close()
