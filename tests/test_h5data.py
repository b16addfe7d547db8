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


def test_prefetch_loader(tmp_path):
    """PrefetchLoader: background workers keep a queue of valid batches and
    shut down cleanly."""
    import time

    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.models.h5data import PrefetchLoader, generate_dataset

    K = np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]])
    mesh = meshio.make_box((0.08, 0.1, 0.06))
    mesh.vertex_colors = np.random.default_rng(0).integers(
        50, 220, (8, 3)
    ).astype(np.uint8)
    path = str(tmp_path / "pairs.h5")
    generate_dataset(path, mesh, K, n_batches=3, batch=4, input_size=32)

    with PrefetchLoader(path, batch_size=4, n_workers=2, prefetch=3, seed=0) as ld:
        batches = [next(ld) for _ in range(5)]
    for b in batches:
        assert b["A"].shape == (4, 32, 32, 6)
        assert b["A"].dtype == np.float32
        assert np.isfinite(b["trans_gt"]).all()
    # workers stopped: queue drains and no new batches appear
    time.sleep(0.3)
    assert all(not t.is_alive() for t in ld._workers)
