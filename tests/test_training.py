"""Training surface: synthetic data generation + train steps reduce loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationpose_tpu.core import meshio
from foundationpose_tpu.models import datagen, training
from foundationpose_tpu.models.refine_net import RefineNet
from foundationpose_tpu.models.score_net import ScoreNetMultiPair
from foundationpose_tpu.ops import raster

K = np.array([[120.0, 0, 32], [0, 120.0, 32], [0, 0, 1]])


@pytest.fixture(scope="module")
def mesh_setup():
    mesh = meshio.make_box((0.08, 0.1, 0.06))
    mesh.vertex_colors = np.random.default_rng(0).integers(
        50, 220, (8, 3)
    ).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh)
    diameter = meshio.compute_mesh_diameter(mesh=mesh)
    return mesh, mt, diameter


def test_make_refine_batch(mesh_setup):
    _, mt, diameter = mesh_setup
    data = datagen.make_refine_batch(
        jax.random.PRNGKey(0), mt, jnp.asarray(K, jnp.float32), diameter,
        batch=4, input_size=64,
    )
    assert data["A"].shape == (4, 64, 64, 6)
    assert data["B"].shape == (4, 64, 64, 6)
    assert data["trans_gt"].shape == (4, 3)
    assert data["rot_gt"].shape == (4, 3, 3)
    # crops show the object (nonzero pixels)
    assert float(jnp.abs(data["A"][..., :3]).sum()) > 10
    assert float(jnp.abs(data["B"][..., :3]).sum()) > 10
    # deltas bounded by the perturbation scales
    assert np.abs(np.asarray(data["trans_gt"])).max() <= 0.02 + 1e-6
    # rot_gt orthonormal
    R = np.asarray(data["rot_gt"])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.tile(np.eye(3)[None], (4, 1, 1)), atol=1e-5
    )


def test_make_score_batch(mesh_setup):
    mesh, mt, diameter = mesh_setup
    data = datagen.make_score_batch(
        jax.random.PRNGKey(1), mt, jnp.asarray(K, jnp.float32), diameter,
        jnp.asarray(mesh.vertices, jnp.float32), n_hyp=6, input_size=64,
    )
    assert data["A"].shape == (6, 64, 64, 6)
    assert data["adds"].shape == (6,)
    assert (np.asarray(data["adds"]) >= 0).all()


@pytest.mark.slow
def test_refiner_training_reduces_loss(mesh_setup):
    mesh, _, _ = mesh_setup
    net, params, losses = datagen.train_refiner_synthetic(
        mesh, K, steps=30, batch=8, input_size=64
    )
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_scorer_train_step(mesh_setup):
    mesh, mt, diameter = mesh_setup
    import optax

    net = ScoreNetMultiPair(c_in=6, dtype=jnp.float32)
    data = datagen.make_score_batch(
        jax.random.PRNGKey(2), mt, jnp.asarray(K, jnp.float32), diameter,
        jnp.asarray(mesh.vertices, jnp.float32), n_hyp=6, input_size=64,
    )
    params = net.init(jax.random.PRNGKey(0), data["A"], data["B"], 6)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    losses = []
    for i in range(3):
        params, opt_state, loss = training.scorer_train_step(
            net, tx, params, opt_state,
            {"A": data["A"], "B": data["B"], "adds": data["adds"]},
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
