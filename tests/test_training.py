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


def test_decode_inverts_egocentric_delta():
    """Training targets must be expressible as exact decode outputs: for a
    (poseA, poseB) pair within the tanh bounds there exist raw net outputs
    whose decode_delta maps poseA exactly onto poseB. This pins the
    train/inference consistency the refiner_loss relies on (decoded deltas
    vs egocentric ground truth)."""
    from foundationpose_tpu.core import geometry as geo
    from foundationpose_tpu.engine.refiner import RefinerConfig, decode_delta

    rng = np.random.default_rng(3)
    d = 0.21  # mesh diameter
    cfg = RefinerConfig()
    poseA = np.eye(4, dtype=np.float32)[None].repeat(4, axis=0)
    poseA[:, :3, :3] = np.asarray(
        geo.so3_exp_map(jnp.asarray(rng.normal(0, 1.0, (4, 3)), jnp.float32))
    )
    poseA[:, :3, 3] = rng.normal(0, 0.05, (4, 3)) + [0, 0, 0.6]
    dt = rng.uniform(-0.015, 0.015, (4, 3)).astype(np.float32)
    dw = rng.uniform(-0.25, 0.25, (4, 3)).astype(np.float32)  # < 20 deg bound
    poseB = np.asarray(
        geo.egocentric_delta_pose_to_pose(
            jnp.asarray(poseA),
            jnp.asarray(dt),
            jnp.asarray(geo.so3_exp_map(jnp.asarray(dw))),
        )
    )
    trans_gt, rot_gt = geo.pose_to_egocentric_delta_pose(
        jnp.asarray(poseA), jnp.asarray(poseB)
    )

    # ideal raw outputs inverting the decode
    out_trans = np.asarray(trans_gt) / (d / 2.0)
    w = -np.asarray(geo.so3_log_map(rot_gt))  # decode transposes
    out_rot = np.arctanh(np.clip(w / cfg.rot_normalizer, -0.999999, 0.999999))

    td, rd = decode_delta(
        {"trans": jnp.asarray(out_trans), "rot": jnp.asarray(out_rot)}, cfg, d
    )
    poseB_dec = np.asarray(
        geo.egocentric_delta_pose_to_pose(jnp.asarray(poseA), td, rd)
    )
    np.testing.assert_allclose(poseB_dec, poseB, atol=1e-5)
