import jax
import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.models.refine_net import RefineNet
from foundationpose_tpu.models.score_net import ScoreNetMultiPair
from foundationpose_tpu.models.layers import sinusoidal_positions


def test_sinusoidal_positions():
    pe = sinusoidal_positions(400, 512)
    assert pe.shape == (400, 512)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    assert np.abs(pe).max() <= 1.0 + 1e-6


def test_refine_net_shapes():
    net = RefineNet(c_in=6, dtype=jnp.float32)
    A = jnp.zeros((3, 64, 64, 6))
    B = jnp.zeros((3, 64, 64, 6))
    params = net.init(jax.random.PRNGKey(0), A, B)
    out = net.apply(params, A, B)
    assert out["trans"].shape == (3, 3)
    assert out["rot"].shape == (3, 3)
    assert out["trans"].dtype == jnp.float32
    # 6d variant
    net6 = RefineNet(c_in=6, rot_rep="6d", dtype=jnp.float32)
    p6 = net6.init(jax.random.PRNGKey(0), A, B)
    assert net6.apply(p6, A, B)["rot"].shape == (3, 6)


def test_refine_net_differs_with_input():
    net = RefineNet(c_in=6, dtype=jnp.float32)
    A = jnp.zeros((1, 64, 64, 6))
    params = net.init(jax.random.PRNGKey(0), A, A)
    rng = np.random.default_rng(0)
    B1 = jnp.asarray(rng.normal(size=(1, 64, 64, 6)), jnp.float32)
    out0 = net.apply(params, A, A)
    out1 = net.apply(params, A, B1)
    assert not np.allclose(np.asarray(out0["trans"]), np.asarray(out1["trans"]))


def test_score_net_shapes():
    net = ScoreNetMultiPair(c_in=6, dtype=jnp.float32)
    L = 4
    A = jnp.zeros((L, 64, 64, 6))
    B = jnp.zeros((L, 64, 64, 6))
    params = net.init(jax.random.PRNGKey(0), A, B, L)
    out = net.apply(params, A, B, L)
    assert out["score_logit"].shape == (1, L)
    # two frames x L hypotheses
    A2 = jnp.zeros((2 * L, 64, 64, 6))
    out2 = net.apply(params, A2, A2, L)
    assert out2["score_logit"].shape == (2, L)


def test_learned_refiner_scorer_coarse_out_size():
    """The funnel's coarse pass runs the SAME weights at a reduced crop
    resolution (conv weights are resolution-independent; the positional table
    slices to the token count). traced_refine/traced_score must accept the
    out_size override and keep their output contracts."""
    from foundationpose_tpu.core import meshio
    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
    from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig
    from foundationpose_tpu.ops import raster

    mesh = meshio.make_icosphere_mesh(subdivisions=1, radius=0.05)
    mesh.vertex_colors = np.full((len(mesh.vertices), 3), 150, np.uint8)
    mt = raster.make_mesh_tensors(mesh)
    K = np.array([[120.0, 0, 40], [0, 120.0, 30], [0, 0, 1]], np.float32)
    rgb = jnp.zeros((60, 80, 3), jnp.float32)
    xyz = jnp.zeros((60, 80, 3), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (2, 1, 1))
    poses = poses.at[:, 2, 3].set(0.5)

    ref = PoseRefiner(RefinerConfig(input_size=64, use_pallas=False))
    out = ref.traced_refine(mt, rgb, xyz, K, poses, 0.1, 1, out_size=32)
    assert out.shape == (2, 4, 4)
    assert np.isfinite(np.asarray(out)).all()

    sc = PoseScorer(ScorerConfig(input_size=64, use_pallas=False))
    s = sc.traced_score(mt, rgb, xyz, K, poses, 0.1, out_size=32)
    assert s.shape == (2,)
    assert np.isfinite(np.asarray(s)).all()
