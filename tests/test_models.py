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
