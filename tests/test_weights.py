"""Torch-checkpoint import: structural round trip against the flax models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationpose_tpu.models import weights as W
from foundationpose_tpu.models.refine_net import RefineNet
from foundationpose_tpu.models.score_net import ScoreNetMultiPair


def _fake_conv(sd, prefix, cin, cout, k, bn=False):
    rng = np.random.default_rng(hash(prefix) % 2**31)
    sd[f"{prefix}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
    sd[f"{prefix}.bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.05


def _fake_bn(sd, prefix, c):
    rng = np.random.default_rng(hash(prefix) % 2**31)
    sd[f"{prefix}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
    sd[f"{prefix}.running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
    sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)


def _fake_linear(sd, prefix, cin, cout):
    rng = np.random.default_rng(hash(prefix) % 2**31)
    sd[f"{prefix}.weight"] = rng.normal(size=(cout, cin)).astype(np.float32) * 0.05
    sd[f"{prefix}.bias"] = rng.normal(size=(cout,)).astype(np.float32) * 0.05


def _fake_mha(sd, prefix, d):
    rng = np.random.default_rng(hash(prefix) % 2**31)
    sd[f"{prefix}.in_proj_weight"] = rng.normal(size=(3 * d, d)).astype(np.float32) * 0.05
    sd[f"{prefix}.in_proj_bias"] = np.zeros(3 * d, np.float32)
    _fake_linear(sd, f"{prefix}.out_proj", d, d)


def _fake_tf_layer(sd, prefix, d=512, ff=512):
    _fake_mha(sd, f"{prefix}.self_attn", d)
    _fake_linear(sd, f"{prefix}.linear1", d, ff)
    _fake_linear(sd, f"{prefix}.linear2", ff, d)
    for norm in ("norm1", "norm2"):
        sd[f"{prefix}.{norm}.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}.{norm}.bias"] = np.zeros(d, np.float32)


def _fake_encoder_a(sd, prefix, c_in, bn):
    _fake_conv(sd, f"{prefix}.0.net.0", c_in, 64, 7)
    _fake_conv(sd, f"{prefix}.1.net.0", 64, 128, 3)
    if bn:
        _fake_bn(sd, f"{prefix}.0.net.1", 64)
        _fake_bn(sd, f"{prefix}.1.net.1", 128)
    for i, p in ((2, 128), (3, 128)):
        _fake_conv(sd, f"{prefix}.{i}.conv1", p, p, 3)
        _fake_conv(sd, f"{prefix}.{i}.conv2", p, p, 3)
        if bn:
            _fake_bn(sd, f"{prefix}.{i}.bn1", p)
            _fake_bn(sd, f"{prefix}.{i}.bn2", p)


def _fake_encoder_ab(sd, prefix, bn):
    for i, p in ((0, 256), (1, 256)):
        _fake_conv(sd, f"{prefix}.{i}.conv1", p, p, 3)
        _fake_conv(sd, f"{prefix}.{i}.conv2", p, p, 3)
        if bn:
            _fake_bn(sd, f"{prefix}.{i}.bn1", p)
            _fake_bn(sd, f"{prefix}.{i}.bn2", p)
    _fake_conv(sd, f"{prefix}.2.net.0", 256, 512, 3)
    if bn:
        _fake_bn(sd, f"{prefix}.2.net.1", 512)
    for i in (3, 4):
        _fake_conv(sd, f"{prefix}.{i}.conv1", 512, 512, 3)
        _fake_conv(sd, f"{prefix}.{i}.conv2", 512, 512, 3)
        if bn:
            _fake_bn(sd, f"{prefix}.{i}.bn1", 512)
            _fake_bn(sd, f"{prefix}.{i}.bn2", 512)


def fake_refine_sd(bn=False, c_in=6):
    sd = {}
    _fake_encoder_a(sd, "encodeA", c_in, bn)
    _fake_encoder_ab(sd, "encodeAB", bn)
    _fake_tf_layer(sd, "trans_head.0")
    _fake_linear(sd, "trans_head.1", 512, 3)
    _fake_tf_layer(sd, "rot_head.0")
    _fake_linear(sd, "rot_head.1", 512, 3)
    return sd


def fake_score_sd(bn=False, c_in=6):
    sd = {}
    _fake_encoder_a(sd, "encoderA", c_in, bn)
    _fake_encoder_ab(sd, "encoderAB", bn)
    _fake_mha(sd, "att", 512)
    _fake_mha(sd, "att_cross", 512)
    _fake_linear(sd, "linear", 512, 1)
    return sd


def _tree_shapes(t):
    return jax.tree.map(lambda x: tuple(np.shape(x)), t)


@pytest.mark.parametrize("bn", [False, True])
def test_refine_import_matches_flax_tree(bn):
    sd = fake_refine_sd(bn=bn)
    params = W.refine_params_from_torch(sd, use_bn=bn)
    net = RefineNet(c_in=6, dtype=jnp.float32)
    A = jnp.zeros((2, 64, 64, 6))
    ref = net.init(jax.random.PRNGKey(0), A, A)
    assert _tree_shapes(params) == _tree_shapes(jax.device_get(ref))
    out = net.apply(jax.tree.map(jnp.asarray, params), A, A)
    assert np.isfinite(np.asarray(out["trans"])).all()


def test_score_import_matches_flax_tree():
    sd = fake_score_sd()
    params = W.score_params_from_torch(sd)
    net = ScoreNetMultiPair(c_in=6, dtype=jnp.float32)
    A = jnp.zeros((2, 64, 64, 6))
    ref = net.init(jax.random.PRNGKey(0), A, A, 2)
    assert _tree_shapes(params) == _tree_shapes(jax.device_get(ref))
    out = net.apply(jax.tree.map(jnp.asarray, params), A, A, 2)
    assert out["score_logit"].shape == (1, 2)


def test_bn_folding_matches_explicit():
    """Folded conv+BN == conv then batchnorm with running stats."""
    sd = {}
    _fake_conv(sd, "c", 3, 8, 3)
    _fake_bn(sd, "b", 8)
    conv = W._conv(sd, "c")
    folded = W._fold_bn(dict(conv), sd, "b")
    x = np.random.default_rng(0).normal(size=(1, 5, 5, 3)).astype(np.float32)
    import jax.numpy as jnp
    from jax import lax

    def apply_conv(k, b):
        y = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(k), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return np.asarray(y + b)

    y_plain = apply_conv(conv["kernel"], conv["bias"])
    gamma, beta = sd["b.weight"], sd["b.bias"]
    mean, var = sd["b.running_mean"], sd["b.running_var"]
    y_bn = (y_plain - mean) / np.sqrt(var + 1e-5) * gamma + beta
    y_folded = apply_conv(folded["kernel"], folded["bias"])
    np.testing.assert_allclose(y_folded, y_bn, atol=1e-5)


def test_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    sd = fake_score_sd()
    tsd = {k: torch.from_numpy(v) for k, v in sd.items()}
    p = str(tmp_path / "model_best.pth")
    torch.save({"model": tsd}, p)
    loaded = W.load_torch_checkpoint(p)
    assert set(loaded.keys()) == set(sd.keys())
    np.testing.assert_allclose(loaded["linear.weight"], sd["linear.weight"])
