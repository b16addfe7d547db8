"""warp_crop_affine (separable MXU warp) must match warp_perspective for the
axis-aligned crop transforms the engine produces."""

import numpy as np

from foundationpose_tpu.ops import image as imops


def _crop_tfs(rng, n):
    tfs = np.zeros((n, 3, 3), np.float32)
    scale = rng.uniform(0.2, 1.5, size=n)
    tfs[:, 0, 0] = scale
    tfs[:, 1, 1] = scale
    tfs[:, 0, 2] = rng.uniform(-80, 30, size=n)
    tfs[:, 1, 2] = rng.uniform(-60, 30, size=n)
    tfs[:, 2, 2] = 1.0
    return tfs


def test_matches_general_warp_bilinear():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(48, 64, 3)).astype(np.float32)
    tfs = _crop_tfs(rng, 7)
    ref = np.asarray(imops.warp_perspective(img, tfs, (40, 40), mode="bilinear"))
    fast = np.asarray(imops.warp_crop_affine(img, tfs, (40, 40), mode="bilinear"))
    np.testing.assert_allclose(fast, ref, atol=1e-2)  # f32 matmul rounding, 0..255 scale


def test_matches_general_warp_nearest():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 2.0, size=(48, 64, 3)).astype(np.float32)
    tfs = _crop_tfs(rng, 5)
    # keep sample positions away from exact .5 ties (round-half-even is
    # matched between both paths, but float rounding of the inverse transform
    # computation differs in the last ulp)
    tfs[:, 0, 2] = np.round(tfs[:, 0, 2]) + 0.25
    tfs[:, 1, 2] = np.round(tfs[:, 1, 2]) + 0.25
    ref = np.asarray(imops.warp_perspective(img, tfs, (40, 40), mode="nearest"))
    fast = np.asarray(imops.warp_crop_affine(img, tfs, (40, 40), mode="nearest"))
    same = np.isclose(fast, ref).mean()
    assert same > 0.995  # boundary ties may differ by one source pixel


def test_2d_and_single_tf():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 1, size=(32, 32)).astype(np.float32)
    tf = _crop_tfs(rng, 1)[0]
    ref = np.asarray(imops.warp_perspective(img, tf, (16, 16), mode="bilinear"))
    fast = np.asarray(imops.warp_crop_affine(img, tf, (16, 16), mode="bilinear"))
    assert fast.shape == ref.shape == (16, 16)
    np.testing.assert_allclose(fast, ref, atol=1e-4)


def test_zero_outside():
    img = np.ones((20, 20, 1), np.float32)
    tf = np.eye(3, dtype=np.float32)
    tf[0, 2] = -15.0  # shifts sampling window past the right edge
    out = np.asarray(imops.warp_crop_affine(img, tf[None], (20, 20)))
    assert out[:, :, 10:].max() == 0.0  # x >= 5 samples past the right edge
    assert out[:, :, :4].min() == 1.0
