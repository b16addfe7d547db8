"""Register-time observed-mask gating (EstimatorConfig.register_mask_dilation).

The estimator zeroes observed rgb/depth beyond a dilated margin around the
segmentation mask before building crops — clutter abutting the object inside
the crop window biases both learned nets and projective ICP (the reference
instead feeds the nets full unmasked RGBD, estimater.py:184-206, and relies
on training-set clutter for robustness).
"""

import jax.numpy as jnp
import numpy as np

from foundationpose_tpu.ops import image as imops


def test_dilate_mask_grows_square():
    m = np.zeros((21, 21), bool)
    m[10, 10] = True
    out = np.asarray(imops.dilate_mask(jnp.asarray(m), radius=3))
    assert out.dtype == bool
    # a single pixel grows to a (2r+1)^2 block, nothing more
    assert out.sum() == 7 * 7
    assert out[7:14, 7:14].all()


def test_dilate_mask_zero_stays_zero():
    m = jnp.zeros((16, 16), bool)
    assert not np.asarray(imops.dilate_mask(m, radius=5)).any()


def test_dilate_mask_edge_clips():
    m = np.zeros((8, 8), bool)
    m[0, 0] = True
    out = np.asarray(imops.dilate_mask(jnp.asarray(m), radius=2))
    assert out[:3, :3].all() and out.sum() == 9
