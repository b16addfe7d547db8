"""RefineNet — render-and-compare pose-delta regressor (flax).

Architecture parity with the reference learning/models/refine_network.py:26-93:
shared CNN encoder over the rendered (A) and observed (B) 6-channel
[rgb, xyz] crops, channel-concat, deeper encoder, 20x20 -> 400-token sequence
with sinusoidal positions, and two single-layer transformer heads regressing
translation (3) and rotation (axis-angle 3 or 6d).

Input layout is NHWC (B,160,160,6); both crops are encoded in one batched
pass (the reference cats them on the batch axis, refine_network.py:80).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from foundationpose_tpu.models.layers import (
    ConvNormAct,
    PositionalEmbedding,
    ResnetBasicBlock,
    TransformerEncoderLayer,
)


class EncoderA(nn.Module):
    norm: Optional[str]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = ConvNormAct(64, 7, 2, norm=self.norm, dtype=self.dtype, name="conv0")(x)
        x = ConvNormAct(128, 3, 2, norm=self.norm, dtype=self.dtype, name="conv1")(x)
        x = ResnetBasicBlock(128, norm=self.norm, dtype=self.dtype, name="res0")(x)
        x = ResnetBasicBlock(128, norm=self.norm, dtype=self.dtype, name="res1")(x)
        return x


class EncoderAB(nn.Module):
    norm: Optional[str]
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        x = ResnetBasicBlock(256, norm=self.norm, dtype=self.dtype, name="res0")(x)
        x = ResnetBasicBlock(256, norm=self.norm, dtype=self.dtype, name="res1")(x)
        x = ConvNormAct(512, 3, 2, norm=self.norm, dtype=self.dtype, name="conv0")(x)
        x = ResnetBasicBlock(512, norm=self.norm, dtype=self.dtype, name="res2")(x)
        x = ResnetBasicBlock(512, norm=self.norm, dtype=self.dtype, name="res3")(x)
        return x


class RefineNet(nn.Module):
    c_in: int = 6
    rot_rep: str = "axis_angle"  # or "6d"
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # positional handling on non-20x20 token grids (coarse funnel crops):
    # "regrid" bilinearly resamples the 20x20 table so positions stay
    # in-distribution; "flat" slices the first h*w rows like the torch
    # reference would (network_modules.py:133-137). At 160px input the two
    # are identical.
    pos_grid_mode: str = "regrid"

    @nn.compact
    def __call__(self, A, B):
        """A: rendered crops (N,H,W,c_in); B: observed crops (N,H,W,c_in).
        Returns {'trans': (N,3), 'rot': (N,3 or 6)} in float32."""
        bs = A.shape[0]
        x = jnp.concatenate([A, B], axis=0).astype(self.dtype)
        x = EncoderA(self.norm, self.dtype, name="encodeA")(x)
        a, b = x[:bs], x[bs:]
        ab = jnp.concatenate([a, b], axis=-1)
        ab = EncoderAB(self.norm, self.dtype, name="encodeAB")(ab)  # (N,20,20,512)
        grid_hw = (ab.shape[1], ab.shape[2])
        tokens = ab.reshape(bs, -1, ab.shape[-1])  # (N,400,512)
        tokens = PositionalEmbedding(512, max_len=400, name="pos_embed")(
            tokens,
            grid_hw=grid_hw if self.pos_grid_mode == "regrid" else None,
            train_hw=(20, 20),
        )

        t = TransformerEncoderLayer(512, 4, 512, self.dtype, name="trans_tf")(tokens)
        trans = nn.Dense(3, dtype=self.dtype, name="trans_out")(t).mean(axis=1)

        rot_dim = 3 if self.rot_rep == "axis_angle" else 6
        r = TransformerEncoderLayer(512, 4, 512, self.dtype, name="rot_tf")(tokens)
        rot = nn.Dense(rot_dim, dtype=self.dtype, name="rot_out")(r).mean(axis=1)

        return {"trans": trans.astype(jnp.float32), "rot": rot.astype(jnp.float32)}
