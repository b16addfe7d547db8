"""ScoreNetMultiPair — hypothesis scorer with cross-pose attention (flax).

Architecture parity with the reference learning/models/score_network.py:27-90:
per-pair CNN encoding of (rendered, observed) crops, token self-attention +
mean pooling into a 512-d pair feature, then attention ACROSS the L pose
hypotheses of one frame and a linear score head.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from foundationpose_tpu.models.layers import (
    MultiheadSelfAttention,
    PositionalEmbedding,
)
from foundationpose_tpu.models.refine_net import EncoderA, EncoderAB


class ScoreNetMultiPair(nn.Module):
    c_in: int = 6
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    # see RefineNet.pos_grid_mode
    pos_grid_mode: str = "regrid"
    # The reference applies its attentions WITHOUT residual connections
    # (score_network.py:73,90: `x, _ = att(x,x,x)`). Near init the attention
    # is ~uniform, so the cross-pose layer outputs the AVERAGE over the L
    # hypotheses — per-hypothesis signal is second-order and from-scratch
    # training collapses onto the rank-loss saddle. residual_attn=True wraps
    # both attentions with x + att(x) for trainability; keep False (exact
    # reference forward) when loading imported checkpoints.
    residual_attn: bool = False

    @nn.compact
    def __call__(self, A, B, L):
        """A/B: (B*L,H,W,c_in); L: number of hypotheses per frame (static).
        Returns {'score_logit': (B, L)} float32."""
        bs = A.shape[0]
        x = jnp.concatenate([A, B], axis=0).astype(self.dtype)
        x = EncoderA(self.norm, self.dtype, name="encoderA")(x)
        a, b = x[:bs], x[bs:]
        ab = jnp.concatenate([a, b], axis=-1)
        ab = EncoderAB(self.norm, self.dtype, name="encoderAB")(ab)
        grid_hw = (ab.shape[1], ab.shape[2])
        tokens = ab.reshape(bs, -1, ab.shape[-1])  # (B*L,400,512)
        tokens = PositionalEmbedding(512, max_len=400, name="pos_embed")(
            tokens,
            grid_hw=grid_hw if self.pos_grid_mode == "regrid" else None,
            train_hw=(20, 20),
        )
        att = MultiheadSelfAttention(512, 4, self.dtype, name="att")(tokens)
        tokens = tokens + att if self.residual_attn else att
        feats = tokens.mean(axis=1).reshape(bs // L, L, -1)  # (B,L,512)
        cross = MultiheadSelfAttention(512, 4, self.dtype, name="att_cross")(feats)
        feats = feats + cross if self.residual_attn else cross
        logit = nn.Dense(1, dtype=self.dtype, name="linear")(feats)
        return {"score_logit": logit[..., 0].astype(jnp.float32)}
