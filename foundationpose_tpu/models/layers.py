"""Shared network building blocks (flax).

Behavioral parity with the reference's learning/models/network_modules.py:
ConvBNReLU (:37-50), ResnetBasicBlock (:73-111), PositionalEmbedding
(:115-137), and the torch ``TransformerEncoderLayer`` / ``MultiheadAttention``
semantics consumed by refine_network.py:56-70 and score_network.py:53-57
(post-LayerNorm residual blocks, ReLU feedforward).

NHWC layout; convolutions use explicit symmetric (k-1)//2 padding to match
the torch shapes exactly. ``dtype`` controls compute precision (bfloat16 on
TPU); parameters stay float32.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _norm_layer(norm: Optional[str], dtype):
    if norm is None or norm == "none":
        return None
    if norm == "batch":
        # inference-style batch norm (running stats folded in at load time)
        return lambda: nn.BatchNorm(use_running_average=True, dtype=dtype)
    if norm == "group":
        return lambda: nn.GroupNorm(num_groups=16, dtype=dtype)
    raise ValueError(f"unknown norm {norm}")


class ConvNormAct(nn.Module):
    """Conv + optional norm + optional ReLU (reference ConvBNReLU/ConvBN)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    norm: Optional[str] = None
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        mk = _norm_layer(self.norm, self.dtype)
        if mk is not None:
            x = mk()(x)
        if self.act:
            x = nn.relu(x)
        return x


class ResnetBasicBlock(nn.Module):
    """Two 3x3 convs with residual (reference network_modules.py:73-111;
    stride 1, no downsample — the only form the reference instantiates)."""

    planes: int
    use_bias: bool = True
    norm: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        mk = _norm_layer(self.norm, self.dtype)
        y = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=self.use_bias,
            dtype=self.dtype, name="conv1",
        )(x)
        if mk is not None:
            y = mk()(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), use_bias=self.use_bias,
            dtype=self.dtype, name="conv2",
        )(y)
        if mk is not None:
            y = mk()(y)
        return nn.relu(y + identity)


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """(max_len, d_model) sin/cos table (reference network_modules.py:115-131)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


def regrid_positions(pe: np.ndarray, train_hw, out_hw) -> np.ndarray:
    """Bilinearly resample a (H*W, D) positional table laid out row-major
    over ``train_hw`` onto an ``out_hw`` token grid (align-corners).

    Used when the funnel schedule runs the nets on coarser crops: token (r,c)
    of an h x w grid then reads the table at the fractional position it would
    occupy in the training-time 20x20 grid, instead of the off-distribution
    flat index 14r+c a plain slice would give it."""
    H, W = train_hw
    h, w = out_hw
    pe2 = pe.reshape(H, W, -1)
    rf = np.linspace(0.0, H - 1.0, h)
    cf = np.linspace(0.0, W - 1.0, w)
    r0 = np.clip(np.floor(rf).astype(int), 0, H - 2)
    c0 = np.clip(np.floor(cf).astype(int), 0, W - 2)
    ar = (rf - r0)[:, None, None]
    ac = (cf - c0)[None, :, None]
    top = pe2[r0][:, c0] * (1 - ac) + pe2[r0][:, c0 + 1] * ac
    bot = pe2[r0 + 1][:, c0] * (1 - ac) + pe2[r0 + 1][:, c0 + 1] * ac
    out = top * (1 - ar) + bot * ar
    return out.reshape(h * w, -1).astype(pe.dtype)


class PositionalEmbedding(nn.Module):
    d_model: int
    max_len: int = 512

    @nn.compact
    def __call__(self, x, grid_hw=None, train_hw=None):
        """``grid_hw``: actual (h, w) spatial layout of the tokens;
        ``train_hw``: layout the table was built for (e.g. (20, 20) for the
        400-token pose nets). When the grids differ, the table is bilinearly
        regridded so coarse-crop funnel passes see in-distribution positions."""
        pe = sinusoidal_positions(self.max_len, self.d_model)
        if (
            grid_hw is not None
            and train_hw is not None
            and tuple(grid_hw) != tuple(train_hw)
        ):
            pe = regrid_positions(pe, train_hw, grid_hw)
            return x + jnp.asarray(pe, dtype=x.dtype)[None]
        return x + jnp.asarray(pe, dtype=x.dtype)[None, : x.shape[1]]


class MultiheadSelfAttention(nn.Module):
    """torch ``nn.MultiheadAttention`` semantics for self-attention: fused
    in-proj, scaled dot-product, out-proj."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        h = self.num_heads
        dh = D // h
        qkv = nn.Dense(3 * D, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, N, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(dh)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """torch post-LN encoder layer: x = LN1(x + MHA(x)); x = LN2(x + FF(x))
    with ReLU feedforward (consumed at refine_network.py:56-70)."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = MultiheadSelfAttention(self.d_model, self.num_heads, self.dtype, name="self_attn")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x + y)
        y = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(y)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(x + y)
