"""Instant-NGP multiresolution hash-grid encoder.

TPU-native counterpart of the reference's CUDA grid encoder
(bundlesdf/mycuda/torch_ngp_grid_encoder/gridencoder.cu: fast_hash :36-51,
tiled-vs-hashed indexing :54-72, trilinear forward kernel :95-244, atomic
scatter-add backward :248-334; python wrapper grid.py:92-157).

Design: the forward pass is pure-XLA gathers + trilinear weights; JAX
autodiff of the gather produces exactly the scatter-add backward the CUDA
kernel hand-writes (XLA lowers it to a sorted segment-sum on TPU), so no
custom VJP is needed for correctness. Same prime-XOR hash, same per-level
dense-vs-hashed switch, same geometric level growth.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# fast_hash primes (gridencoder.cu:36-51); index 0 intentionally 1 so dense
# grids reduce to row-major indexing
_PRIMES = (1, 2654435761, 805459861)


def level_resolutions(num_levels, base_resolution, desired_resolution):
    """Per-level grid resolutions with geometric growth
    (instant-ngp eq. 2-3; grid.py:109-122)."""
    if num_levels > 1:
        b = math.exp(
            math.log(desired_resolution / base_resolution) / (num_levels - 1)
        )
    else:
        b = 1.0
    return [int(math.ceil(base_resolution * (b**l))) for l in range(num_levels)]


def level_table_sizes(resolutions: Sequence[int], log2_hashmap_size: int):
    """Entries per level: dense (R+1)^3 when it fits, else 2^log2_hashmap_size,
    aligned up to 8 like the reference (grid.py:112-116)."""
    max_entries = 2**log2_hashmap_size
    sizes = []
    for R in resolutions:
        dense = (R + 1) ** 3
        size = min(dense, max_entries)
        size = int((size + 7) // 8) * 8
        sizes.append(size)
    return sizes


def _grid_index(coords, R, table_size):
    """coords: (..., 3) int32 lattice corners in [0, R]. Dense row-major when
    the level fits, prime-XOR hash otherwise (gridencoder.cu:54-72)."""
    dense = (R + 1) ** 3
    if dense <= table_size:
        return (
            coords[..., 0] * ((R + 1) ** 2)
            + coords[..., 1] * (R + 1)
            + coords[..., 2]
        )
    c = coords.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(_PRIMES[0])
        ^ c[..., 1] * jnp.uint32(_PRIMES[1])
        ^ c[..., 2] * jnp.uint32(_PRIMES[2])
    )
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


def hash_encode(x, table, resolutions, offsets, table_sizes):
    """Encode points with a multires hash grid.

    x: (N,3) in [-1, 1]; table: (total_entries, F).
    Returns (N, L*F).
    """
    u = jnp.clip(x * 0.5 + 0.5, 0.0, 1.0)  # [0,1]
    outs = []
    for l, R in enumerate(resolutions):
        p = u * R  # [0, R]
        c0 = jnp.floor(p).astype(jnp.int32)
        c0 = jnp.clip(c0, 0, R - 1)
        frac = p - c0
        level_feats = 0.0
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    corner = c0 + jnp.array([dx, dy, dz], jnp.int32)
                    idx = _grid_index(corner, R, table_sizes[l]) + offsets[l]
                    w = (
                        (frac[..., 0] if dx else 1 - frac[..., 0])
                        * (frac[..., 1] if dy else 1 - frac[..., 1])
                        * (frac[..., 2] if dz else 1 - frac[..., 2])
                    )
                    level_feats = level_feats + table[idx] * w[..., None]
        outs.append(level_feats)
    return jnp.concatenate(outs, axis=-1)


class HashGridEncoder(nn.Module):
    """flax module owning the embedding table.

    Defaults are the reference's BundleSDF config (config_ycbv.yml:44-47):
    16 levels x 2 features, 2^22 hashmap, base 32 -> finest 512.
    """

    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 32
    desired_resolution: int = 512
    log2_hashmap_size: int = 22

    def setup(self):
        self.resolutions = level_resolutions(
            self.num_levels, self.base_resolution, self.desired_resolution
        )
        self.table_sizes = level_table_sizes(
            self.resolutions, self.log2_hashmap_size
        )
        offsets = np.concatenate([[0], np.cumsum(self.table_sizes)])
        self.offsets = tuple(int(o) for o in offsets[:-1])
        total = int(offsets[-1])
        # init U(-1e-4, 1e-4) like torch-ngp (grid.py resets params small)
        self.table = self.param(
            "table",
            lambda key: jax.random.uniform(
                key, (total, self.level_dim), jnp.float32, -1e-4, 1e-4
            ),
        )

    @property
    def out_dim(self):
        return self.num_levels * self.level_dim

    def __call__(self, x):
        return hash_encode(
            x, self.table, self.resolutions, jnp.asarray(self.offsets), self.table_sizes
        )
