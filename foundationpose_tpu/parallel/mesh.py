"""Device-mesh construction and sharding helpers.

The reference is single-process/single-GPU (SURVEY.md section 2.3); its only
parallel axis is the hypothesis/ray batch chunked over CUDA launches. On TPU
that axis becomes a first-class sharded axis over the device mesh:

- ``batch`` axis: pose hypotheses (register), rays (field training), frames
  (multi-stream tracking) — pure data parallelism, gradients reduced with
  psum over ICI.
- optional ``model`` axis: reserved for tensor-sharding the 512-wide
  transformer blocks; unused by default (models are small; replication wins).

Multi-host: call ``jax.distributed.initialize()`` before ``make_device_mesh``;
the same code then lays the batch axis across hosts (DCN) x local chips (ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_devices: int | None = None, axis_names=("batch",), shape=None):
    """Build a Mesh over the first ``n_devices`` devices.

    ``shape``: per-axis sizes (defaults to all devices on one axis).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names)


_default_mesh = None


def get_mesh():
    """Process-wide default mesh (all devices on the 'batch' axis)."""
    global _default_mesh
    if _default_mesh is None:
        _default_mesh = make_device_mesh()
    return _default_mesh


def shard_batch(mesh: Mesh, tree, axis: str = "batch"):
    """Place a pytree with the leading axis sharded over ``axis``; scalars and
    rank-0 leaves are replicated."""

    def put(x):
        x = np.asarray(x) if not hasattr(x, "ndim") else x
        if getattr(x, "ndim", 0) == 0:
            spec = P()
        else:
            spec = P(axis, *(None,) * (x.ndim - 1))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
