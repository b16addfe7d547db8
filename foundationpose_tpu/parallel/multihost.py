"""Multi-host runtime initialization + global mesh construction.

The reference is strictly single-process (SURVEY.md section 2.3: its
``torch.distributed`` import is dead code, predict_score.py:15, and
``split_objects_across_gpus`` is an unused flag, training_config.py:24).
The TPU-native replacement is ``jax.distributed``: one process per host, XLA
collectives over ICI within a slice and DCN across slices. This module is the
single entry point a launcher calls on every host before touching devices.

Typical pod-slice launch (same command on every host):

    from foundationpose_tpu.parallel import multihost
    multihost.initialize()                  # env-driven on Cloud TPU
    mesh = multihost.make_global_mesh(("batch",))
    # ... shard hypothesis/ray/object axes over `mesh` as usual

For CPU-based multi-process testing (the JAX-standard stand-in for multi-host
hardware), pass the coordinator explicitly:

    multihost.initialize(coordinator_address="localhost:9876",
                         num_processes=2, process_id=rank)
"""

from __future__ import annotations

import logging

import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
):
    """Bring up the cross-host runtime (idempotent). With no arguments, JAX
    auto-discovers the topology from the Cloud TPU / cluster environment."""
    import jax

    if getattr(initialize, "_done", False):
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    try:
        jax.distributed.initialize(**kwargs)
        initialize._done = True
    except ValueError as e:
        # single-process launch without cluster env vars: run locally
        logging.info("multihost.initialize: running single-process (%s)", e)
    except RuntimeError as e:
        # backend already up (e.g. a framework call touched jax.devices()
        # first) — don't take down a working single-process session
        if "must be called before" in str(e) or "already initialized" in str(e):
            logging.warning("multihost.initialize skipped: %s", e)
        else:
            raise


def is_primary() -> bool:
    """True on the host that should write checkpoints / logs."""
    import jax

    return jax.process_index() == 0


def make_global_mesh(axis_names=("batch",), shape=None):
    """Device mesh over ALL hosts' devices. With the default 1-D shape the
    axis spans every chip in the job; pass ``shape`` for 2-D layouts, e.g.
    ``shape=(n_hosts, devices_per_host)`` with ``axis_names=("host", "chip")``
    so that collectives over "chip" ride ICI and only "host" touches DCN."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), axis_names)


def sync_hosts(name: str = "barrier"):
    """Cross-host barrier (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_from_primary(tree):
    """Replicate host-0's pytree of np arrays to every host (no-op
    single-process). Use for RNG seeds, configs resolved on host 0, etc."""
    import jax

    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
