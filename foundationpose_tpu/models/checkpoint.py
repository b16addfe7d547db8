"""Checkpointing for engine and field state (orbax).

Reference behavior: torch ``model_best.pth`` for the networks
(predict_pose_refine.py:138-141) and ``model_latest.pth`` containing model +
optimizer + pose/feature arrays for the NeRF (nerf_runner.save_weights
:394-422). Here: orbax PyTree checkpoints with the same coverage — engine
params (refiner+scorer) and the full field training state (params, optimizer
state, step, normalization constants) for resumable reconstruction.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_engine(estimator, path):
    """Save refiner + scorer params."""
    path = os.path.abspath(path)
    state = {
        "refiner": jax.device_get(estimator.refiner.params),
        "scorer": jax.device_get(estimator.scorer.params),
    }
    _ckptr().save(path, state, force=True)
    logging.info("engine checkpoint saved to %s", path)


def load_engine(estimator, path):
    path = os.path.abspath(path)
    target = {
        "refiner": jax.device_get(estimator.refiner.params),
        "scorer": jax.device_get(estimator.scorer.params),
    }
    state = _ckptr().restore(path, item=target)
    estimator.refiner.params = jax.device_put(state["refiner"])
    estimator.scorer.params = jax.device_put(state["scorer"])
    logging.info("engine checkpoint loaded from %s", path)


def save_field(runner, path):
    """Save the full field training state (resumable, reference
    nerf_runner.save_weights coverage)."""
    path = os.path.abspath(path)
    state = {
        "params": jax.device_get(runner.params),
        "opt_state": jax.device_get(runner.opt_state),
        "global_step": np.asarray(runner.global_step),
        "sc_factor": np.asarray(runner.sc_factor),
        "translation": np.asarray(runner.translation),
        "occ_grid": np.asarray(runner.occ_grid),
    }
    _ckptr().save(path, state, force=True)
    logging.info("field checkpoint saved to %s", path)


def load_field(runner, path):
    import jax.numpy as jnp

    path = os.path.abspath(path)
    target = {
        "params": jax.device_get(runner.params),
        "opt_state": jax.device_get(runner.opt_state),
        "global_step": np.asarray(runner.global_step),
        "sc_factor": np.asarray(runner.sc_factor),
        "translation": np.asarray(runner.translation),
        "occ_grid": np.asarray(runner.occ_grid),
    }
    state = _ckptr().restore(path, item=target)
    runner.params = jax.device_put(state["params"])
    runner.opt_state = jax.device_put(state["opt_state"])
    runner.global_step = int(state["global_step"])
    runner.occ_grid = jnp.asarray(state["occ_grid"])
    logging.info("field checkpoint loaded from %s", path)
