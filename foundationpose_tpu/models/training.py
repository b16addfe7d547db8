"""Training steps for the pose networks.

The reference ships only config dataclasses for training
(learning/training/training_config.py:18-100 — 160^2 crops, batch 64, Adam
1e-4, L2 pose-delta loss for the refiner, pairwise-valid ranking loss for the
scorer); the loops themselves are absent from the snapshot. These jitted steps
realize that surface TPU-natively: data-parallel over the device mesh (batch
axis sharded; XLA inserts the psum for the gradient reduction).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from foundationpose_tpu.core import geometry as geo


def make_refiner_train_state(net, rng, input_size=160, c_in=6, lr=1e-4):
    dummy = jnp.zeros((1, input_size, input_size, c_in))
    params = net.init(rng, dummy, dummy)
    tx = optax.adam(lr)
    return params, tx, tx.init(params)


def refiner_loss(net, params, batch, mesh_diameter):
    """L2 on the DECODED deltas (TrainRefinerConfig: trans/rot L2,
    training_config.py:97).

    The network outputs are pushed through the exact inference decode
    (engine.refiner.decode_delta — diameter scaling, tanh bounds, the
    rotation transpose) and compared against the egocentric ground-truth
    deltas, so train and inference are consistent BY CONSTRUCTION; training
    raw outputs against metric targets would learn the inverse-transposed
    map of what inference applies. Translation error is normalized by the
    mesh radius to balance the two terms."""
    from foundationpose_tpu.engine.refiner import RefinerConfig, decode_delta

    out = net.apply(params, batch["A"], batch["B"])
    cfg = RefinerConfig(rot_rep=net.rot_rep)
    trans_delta, rot_mat_delta = decode_delta(out, cfg, mesh_diameter)
    radius = mesh_diameter / 2.0
    loss_t = jnp.mean(
        jnp.sum(((trans_delta - batch["trans_gt"]) / radius) ** 2, axis=-1)
    )
    loss_r = jnp.mean(
        jnp.sum((rot_mat_delta - batch["rot_gt"]) ** 2, axis=(-2, -1))
    )
    return loss_t + loss_r


@functools.partial(
    jax.jit, static_argnames=("net", "tx", "mesh_diameter"), donate_argnums=(2, 3)
)
def refiner_train_step(net, tx, params, opt_state, batch, mesh_diameter=0.2):
    loss, grads = jax.value_and_grad(
        lambda p: refiner_loss(net, p, batch, mesh_diameter)
    )(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(
    jax.jit, static_argnames=("net", "tx"), donate_argnums=(2, 3)
)
def refiner_train_step_multimesh(net, tx, params, opt_state, batch,
                                 mesh_diameter):
    """Like refiner_train_step but with a TRACED mesh diameter: the
    object-agnostic corpus trainer cycles through meshes with distinct
    diameters every step, and a static diameter would compile one program
    per mesh."""
    loss, grads = jax.value_and_grad(
        lambda p: refiner_loss(net, p, batch, mesh_diameter)
    )(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def scorer_loss(net, params, batch, mode="listwise", temperature=0.25):
    """Ranking supervision for the scorer: hypotheses with lower ADD score
    higher.

    ``mode="pairwise"`` is the hinge form of the reference's
    'pairwise_valid' flag (training_config.py:51 — the trainer itself is
    absent from the snapshot). ``mode="listwise"`` (default) is a softmax
    cross-entropy against soft targets softmax(-adds/(tau*diameter-ish)):
    shift-invariant in the logits (no scale drift) and much better
    conditioned for small synthetic hypothesis sets, where the pairwise
    hinge's +-1 pair gradients are dominated by the shared feature
    component and fail to separate ranks."""
    out = net.apply(params, batch["A"], batch["B"], batch["A"].shape[0])
    s = out["score_logit"].reshape(-1)  # (L,)
    err = batch["adds"].reshape(-1)
    if mode == "pairwise":
        better = err[:, None] < err[None, :] - batch.get("margin", 1e-4)
        diff = s[None, :] - s[:, None]  # s_i - s_j where i better
        hinge = jnp.maximum(0.0, 0.5 + diff) * better
        return hinge.sum() / jnp.maximum(better.sum(), 1.0)
    # listwise: normalize errors to a scale-free range, soft target dist
    e = (err - err.min()) / jnp.maximum(err.max() - err.min(), 1e-9)
    target = jax.nn.softmax(-e / temperature)
    logp = jax.nn.log_softmax(s)
    ce = -(target * logp).sum()
    # pointwise anchor: difference-only ranking losses have a zero-gradient
    # saddle at collapsed (hypothesis-independent) features, and training
    # falls into it from scratch — regressing each score to its own -err
    # makes collapse cost loss, destroying the saddle; any monotone map of
    # -err leaves the argmax semantics unchanged
    pointwise = jnp.mean((s - (-e)) ** 2)
    return ce + pointwise


@functools.partial(
    jax.jit, static_argnames=("net", "tx", "mode"), donate_argnums=(2, 3)
)
def scorer_train_step(net, tx, params, opt_state, batch, mode="listwise"):
    loss, grads = jax.value_and_grad(
        lambda p: scorer_loss(net, p, batch, mode=mode)
    )(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
