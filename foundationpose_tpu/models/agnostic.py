"""Object-agnostic RefineNet/ScoreNet training over the randomized corpus.

This realizes the reference's flagship capability — ONE trained refiner and
ONE trained scorer applied to ANY object, conditioned on the object only
through its renders (predict_pose_refine.py:93-147 loads a single
``weights/<run>/model_best.pth``; training_config.py:20 fixes the 160 px
crop) — with the framework's own on-device synthetic data generation
(models/datagen.py) over a randomized mesh corpus (models/corpus.py).

TPU shape discipline: every corpus mesh is padded to ONE shared shape bucket
(vertices/faces/texture), so the whole multi-object training run compiles
exactly two programs (textured / vertex-colored) regardless of corpus size;
the mesh diameter is a traced scalar (training.refiner_train_step_multimesh).
"""

from __future__ import annotations

import functools
import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from foundationpose_tpu.core import meshio
from foundationpose_tpu.models import corpus as corpus_mod, datagen, training
from foundationpose_tpu.ops import raster


# ---------------------------------------------------------------------------
# flat npz (de)serialization for flax param trees — portable, diffable sizes,
# no directory layout; stored bf16 (training runs the nets in bf16 anyway)

def save_params_npz(path, params, dtype=np.float32):
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            getattr(p, "key", getattr(p, "idx", None)).__str__() for p in kp
        )
        arr = np.asarray(leaf)
        if dtype is not None and arr.dtype == np.float32:
            arr = arr.astype(dtype)
        flat[key] = arr
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params_npz(path, target):
    """Restore into the structure of ``target`` (an initialized param tree)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    out = []
    for kp, leaf in leaves:
        key = "/".join(
            getattr(p, "key", getattr(p, "idx", None)).__str__() for p in kp
        )
        arr = data[key]
        np_leaf = np.asarray(leaf)
        if arr.shape != np_leaf.shape:
            raise ValueError(f"{key}: shape {arr.shape} != {np_leaf.shape}")
        out.append(jnp.asarray(arr, np_leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# corpus preparation: uniform shape buckets


def _sample_surface_points(mesh, n=512, seed=0):
    """Fixed-count face-area-weighted surface samples (the scorer's ADD
    supervision needs one static shape across meshes)."""
    rng = np.random.default_rng(seed)
    v, f = mesh.vertices, mesh.faces
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=-1
    )
    p = area / max(area.sum(), 1e-12)
    idx = rng.choice(len(f), n, p=p)
    r1, r2 = rng.uniform(size=(2, n))
    s = np.sqrt(r1)
    w = np.stack([1 - s, s * (1 - r2), s * r2], axis=-1)  # (n,3) barycentric
    return (tri[idx] * w[..., None]).sum(axis=1).astype(np.float32)


def prepare_corpus(n_meshes, seed=0, max_faces=4096, n_pts=512):
    """Center meshes, build SHARED-bucket mesh tensors, diameters, surface
    samples. Returns list of dicts. All vertex-colored entries share one
    pytree of shapes; all textured entries share another."""
    meshes = corpus_mod.build_corpus(n_meshes, seed=seed)
    prepped = []
    for i, mesh in enumerate(meshes):
        b = mesh.bounds
        centered = mesh.translated(-(b[0] + b[1]) / 2)
        mt = raster.make_mesh_tensors(
            centered, max_faces=max_faces, bucket=True
        )
        prepped.append({
            "mesh": centered,
            "mt": mt,
            "diameter": float(meshio.compute_mesh_diameter(mesh=centered)),
            "pts": _sample_surface_points(centered, n=n_pts, seed=seed + i),
            "textured": "tex" in mt,
        })
    # unify shape buckets across the corpus so one compiled program serves
    # every mesh: ALL vertex-axis arrays pad to the corpus-max vertex count
    # (a per-key max would let a textured mesh's vertex count exceed the
    # vertex-color meshes' color array and break the renderer's concat),
    # faces to the corpus-max face count, textures to the texture max.
    v_target = max(p["mt"]["pos"].shape[0] for p in prepped)
    f_target = max(p["mt"]["faces"].shape[0] for p in prepped)

    def _pad_to(arr, n0):
        arr = np.asarray(arr)
        if arr.shape[0] == n0:
            return jnp.asarray(arr)
        pad = [(0, n0 - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return jnp.asarray(np.pad(arr, pad))

    tex_shapes = [p["mt"]["tex"].shape for p in prepped if "tex" in p["mt"]]
    tex_target = (
        tuple(max(s[d] for s in tex_shapes) for d in range(3))
        if tex_shapes else None
    )
    for p in prepped:
        mt = p["mt"]
        for key in ("pos", "vnormals", "vertex_color", "uv"):
            if key in mt:
                mt[key] = _pad_to(mt[key], v_target)
        mt["faces"] = _pad_to(mt["faces"], f_target)
        if "tex" in mt and tuple(mt["tex"].shape) != tex_target:
            pad = [(0, t - s) for s, t in zip(mt["tex"].shape, tex_target)]
            mt["tex"] = jnp.asarray(np.pad(np.asarray(mt["tex"]), pad))
    return prepped


# ---------------------------------------------------------------------------
# training drivers
#
# Dispatch discipline: the TPU is remote-attached (~29 ms per dispatch), so
# a per-step host loop (2 dispatches/step) pays more for the link than for
# the math (measured 0.19 s/step refiner, 0.49 s/step scorer). Training
# therefore runs as lax.scan CHUNKS: corpus mesh tensors are stacked along a
# leading axis, the scan body picks a random mesh index per step
# (dynamic-indexed tree), generates the batch, and applies the update — one
# dispatch per `chunk` steps. Meshes with/without texture form two stacked
# groups (different pytrees -> two compiled programs) and chunks alternate
# between groups proportionally.


def _stack_groups(prepped):
    """Group prepped meshes by pytree structure (textured / vertex-colored)
    and stack each group's tensors along a new leading axis."""
    groups = []
    for flag in (False, True):
        sel = [p for p in prepped if p["textured"] == flag]
        if not sel:
            continue
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[p["mt"] for p in sel])
        groups.append({
            "mt": stacked,
            "diameters": jnp.asarray([p["diameter"] for p in sel], jnp.float32),
            "pts": jnp.asarray(np.stack([p["pts"] for p in sel])),
            "n": len(sel),
        })
    return groups


@functools.partial(
    jax.jit,
    static_argnames=("net", "tx", "batch", "input_size", "chunk", "use_pallas"),
    donate_argnums=(2, 3),
)
def _refiner_chunk(net, tx, params, opt_state, key, stacked_mt, diameters, K,
                   batch, input_size, chunk, use_pallas):
    def body(carry, k):
        params, opt_state = carry
        km, kb = jax.random.split(k)
        mi = jax.random.randint(km, (), 0, diameters.shape[0])
        mt = jax.tree.map(lambda a: a[mi], stacked_mt)
        diameter = diameters[mi]
        data = datagen.make_refine_batch(
            kb, mt, K, diameter, batch=batch, input_size=input_size,
            use_pallas=use_pallas, augment=True,
        )
        batch_t = {"A": data["A"], "B": data["B"],
                   "trans_gt": data["trans_gt"], "rot_gt": data["rot_gt"]}
        loss, grads = jax.value_and_grad(
            lambda p: training.refiner_loss(net, p, batch_t, diameter)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    keys = jax.random.split(key, chunk)
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
    return params, opt_state, losses


@functools.partial(
    jax.jit,
    static_argnames=("net", "tx", "n_hyp", "input_size", "chunk", "use_pallas"),
    donate_argnums=(2, 3),
)
def _scorer_chunk(net, tx, params, opt_state, key, stacked_mt, diameters,
                  model_pts, K, n_hyp, input_size, chunk, use_pallas):
    def body(carry, k):
        params, opt_state = carry
        km, kb = jax.random.split(k)
        mi = jax.random.randint(km, (), 0, diameters.shape[0])
        mt = jax.tree.map(lambda a: a[mi], stacked_mt)
        data = datagen.make_score_batch(
            kb, mt, K, diameters[mi], model_pts[mi], n_hyp=n_hyp,
            input_size=input_size, use_pallas=use_pallas, augment=True,
        )
        batch_t = {"A": data["A"], "B": data["B"], "adds": data["adds"]}
        loss, grads = jax.value_and_grad(
            lambda p: training.scorer_loss(net, p, batch_t)
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    keys = jax.random.split(key, chunk)
    (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), keys)
    return params, opt_state, losses


def _save_resume(path, params, opt_state, done, key):
    state = {"params": params, "opt_state": opt_state,
             "done": jnp.asarray(done), "key": key}
    save_params_npz(path + ".tmp.npz", state, dtype=None)
    os.replace(path + ".tmp.npz", path)


def _load_resume(path, params, opt_state):
    target = {"params": params, "opt_state": opt_state,
              "done": jnp.asarray(0), "key": jax.random.PRNGKey(0)}
    state = load_params_npz(path, target)
    return (state["params"], state["opt_state"], int(state["done"]),
            state["key"])


def _run_chunked(step_fn_per_group, groups, params, opt_state, steps, chunk,
                 seed, tag, log_cb, t0, resume_path=None, ckpt_every=2500):
    """Alternate scan chunks across groups, weighted by group size.

    ``resume_path``: periodic (params, opt_state, step, key) snapshot; if
    the file exists, training CONTINUES from it — the remote tunnel wedges
    stochastically on long processes, so long runs are driven by an outer
    retry loop around a resumable inner process."""
    key = jax.random.PRNGKey(seed)
    losses = []
    done = 0
    if resume_path and os.path.exists(resume_path):
        params, opt_state, done, key = _load_resume(
            resume_path, params, opt_state
        )
        logging.info("%s resumed at step %d from %s", tag, done, resume_path)
    gi = 0
    weights = np.array([g["n"] for g in groups], np.float64)
    weights = weights / weights.sum()
    # deterministic proportional interleave of group chunks
    sched = []
    n_chunks = (steps + chunk - 1) // chunk
    acc = np.zeros(len(groups))
    for _ in range(n_chunks):
        acc += weights
        gi = int(np.argmax(acc))
        acc[gi] -= 1.0
        sched.append(gi)
    for ci, gi in enumerate(sched):
        if ci * chunk < done:
            continue  # already trained before the resume point
        key, kc = jax.random.split(key)
        params, opt_state, chunk_losses = step_fn_per_group[gi](
            params, opt_state, kc
        )
        # sync EVERY chunk: a ~29 ms link round trip per 25 steps is ~1 ms/
        # step, and the deep async dispatch pipeline (hundreds of queued
        # chunk executions) wedged the remote-attached link twice mid-run
        # (host futex-blocked, device silent) — shallow queues are the
        # proven-stable regime on this tunnel
        losses.append(np.asarray(chunk_losses))
        done += chunk
        if resume_path and (done % ckpt_every < chunk):
            _save_resume(resume_path, params, opt_state, done, key)
        if log_cb and (ci % max(1, len(sched) // 20) == 0 or ci == len(sched) - 1):
            l = float(np.mean(losses[-1]))
            logging.info("%s step %d loss %.4f (%.0fs)", tag, done, l,
                         time.time() - t0)
            log_cb(done, l)
    all_losses = np.concatenate(losses) if losses else np.zeros(1)
    if resume_path and os.path.exists(resume_path):
        os.remove(resume_path)  # finished: the final checkpoint supersedes
    return params, opt_state, all_losses


def train_agnostic_refiner(prepped, K, steps=20000, batch=32, input_size=160,
                           lr=2e-4, seed=0, use_pallas=None, chunk=25,
                           log_cb=None, resume_path=None):
    """ONE RefineNet over the whole corpus. Returns (net, params, stats).

    f32 compute + NaN-skipping optimizer: the bf16 run diverged mid-training
    (loss 0.06 -> 0.17 -> NaN around the lr peak on the augmented corpus);
    f32 at lr 2e-4 matches the round-4 recipe that trained stably, and
    apply_if_finite drops any residual non-finite update instead of
    poisoning the params permanently."""
    from foundationpose_tpu.models.refine_net import RefineNet

    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    net = RefineNet(c_in=6, dtype=jnp.float32)
    dummy = jnp.zeros((1, input_size, input_size, 6))
    params = net.init(jax.random.PRNGKey(seed), dummy, dummy)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, min(500, max(steps // 20, 1)), steps, lr * 0.02
    )
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched)),
        max_consecutive_errors=200,
    )
    opt_state = tx.init(params)
    groups = _stack_groups(prepped)
    K_j = jnp.asarray(K, jnp.float32)
    t0 = time.time()
    step_fns = [
        (lambda g: lambda p, o, k: _refiner_chunk(
            net, tx, p, o, k, g["mt"], g["diameters"], K_j,
            batch, input_size, chunk, use_pallas))(g)
        for g in groups
    ]
    params, opt_state, losses = _run_chunked(
        step_fns, groups, params, opt_state, steps, chunk, seed + 1,
        "refiner[agnostic]", log_cb, t0, resume_path=resume_path,
    )
    stats = {"loss_first": float(np.mean(losses[:50])),
             "loss_last": float(np.mean(losses[-50:])),
             "steps": int(len(losses)), "seconds": round(time.time() - t0, 1)}
    return net, params, stats


def train_agnostic_scorer(prepped, K, steps=15000, n_hyp=16, input_size=160,
                          lr=5e-4, seed=0, use_pallas=None, chunk=25,
                          dtype=jnp.float32, log_cb=None, resume_path=None):
    """ONE ScoreNetMultiPair over the whole corpus (group-norm from-scratch
    variant, the validated training architecture — datagen.py notes).
    f32 compute (the round-4 validated recipe; the refiner's bf16 run
    diverged on this corpus) + NaN-skipping optimizer."""
    from foundationpose_tpu.models.score_net import ScoreNetMultiPair

    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"
    net = ScoreNetMultiPair(c_in=6, dtype=dtype, norm="group",
                            residual_attn=True)
    dummy = jnp.zeros((2, input_size, input_size, 6))
    params = net.init(jax.random.PRNGKey(seed), dummy, dummy, 2)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, min(500, max(steps // 20, 1)), steps, lr * 0.02
    )
    tx = optax.apply_if_finite(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched)),
        max_consecutive_errors=200,
    )
    opt_state = tx.init(params)
    groups = _stack_groups(prepped)
    K_j = jnp.asarray(K, jnp.float32)
    t0 = time.time()
    step_fns = [
        (lambda g: lambda p, o, k: _scorer_chunk(
            net, tx, p, o, k, g["mt"], g["diameters"], g["pts"], K_j,
            n_hyp, input_size, chunk, use_pallas))(g)
        for g in groups
    ]
    params, opt_state, losses = _run_chunked(
        step_fns, groups, params, opt_state, steps, chunk, seed + 2,
        "scorer[agnostic]", log_cb, t0, resume_path=resume_path,
    )
    stats = {"loss_first": float(np.mean(losses[:50])),
             "loss_last": float(np.mean(losses[-50:])),
             "steps": int(len(losses)), "seconds": round(time.time() - t0, 1)}
    return net, params, stats


# ---------------------------------------------------------------------------
# checkpoint directory: refiner.npz + scorer.npz + meta.json


def save_agnostic(out_dir, params_r, params_s, meta):
    # f16 storage: halves the artifact; params are O(1e-2..1) magnitude so
    # the f16 round (2^-11 relative) is far below training noise
    os.makedirs(out_dir, exist_ok=True)
    save_params_npz(os.path.join(out_dir, "refiner.npz"), params_r,
                    dtype=np.float16)
    save_params_npz(os.path.join(out_dir, "scorer.npz"), params_s,
                    dtype=np.float16)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    logging.info("agnostic checkpoint saved to %s", out_dir)


def load_agnostic(ckpt_dir, input_size=None):
    """Build (PoseRefiner, PoseScorer) from an agnostic checkpoint dir.
    The returned predictors plug straight into FoundationPoseTPU for ANY
    mesh — the object enters only through its renders."""
    from foundationpose_tpu.engine.refiner import PoseRefiner, RefinerConfig
    from foundationpose_tpu.engine.scorer import PoseScorer, ScorerConfig

    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    px = int(input_size or meta["input_size"])
    refiner = PoseRefiner(RefinerConfig(input_size=px, dtype="bfloat16"))
    refiner.params = load_params_npz(
        os.path.join(ckpt_dir, "refiner.npz"), refiner.params
    )
    scorer = PoseScorer(ScorerConfig(input_size=px, dtype="bfloat16",
                                     norm="group", residual_attn=True))
    scorer.params = load_params_npz(
        os.path.join(ckpt_dir, "scorer.npz"), scorer.params
    )
    return refiner, scorer, meta
