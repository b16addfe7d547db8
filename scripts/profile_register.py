"""Stage-by-stage wall-clock profile of the register hot path on the real
device. Times each jitted stage with block_until_ready after warmup."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=5):
    import jax

    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.core import geometry as geo, meshio
    from foundationpose_tpu.engine.crop import make_crop_batch
    from foundationpose_tpu.engine.estimator import (
        EstimatorConfig,
        FoundationPoseTPU,
        _preprocess_jit,
    )
    from foundationpose_tpu.ops import image as imops, raster
    from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

    print("backend:", jax.default_backend(), jax.devices()[0])

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    HW = (480, 640)
    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(60, 220, size=(len(mesh.vertices), 3)).astype(
        np.uint8
    )
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.4, -0.3, 0.2))[:3, :3]
    gt[:3, 3] = [0.02, -0.01, 0.6]
    mt = raster.make_mesh_tensors(mesh)
    out = raster.render_full_frame(mt, gt[None], K, HW)
    rgb = np.asarray(out["rgb"][0]) * 255.0
    depth = np.asarray(out["depth"][0])
    mask = np.asarray(out["mask"][0])

    est = FoundationPoseTPU(mesh, config=EstimatorConfig(register_iterations=5))
    n = len(est.rot_grid)
    print("n_hyp:", n, "faces:", est.mesh_tensors["faces"].shape[0])

    depth_j = jnp.asarray(depth, jnp.float32)
    K_j = jnp.asarray(K, jnp.float32)
    d_p, xyz_map = _preprocess_jit(depth_j, K_j)
    center = est.guess_translation(np.asarray(d_p), mask, K)
    hyp = est.rot_grid.copy()
    hyp[:, :3, 3] = center[None]
    hyp = jnp.asarray(hyp, jnp.float32)
    rgb_j = jnp.asarray(rgb, jnp.float32)
    diam = float(est.diameter)

    print("preprocess:          %.1f ms" % (1e3 * t(lambda: _preprocess_jit(depth_j, K_j))))

    tfs = geo.compute_crop_window_tf_batch(hyp, K_j, 1.2, diam, (160, 160))
    tfs = jax.block_until_ready(tfs)

    f_croptf = jax.jit(
        lambda p: geo.compute_crop_window_tf_batch(p, K_j, 1.2, diam, (160, 160))
    )
    print("crop_tf:             %.1f ms" % (1e3 * t(lambda: f_croptf(hyp))))

    f_pallas = jax.jit(
        lambda p, tf: render_crops_pallas(est.mesh_tensors, p, K_j, tf)
    )
    print("render pallas x252:  %.1f ms" % (1e3 * t(lambda: f_pallas(hyp, tfs))))

    f_xla = jax.jit(
        lambda p, tf: raster.render_crops(est.mesh_tensors, p, K_j, tf)
    )
    print("render XLA   x252:   %.1f ms" % (1e3 * t(lambda: f_xla(hyp, tfs))))

    f_warp_b = jax.jit(
        lambda tf: imops.warp_perspective(rgb_j, tf, (160, 160), mode="bilinear")
    )
    print("warp rgb bilinear:   %.1f ms" % (1e3 * t(lambda: f_warp_b(tfs))))
    xyz_dev = jax.block_until_ready(xyz_map)
    f_warp_n = jax.jit(
        lambda tf: imops.warp_perspective(xyz_dev, tf, (160, 160), mode="nearest")
    )
    print("warp xyz nearest:    %.1f ms" % (1e3 * t(lambda: f_warp_n(tfs))))

    f_crop = jax.jit(
        lambda p: make_crop_batch(
            est.mesh_tensors, p, K_j, rgb_j, xyz_dev, diam, use_pallas=True
        )
    )
    print("make_crop_batch:     %.1f ms" % (1e3 * t(lambda: f_crop(hyp))))

    data = jax.block_until_ready(f_crop(hyp))
    A, B = data["inputA"], data["inputB"]
    net, params = est.refiner.net, est.refiner.params
    f_net = jax.jit(lambda a, b: net.apply(params, a, b))
    print("RefineNet fwd x252:  %.1f ms" % (1e3 * t(lambda: f_net(A, B))))

    snet, sparams = est.scorer.net, est.scorer.params
    f_snet = jax.jit(lambda a, b: snet.apply(sparams, a, b, n))
    print("ScoreNet fwd x252:   %.1f ms" % (1e3 * t(lambda: f_snet(A, B))))

    from foundationpose_tpu.engine.refiner import _refine_jit

    f_ref1 = lambda: _refine_jit(
        est.refiner.net, est.refiner.cfg, est.refiner.params, est.mesh_tensors,
        hyp, K_j, rgb_j, xyz_dev, diam, 1,
    )
    print("refine 1 iter:       %.1f ms" % (1e3 * t(f_ref1)))
    f_ref5 = lambda: _refine_jit(
        est.refiner.net, est.refiner.cfg, est.refiner.params, est.mesh_tensors,
        hyp, K_j, rgb_j, xyz_dev, diam, 5,
    )
    print("refine 5 iters:      %.1f ms" % (1e3 * t(f_ref5)))

    t0 = time.perf_counter()
    est.register(K, rgb, depth, mask)
    print("register e2e:        %.1f ms" % (1e3 * (time.perf_counter() - t0)))
    t0 = time.perf_counter()
    est.track_one(rgb, depth, K)
    est.track_one(rgb, depth, K)
    print("track_one e2e x2:    %.1f ms" % (1e3 * (time.perf_counter() - t0) / 2))


if __name__ == "__main__":
    main()
