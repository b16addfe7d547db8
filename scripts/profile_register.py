"""Stage-level timing of the register hot path on the real device.

Times, separately jitted: (a) the crop-space raster of all 252 hypotheses,
(b) one refiner iteration (render + warp + RefineNet + update), (c) the
scorer pass, (d) the RefineNet forward alone, (e) the real-image crop warp
alone. Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    import jax

    jax.block_until_ready(out)
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
    from foundationpose_tpu.engine.estimator import EstimatorConfig, FoundationPoseTPU
    from foundationpose_tpu.ops import raster

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
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
    refiner, scorer = est.refiner, est.scorer
    mesh_t = est.mesh_tensors
    diameter = float(est.diameter)
    n = len(est.rot_grid)

    grid = jnp.asarray(est.rot_grid, jnp.float32)
    center = jnp.asarray([0.02, -0.01, 0.6], jnp.float32)
    hyp = grid.at[:, :3, 3].set(center[None])
    Kj = jnp.asarray(K, jnp.float32)
    rgbj = jnp.asarray(rgb, jnp.float32)
    from foundationpose_tpu.ops import image as imops

    d = imops.erode_depth(jnp.asarray(depth, jnp.float32), radius=2)
    d = imops.bilateral_filter_depth(d, radius=2)
    xyz_map = geo.depth2xyzmap(d, Kj)
    xyz_map = jax.block_until_ready(xyz_map)

    res = {"n_hyp": n, "device": str(jax.devices()[0])}

    # (a) crop-batch construction (raster + warp + normalize, no net)
    from foundationpose_tpu.engine.crop import make_crop_batch

    crop_res = refiner.cfg.input_size
    use_pallas = bool(refiner.cfg.use_pallas)

    def f_crop():
        return make_crop_batch(
            mesh_t, hyp, Kj, rgbj, xyz_map, diameter,
            crop_ratio=refiner.cfg.crop_ratio, out_size=crop_res,
            use_pallas=use_pallas, backface_cull=refiner.cfg.backface_cull,
        )["inputA"]

    res["cropbatch_s"] = round(timeit(f_crop), 4)

    # (a2) raster alone
    from foundationpose_tpu.ops import raster as rast

    tfs = geo.compute_crop_window_tf_batch(hyp, Kj, 1.2, diameter, (crop_res, crop_res))
    if use_pallas:
        from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

        f_r = jax.jit(lambda p: render_crops_pallas(
            mesh_t, p, Kj, tfs, out_hw=(crop_res, crop_res), use_light=True,
            backface_cull=refiner.cfg.backface_cull, with_normal=False)["rgb"])
    else:
        f_r = jax.jit(lambda p: rast.render_crops(
            mesh_t, p, Kj, tfs, out_hw=(crop_res, crop_res), use_light=True,
            with_normal=False)["rgb"])
    res["raster_s"] = round(timeit(lambda: f_r(hyp)), 4)

    # (d) RefineNet forward alone on random crops
    A = jnp.zeros((n, crop_res, crop_res, 6), jnp.float32)
    B = jnp.ones((n, crop_res, crop_res, 6), jnp.float32)
    try:
        net_apply = jax.jit(lambda A, B: refiner.net.apply(refiner.params, A, B))
        res["refnet_fwd_s"] = round(timeit(lambda: net_apply(A, B)), 4)
    except Exception as e:
        res["refnet_err"] = repr(e)[:200]

    print(json.dumps(res))


if __name__ == "__main__":
    main()
