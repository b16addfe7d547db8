"""On-device sweep: raster tile_rows, bf16 output, and funnel coarse size.

Prints one JSON line with per-variant seconds for the bench scene.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    import jax

    jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
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
    from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

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
    mesh_t = est.mesh_tensors
    diameter = float(est.diameter)
    grid = jnp.asarray(est.rot_grid, jnp.float32)
    hyp = grid.at[:, :3, 3].set(jnp.asarray([0.02, -0.01, 0.6], jnp.float32)[None])
    Kj = jnp.asarray(K, jnp.float32)
    tfs = geo.compute_crop_window_tf_batch(hyp, Kj, 1.2, diameter, (160, 160))

    res = {"device": str(jax.devices()[0])}
    for tr in (4, 8):
        f = jax.jit(lambda p, tr=tr: render_crops_pallas(
            mesh_t, p, Kj, tfs, out_hw=(160, 160), use_light=True,
            backface_cull=True, with_normal=False, out_bf16=True,
            tile_rows=tr)["rgb"])
        res[f"raster_tile{tr}_s"] = round(timeit(lambda: f(hyp)), 4)

    # fused register, parity schedule
    t0 = time.perf_counter()
    est.register(K, rgb, depth, mask)
    res["compile_s"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    for _ in range(3):
        p = est.register(K, rgb, depth, mask)
    res["register_s"] = round((time.perf_counter() - t0) / 3, 4)
    err = float(np.linalg.norm(p[:3, 3] - gt[:3, 3]))
    res["register_terr_mm"] = round(err * 1000, 2)

    # funnel, full-res coarse vs 112 coarse
    for cs in (0, 112):
        est_f = FoundationPoseTPU(
            mesh,
            config=dataclasses.replace(
                EstimatorConfig(register_iterations=5),
                funnel_top_k=64, funnel_coarse_size=cs,
            ),
        )
        est_f.register(K, rgb, depth, mask)
        t0 = time.perf_counter()
        for _ in range(3):
            p = est_f.register(K, rgb, depth, mask)
        res[f"funnel_cs{cs}_s"] = round((time.perf_counter() - t0) / 3, 4)
        res[f"funnel_cs{cs}_terr_mm"] = round(
            float(np.linalg.norm(p[:3, 3] - gt[:3, 3])) * 1000, 2
        )

    print(json.dumps(res))


if __name__ == "__main__":
    main()
