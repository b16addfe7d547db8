"""Sweep render_crops_pallas tile_rows / cull settings on the real device."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn, n=10):
    import jax

    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    return 1e3 * (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.core import geometry as geo, meshio
    from foundationpose_tpu.ops import raster
    from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

    print("backend:", jax.default_backend(), jax.devices()[0])
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(60, 220, size=(len(mesh.vertices), 3)).astype(
        np.uint8
    )
    mt = raster.make_mesh_tensors(mesh)
    est_rot = np.eye(4)
    est_rot[:3, 3] = [0.02, -0.01, 0.6]

    n_hyp = 252
    rots = []
    g = np.random.default_rng(1)
    for _ in range(n_hyp):
        q = g.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array(
            [
                [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
            ]
        )
        p = est_rot.copy()
        p[:3, :3] = R
        rots.append(p)
    poses = jnp.asarray(np.asarray(rots), jnp.float32)
    K_j = jnp.asarray(K)
    diam = 0.12
    tfs = geo.compute_crop_window_tf_batch(poses, K_j, 1.2, diam, (160, 160))
    tfs = jax.block_until_ready(jnp.asarray(tfs))

    for cull in (False, True):
        for tr in (4, 8, 16, 32):
            f = jax.jit(
                lambda p, tf, tr=tr, cull=cull: render_crops_pallas(
                    mt, p, K_j, tf, tile_rows=tr, backface_cull=cull
                )["rgb"]
            )
            ms = t(lambda: f(poses, tfs))
            print(f"cull={int(cull)} tile_rows={tr:3d}: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
