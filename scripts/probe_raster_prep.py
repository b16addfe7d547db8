"""Split render_crops_pallas cost: XLA prep (triangle setup + y-sort +
ranges) vs the pallas_call vs the epilogue, on the bench scene."""

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
    from foundationpose_tpu.ops import raster_pallas as rp

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(60, 220, size=(len(mesh.vertices), 3)).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh)

    n_hyp = 252
    g = np.random.default_rng(1)
    poses = []
    for _ in range(n_hyp):
        q = g.normal(size=4); q /= np.linalg.norm(q)
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        p = np.eye(4); p[:3, :3] = R; p[:3, 3] = [0.02, -0.01, 0.6]
        poses.append(p)
    poses = jnp.asarray(np.asarray(poses), jnp.float32)
    K_j = jnp.asarray(K)
    tfs = jax.block_until_ready(
        jnp.asarray(geo.compute_crop_window_tf_batch(poses, K_j, 1.2, 0.12, (160, 160)))
    )

    # full render
    f_full = jax.jit(lambda p, tf: rp.render_crops_pallas(mt, p, K_j, tf)["rgb"])
    print("full render:        %7.1f ms" % t(lambda: f_full(poses, tfs)))

    # prep only: replicate the prep closure by monkey-calling the internals.
    # We time a jit that computes the combined face tables + ranges and
    # returns a reduction (so nothing is dead-code eliminated).
    import functools

    def prep_only(poses, crop_tfs):
        # duplicate of render_crops_pallas up to the pallas_call
        import foundationpose_tpu.ops.raster_pallas as M

        H = W = 160
        verts = mt["pos"]; faces = mt["faces"]; vnormals = mt["vnormals"]
        F = faces.shape[0]
        FC = M.FC
        Fp = ((F + FC - 1) // FC) * FC
        out = {}
        # call the real function in interpret-skip mode is not available;
        # instead reuse via private API: easiest is to inline a small part.
        return None

    # approximate prep cost: time the full function minus a variant that
    # feeds precomputed tables? Simpler: time the pallas_call-only via
    # rerunning probe kernels is done elsewhere. Here: time argsort alone,
    # the known suspect.
    ymin = jnp.asarray(rng.normal(size=(252, 1280)).astype(np.float32))
    f_sort = jax.jit(lambda y: jnp.argsort(y, axis=-1))
    print("argsort (252,1280): %7.1f ms" % t(lambda: f_sort(ymin)))

    comb = jnp.asarray(rng.normal(size=(252, 1280, 80)).astype(np.float32))
    perm = jax.block_until_ready(f_sort(ymin))
    f_take = jax.jit(
        lambda c, p: jnp.take_along_axis(c, p[:, :, None], axis=1)
    )
    print("gather (252,1280,80): %5.1f ms" % t(lambda: f_take(comb, perm)))


if __name__ == "__main__":
    main()
