"""Same render, three ways: poses as traced args, poses as jit constants,
and the pallas_call alone on pre-computed inputs — finds where the 86-vs-20ms
discrepancy between probe_crop_split and probe_pass_split lives."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
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

    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(60, 220, (len(mesh.vertices), 3)).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh)
    K = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]), jnp.float32)
    B = 252
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    poses[:, 2, 3] = 0.6
    for i in range(B):
        e = rng.uniform(-np.pi, np.pi, 3)
        poses[i, :3, :3] = np.asarray(geo.euler_matrix(*e))[:3, :3]
    poses = jnp.asarray(poses)
    tfs = jnp.asarray(
        geo.compute_crop_window_tf_batch(poses, K, 1.2, 0.12, (160, 160))
    )

    kw = dict(out_hw=(160, 160), backface_cull=True, with_normal=False,
              out_bf16=True)

    f_const = jax.jit(lambda: rp.render_crops_pallas(mt, poses, K, tfs, **kw)["rgb"])
    f_args = jax.jit(lambda p, tf: rp.render_crops_pallas(mt, p, K, tf, **kw)["rgb"])

    print(f"render const    : {t(f_const):8.2f} ms")
    print(f"render args     : {t(f_args, poses, tfs):8.2f} ms")

    # pallas_call alone on pre-computed inputs (replicate internals)
    import functools

    H = W = 160
    tile_rows = 2
    Fp = mt["faces"].shape[0]

    # reproduce internal prep by calling with a probe variant that returns
    # early is not available; instead lower via the public function but time
    # a jit that takes (coeffT, table, ranges) directly through pl.pallas_call
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    A_DIM, T_DIM = 16, 64
    P = H * W
    Pt = tile_rows * W
    n_tiles = H // tile_rows
    kernel = rp._make_raster_kernel(
        Pt, A_DIM, T_DIM, False, True, 0.8, 0.5, out_dtype=jnp.bfloat16,
        W=W, tile_rows=tile_rows, n_tiles=n_tiles, variant=None,
    )

    def run_kernel(coeffT, table, ranges):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 9, Fp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Fp, T_DIM), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_tiles, 2), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, Pt * n_tiles, A_DIM), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((B, Pt * n_tiles, A_DIM), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(coeffT, table, ranges)

    # build the real inputs by tracing the prep from render_crops_pallas:
    # cheap replication — call the function but grab intermediates via
    # closure? Simpler: recompute with the same code path via jax.make_jaxpr
    # is overkill; instead just rebuild using the module's own prep by
    # monkeypatching pallas_call is fragile. Use random-but-valid inputs:
    # timing the kernel only needs realistic RANGES (work distribution).
    # Take ranges from a real run via the idx probe: approximate with full
    # range [0, C) for all bands (UPPER bound on kernel work).
    C = Fp // 128
    coeffT = jnp.asarray(rng.normal(size=(B, 9, Fp)), jnp.float32)
    table = jnp.asarray(rng.normal(size=(B, Fp, T_DIM)), jnp.float32)
    ranges_full = jnp.tile(
        jnp.asarray([[0, C]], jnp.int32)[None], (B, n_tiles, 1)
    )
    ranges_1 = jnp.tile(
        jnp.asarray([[0, 2]], jnp.int32)[None], (B, n_tiles, 1)
    )
    print(f"kernel full rng : {t(jax.jit(run_kernel), coeffT, table, ranges_full):8.2f} ms")
    print(f"kernel 2-chunk  : {t(jax.jit(run_kernel), coeffT, table, ranges_1):8.2f} ms")


if __name__ == "__main__":
    main()
