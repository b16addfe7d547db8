"""Measure the production raster kernel's pass-1 (z-test) vs pass-2 (fetch)
split and candidate optimizations, on the bench scene shapes.

Variants:
  prod        - render_crops_pallas as shipped (baseline)
  pass1       - kernel with the fetch+interpolation epilogue removed
                (writes the packed winner only): isolates the z-test loop
  mxu1        - pass-1 affine evaluations on the MXU ((Pt,8)@(8,FC) dots
                instead of 9 VPU broadcast-FMAs per window)
  idx_out     - kernel outputs the winner FACE INDEX only; attribute fetch +
                perspective interpolation moved to an XLA epilogue gather

Run on TPU: python scripts/probe_pass_split.py

NOTE: poses/tfs MUST be traced arguments of the timed jit. An earlier
version closed over them as constants; XLA constant-folded the whole
program (pallas call included) at compile time and every variant measured
~20 ms — those numbers were bogus.
"""

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

    from foundationpose_tpu.core import geometry as geo
    from foundationpose_tpu.ops import raster
    from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

    # bench scene: 1280-face icosphere, 252 poses, 160px crops
    from foundationpose_tpu.core import meshio

    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(60, 220, (len(mesh.vertices), 3)).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh)
    K = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]), jnp.float32)
    B = 252
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    poses[:, 2, 3] = 0.6
    # spread rotations so face distributions vary like real hypotheses
    for i in range(B):
        e = rng.uniform(-np.pi, np.pi, 3)
        poses[i, :3, :3] = np.asarray(geo.euler_matrix(*e))[:3, :3]
    poses = jnp.asarray(poses)
    tfs = geo.compute_crop_window_tf_batch(poses, K, 1.2, 0.12, (160, 160))

    f_prod = jax.jit(lambda p, tf: render_crops_pallas(
        mt, p, K, tf, out_hw=(160, 160), backface_cull=True,
        with_normal=False, out_bf16=True,
    )["rgb"])
    print(f"prod      : {t(f_prod, poses, tfs):7.2f} ms", flush=True)

    for tr in (1, 4):
        try:
            ms = t(jax.jit(lambda p, tf, tr=tr: render_crops_pallas(
                mt, p, K, tf, out_hw=(160, 160), backface_cull=True,
                with_normal=False, out_bf16=True, tile_rows=tr,
            )["rgb"]), poses, tfs)
            print(f"tile_rows={tr:2d}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"tile_rows={tr:2d}: FAILED {type(e).__name__}: {e}", flush=True)

    for variant in ("pass1", "fetch"):
        try:
            ms = t(jax.jit(lambda p, tf, v=variant: render_crops_pallas(
                mt, p, K, tf, out_hw=(160, 160), backface_cull=True,
                with_normal=False, out_bf16=True, _variant=v,
            )["rgb"]), poses, tfs)
            print(f"{variant:10s}: {ms:7.2f} ms", flush=True)
        except Exception as e:
            print(f"{variant:10s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
