"""Decompose make_crop_batch cost on the bench scene: render kernel vs
observed-frame warps vs the full fused crop program. Run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    from foundationpose_tpu.engine.crop import make_crop_batch
    from foundationpose_tpu.ops import image as imops, raster
    from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(60, 220, (len(mesh.vertices), 3)).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh, max_faces=4096, bucket=True)
    mt_exact = raster.make_mesh_tensors(mesh)
    K = jnp.asarray(np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]]), jnp.float32)
    B, S = 252, 160
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    poses[:, 2, 3] = 0.6
    poses = jnp.asarray(poses)
    rgb = jnp.asarray(rng.uniform(0, 255, (480, 640, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.4, 0.8, (480, 640)), jnp.float32)
    xyz = jax.jit(geo.depth2xyzmap)(depth, K)
    diameter = 0.12

    tfs = jax.jit(
        lambda p: geo.compute_crop_window_tf_batch(p, K, 1.2, diameter, (S, S))
    )(poses)

    render = jax.jit(
        lambda p, tf: render_crops_pallas(
            mt, p, K, tf, out_hw=(S, S), use_light=True,
            backface_cull=True, with_normal=False, out_bf16=True,
        )["rgb"]
    )
    render_exact = jax.jit(
        lambda p, tf: render_crops_pallas(
            mt_exact, p, K, tf, out_hw=(S, S), use_light=True,
            backface_cull=True, with_normal=False, out_bf16=True,
        )["rgb"]
    )
    warp_rgb = jax.jit(
        lambda tf: imops.warp_crop_affine(rgb, tf, (S, S), mode="bilinear")
    )
    warp_xyz = jax.jit(
        lambda tf: imops.warp_crop_affine(xyz, tf, (S, S), mode="nearest")
    )
    warp_rgb16 = jax.jit(
        lambda tf: imops.warp_crop_affine(
            rgb, tf, (S, S), mode="bilinear", compute_dtype=jnp.bfloat16
        )
    )
    warp_xyz16 = jax.jit(
        lambda tf: imops.warp_crop_affine(
            xyz, tf, (S, S), mode="nearest", compute_dtype=jnp.bfloat16
        )
    )
    full = jax.jit(
        lambda p: make_crop_batch(
            mt, p, K, rgb, xyz, diameter, out_size=S,
            use_pallas=True, backface_cull=True,
        )["inputA"]
    )
    both = jax.jit(
        lambda p: jax.tree.map(
            lambda x: x,
            {k: v for k, v in make_crop_batch(
                mt, p, K, rgb, xyz, diameter, out_size=S,
                use_pallas=True, backface_cull=True,
            ).items() if k in ("inputA", "inputB")},
        )
    )

    print(f"faces bucketed to {mt['faces'].shape[0]} (exact {mt_exact['faces'].shape[0]})")
    print(f"render(bucket)  : {t(lambda: render(poses, tfs)):8.2f} ms")
    print(f"render(exact)   : {t(lambda: render_exact(poses, tfs)):8.2f} ms")
    print(f"warp_rgb        : {t(lambda: warp_rgb(tfs)):8.2f} ms")
    print(f"warp_xyz        : {t(lambda: warp_xyz(tfs)):8.2f} ms")
    print(f"warp_rgb bf16   : {t(lambda: warp_rgb16(tfs)):8.2f} ms")
    print(f"warp_xyz bf16   : {t(lambda: warp_xyz16(tfs)):8.2f} ms")
    print(f"make_crop inputA: {t(lambda: full(poses)):8.2f} ms")
    print(f"make_crop A+B   : {t(lambda: both(poses)):8.2f} ms")


if __name__ == "__main__":
    main()
