"""Profile the crop_ab pipeline on the real chip (round-5 ask #5).

Breaks crop_ab (the per-refine-iteration cost over 252 hypotheses) into:
raster kernel alone, observed rgb warp, observed xyz warp, full make_crop
— and sweeps raster tile_rows. All timings use traced-argument jits
(never closed-over constants: see scripts/probe_pass_split.py header).

    cd /root/repo && timeout 1800 python scripts/probe_crop.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from foundationpose_tpu.core import geometry as geo, meshio
    from foundationpose_tpu.engine.crop import make_crop_batch
    from foundationpose_tpu.ops import image as imops, raster
    from foundationpose_tpu.ops.raster_pallas import render_crops_pallas

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    HW = (480, 640)
    mesh = meshio.make_icosphere_mesh(subdivisions=3, radius=0.06)
    rng = np.random.default_rng(0)
    mesh.vertex_colors = rng.integers(
        60, 220, (len(mesh.vertices), 3)).astype(np.uint8)
    mt = raster.make_mesh_tensors(mesh, max_faces=4096, bucket=True)
    gt = np.eye(4)
    gt[:3, :3] = np.asarray(geo.euler_matrix(0.4, -0.3, 0.2))[:3, :3]
    gt[:3, 3] = [0.02, -0.01, 0.6]
    out = raster.render_full_frame(mt, gt[None], K, HW)
    rgb = jnp.asarray(np.asarray(out["rgb"][0]) * 255.0, jnp.float32)
    depth = jnp.asarray(np.asarray(out["depth"][0]), jnp.float32)
    K_j = jnp.asarray(K, jnp.float32)
    xyz = jax.jit(geo.depth2xyzmap)(depth, K_j)
    diameter = 0.12
    B = 252
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (B, 1, 1))
    poses[:, :3, :3] = gt[:3, :3]
    poses[:, :3, 3] = gt[:3, 3]
    poses = jnp.asarray(poses)
    S = 160
    tfs_fn = jax.jit(lambda p: geo.compute_crop_window_tf_batch(
        p, K_j, 1.2, diameter, (S, S)))
    tfs = tfs_fn(poses)

    def timeit(fn, *args, n=6):
        jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(n):
            o = fn(*args)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / n * 1e3

    print("== raster kernel alone (bf16 out, cull) ==", flush=True)
    for tr in (1, 2, 4, 8):
        fn = jax.jit(lambda p, t, _tr=tr: render_crops_pallas(
            mt, p, K_j, t, out_hw=(S, S), with_normal=False, out_bf16=True,
            backface_cull=True, tile_rows=_tr)["rgb"])
        print(f"  tile_rows={tr}: {timeit(fn, poses, tfs):7.2f} ms", flush=True)

    print("== observed-side warps ==", flush=True)
    warp_rgb = jax.jit(lambda t: imops.warp_crop_affine(
        rgb, t, (S, S), mode="bilinear", compute_dtype=jnp.bfloat16))
    print(f"  rgb bilinear bf16: {timeit(warp_rgb, tfs):7.2f} ms", flush=True)
    src = jnp.concatenate([xyz, (xyz[..., 2:] > 0).astype(jnp.float32)], -1)
    warp_xyz = jax.jit(lambda t: imops.warp_crop_affine(
        src, t, (S, S), mode="nearest", compute_dtype=jnp.bfloat16))
    print(f"  xyz+valid nearest bf16: {timeit(warp_xyz, tfs):7.2f} ms", flush=True)
    both = jax.jit(lambda t: (warp_rgb.__wrapped__(t), warp_xyz.__wrapped__(t)))
    print(f"  both fused: {timeit(both, tfs):7.2f} ms", flush=True)

    print("== full make_crop_batch ==", flush=True)
    fullab = jax.jit(lambda p: [make_crop_batch(
        mt, p, K_j, rgb, xyz, diameter, out_size=S, use_pallas=True,
        backface_cull=True)[k] for k in ("inputA", "inputB")])
    print(f"  crop_ab: {timeit(fullab, poses):7.2f} ms", flush=True)
    fa = jax.jit(lambda p: make_crop_batch(
        mt, p, K_j, rgb, xyz, diameter, out_size=S, use_pallas=True,
        backface_cull=True)["inputA"])
    print(f"  crop_a only: {timeit(fa, poses):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
