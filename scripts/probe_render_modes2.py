"""Check whether probe_pass_split's 19.9ms 'prod' was compile-time constant
folding, and measure real per-band chunk range tightness."""

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

    # const inputs BUT a traced perturbation flows through the kernel input,
    # so nothing can constant-fold
    f_eps = jax.jit(
        lambda eps: rp.render_crops_pallas(
            mt, poses + eps, K, tfs, **kw
        )["rgb"]
    )
    eps = jnp.zeros((), jnp.float32)
    print(f"render const+eps: {t(f_eps, eps):8.2f} ms")

    # real range tightness: average active chunks per band
    verts, faces = mt["pos"], mt["faces"]

    def ymm(pose, crop_tf):
        R, tt = pose[:3, :3], pose[:3, 3]
        v_cam = verts @ R.T + tt
        uvw = v_cam @ K.T
        uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-12)
        uv_crop = uv @ crop_tf[:2, :2].T + crop_tf[:2, 2]
        y = uv_crop[:, 1][faces]
        nf = jnp.cross(v_cam[faces[:, 1]] - v_cam[faces[:, 0]],
                       v_cam[faces[:, 2]] - v_cam[faces[:, 0]])
        ctr = (v_cam[faces[:, 0]] + v_cam[faces[:, 1]] + v_cam[faces[:, 2]]) / 3
        valid = jnp.sum(nf * ctr, -1) < 0
        ymin = jnp.where(valid, y.min(-1), jnp.inf)
        ymax = jnp.where(valid, y.max(-1), -jnp.inf)
        s = jnp.argsort(ymin)
        return ymin[s], ymax[s]

    ymin, ymax = jax.jit(jax.vmap(ymm))(poses, tfs)
    ymin, ymax = np.asarray(ymin), np.asarray(ymax)
    C = ymin.shape[1] // 128
    cy_min = ymin.reshape(B, C, 128).min(-1)
    cy_max = ymax.reshape(B, C, 128).max(-1)
    tile_rows, n_tiles = 2, 80
    tot = 0
    empty = 0
    for tl in range(n_tiles):
        r0 = tl * tile_rows - 1.0
        r1 = r0 + tile_rows + 2.0
        act = (cy_min <= r1) & (cy_max >= r0)  # (B,C)
        any_a = act.any(-1)
        lo = np.argmax(act, -1)
        hi = C - np.argmax(act[:, ::-1], -1)
        n = np.where(any_a, hi - lo, 0)
        tot += n.sum()
        empty += (~any_a).sum()
    print(f"C={C} bands={n_tiles} poses={B}")
    print(f"avg active chunks/band (incl empty): {tot/(B*n_tiles):.2f}")
    print(f"empty bands frac: {empty/(B*n_tiles):.2f}")
    print(f"total chunk-band iters: {tot}")


if __name__ == "__main__":
    main()
