"""Isolate the raster PREP cost (per-pose face tables) on the bench scene:
table build vs y-argsort vs sorted gather, plus MXU one-hot permutation as a
gather replacement. Run on TPU."""

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

    verts = mt["pos"]
    faces = mt["faces"]
    vnormals = mt["vnormals"]
    Fp = faces.shape[0]
    print(f"faces={Fp}")
    from foundationpose_tpu.ops.raster import _bary_coeffs, _signed_area2, ZNEAR

    def build(pose, crop_tf):
        R, tt = pose[:3, :3], pose[:3, 3]
        v_cam = verts @ R.T + tt
        z = v_cam[:, 2]
        uvw = v_cam @ K.T
        uv = uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-12)
        uv_crop = uv @ crop_tf[:2, :2].T + crop_tf[:2, 2]
        tri_xy = uv_crop[faces]
        tri_z = z[faces]
        det = _signed_area2(tri_xy)
        coeff = _bary_coeffs(tri_xy, det)
        valid = (jnp.abs(det) > 1e-12) & (tri_z > ZNEAR).all(axis=-1)
        coeff = jnp.where(valid[:, None, None], coeff, 0.0)
        invz = 1.0 / jnp.maximum(tri_z, ZNEAR)
        coeffT2 = coeff.transpose(0, 2, 1).reshape(Fp, 9)
        n_cam = vnormals @ R.T
        diffuse = jnp.clip(jnp.sum(n_cam * jnp.array([0.0, 0, -1.0]), -1), 0, 1)
        V = verts.shape[0]
        vert_attr = jnp.concatenate(
            [jnp.zeros((V, 1)), v_cam - tt[None], n_cam,
             mt["vertex_color"], diffuse[:, None], jnp.zeros((V, 5))], axis=-1
        )
        attr = vert_attr[faces]
        attr = attr.at[:, :, 0].set(invz)
        attr3A = attr.reshape(Fp, 48)
        y = tri_xy[..., 1]
        ymin = jnp.where(valid, y.min(-1), jnp.inf)
        ymax = jnp.where(valid, y.max(-1), -jnp.inf)
        combined = jnp.concatenate(
            [coeffT2, ymin[:, None], ymax[:, None], jnp.zeros((Fp, 5)), attr3A],
            axis=-1,
        )
        return combined, ymin

    def build_only(poses, tfs):
        return jax.vmap(build)(poses, tfs)[0]

    def build_sort_gather(poses, tfs):
        comb, ymin = jax.vmap(build)(poses, tfs)
        perm = jnp.argsort(ymin, axis=-1)
        return jnp.take_along_axis(comb, perm[..., None], axis=1)

    def argsort_only(ymin):
        return jnp.argsort(ymin, axis=-1)

    def gather_only(comb, perm):
        return jnp.take_along_axis(comb, perm[..., None], axis=1)

    def onehot_perm(comb, perm):
        oh = (perm[..., None] == jnp.arange(Fp)[None, None]).astype(jnp.float32)
        return jax.lax.dot_general(
            oh, comb, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )

    comb, ymin = jax.jit(lambda p, tf: jax.vmap(build)(p, tf))(poses, tfs)
    perm = jax.jit(argsort_only)(ymin)

    print(f"build only      : {t(jax.jit(build_only), poses, tfs):8.2f} ms")
    print(f"build+sort+gath : {t(jax.jit(build_sort_gather), poses, tfs):8.2f} ms")
    print(f"argsort only    : {t(jax.jit(argsort_only), ymin):8.2f} ms")
    print(f"gather only     : {t(jax.jit(gather_only), comb, perm):8.2f} ms")
    print(f"onehot matmul   : {t(jax.jit(onehot_perm), comb, perm):8.2f} ms")


if __name__ == "__main__":
    main()
