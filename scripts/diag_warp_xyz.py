"""Diagnose warp_crop_affine(nearest) vs warp_perspective(nearest) on the
E2E test scene's xyz map + real crop transforms."""
import numpy as np
import jax.numpy as jnp

from foundationpose_tpu.core import geometry as geo
from foundationpose_tpu.core import meshio
from foundationpose_tpu.ops import raster, image as imops

K = np.array([[250.0, 0, 80], [0, 250.0, 60], [0, 0, 1]])
HW = (120, 160)


def asymmetric_mesh():
    a = meshio.make_box((0.12, 0.04, 0.04))
    b = meshio.make_box((0.04, 0.09, 0.04)).translated([0.04, 0.065, 0.0])
    c = meshio.make_box((0.04, 0.04, 0.07)).translated([-0.04, 0.0, 0.055])
    meshes = [a, b, c]
    verts = np.concatenate([m.vertices for m in meshes])
    offs = np.cumsum([0] + [len(m.vertices) for m in meshes[:-1]])
    faces = np.concatenate([m.faces + o for m, o in zip(meshes, offs)])
    m = meshio.Mesh(verts, faces)
    m.vertex_colors = np.full((len(verts), 3), 180, dtype=np.uint8)
    return m


mesh = asymmetric_mesh()
gt = np.eye(4)
gt[:3, :3] = np.asarray(geo.euler_matrix(0.3, -0.2, 0.5))[:3, :3]
gt[:3, 3] = [0.01, -0.02, 0.55]
mt = raster.make_mesh_tensors(mesh)
out = raster.render_full_frame(mt, gt[None], K, HW)
depth = np.asarray(out["depth"][0])
xyz_map = np.asarray(geo.depth2xyzmap(jnp.asarray(depth), jnp.asarray(K, jnp.float32)))

# crop transforms around perturbed poses
diameter = meshio.compute_mesh_diameter(mesh=mesh)
rng = np.random.default_rng(0)
poses = np.repeat(gt[None], 16, axis=0).astype(np.float32)
poses[:, :3, 3] += rng.normal(0, 0.01, size=(16, 3))
tfs = np.asarray(
    geo.compute_crop_window_tf_batch(
        jnp.asarray(poses), jnp.asarray(K, jnp.float32), crop_ratio=1.2,
        out_size=(64, 64), mesh_diameter=float(diameter),
    )
)
print("tf offdiag max:", np.abs(tfs[:, 0, 1]).max(), np.abs(tfs[:, 1, 0]).max())
print("tf persp row:", np.abs(tfs[:, 2, :2]).max())

a = np.asarray(imops.warp_perspective(xyz_map, tfs, (64, 64), mode="nearest"))
b = np.asarray(imops.warp_crop_affine(xyz_map, tfs, (64, 64), mode="nearest"))
diff = np.abs(a - b)
mism = (diff > 1e-6).any(axis=-1)
print("mismatch frac:", mism.mean())
print("max abs diff:", diff.max())
# where do they disagree?
idx = np.argwhere(mism)
if len(idx):
    bb, ii, jj = idx[0]
    print("example at", bb, ii, jj, "a=", a[bb, ii, jj], "b=", b[bb, ii, jj])
    # recompute positions both ways
    tf = tfs[bb]
    inv = np.linalg.inv(tf)
    src = inv @ np.array([jj, ii, 1.0])
    print("matrix-inv pos:", src[:2] / src[2])
    sx, tx = tf[0, 0], tf[0, 2]
    sy, ty = tf[1, 1], tf[1, 2]
    print("analytic pos:", (jj - tx) / sx, (ii - ty) / sy)
