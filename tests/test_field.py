"""Neural object field: train a tiny SDF NeRF on synthetic sphere views and
verify geometry, then unit-test the supporting ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationpose_tpu.field import bounds as bounds_mod
from foundationpose_tpu.field import sampling
from foundationpose_tpu.field.encoders import sh_encode
from foundationpose_tpu.field.losses import depth_band_weights, sdf_losses
from foundationpose_tpu.field.meshing import marching_tetrahedra
from foundationpose_tpu.field.runner import FieldConfig, NeRFRunnerTPU
from foundationpose_tpu.ops.hashgrid import HashGridEncoder


def test_hashgrid_shapes_and_grad():
    enc = HashGridEncoder(num_levels=4, level_dim=2, base_resolution=4,
                          desired_resolution=16, log2_hashmap_size=10)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    out = enc.apply(params, x)
    assert out.shape == (32, 8)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)
    table_grad = g["params"]["table"]
    assert np.isfinite(np.asarray(table_grad)).all()
    assert np.abs(np.asarray(table_grad)).sum() > 0  # scatter-add backward works


def test_hashgrid_locality():
    """Nearby points share features; far points (beyond a cell) differ."""
    enc = HashGridEncoder(num_levels=2, level_dim=2, base_resolution=8,
                          desired_resolution=16, log2_hashmap_size=16)
    key = jax.random.PRNGKey(1)
    x = jnp.array([[0.1, 0.1, 0.1]])
    params = enc.init(key, x)
    # randomize the table so features are informative
    params = jax.tree.map(
        lambda t: jax.random.normal(key, t.shape), params
    )
    f0 = enc.apply(params, x)
    f_near = enc.apply(params, x + 1e-4)
    f_far = enc.apply(params, x + 0.5)
    assert float(jnp.abs(f0 - f_near).max()) < 1e-2
    assert float(jnp.abs(f0 - f_far).max()) > 1e-3


def test_sh_encode():
    d = jnp.array([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode(d, degree=3))
    assert out.shape == (1, 9)
    np.testing.assert_allclose(out[0, 0], 0.28209479, atol=1e-6)


def test_ray_box_intersect():
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    tmin, tmax = sampling.ray_box_intersect(o, d)
    np.testing.assert_allclose(float(tmin[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(float(tmax[0]), 3.0, atol=1e-5)
    # miss
    o2 = jnp.array([[5.0, 5.0, -2.0]])
    tmin2, _ = sampling.ray_box_intersect(o2, d)
    assert float(tmin2[0]) == -1.0


def test_occupancy_grid():
    pts = np.array([[0.0, 0.0, 0.0]])
    grid = sampling.build_occupancy_grid(pts, resolution=16, dilate=1)
    occ = np.asarray(
        sampling.occupancy_lookup(jnp.asarray(grid), jnp.array([[0.0, 0, 0], [0.9, 0.9, 0.9]]))
    )
    assert occ[0] and not occ[1]


def test_depth_band_weights_peak():
    z = jnp.linspace(0.1, 1.0, 64)[None]
    w = np.asarray(depth_band_weights(z, jnp.array([0.5]), 0.05, 5.0, 2.0))
    assert abs(float(z[0, w[0].argmax()]) - 0.5) < 0.02
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-3)
    # invalid depth -> all zeros
    w2 = np.asarray(depth_band_weights(z, jnp.array([5.0]), 0.05, 5.0, 2.0))
    assert w2.max() < 1e-6


def test_marching_tetrahedra_sphere():
    n = 48
    ax = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.5
    mesh = marching_tetrahedra(sdf, iso=0.0, origin=(-1, -1, -1), spacing=2 / (n - 1))
    assert len(mesh.vertices) > 100
    r = np.linalg.norm(mesh.vertices, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)
    assert r.std() < 0.02
    # outward normals
    outward = (mesh.vertex_normals * mesh.vertices).sum(axis=-1)
    assert (outward > 0).mean() > 0.95


def _sphere_scene(n_views=8, H=60, W=80, radius=0.5, cam_dist=1.8):
    """Analytic sphere renders: depth + flat color + masks + cam poses."""
    from foundationpose_tpu.core.icosphere import sample_views_icosphere

    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    cams = sample_views_icosphere(n_views=12)[:n_views]
    cams[:, :3, 3] *= cam_dist
    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    dirs_cam = np.stack(
        [(us - K[0, 2]) / K[0, 0], (vs - K[1, 2]) / K[1, 1], np.ones_like(us)], -1
    ).astype(np.float64)
    rgbs, depths, masks = [], [], []
    for cam in cams:
        o = cam[:3, 3]
        d_w = dirs_cam @ cam[:3, :3].T  # (H,W,3), z-cam = 1 units
        # solve |o + d t|^2 = r^2 for smallest positive t
        a = (d_w * d_w).sum(-1)
        b = 2 * (d_w * o).sum(-1)
        c = (o * o).sum() - radius**2
        disc = b**2 - 4 * a * c
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / (2 * a)
        depth = np.where(hit & (t > 0), t, 0.0)  # t is cam-z since dz=1
        p = o[None, None] + d_w * t[..., None]
        color = np.where(
            hit[..., None], 0.5 + 0.5 * p / radius, 0.0
        )  # position-coded color
        rgbs.append((color * 255).astype(np.float32))
        depths.append(depth.astype(np.float32))
        masks.append(hit.astype(np.uint8))
    return K, cams, np.stack(rgbs), np.stack(depths), np.stack(masks)


@pytest.mark.slow
def test_field_reconstruction_sphere():
    K, cams, rgbs, depths, masks = _sphere_scene()
    translation, sc_factor, cluster = bounds_mod.compute_scene_bounds(
        depths, masks, K, cams, voxel=0.02
    )
    # sphere of radius .5 -> extent 1.0 -> sc_factor ~= 1.8
    assert 1.5 < sc_factor < 2.1
    rgbs_n, depths_n, masks_n, poses_n = bounds_mod.preprocess_data(
        rgbs, depths, masks, cams, sc_factor, translation
    )
    occ_pts = (cluster + translation) * sc_factor

    cfg = FieldConfig(
        n_step=150, n_rand=1024, n_samples=24, n_samples_around_depth=24,
        num_levels=4, log2_hashmap_size=14, base_res=8, finest_res=48,
        triplane_resolutions=(8, 16, 32), triplane_channels=2,
        trunc=0.02, occ_resolution=32, mask_dilate_first=8, mask_dilate=6,
        mesh_resolution=0.04,
    )
    runner = NeRFRunnerTPU(
        cfg, rgbs_n, depths_n, masks_n, poses_n, K, occ_pts, sc_factor, translation
    )
    loss = runner.train(log_every=50)
    assert np.isfinite(loss)

    # SDF sign flips across the sphere surface (normalized radius = .5*sc)
    r_surf = 0.5 * sc_factor
    dirs = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0], [-1, 0, 0]])
    band = 0.015 * sc_factor
    sdf_out = np.asarray(runner.sdf_fn((r_surf + band) * dirs))
    sdf_in = np.asarray(runner.sdf_fn((r_surf - band) * dirs))
    assert (sdf_out > 0).all(), sdf_out
    assert (sdf_in < 0).mean() >= 0.75, sdf_in

    # extracted mesh is a sphere of the right radius (in normalized units)
    mesh = runner.extract_mesh(voxel_size=0.04)
    assert len(mesh.vertices) > 50
    r = np.linalg.norm(mesh.vertices, axis=-1) / sc_factor
    np.testing.assert_allclose(np.median(r), 0.5, atol=0.05)

    # real-world conversion: sphere recentered at the original origin
    world = runner.mesh_to_real_world(mesh)
    np.testing.assert_allclose(
        np.linalg.norm(world.vertices, axis=-1).mean(), 0.5, atol=0.06
    )
    # optimized poses: frame 0 pinned to its input pose
    opt = runner.get_optimized_poses_in_real_world()
    np.testing.assert_allclose(opt[0], cams[0], atol=1e-4)


def test_optional_regularizers_finite():
    """fs_rgb and eikonal regularizers (reference nerf_runner.py:559-568,
    weights in config_ycbv.yml:75,84) produce finite losses and gradients."""
    K, cams, rgbs, depths, masks = _sphere_scene()
    translation, sc_factor, cluster = bounds_mod.compute_scene_bounds(
        depths, masks, K, cams, voxel=0.02
    )
    rgbs_n, depths_n, masks_n, poses_n = bounds_mod.preprocess_data(
        rgbs, depths, masks, cams, sc_factor, translation
    )
    occ_pts = (cluster + translation) * sc_factor
    cfg = FieldConfig(
        n_step=5, n_rand=256, n_samples=8, n_samples_around_depth=8,
        triplane_resolutions=(8, 16), triplane_channels=2,
        trunc=0.02, occ_resolution=16, mask_dilate_first=4, mask_dilate=4,
        fs_rgb_weight=10.0, eikonal_weight=0.1,
    )
    runner = NeRFRunnerTPU(
        cfg, rgbs_n, depths_n, masks_n, poses_n, K, occ_pts, sc_factor, translation
    )
    loss = runner.train(log_every=5)
    assert np.isfinite(loss)


def test_triplane_custom_vjp_matches_autodiff():
    """The analytic triplane VJP (plane grads AND point grads — the joint
    pose-optimization path differentiates through sample positions) must
    match plain autodiff of the same forward math."""
    import jax
    import jax.numpy as jnp

    from foundationpose_tpu.field import encoders as enc_mod

    res = (8, 16)
    C = 3
    rng = np.random.default_rng(0)
    planes = tuple(
        jnp.asarray(rng.normal(0, 0.1, (3, R + 1, R + 1, C)).astype(np.float32))
        for R in res
    )
    pts = jnp.asarray(rng.uniform(-0.95, 0.95, (64, 3)).astype(np.float32))
    g_out = jnp.asarray(rng.normal(0, 1, (64, len(res) * C)).astype(np.float32))

    def f_custom(planes, pts):
        return (enc_mod._triplane_eval(planes, pts, res, C) * g_out).sum()

    def f_auto(planes, pts):
        return (enc_mod._triplane_eval_fwd(planes, pts, res, C)[0] * g_out).sum()

    out_c = enc_mod._triplane_eval(planes, pts, res, C)
    out_a = enc_mod._triplane_eval_fwd(planes, pts, res, C)[0]
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_a), atol=1e-6)

    gc = jax.grad(f_custom, argnums=(0, 1))(planes, pts)
    ga = jax.grad(f_auto, argnums=(0, 1))(planes, pts)
    for a, b in zip(gc[0], ga[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(ga[1]), atol=1e-3)


def test_train_observability_and_artifact_hooks(tmp_path):
    """Aux loss-term dict is surfaced at log points, and the i_weights /
    i_img / i_mesh hooks leave the reference-style artifact trail
    (nerf_runner.py:594-681) under save_dir."""
    import os

    K, cams, rgbs, depths, masks = _sphere_scene(n_views=3, H=30, W=40)
    translation, sc_factor, cluster = bounds_mod.compute_scene_bounds(
        depths, masks, K, cams, voxel=0.05
    )
    rgbs_n, depths_n, masks_n, poses_n = bounds_mod.preprocess_data(
        rgbs, depths, masks, cams, sc_factor, translation
    )
    occ_pts = (cluster + translation) * sc_factor
    cfg = FieldConfig(
        n_step=6, n_rand=128, n_samples=8, n_samples_around_depth=8,
        num_levels=2, log2_hashmap_size=10, base_res=4, finest_res=8,
        triplane_resolutions=(4, 8), triplane_channels=2,
        occ_resolution=8, mask_dilate_first=0, mask_dilate=0,
        mesh_resolution=0.15,
        i_weights=3, i_img=3, i_mesh=6, save_dir=str(tmp_path),
    )
    runner = NeRFRunnerTPU(
        cfg, rgbs_n, depths_n, masks_n, poses_n, K, occ_pts, sc_factor, translation
    )
    runner.train(n_step=6, log_every=2)

    for key in ("loss", "rgb_loss", "fs_loss", "sdf_loss", "empty_loss",
                "valid_rays", "valid_samples"):
        assert key in runner.last_aux, runner.last_aux
        assert np.isfinite(runner.last_aux[key])

    assert os.path.exists(tmp_path / "ckpt" / "model_latest.npz")
    imgs = os.listdir(tmp_path / "image_step")
    assert any(f.endswith(".png") for f in imgs), imgs
    meshes = os.listdir(tmp_path / "mesh_step")
    assert any(f.endswith(".obj") for f in meshes), meshes


def test_sample_pdf_concentrates():
    """Inverse-CDF importance sampling (reference nerf_helpers.py:358-385):
    samples land where the weights are."""
    bins = jnp.tile(jnp.linspace(0.0, 1.0, 9)[None], (2, 1))  # (2,9)
    w = np.zeros((2, 8), np.float32)
    w[0, 2] = 1.0  # all mass in bin [0.25, 0.375]
    w[1, 6] = 1.0  # all mass in bin [0.75, 0.875]
    z = np.asarray(
        sampling.sample_pdf(jax.random.PRNGKey(0), bins, jnp.asarray(w), 64)
    )
    assert ((z[0] >= 0.24) & (z[0] <= 0.39)).mean() > 0.9
    assert ((z[1] >= 0.74) & (z[1] <= 0.89)).mean() > 0.9
    # deterministic mode spans the CDF evenly
    zd = np.asarray(
        sampling.sample_pdf(
            jax.random.PRNGKey(0), bins, jnp.asarray(w), 16, deterministic=True
        )
    )
    assert np.all(np.diff(zd[0]) >= -1e-6)


def test_field_n_importance_trains():
    """Hierarchical sampling behind the n_importance flag
    (reference N_importance, nerf_runner.py:807-830; default stays 0)."""
    K, cams, rgbs, depths, masks = _sphere_scene()
    translation, sc_factor, cluster = bounds_mod.compute_scene_bounds(
        depths, masks, K, cams, voxel=0.02
    )
    rgbs_n, depths_n, masks_n, poses_n = bounds_mod.preprocess_data(
        rgbs, depths, masks, cams, sc_factor, translation
    )
    occ_pts = (cluster + translation) * sc_factor
    cfg = FieldConfig(
        n_step=3, n_rand=128, n_samples=8, n_samples_around_depth=8,
        n_importance=8,
        triplane_resolutions=(8, 16), triplane_channels=2,
        trunc=0.02, occ_resolution=16, mask_dilate_first=4, mask_dilate=4,
    )
    runner = NeRFRunnerTPU(
        cfg, rgbs_n, depths_n, masks_n, poses_n, K, occ_pts, sc_factor,
        translation,
    )
    loss = runner.train(log_every=3)
    assert np.isfinite(loss)
