import numpy as np
import pytest

from foundationpose_tpu.core import icosphere, meshio, poses
from foundationpose_tpu.core import metrics


def test_icosphere_counts():
    v, f = icosphere.icosphere(0)
    assert v.shape == (12, 3)
    v, f = icosphere.icosphere(1)
    assert v.shape == (42, 3)
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-9)
    # closed manifold: E = 3F/2, V - E + F = 2
    E = 3 * len(f) // 2
    assert len(v) - E + len(f) == 2


def test_sample_views_icosphere():
    cams = icosphere.sample_views_icosphere(n_views=40)
    assert cams.shape == (42, 4, 4)
    # z-axis points at origin
    z = cams[:, :3, 2]
    toward = -cams[:, :3, 3] / np.linalg.norm(cams[:, :3, 3], axis=-1, keepdims=True)
    np.testing.assert_allclose(z, toward, atol=1e-9)
    # orthonormal
    RtR = np.einsum("nij,nik->njk", cams[:, :3, :3], cams[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3)[None], (42, 1, 1)), atol=1e-9)


def test_rotation_grid_no_symmetry():
    grid = poses.make_rotation_grid(min_n_views=40, inplane_step=60)
    # 42*6 = 252 candidates; at 30 deg clustering threshold the grid mostly
    # survives (reference keeps ~252 for asymmetric objects)
    assert 200 <= len(grid) <= 252
    # all valid rotations
    dets = np.linalg.det(grid[:, :3, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-6)


def test_rotation_grid_symmetry_reduces():
    # continuous z-axis symmetry (e.g. a cylinder) should collapse in-plane dupes
    sym = poses.symmetry_tfs_from_info(
        {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]},
        rot_angle_discrete=5,
    )
    grid_sym = poses.make_rotation_grid(symmetry_tfs=sym)
    grid_plain = poses.make_rotation_grid()
    assert len(grid_sym) < len(grid_plain) / 2


def test_cluster_poses_native_matches_numpy():
    rng = np.random.default_rng(0)
    from scipy.spatial.transform import Rotation

    n = 100
    ps = np.tile(np.eye(4)[None], (n, 1, 1))
    ps[:, :3, :3] = Rotation.random(n, rng=rng).as_matrix()
    sym = np.eye(4)[None]
    try:
        from foundationpose_tpu.native import cluster_poses_native

        native = cluster_poses_native(30.0, 99999.0, ps, sym)
    except Exception:
        pytest.skip("native backend unavailable")
    # force numpy path by calling internals
    import foundationpose_tpu.core.poses as P

    radian = 30 / 180 * np.pi
    kept = [0]
    for i in range(1, n):
        ds = P.rotation_geodesic_distance_np(ps[i, :3, :3][None], ps[kept][:, :3, :3])
        if (ds < radian).any():
            continue
        kept.append(i)
    np.testing.assert_allclose(native, ps[kept], atol=1e-12)


def test_symmetry_tfs_from_info_discrete():
    info = {"symmetries_discrete": [np.eye(4).flatten().tolist()]}
    tfs = poses.symmetry_tfs_from_info(info)
    assert tfs.shape == (2, 4, 4)


def test_mesh_box_normals_and_diameter():
    box = meshio.make_box((0.2, 0.2, 0.2))
    assert len(box.faces) == 12
    # vertex normals point outward
    outward = np.sign(box.vertices)
    assert (np.sign(box.vertex_normals) == outward).all()
    d = meshio.compute_mesh_diameter(mesh=box)
    np.testing.assert_allclose(d, 0.2 * np.sqrt(3), rtol=1e-6)


def test_obj_roundtrip(tmp_path):
    box = meshio.make_box((1.0, 2.0, 3.0))
    box.vertex_colors = np.full((8, 3), 128, dtype=np.uint8)
    p = str(tmp_path / "box.obj")
    meshio.save_obj(p, box)
    m = meshio.load_obj(p)
    np.testing.assert_allclose(np.sort(m.vertices, axis=0), np.sort(box.vertices, axis=0), atol=1e-6)
    assert len(m.faces) == 12


def test_ply_roundtrip(tmp_path):
    box = meshio.make_box((1.0, 1.0, 1.0))
    box.vertex_colors = np.arange(24, dtype=np.uint8).reshape(8, 3)
    p = str(tmp_path / "box.ply")
    meshio.save_ply(p, box)
    m = meshio.load_ply(p)
    np.testing.assert_allclose(m.vertices, box.vertices, atol=1e-6)
    np.testing.assert_array_equal(m.vertex_colors, box.vertex_colors)
    np.testing.assert_array_equal(m.faces, box.faces)


def test_voxel_downsample():
    pts = np.random.default_rng(0).uniform(size=(1000, 3))
    out = meshio.voxel_downsample(pts, 0.25)
    assert len(out) <= 4 ** 3 + 3 * 16  # ~64 cells
    assert len(out) > 10


def test_decimate():
    sphere = meshio.make_icosphere_mesh(subdivisions=3)  # 1280 faces
    dec = meshio.decimate_vertex_clustering(sphere, 300)
    assert len(dec.faces) <= 300
    # still roughly a unit sphere
    r = np.linalg.norm(dec.vertices, axis=-1)
    assert 0.8 < r.mean() < 1.05


def test_add_adds_metrics():
    pts = np.random.default_rng(0).normal(size=(500, 3)) * 0.05
    gt = np.eye(4)
    pred = np.eye(4)
    pred[:3, 3] = [0.01, 0, 0]
    e_add = float(metrics.add_err(pred, gt, pts))
    np.testing.assert_allclose(e_add, 0.01, atol=1e-6)
    e_adds = float(metrics.adds_err(pred, gt, pts))
    assert e_adds <= e_add + 1e-6


def test_auc():
    errs = np.zeros(10)
    assert metrics.compute_auc(errs) > 0.99
    errs = np.full(10, 1e9)
    assert metrics.compute_auc(errs) < 0.01
    # half perfect, half terrible -> ~0.5
    errs = np.concatenate([np.zeros(5), np.full(5, 1e9)])
    assert abs(metrics.compute_auc(errs) - 0.5) < 0.02
