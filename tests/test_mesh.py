"""Marching-tetrahedra mesh extraction tests."""

import numpy as np

from hotrack_tpu.sdf.mesh import (
    chamfer_distance,
    marching_tetrahedra,
    read_ply,
    sample_surface,
    write_ply,
)


def _sphere_volume(n=48, radius=0.35):
    r = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(r, r, r, indexing="ij")
    return np.sqrt(x**2 + y**2 + z**2) - radius, 2.0 / (n - 1)


def test_sphere_surface():
    vol, voxel = _sphere_volume()
    verts, faces = marching_tetrahedra(vol, voxel_size=voxel, origin=-1.0)
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.35, atol=0.01)
    assert radii.std() < 0.01
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_ply_roundtrip(tmp_path):
    vol, voxel = _sphere_volume(24, 0.4)
    verts, faces = marching_tetrahedra(vol, voxel_size=voxel, origin=-1.0)
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_sample_and_chamfer():
    vol, voxel = _sphere_volume(40, 0.3)
    verts, faces = marching_tetrahedra(vol, voxel_size=voxel, origin=-1.0)
    pts = sample_surface(verts, faces, 512)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1).mean(), 0.3,
                               atol=0.02)
    # chamfer of a set against itself ~ 0; against shifted set ~ 2*shift-ish
    d0 = float(chamfer_distance(pts, pts))
    assert d0 < 1e-6
    d1 = float(chamfer_distance(pts, pts + np.array([0.05, 0, 0])))
    assert 0.01 < d1 < 0.12


def _box_sdf_volume(n, half, extent=1.0):
    r = np.linspace(-extent, extent, n)
    x, y, z = np.meshgrid(r, r, r, indexing="ij")
    p = np.stack([x, y, z], -1)
    q = np.abs(p) - np.asarray(half)
    outside = np.linalg.norm(np.clip(q, 0, None), axis=-1)
    inside = np.clip(q.max(-1), None, 0.0)
    return outside + inside, 2.0 * extent / (n - 1)


def test_tet_mesh_surface_error_bounds():
    """Mesh-extraction parity evidence (VERDICT item: marching tetrahedra vs
    the reference's marching cubes): every extracted vertex must lie within a
    small fraction of a voxel of the TRUE surface for analytic SDFs. Linear
    edge interpolation is exact on linear fields (the box's faces) and
    O(voxel^2/R) on the sphere — the same class of bound marching cubes has,
    so chamfer evaluations against either triangulation agree at the mm
    reporting scale."""
    # sphere
    vol, voxel = _sphere_volume(n=48, radius=0.35)
    verts, _ = marching_tetrahedra(vol, voxel_size=voxel, origin=-1.0)
    err = np.abs(np.linalg.norm(verts, axis=-1) - 0.35)
    assert err.max() < 0.15 * voxel, err.max() / voxel

    # box at the object stage's 2 mm voxel scale (201^3 equivalent density)
    half = np.array([0.035, 0.05, 0.025])
    vol, voxel = _box_sdf_volume(101, half, extent=0.1)  # ~2 mm voxels
    verts, faces = marching_tetrahedra(vol, voxel_size=voxel, origin=-0.1)
    q = np.abs(verts) - half
    sdf = (np.linalg.norm(np.clip(q, 0, None), axis=-1)
           + np.clip(q.max(-1), None, 0.0))
    # edges/corners are the SDF's non-linear band: 0.09 voxel there,
    # exact (to fp) on the flat faces
    assert np.abs(sdf).max() < 0.15 * voxel, np.abs(sdf).max() / voxel


def test_tet_mesh_chamfer_agreement_mm():
    """Chamfer computed on the tet mesh agrees with the analytic surface at
    well below the mm level the eval reports (track_network.py:429-433
    multiplies by 1000 and logs mm): surface samples from the extracted mesh
    vs exact analytic sphere samples."""
    rng = np.random.RandomState(0)
    vol, voxel = _sphere_volume(n=64, radius=0.35)
    verts, faces = marching_tetrahedra(vol, voxel_size=voxel, origin=-1.0)
    mesh_pts = sample_surface(verts, faces, 2048, rng)

    def exact(n):
        d = rng.randn(n, 3)
        return (0.35 * d / np.linalg.norm(d, axis=-1, keepdims=True)
                ).astype(np.float32)

    gt_pts = exact(2048)
    cham_mesh = float(chamfer_distance(mesh_pts.astype(np.float32), gt_pts))
    # chamfer at this sample count is dominated by sampling density
    # (~27 mm mean NN spacing for 2048 points on this sphere) — the
    # triangulation's contribution is the DIFFERENCE vs an exact surface
    # sampling of the same density
    cham_exact = float(chamfer_distance(exact(2048), gt_pts))
    bias_mm = abs(cham_mesh - cham_exact) * 1000.0
    assert bias_mm < 1.0, (bias_mm, cham_mesh, cham_exact)
