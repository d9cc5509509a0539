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
