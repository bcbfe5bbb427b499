"""Electron density synthesis + isosurface meshes
(reference reflection.rs / sfc_mesh)."""
import numpy as np
import pytest

from molchanica_tpu.density import (
    DensityMap, density_from_atoms, density_map_from_sf, density_rect,
    sample_density)
from molchanica_tpu.sfc_mesh import marching_tetrahedra, molecular_surface


def test_sf_synthesis_roundtrip():
    """A single cosine reflection must synthesize to the analytic wave."""
    cell = (20.0, 20.0, 20.0)
    # F(1,0,0) with amplitude A and phase 0 -> rho ~ (2A/V) cos(2 pi x / a)
    dm = density_map_from_sf(h=[1], k=[0], l=[0], amp=[5.0], phase=[0.0],
                             grid=(16, 16, 16), cell=cell)
    x = (np.arange(16) + 0.0) * cell[0] / 16
    expected = 2 * 5.0 / np.prod(cell) * np.cos(2 * np.pi * x / cell[0])
    np.testing.assert_allclose(dm.data[:, 0, 0], expected, atol=1e-6)


def test_sample_density_trilinear():
    data = np.zeros((8, 8, 8))
    data[4, 4, 4] = 1.0
    dm = DensityMap(data=data, cell=(8.0, 8.0, 8.0))
    # at the voxel's grid point (cartesian 4,4,4): weight 1
    v = sample_density(dm, np.array([[4.0, 4.0, 4.0]]))
    np.testing.assert_allclose(v, [1.0], atol=1e-9)
    # halfway to the next voxel: 0.5
    v2 = sample_density(dm, np.array([[4.5, 4.0, 4.0]]))
    np.testing.assert_allclose(v2, [0.5], atol=1e-9)


def test_density_rect_crop():
    rng = np.random.default_rng(0)
    dm = DensityMap(data=rng.normal(size=(20, 20, 20)),
                    cell=(40.0, 40.0, 40.0))
    atoms = np.array([[10.0, 10, 10], [14.0, 12, 11]])
    rect = density_rect(dm, atoms, margin=2.0)
    assert all(d <= 20 for d in rect.dims)
    assert rect.data.size > 0
    # the crop covers the atoms
    assert np.all(rect.origin <= atoms.min(0))


def test_gaussian_atoms_and_sphere_mesh():
    """Density of one atom -> isosurface is a sphere: check area ~ 4 pi r^2
    within mesh discretization error."""
    dm = density_from_atoms(np.array([[8.0, 8.0, 8.0]]), [6.0],
                            cell=(16.0, 16.0, 16.0), grid=(32, 32, 32),
                            b_factor=30.0)
    # pick the iso level crossing at radius ~2.0 A
    sig2 = 30.0 / (8 * np.pi ** 2)
    rho0 = 6.0 / (2 * np.pi * sig2) ** 1.5
    r_target = 2.0
    iso = rho0 * np.exp(-0.5 * r_target ** 2 / sig2)
    mesh = marching_tetrahedra(dm, float(iso))
    assert mesh.n_triangles > 50
    area = mesh.area()
    # marching tetrahedra over-tessellate (zigzag diagonals): the
    # area converges from above; allow the known ~20% bias at this grid
    np.testing.assert_allclose(area, 4 * np.pi * r_target ** 2, rtol=0.25)
    # all vertices near radius 2 from the center
    r = np.linalg.norm(mesh.vertices - 8.0, axis=1)
    assert abs(r.mean() - r_target) < 0.2


def test_molecular_surface_encloses():
    pts = np.array([[0.0, 0, 0], [1.5, 0, 0], [0.0, 1.5, 0]])
    mesh = molecular_surface(pts, grid_step=0.7)
    assert mesh.n_triangles > 20
    # surface surrounds the atoms: mesh bbox contains them
    assert np.all(mesh.vertices.min(0) < pts.min(0))
    assert np.all(mesh.vertices.max(0) > pts.max(0))
