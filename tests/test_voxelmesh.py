"""Device-side surface reconstruction (density splat + marching tetrahedra)
— the Poisson/BPA stand-in (ref surf_recon.py:87-116, mesh_processing.py:
196-217). Oracle checks: area against the analytic surface, occupancy of
interior points via the ray engine, and scale/translation invariance."""

import numpy as np
import jax.numpy as jnp

from pyqsm_tpu.ops.voxelmesh import (
    marching_tetrahedra, poisson_like_mesh, weld_vertices,
)
from pyqsm_tpu.ops.mesh import mesh_properties


def sphere_cloud(rng, n=20000, r=1.0):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32)


def test_marching_tets_sphere_field():
    # analytic SDF-ish field: f = r0 - |x| sampled on a lattice; isosurface
    # at f=0 is the sphere of radius r0
    n = 48
    voxel = 0.1
    lo = np.array([-2.4, -2.4, -2.4], np.float32)
    g = lo[0] + voxel * np.arange(n)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    r0 = 1.5
    field = r0 - np.sqrt(X**2 + Y**2 + Z**2)
    mesh = marching_tetrahedra(jnp.asarray(field.astype(np.float32)),
                               lo, voxel, iso=0.0)
    props = mesh_properties(weld_vertices(mesh))
    area = props["surface_area"]
    expect = 4 * np.pi * r0**2
    assert abs(area - expect) / expect < 0.05
    # all triangle vertices lie near the sphere surface
    v = np.asarray(mesh.vertices)
    rr = np.linalg.norm(v, axis=1)
    assert np.abs(rr - r0).max() < voxel

    # watertight: parity occupancy of interior/exterior probes
    from pyqsm_tpu.ops.grid3d import build_grid3d, grid_occupancy

    grid = build_grid3d(mesh.vertices, mesh.triangles)
    probes = np.array([[0, 0, 0], [0.5, 0.3, -0.4], [2.2, 0, 0],
                       [0, -2.2, 0.1]], np.float32)
    occ = np.asarray(grid_occupancy(grid, jnp.asarray(probes)))
    np.testing.assert_array_equal(occ, [True, True, False, False])


def test_poisson_like_mesh_from_cloud(rng):
    pts = sphere_cloud(rng, 20000, r=1.0)
    mesh = poisson_like_mesh(jnp.asarray(pts), voxel=0.08, blur_iters=2)
    assert mesh.n_triangles() > 500
    props = mesh_properties(weld_vertices(mesh))
    # the shell closes around the sampled sphere: area between the sphere's
    # and a shell inflated by the blur support
    assert 0.5 * 4 * np.pi < props["surface_area"] < 3.0 * 4 * np.pi
    v = np.asarray(mesh.vertices)
    rr = np.linalg.norm(v, axis=1)
    assert rr.min() > 0.4 and rr.max() < 1.6


def test_poisson_like_mesh_empty_and_tiny():
    empty = poisson_like_mesh(jnp.zeros((0, 3)), mask=jnp.zeros(0, bool))
    assert empty.n_triangles() == 0
    tiny = poisson_like_mesh(jnp.asarray(np.random.default_rng(0)
                                         .normal(size=(3, 3))
                                         .astype(np.float32)))
    assert tiny.n_triangles() == 0


def test_density_grid_counts(rng):
    from pyqsm_tpu.ops.voxelmesh import density_grid

    pts = np.array([[0.05, 0.05, 0.05], [0.05, 0.05, 0.05],
                    [0.35, 0.05, 0.05]], np.float32)
    f = density_grid(jnp.asarray(pts), jnp.ones(3, bool),
                     jnp.zeros(3), 0.1, 8, 8, 8, blur_iters=0)
    f = np.asarray(f)
    assert f[0, 0, 0] == 2.0
    assert f[3, 0, 0] == 1.0
    assert f.sum() == 3.0


def test_simplify_mesh_preserves_area_and_hits_target(rng):
    from pyqsm_tpu.ops.voxelmesh import simplify_mesh

    pts = sphere_cloud(rng, 40000, r=1.0)
    mesh = poisson_like_mesh(jnp.asarray(pts), voxel=0.05, blur_iters=1)
    n0 = mesh.n_triangles()
    assert n0 > 4000
    target = n0 // 8
    simp = simplify_mesh(mesh, target_triangles=target)
    n1 = simp.n_triangles()
    assert n1 <= target
    assert n1 > target // 8  # not collapsed to nothing
    a0 = mesh_properties(weld_vertices(mesh))["surface_area"]
    a1 = mesh_properties(simp)["surface_area"]
    assert abs(a1 - a0) / a0 < 0.25  # clustering keeps the shell area
    # vertices shared (welded output): triangle ids reference a compact pool
    t = np.asarray(simp.triangles)
    assert t.max() < len(np.asarray(simp.vertices))
    # spherical shell stays a shell
    v = np.asarray(simp.vertices)
    rr = np.linalg.norm(v, axis=1)
    assert rr.min() > 0.3 and rr.max() < 1.8


def test_simplify_mesh_noop_below_target():
    from pyqsm_tpu.ops.mesh import sphere_mesh
    from pyqsm_tpu.ops.voxelmesh import simplify_mesh

    m = sphere_mesh(jnp.zeros(3), 1.0, n_lat=8, n_lon=16)
    out = simplify_mesh(m, target_triangles=10_000)
    assert out.n_triangles() == m.n_triangles()
