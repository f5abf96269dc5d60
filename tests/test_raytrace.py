import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.ops.mesh import (
    TriMesh, cylinder_mesh, sphere_mesh, merge_meshes, qsm_mesh,
    canopy_surface_mesh, alpha_complex_mesh, mesh_properties,
)
from pyqsm_tpu.ops.raytrace import (
    cast_rays, pinhole_rays, parallel_rays, occupancy, hit_points,
    exposed_surface_area, unsigned_distance, triangle_areas,
)
from pyqsm_tpu.models.raycast import cast_scene, sun_exposure, sun_sweep, mri_slices


def unit_square_mesh(z=0.0):
    verts = jnp.asarray(np.array(
        [[0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z]], np.float32))
    tris = jnp.asarray(np.array([[0, 1, 2], [0, 2, 3]], np.int32))
    return TriMesh(verts, tris)


def test_cast_single_triangle_hit_and_miss():
    mesh = unit_square_mesh(z=0.0)
    origins = jnp.asarray(np.array([[0.25, 0.25, 1.0], [5.0, 5.0, 1.0]], np.float32))
    dirs = jnp.asarray(np.array([[0, 0, -1.0], [0, 0, -1.0]], np.float32))
    hits = cast_rays(origins, dirs, mesh.vertices, mesh.triangles)
    t = np.asarray(hits.t)
    assert t[0] == pytest.approx(1.0, abs=1e-5)
    assert np.isinf(t[1])
    assert int(hits.tri[0]) >= 0 and int(hits.tri[1]) == -1
    # hit point reconstruction
    hp = np.asarray(hit_points(hits, mesh.vertices, mesh.triangles))
    np.testing.assert_allclose(hp[0], [0.25, 0.25, 0.0], atol=1e-5)


def test_closest_hit_of_stacked_planes():
    m1 = unit_square_mesh(z=0.0)
    m2 = unit_square_mesh(z=0.5)
    mesh = merge_meshes([m1, m2])
    # NB off the shared diagonal edge — a ray exactly on an edge is counted
    # by both adjacent triangles (same caveat as any non-watertight tracer)
    origins = jnp.asarray(np.array([[0.4, 0.3, 2.0]], np.float32))
    dirs = jnp.asarray(np.array([[0, 0, -1.0]], np.float32))
    hits = cast_rays(origins, dirs, mesh.vertices, mesh.triangles)
    assert float(hits.t[0]) == pytest.approx(1.5, abs=1e-5)  # hits z=0.5 first
    assert int(hits.count[0]) == 2  # crosses both planes


def test_occupancy_in_sphere():
    mesh = sphere_mesh(jnp.array([0.0, 0, 0]), 1.0, n_lat=16, n_lon=32)
    pts = jnp.asarray(np.array(
        [[0, 0, 0], [0.5, 0, 0], [0.95, 0, 0], [1.5, 0, 0], [0, 2, 0]], np.float32))
    occ = np.asarray(occupancy(pts, mesh.vertices, mesh.triangles))
    np.testing.assert_array_equal(occ, [True, True, True, False, False])


def test_pinhole_rays_shapes_and_norms():
    o, d = pinhole_rays(jnp.array([0.0, 0, 10]), jnp.array([0.0, 0, 0]),
                        jnp.array([0.0, 1, 0]), 90.0, 64, 48)
    assert o.shape == (64 * 48, 3) and d.shape == (64 * 48, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)
    # central ray points at the target
    mid = np.asarray(d).reshape(48, 64, 3)[24, 32]
    assert mid[2] < -0.99


def test_exposure_of_unit_square_nadir():
    mesh = unit_square_mesh()
    res = sun_exposure(mesh, elevation_deg=90.0, nx=128, ny=128)
    # full square visible from straight above: both areas == 1
    assert res.surface_area_3d == pytest.approx(1.0, abs=1e-3)
    assert res.surface_area_2d == pytest.approx(1.0, abs=1e-3)


def test_sun_sweep_monotone_projected_area():
    # vertical cylinder: projected (2D) exposed area grows as the sun drops?
    # at least: sweep runs and returns all angles
    mesh = cylinder_mesh(jnp.array([0.0, 0, 0]), jnp.array([0.0, 0, 1]), 0.5, 3.0)
    sweep = sun_sweep(mesh, elevations=(45.0, 90.0), nx=96, ny=96)
    assert set(sweep) == {45.0, 90.0}
    # from overhead only the cap is lit; at 45 deg the side wall is hit too
    assert sweep[45.0].surface_area_3d > sweep[90.0].surface_area_3d


def test_cast_scene_cylinder():
    mesh = cylinder_mesh(jnp.array([0.0, 0, 0]), jnp.array([0.0, 0, 1]), 0.5, 2.0)
    from pyqsm_tpu.config import RaycastConfig
    res = cast_scene(mesh, cfg=RaycastConfig(width_px=96, height_px=72))
    # eye is 10 m above a 0.5 m-radius cylinder with 90° fov: the cap
    # subtends a tiny solid angle, so only ~0.2% of rays hit
    assert res.hit_fraction > 0.001
    assert res.surface_area_3d > 0


def test_unsigned_distance():
    mesh = unit_square_mesh()
    pts = jnp.asarray(np.array([[0.5, 0.5, 0.7], [2.0, 0.5, 0.0]], np.float32))
    d = np.asarray(unsigned_distance(pts, mesh.vertices, mesh.triangles))
    assert d[0] == pytest.approx(0.7, abs=1e-4)
    assert d[1] == pytest.approx(1.0, abs=1e-4)


def test_mesh_properties_and_areas():
    mesh = sphere_mesh(jnp.array([0.0, 0, 0]), 1.0, n_lat=16, n_lon=32)
    props = mesh_properties(mesh)
    assert props["watertight"] and props["edge_manifold"]
    assert props["surface_area"] == pytest.approx(4 * np.pi, rel=0.05)
    a = float(jnp.sum(triangle_areas(mesh.vertices, mesh.triangles)))
    assert a == pytest.approx(props["surface_area"], rel=1e-5)


def test_canopy_surface_mesh(rng):
    pts = np.concatenate([rng.uniform(0, 2, (500, 2)),
                          rng.uniform(0.9, 1.1, (500, 1))], 1).astype(np.float32)
    mesh = canopy_surface_mesh(pts, max_edge=0.5)
    props = mesh_properties(mesh)
    assert props["n_triangles"] > 100
    # nadir exposure of a 2x2 roof ~ 4 m2 (2D)
    res = sun_exposure(mesh, elevation_deg=90.0, nx=128, ny=128)
    assert res.surface_area_2d == pytest.approx(4.0, rel=0.15)


def test_alpha_complex_sphere(rng):
    th = rng.uniform(0, 2 * np.pi, 800)
    ph = np.arccos(rng.uniform(-1, 1, 800))
    pts = np.stack([np.sin(ph) * np.cos(th), np.sin(ph) * np.sin(th), np.cos(ph)], 1)
    pts = (pts * 1.0).astype(np.float32)
    mesh = alpha_complex_mesh(pts, alpha=1.5)
    props = mesh_properties(mesh)
    assert props["surface_area"] == pytest.approx(4 * np.pi, rel=0.25)


def test_qsm_mesh_roundtrip(rng):
    from pyqsm_tpu.state import Cylinders
    cyl = Cylinders(
        center=jnp.asarray(np.array([[0, 0, 1.0], [0, 0, 3.0]], np.float32)),
        axis=jnp.asarray(np.array([[0, 0, 1.0], [0, 0, 1.0]], np.float32)),
        height=jnp.asarray(np.array([2.0, 2.0], np.float32)),
        radius=jnp.asarray(np.array([0.3, 0.2], np.float32)),
        branch_order=jnp.zeros(2, jnp.int32),
        parent=jnp.asarray(np.array([-1, 0], np.int32)),
        mask=jnp.ones(2, bool),
    )
    mesh = qsm_mesh(cyl)
    assert mesh.n_triangles() > 50
    # points inside the trunk are occupied
    pts = jnp.asarray(np.array([[0, 0, 1.0], [1.0, 0, 1.0]], np.float32))
    occ = np.asarray(occupancy(pts, mesh.vertices, mesh.triangles))
    np.testing.assert_array_equal(occ, [True, False])


def _brute_hitlist(origins, dirs, verts, tris, eps=1e-9):
    """NumPy oracle: every crossing per ray, sorted by t."""
    out = []
    v = np.asarray(verts, np.float64)
    f = np.asarray(tris)
    for o, d in zip(np.asarray(origins, np.float64), np.asarray(dirs, np.float64)):
        hits = []
        for ti, (a, b, c) in enumerate(f):
            if a < 0:
                continue
            v0, e1, e2 = v[a], v[b] - v[a], v[c] - v[a]
            p = np.cross(d, e2)
            det = e1 @ p
            if abs(det) < eps:
                continue
            tv = o - v0
            u = (tv @ p) / det
            q = np.cross(tv, e1)
            w = (d @ q) / det
            t = (e2 @ q) / det
            if u >= 0 and w >= 0 and u + w <= 1 and t > eps:
                hits.append((t, ti, u, w))
        hits.sort()
        out.append(hits)
    return out


def test_list_intersections_matches_brute_oracle(rng):
    from pyqsm_tpu.ops.raytrace import list_intersections, hit_points_list

    # 6 stacked unit quads + one rotated triangle, rays at random xy
    meshes = [unit_square_mesh(z=0.3 * i) for i in range(6)]
    extra = TriMesh(
        jnp.asarray(np.array([[0.1, 0.1, 0.95], [0.9, 0.2, 0.95],
                              [0.4, 0.9, 0.95]], np.float32)),
        jnp.asarray(np.array([[0, 1, 2]], np.int32)))
    mesh = merge_meshes(meshes + [extra])
    r = 64
    xy = rng.uniform(0.05, 0.95, (r, 2)).astype(np.float32)
    origins = jnp.asarray(np.column_stack([xy, np.full(r, -1.0, np.float32)]))
    dirs = jnp.broadcast_to(jnp.asarray([0.017, 0.013, 1.0], jnp.float32), (r, 3))

    hl = list_intersections(origins, dirs, mesh.vertices, mesh.triangles,
                            max_hits=8, ray_tile=32, tri_tile=4)
    oracle = _brute_hitlist(origins, dirs, mesh.vertices, mesh.triangles)
    for i, hits in enumerate(oracle):
        n = len(hits)
        assert int(hl.count[i]) == n
        got_t = np.asarray(hl.t[i])
        got_tri = np.asarray(hl.tri[i])
        for j, (t, ti, u, w) in enumerate(hits[:8]):
            assert got_t[j] == pytest.approx(t, rel=1e-4)
            assert got_tri[j] == ti
            assert np.asarray(hl.uv[i, j, 0]) == pytest.approx(u, abs=1e-4)
            assert np.asarray(hl.uv[i, j, 1]) == pytest.approx(w, abs=1e-4)
        assert np.all(np.isinf(got_t[n:])) and np.all(got_tri[n:] == -1)

    # world-space reconstruction: z of the k-th crossing == quad plane
    pts = hit_points_list(origins, dirs, hl)
    for i, hits in enumerate(oracle):
        for j, (t, ti, _, _) in enumerate(hits[:8]):
            expect = np.asarray(origins[i]) + t * np.asarray(dirs[i])
            np.testing.assert_allclose(np.asarray(pts[i, j]), expect,
                                       rtol=1e-4, atol=1e-5)


def test_list_intersections_overflow_count_exact():
    from pyqsm_tpu.ops.raytrace import list_intersections

    mesh = merge_meshes([unit_square_mesh(z=0.1 * i) for i in range(12)])
    origins = jnp.asarray(np.array([[0.37, 0.52, -1.0]], np.float32))
    dirs = jnp.asarray(np.array([[0.0, 0.0, 1.0]], np.float32))
    hl = list_intersections(origins, dirs, mesh.vertices, mesh.triangles,
                            max_hits=4)
    assert int(hl.count[0]) == 12  # exact even past K
    t = np.asarray(hl.t[0])
    np.testing.assert_allclose(t, 1.0 + 0.1 * np.arange(4), rtol=1e-5)


def test_sparse_cast_with_intersections_sphere():
    from pyqsm_tpu.models.raycast import sparse_cast_with_intersections

    mesh = sphere_mesh(jnp.asarray([0.0, 0.0, 0.0]), 1.0, n_lat=24, n_lon=24)
    # slight tilt keeps rays off exact shared-edge/vertex grazing (a
    # measure-zero float boundary where crossing parity is undefined —
    # Embree has the same edge behavior)
    hl, pts = sparse_cast_with_intersections(
        mesh, nx=16, ny=16, max_hits=4, direction=(0.0171, 0.0133, -1.0))
    cnt = np.asarray(hl.count)
    # rays through a closed sphere cross an even number of times
    assert np.all(cnt % 2 == 0)
    assert cnt.max() == 2
    inside = cnt == 2
    # grid spans the AABB's bounding sphere (radius sqrt(3)) so the unit
    # sphere covers ~pi/12 of the 16x16 footprint (~67 rays, minus faceting)
    assert inside.sum() > 40
    p = np.asarray(pts)
    # entry point is on the upper hemisphere, exit on the lower
    assert np.nanmin(p[inside, 0, 2]) > -0.05
    assert np.nanmax(p[inside, 1, 2]) < 0.05
    # every reconstructed crossing lies on the sphere (mesh is a 24x24
    # faceted approximation -> loose tolerance)
    r = np.linalg.norm(p[inside][:, :2, :], axis=-1)
    assert np.all(np.abs(r - 1.0) < 0.05)
