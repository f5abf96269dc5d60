"""Oracle tests: 3D uniform-grid DDA traversal vs brute Möller–Trumbore.

The grid is the general-bundle acceleration structure (Embree BVH analog,
ref viz/ray_casting.py:65-71); these tests pin exactness of closest hits,
crossing counts (occupancy parity), and degenerate-direction handling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.ops.grid3d import build_grid3d, grid_cast, grid_occupancy
from pyqsm_tpu.ops.mesh import cylinder_mesh, merge_meshes, sphere_mesh
from pyqsm_tpu.ops.raytrace import cast_rays, occupancy, pinhole_rays


def _scene():
    return merge_meshes([
        sphere_mesh(jnp.array([0.0, 0, 3.0]), 1.0, n_lat=10, n_lon=20),
        cylinder_mesh(jnp.array([0.0, 0, 1.0]), jnp.array([0.0, 0, 1]), 0.3, 2.0),
        cylinder_mesh(jnp.array([3.0, 1, 1.5]), jnp.array([0.3, 0, 0.95]), 0.2, 3.0),
        sphere_mesh(jnp.array([-2.0, 2, 2.0]), 0.7, n_lat=8, n_lon=12),
    ])


def _assert_hits_match(hits, ref, vertices, triangles):
    t, tr = np.asarray(hits.t), np.asarray(ref.t)
    np.testing.assert_array_equal(np.isfinite(t), np.isfinite(tr))
    h = np.isfinite(tr)
    np.testing.assert_allclose(t[h], tr[h], rtol=1e-4, atol=1e-4)
    # triangle ids may differ only where two triangles tie at the same t
    diff = h & (np.asarray(hits.tri) != np.asarray(ref.tri))
    assert diff.mean() < 0.01


def test_pinhole_matches_brute(rng):
    mesh = _scene()
    center = jnp.mean(mesh.vertices, axis=0)
    eye = center + jnp.array([4.0, -6.0, 5.0])
    origins, dirs = pinhole_rays(eye, center, jnp.array([0.0, 0, 1.0]),
                                 70.0, 96, 72)
    ref = cast_rays(origins, dirs, mesh.vertices, mesh.triangles,
                    backend="xla")
    grid = build_grid3d(mesh.vertices, mesh.triangles)
    hits = grid_cast(grid, origins, dirs, ray_tile=2048)
    _assert_hits_match(hits, ref, mesh.vertices, mesh.triangles)


def test_random_rays_match_brute_with_counts(rng):
    mesh = _scene()
    v = np.asarray(mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    n = 3000
    # random origins inside AND outside the scene box, random directions
    origins = rng.uniform(lo - 2.0, hi + 2.0, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = cast_rays(jnp.asarray(origins), jnp.asarray(dirs),
                    mesh.vertices, mesh.triangles, backend="xla")
    grid = build_grid3d(mesh.vertices, mesh.triangles)
    hits = grid_cast(grid, jnp.asarray(origins), jnp.asarray(dirs),
                     ray_tile=1024, count_all=True)
    _assert_hits_match(hits, ref, mesh.vertices, mesh.triangles)
    np.testing.assert_array_equal(np.asarray(hits.count), np.asarray(ref.count))


def test_axis_aligned_rays(rng):
    # d has zero components — the DDA must handle inf t_max axes
    mesh = _scene()
    v = np.asarray(mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    n = 400
    origins = rng.uniform(lo - 1.0, hi + 1.0, (n, 3)).astype(np.float32)
    axes = np.eye(3, dtype=np.float32)
    dirs = np.concatenate([
        np.tile(a, (n // 6, 1)) * s for a in axes for s in (1.0, -1.0)
    ])
    origins = origins[: len(dirs)]
    ref = cast_rays(jnp.asarray(origins), jnp.asarray(dirs),
                    mesh.vertices, mesh.triangles, backend="xla")
    grid = build_grid3d(mesh.vertices, mesh.triangles)
    hits = grid_cast(grid, jnp.asarray(origins), jnp.asarray(dirs),
                     ray_tile=512, count_all=True)
    _assert_hits_match(hits, ref, mesh.vertices, mesh.triangles)
    np.testing.assert_array_equal(np.asarray(hits.count), np.asarray(ref.count))


def test_grid_occupancy_matches_brute(rng):
    mesh = sphere_mesh(jnp.array([0.0, 0, 0.0]), 1.0, n_lat=12, n_lon=24)
    pts = rng.uniform(-1.5, 1.5, (800, 3)).astype(np.float32)
    ref = occupancy(jnp.asarray(pts), mesh.vertices, mesh.triangles)
    grid = build_grid3d(mesh.vertices, mesh.triangles)
    got = grid_occupancy(grid, jnp.asarray(pts), ray_tile=1024)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # sanity: points well inside really are inside
    inside = np.linalg.norm(pts, axis=1) < 0.8
    assert np.asarray(got)[inside].all()


def test_padded_triangles_ignored(rng):
    mesh = _scene()
    tris = jnp.concatenate(
        [mesh.triangles, jnp.full((13, 3), -1, jnp.int32)], axis=0)
    grid = build_grid3d(mesh.vertices, tris)
    center = jnp.mean(mesh.vertices, axis=0)
    origins, dirs = pinhole_rays(center + jnp.array([0.0, 0, 8.0]), center,
                                 jnp.array([0.0, 1, 0.0]), 80.0, 32, 32)
    hits = grid_cast(grid, origins, dirs)
    ref = cast_rays(origins, dirs, mesh.vertices, mesh.triangles,
                    backend="xla")
    np.testing.assert_array_equal(np.isfinite(np.asarray(hits.t)),
                                  np.isfinite(np.asarray(ref.t)))
    assert int(jnp.sum(hits.tri >= 0)) > 20
    assert int(jnp.max(hits.tri)) < mesh.triangles.shape[0]


def test_dense_hotspot_spills_to_residual(rng):
    # a dense clump of tiny triangles in one corner + sparse scene elsewhere:
    # the clump overflows the percentile cap and must spill, staying exact
    n = 600
    c = rng.normal([0.0, 0, 0], 0.05, (n, 3)).astype(np.float32)
    u = rng.normal(size=(n, 3)).astype(np.float32)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.normal(size=(n, 3)).astype(np.float32)
    w -= (w * u).sum(1, keepdims=True) * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    s = 0.02
    verts = np.concatenate([c - s * u, c + s * u, c + s * w])
    tris = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n],
                    1).astype(np.int32)
    far = sphere_mesh(jnp.array([4.0, 0, 0.0]), 0.5, n_lat=6, n_lon=10)
    verts = jnp.concatenate([jnp.asarray(verts), far.vertices])
    tris = jnp.concatenate([jnp.asarray(tris),
                            far.triangles + 3 * n])
    grid = build_grid3d(verts, tris, cap_percentile=90.0)
    assert grid.n_residual > 0  # the clump spilled
    origins = rng.uniform(-1.5, 5.0, (1500, 3)).astype(np.float32)
    dirs = rng.normal(size=(1500, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = cast_rays(jnp.asarray(origins), jnp.asarray(dirs), verts, tris,
                    backend="xla")
    hits = grid_cast(grid, jnp.asarray(origins), jnp.asarray(dirs),
                     ray_tile=512, count_all=True)
    _assert_hits_match(hits, ref, verts, tris)
    np.testing.assert_array_equal(np.asarray(hits.count), np.asarray(ref.count))


def test_cap_overflow_raises():
    verts = jnp.asarray(np.tile(
        np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32), (300, 1)))
    tris = jnp.asarray(np.arange(900, dtype=np.int32).reshape(300, 3))
    with pytest.raises(ValueError):
        build_grid3d(verts, tris, cell_cap=64)


def test_wavefront_matches_grid_cast(rng):
    # random soup + arbitrary ray bundle: the wavefront (cell-major) path
    # must agree with the DDA path exactly, including crossing counts and
    # multi-round resumes (visits smaller than the deepest traversal)
    from pyqsm_tpu.ops.grid3d import grid_cast_wavefront

    ntri = 800
    v0 = rng.uniform(-4, 4, (ntri, 3)).astype(np.float32)
    verts = np.concatenate([
        v0, v0 + rng.normal(0, 0.35, (ntri, 3)).astype(np.float32),
        v0 + rng.normal(0, 0.35, (ntri, 3)).astype(np.float32)])
    tris = np.stack([np.arange(ntri), np.arange(ntri) + ntri,
                     np.arange(ntri) + 2 * ntri], 1).astype(np.int32)
    grid = build_grid3d(jnp.asarray(verts), jnp.asarray(tris))
    origins = rng.uniform(-6, 6, (2048, 3)).astype(np.float32)
    dirs = rng.normal(size=(2048, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    ref = grid_cast(grid, jnp.asarray(origins), jnp.asarray(dirs),
                    count_all=True)
    for visits in (4, 16):
        hits = grid_cast_wavefront(grid, jnp.asarray(origins),
                                   jnp.asarray(dirs), visits=visits,
                                   count_all=True)
        t0 = np.where(np.isfinite(np.asarray(ref.t)), np.asarray(ref.t), -1)
        t1 = np.where(np.isfinite(np.asarray(hits.t)), np.asarray(hits.t), -1)
        np.testing.assert_allclose(t1, t0, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(hits.count),
                                      np.asarray(ref.count))


@pytest.mark.parametrize("tail_fallback", [0, 2048])
def test_wavefront_compaction_matches_grid_cast(rng, tail_fallback):
    """Oracle for the ray-compaction branch (rc > 2048): 8192 rays where
    ~90% retire in round one (fired away from the scene) and a long-corridor
    minority survives several visits-bounded rounds, so the live frontier
    drops under rc//4 and the survivors are front-packed into a smaller
    buffer (8192 -> 2048, padding rows aliasing row 0). Results — t, tri,
    uv-consistency, and count_all crossing counts — must match the DDA
    path exactly through the compaction.

    ``tail_fallback=0`` disables the straggler grid_cast handoff so the
    multi-round RESUME path (carried cell/t state, ``first_round=False``)
    stays oracle-covered; the default exercises the fallback scatter +
    residual exclusion."""
    from pyqsm_tpu.ops.grid3d import grid_cast_wavefront

    # dense triangle wall at the far +x end of a long thin corridor: the
    # corridor rays must traverse ~everything before terminating
    ntri = 500
    yz = rng.uniform(-1.5, 1.5, (ntri, 2)).astype(np.float32)
    v0 = np.concatenate([np.full((ntri, 1), 40.0, np.float32), yz], 1)
    verts = np.concatenate([
        v0,
        v0 + np.array([0.05, 0.4, 0.0], np.float32)
        + rng.normal(0, 0.05, (ntri, 3)).astype(np.float32),
        v0 + np.array([0.05, 0.0, 0.4], np.float32)
        + rng.normal(0, 0.05, (ntri, 3)).astype(np.float32)])
    tris = np.stack([np.arange(ntri), np.arange(ntri) + ntri,
                     np.arange(ntri) + 2 * ntri], 1).astype(np.int32)
    # tiny decoy triangles strewn along the corridor occupy its cells: the
    # proximity-skip map can't jump them, so surviving rays burn a visit per
    # decoy cell and live across many visits=4 rounds (mostly missing the
    # decoys geometrically)
    ndec = 120
    dc = np.stack([rng.uniform(3.0, 38.0, ndec),
                   rng.uniform(-1.2, 1.2, ndec),
                   rng.uniform(-1.2, 1.2, ndec)], 1).astype(np.float32)
    dverts = np.concatenate([
        dc, dc + np.array([0.0, 0.02, 0.0], np.float32),
        dc + np.array([0.0, 0.0, 0.02], np.float32)])
    dtris = (np.stack([np.arange(ndec), np.arange(ndec) + ndec,
                       np.arange(ndec) + 2 * ndec], 1).astype(np.int32)
             + len(verts))
    # a triangle behind the origin so round-1 retirees can also HIT
    near = np.array([[0, -9, -9], [0, 9, -9], [0, 0, 9]], np.float32)
    nt0 = len(verts) + len(dverts)
    verts = np.concatenate([verts, dverts, near])
    tris = np.concatenate(
        [tris, dtris, np.array([[nt0, nt0 + 1, nt0 + 2]], np.int32)])
    grid = build_grid3d(jnp.asarray(verts), jnp.asarray(tris))

    n_rays = 8192
    origins = np.zeros((n_rays, 3), np.float32)
    origins[:, 0] = rng.uniform(0.5, 2.0, n_rays)
    origins[:, 1:] = rng.uniform(-1.0, 1.0, (n_rays, 2))
    dirs = np.zeros((n_rays, 3), np.float32)
    # 90%: straight back through the near wall and out (retire round 1)
    dirs[:, 0] = -1.0
    # 10%: down the corridor toward the far wall, many cells to cross
    far_rows = rng.choice(n_rays, n_rays // 10, replace=False)
    jitter = rng.normal(0, 0.01, (len(far_rows), 2)).astype(np.float32)
    dirs[far_rows, 0] = 1.0
    dirs[far_rows, 1:] = jitter
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    ref = grid_cast(grid, jnp.asarray(origins), jnp.asarray(dirs),
                    count_all=True)
    import contextlib
    import io

    dbg = io.StringIO()
    with contextlib.redirect_stdout(dbg):
        hits = grid_cast_wavefront(grid, jnp.asarray(origins),
                                   jnp.asarray(dirs), visits=4,
                                   count_all=True, debug=True)
    rcs = [int(line.split("rc=")[1].split()[0])
           for line in dbg.getvalue().splitlines() if "rc=" in line]
    assert min(rcs) < 8192, f"compaction never engaged: rc per round {rcs}"
    t0 = np.where(np.isfinite(np.asarray(ref.t)), np.asarray(ref.t), -1)
    t1 = np.where(np.isfinite(np.asarray(hits.t)), np.asarray(hits.t), -1)
    np.testing.assert_allclose(t1, t0, atol=1e-4)
    _assert_hits_match(hits, ref, jnp.asarray(verts), jnp.asarray(tris))
    np.testing.assert_array_equal(np.asarray(hits.count),
                                  np.asarray(ref.count))


def test_chebyshev_dt_matches_scipy():
    """The numpy fallback for the proximity-skip map must match scipy's
    chessboard distance transform wherever both are defined (< saturation)."""
    from scipy.ndimage import distance_transform_cdt

    from pyqsm_tpu.ops.grid3d import _chebyshev_dt

    rng = np.random.default_rng(3)
    occ = rng.random((9, 7, 11)) < 0.08
    occ[4, 3, 5] = True  # guarantee non-empty
    ours = _chebyshev_dt(occ)
    ref = distance_transform_cdt(~occ, metric="chessboard")
    np.testing.assert_array_equal(ours, np.asarray(ref))


def test_teapot_in_stadium_stays_exact(rng):
    """Extreme scale-ratio scene (VERDICT r3 missing #4): a finely-tessellated
    0.5 m object inside a 200 m arena. The uniform grid is sized to the whole
    scene, so the object's triangles pile into a handful of cells — the
    percentile cap + residual spill must absorb them with closest hits and
    crossing counts still EXACT vs the brute oracle (Embree's BVH handles
    this by subdivision; our design contract is graceful-exact, with the
    two-level grid as the perf escalation if measurement demands it)."""
    from pyqsm_tpu.ops.grid3d import grid_cast_wavefront

    teapot = sphere_mesh(jnp.array([3.0, -2.0, 1.0]), 0.25, n_lat=18, n_lon=36)
    # arena: sparse ground plane + two far walls, 200 m extent
    g = 200.0
    verts_a = np.array([
        [-g, -g, 0], [g, -g, 0], [g, g, 0], [-g, g, 0],     # ground
        [-g, -g, 0], [-g, -g, 25], [-g, g, 25], [-g, g, 0],  # west wall
        [g, -g, 0], [g, -g, 25], [g, g, 25], [g, g, 0],      # east wall
    ], np.float32)
    tris_a = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7],
                       [8, 9, 10], [8, 10, 11]], np.int32)
    verts = jnp.concatenate([teapot.vertices, jnp.asarray(verts_a)])
    tris = jnp.concatenate([teapot.triangles,
                            jnp.asarray(tris_a) + teapot.vertices.shape[0]])
    grid = build_grid3d(verts, tris)
    # the object really did overflow into the spill path
    assert grid.n_residual > 0

    # bundle biased at the object (the hard rays) + wide arena rays
    o_obj = rng.uniform([1.0, -4.0, 0.0], [5.0, 0.0, 3.0], (600, 3))
    at = np.array([3.0, -2.0, 1.0]) - o_obj
    d_obj = at + rng.normal(0, 0.15, at.shape)
    o_far = rng.uniform(-g, g, (400, 3)).astype(np.float32)
    o_far[:, 2] = rng.uniform(0, 25, 400)
    d_far = rng.normal(size=(400, 3))
    origins = jnp.asarray(np.concatenate([o_obj, o_far]).astype(np.float32))
    dirs_np = np.concatenate([d_obj, d_far]).astype(np.float32)
    dirs_np /= np.linalg.norm(dirs_np, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs_np)

    ref = cast_rays(origins, dirs, verts, tris, backend="xla")
    hits = grid_cast(grid, origins, dirs, ray_tile=512, count_all=True)
    _assert_hits_match(hits, ref, verts, tris)
    np.testing.assert_array_equal(np.asarray(hits.count), np.asarray(ref.count))

    wf = grid_cast_wavefront(grid, origins, dirs, count_all=True)
    t0 = np.where(np.isfinite(np.asarray(ref.t)), np.asarray(ref.t), -1)
    t1 = np.where(np.isfinite(np.asarray(wf.t)), np.asarray(wf.t), -1)
    np.testing.assert_allclose(t1, t0, rtol=1e-4, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(wf.count), np.asarray(ref.count))


def test_two_level_grid_matches_brute(rng):
    """TwoLevelGrid (VERDICT r3 #10): the spilled hotspot gets its own fine
    grid; merged closest hits + counts must equal the brute oracle, and the
    escalation must actually engage on the teapot-in-stadium scene."""
    from pyqsm_tpu.ops.grid3d import (TwoLevelGrid, build_grid3d_two_level,
                                      two_level_cast)

    teapot = sphere_mesh(jnp.array([3.0, -2.0, 1.0]), 0.25, n_lat=18, n_lon=36)
    g = 200.0
    verts_a = np.array([
        [-g, -g, 0], [g, -g, 0], [g, g, 0], [-g, g, 0],
        [-g, -g, 0], [-g, -g, 25], [-g, g, 25], [-g, g, 0],
        [g, -g, 0], [g, -g, 25], [g, g, 25], [g, g, 0],
    ], np.float32)
    tris_a = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7],
                       [8, 9, 10], [8, 10, 11]], np.int32)
    verts = jnp.concatenate([teapot.vertices, jnp.asarray(verts_a)])
    tris = jnp.concatenate([teapot.triangles,
                            jnp.asarray(tris_a) + teapot.vertices.shape[0]])

    tl = build_grid3d_two_level(verts, tris)
    assert isinstance(tl, TwoLevelGrid)
    # the sub grid is FINE: its cells resolve the 0.5 m object, not the arena
    assert tl.sub.cell < 0.2
    # the hotspot left the brute pass; only oversized spanning triangles
    # (few by nature) may remain on it
    assert tl.primary.n_residual < 8

    o_obj = rng.uniform([1.0, -4.0, 0.0], [5.0, 0.0, 3.0], (400, 3))
    at = np.array([3.0, -2.0, 1.0]) - o_obj
    d_obj = at + rng.normal(0, 0.15, at.shape)
    o_far = rng.uniform(-g, g, (200, 3)).astype(np.float32)
    o_far[:, 2] = rng.uniform(0, 25, 200)
    d_far = rng.normal(size=(200, 3))
    origins = jnp.asarray(np.concatenate([o_obj, o_far]).astype(np.float32))
    dirs_np = np.concatenate([d_obj, d_far]).astype(np.float32)
    dirs_np /= np.linalg.norm(dirs_np, axis=1, keepdims=True)
    dirs = jnp.asarray(dirs_np)

    ref = cast_rays(origins, dirs, verts, tris, backend="xla")
    for wavefront in (False, True):
        hits = two_level_cast(tl, origins, dirs, wavefront=wavefront,
                              count_all=True)
        _assert_hits_match(hits, ref, verts, tris)
        np.testing.assert_array_equal(np.asarray(hits.count),
                                      np.asarray(ref.count))
        # closest-hit mode engages the sub-AABB occlusion cull (rays whose
        # primary hit precedes their sub-grid entry are dropped from the
        # sub walk) — t/tri must still match the brute oracle exactly
        hits_ch = two_level_cast(tl, origins, dirs, wavefront=wavefront,
                                 count_all=False)
        _assert_hits_match(hits_ch, ref, verts, tris)

    # plain scenes stay single-level
    small = sphere_mesh(jnp.array([0.0, 0, 0.0]), 1.0, n_lat=10, n_lon=20)
    assert not isinstance(build_grid3d_two_level(small.vertices,
                                                 small.triangles),
                          TwoLevelGrid)
