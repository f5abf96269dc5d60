"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqsm_tpu.parallel import make_mesh, tree_points_mesh, multi_tree_pipeline_step
from pyqsm_tpu.parallel.mesh import shard_tree_batch
from tests.conftest import synthetic_branch


def test_device_count():
    assert jax.device_count() == 8


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.axis_names == ("points",)
    mesh2 = tree_points_mesh()
    assert mesh2.axis_names == ("trees", "points")
    assert mesh2.devices.shape == (2, 4)


def test_multi_tree_pipeline_step_runs_and_matches_single_device(rng):
    mesh = tree_points_mesh()  # (2, 4)
    t, n = 2, 512
    trees = []
    for i in range(t):
        pts = synthetic_branch(n, radius=0.3, length=3.0, seed=i)
        trees.append(pts)
    batch = jnp.asarray(np.stack(trees))
    mask = jnp.ones((t, n), bool)
    batch = shard_tree_batch(batch, mesh)

    step = multi_tree_pipeline_step(mesh, k=8, n_hyp=64)
    out = step(batch, mask, jax.random.PRNGKey(0))
    # shapes
    assert out["contracted"].shape == (t, n, 3)
    assert out["shift_mag"].shape == (t, n)
    assert out["fit_radius"].shape == (t,)
    assert out["labels"].shape == (t, n)

    radii = np.asarray(out["fit_radius"])
    # RANSAC circle on a 0.3-radius trunk ring
    np.testing.assert_allclose(radii, 0.3, atol=0.05)
    # contraction moved points inward (shift > 0 on average)
    assert float(jnp.mean(out["shift_mag"])) > 1e-4
    # neighbor distances are sane (trunk sampling scale)
    nd = np.asarray(out["nbr_dist_mean"])
    assert 0.0 < nd.mean() < 0.5


def test_ring_knn_matches_local(rng):
    """ring kNN inside shard_map == single-device brute force."""
    from functools import partial
    from jax.sharding import PartitionSpec as P, NamedSharding
    from jax import shard_map
    from pyqsm_tpu.parallel.collective_ops import ring_knn
    from pyqsm_tpu.ops.neighbors import knn

    mesh = make_mesh()  # 8-way points
    n = 1024
    pts = rng.uniform(0, 3, (n, 3)).astype(np.float32)
    mask = np.ones(n, bool)

    fn = shard_map(
        partial(ring_knn, k=6, axis="points"),
        mesh=mesh,
        in_specs=(P("points"), P("points"), P("points")),
        out_specs=(P("points"), P("points")),
        check_vma=False,
    )
    pj = jax.device_put(jnp.asarray(pts), NamedSharding(mesh, P("points")))
    d, idx = jax.jit(fn)(pj, pj, jnp.asarray(mask))
    d_ref, i_ref = knn(jnp.asarray(pts), jnp.asarray(pts), 6)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-3, atol=1e-4)
    # chosen indices give identical distances (ties aside)
    chosen = np.linalg.norm(pts[np.asarray(idx)] - pts[:, None], axis=-1)
    np.testing.assert_allclose(chosen, np.asarray(d_ref), rtol=1e-3, atol=1e-4)


def test_sharded_cast_rays_matches_local(rng):
    from pyqsm_tpu.parallel import make_mesh, sharded_cast_rays
    from pyqsm_tpu.ops.mesh import sphere_mesh
    from pyqsm_tpu.ops.raytrace import cast_rays, pinhole_rays
    import jax.numpy as jnp

    mesh3d = sphere_mesh(jnp.array([0.0, 0, 0]), 1.0, n_lat=8, n_lon=16)
    origins, dirs = pinhole_rays(jnp.array([0.0, 0, 5.0]), jnp.array([0.0, 0, 0]),
                                 jnp.array([0.0, 1, 0]), 60.0, 32, 16)  # 512 rays
    dmesh = make_mesh()
    hits = sharded_cast_rays(dmesh, origins, dirs, mesh3d.vertices, mesh3d.triangles)
    ref = cast_rays(origins, dirs, mesh3d.vertices, mesh3d.triangles)
    np.testing.assert_allclose(
        np.where(np.isfinite(np.asarray(hits.t)), np.asarray(hits.t), -1),
        np.where(np.isfinite(np.asarray(ref.t)), np.asarray(ref.t), -1),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(hits.count), np.asarray(ref.count))


def test_sharded_cg_matches_dense_solve_directed_weights(rng):
    """sharded_cg must solve the exact normal equations of DIRECTED kNN
    weights (ADVICE r1: the old path assumed a symmetric L)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P, NamedSharding
    from jax import shard_map
    from pyqsm_tpu.parallel.collective_ops import sharded_cg

    mesh = make_mesh()  # 8-way 'points'
    n, k = 256, 6
    idx = np.full((n, k), -1, np.int32)
    w = np.zeros((n, k), np.float32)
    for i in range(n):
        nbrs = rng.choice([j for j in range(n) if j != i], k, replace=False)
        idx[i] = nbrs
        w[i] = rng.uniform(0.1, 1.0, k)  # asymmetric by construction
    deg = w.sum(1)
    wl = rng.uniform(0.5, 2.0, n).astype(np.float32)
    wh = rng.uniform(0.5, 2.0, n).astype(np.float32)
    b = rng.normal(size=(n, 3)).astype(np.float32)

    A = np.diag(deg).astype(np.float64)
    for i in range(n):
        for s in range(k):
            A[i, idx[i, s]] -= w[i, s]
    Nmat = A.T @ np.diag(wl.astype(np.float64) ** 2) @ A + np.diag(wh.astype(np.float64) ** 2)
    x_ref = np.linalg.solve(Nmat, b.astype(np.float64))

    fn = shard_map(
        partial(sharded_cg, axis="points", iters=400),
        mesh=mesh,
        in_specs=(P("points"), P("points"), P("points"), P("points"),
                  P("points"), P("points")),
        out_specs=P("points"),
        check_vma=False,
    )
    put = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("points")))
    x = jax.jit(fn)(put(idx), put(w), put(deg), put(wl), put(wh), put(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-2, atol=2e-3)


def test_sharded_grid_cast_matches_single(rng):
    """Accelerated DDA casting sharded over the ray axis equals the
    single-device grid_cast (grid replicated, no collectives)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pyqsm_tpu.ops.grid3d import build_grid3d, grid_cast
    from pyqsm_tpu.ops.mesh import merge_meshes, sphere_mesh, cylinder_mesh
    from pyqsm_tpu.ops.raytrace import pinhole_rays
    from pyqsm_tpu.parallel.raycast import sharded_grid_cast

    mesh3d = merge_meshes([
        sphere_mesh(jnp.array([0.0, 0, 3.0]), 1.0, n_lat=8, n_lon=16),
        cylinder_mesh(jnp.array([0.0, 0, 1.0]), jnp.array([0.0, 0, 1]), 0.3, 2.0),
    ])
    grid = build_grid3d(mesh3d.vertices, mesh3d.triangles)
    center = jnp.mean(mesh3d.vertices, axis=0)
    origins, dirs = pinhole_rays(center + jnp.array([0.0, 0, 8.0]), center,
                                 jnp.array([0.0, 1, 0.0]), 70.0, 64, 64)
    ref = grid_cast(grid, origins, dirs, ray_tile=512, count_all=True)
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    m = Mesh(devs, ("points",))
    got = sharded_grid_cast(m, grid, origins, dirs, ray_tile=512,
                            count_all=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))


def test_sharded_cell_cast_matches_single(rng):
    """Sun-bundle cell casting sharded over the cell axis equals the
    single-device cell_cast_parallel."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pyqsm_tpu.ops.mesh import merge_meshes, sphere_mesh, cylinder_mesh
    from pyqsm_tpu.ops.raygrid import build_ray_grid, cell_cast_parallel
    from pyqsm_tpu.parallel.raycast import sharded_cell_cast

    mesh3d = merge_meshes([
        sphere_mesh(jnp.array([0.0, 0, 3.0]), 1.0, n_lat=8, n_lon=16),
        cylinder_mesh(jnp.array([0.0, 0, 1.0]), jnp.array([0.0, 0, 1]), 0.3, 2.0),
    ])
    d = np.array([0.2, 0.1, -0.97], np.float32)
    d /= np.linalg.norm(d)
    grid = build_ray_grid(mesh3d.vertices, mesh3d.triangles, d, cell_cap=128)
    ref = cell_cast_parallel(grid, d, rays_per_cell_side=2, cell_tile=64,
                             back_dist=50.0)
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    m = Mesh(devs, ("points",))
    got = sharded_cell_cast(m, grid, d, rays_per_cell_side=2, cell_tile=64,
                            back_dist=50.0)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))


def test_sharded_image_cast_matches_single(rng):
    """Pinhole bucket tiles sharded over the mesh equal the single-device
    image_cast (scene replicated)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pyqsm_tpu.ops.mesh import merge_meshes, sphere_mesh, cylinder_mesh
    from pyqsm_tpu.ops.raygrid import build_image_grid, image_cast
    from pyqsm_tpu.parallel.raycast import sharded_image_cast

    mesh3d = merge_meshes([
        sphere_mesh(jnp.array([0.0, 0, 3.0]), 1.0, n_lat=8, n_lon=16),
        cylinder_mesh(jnp.array([0.0, 0, 1.0]), jnp.array([0.0, 0, 1]), 0.3, 2.0),
    ])
    eye = jnp.array([4.0, -5.0, 4.0])
    center = jnp.array([0.0, 0.0, 2.0])
    up = jnp.array([0.0, 0.0, 1.0])
    grid = build_image_grid(mesh3d.vertices, mesh3d.triangles, eye, center,
                            up, 65.0, 96, 72, tile_px=8)
    ref = image_cast(grid)
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    m = Mesh(devs, ("points",))
    got = sharded_image_cast(m, grid)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))


def test_sharded_image_cast_residual_matches_single(rng):
    """Eye-straddling residual triangles (camera INSIDE the scene bounds —
    r4 raised NotImplementedError here) take the sharded brute-merge path
    and still match the single-device image_cast exactly."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from pyqsm_tpu.ops.mesh import merge_meshes, sphere_mesh, cylinder_mesh
    from pyqsm_tpu.ops.raygrid import build_image_grid, image_cast
    from pyqsm_tpu.parallel.raycast import sharded_image_cast

    mesh3d = merge_meshes([
        sphere_mesh(jnp.array([0.0, 0, 3.0]), 1.0, n_lat=8, n_lon=16),
        cylinder_mesh(jnp.array([0.0, 0, 1.0]), jnp.array([0.0, 0, 1]),
                      0.3, 2.0),
        # a big wall BEHIND the eye: its triangles straddle the eye plane
        sphere_mesh(jnp.array([2.5, -2.0, 2.0]), 2.6, n_lat=6, n_lon=10),
    ])
    eye = jnp.array([2.0, -1.2, 2.2])  # inside the big sphere
    center = jnp.array([0.0, 0.0, 2.0])
    up = jnp.array([0.0, 0.0, 1.0])
    grid = build_image_grid(mesh3d.vertices, mesh3d.triangles, eye, center,
                            up, 65.0, 96, 72, tile_px=8)
    assert bool((np.asarray(grid.residual) >= 0).any()), \
        "scene must actually produce eye-straddling residual triangles"
    ref = image_cast(grid)
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    m = Mesh(devs, ("points",))
    got = sharded_image_cast(m, grid)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
    np.testing.assert_array_equal(np.asarray(got.count),
                                  np.asarray(ref.count))


@pytest.mark.parametrize("claim", ["auto", "push", "band"])
def test_sharded_growth_all_claim_modes_match_single(rng, monkeypatch, claim):
    """region_grow_sharded under every PYQSM_CLAIM mode == the single-device
    kernel under the same mode (VERDICT r4 #9: opt-in modes must not rot
    silently). The sharded dispatcher has no push kernel — under
    PYQSM_CLAIM=push it falls back to gather, which must STILL be
    bit-identical to the single-device push path (whose engagement the
    isolation suite asserts via LAST_CLAIM_KERNEL)."""
    monkeypatch.setenv("PYQSM_CLAIM", claim)
    import pyqsm_tpu.models.isolation as iso_mod
    from pyqsm_tpu.models.isolation import region_grow
    from pyqsm_tpu.ops.neighbors import grid_self_radius_knn
    from pyqsm_tpu.ops.sparse import morton_codes
    from pyqsm_tpu.parallel import make_mesh
    from pyqsm_tpu.parallel.growth import region_grow_sharded

    n = 32768
    per = n // 4
    pts = []
    for cx in (0.0, 6.0, 12.0, 18.0):
        th = rng.uniform(0, 2 * np.pi, per)
        z = rng.uniform(0, 5.0, per)
        r = 0.3 + rng.normal(0, 0.01, per)
        pts.append(np.stack([cx + r * np.cos(th), r * np.sin(th), z], 1))
    pts = np.concatenate(pts).astype(np.float32)
    mask = jnp.ones(n, bool)
    order_m = np.asarray(jnp.argsort(morton_codes(jnp.asarray(pts), mask)))
    pts = jnp.asarray(pts[order_m])
    _, nbr_idx = grid_self_radius_knn(pts, radius=0.25, k=12, mask=mask,
                                      sort=False, need_dists=False)
    z = np.asarray(pts[:, 2])
    seeds = np.full(n, -1, np.int32)
    base = z < 0.3
    x = np.asarray(pts[:, 0])
    for cid, (lo, hi) in enumerate([(-3, 3), (3, 9), (9, 15), (15, 21)]):
        rows = np.flatnonzero(base & (x >= lo) & (x < hi))[:50]
        seeds[rows] = cid

    kw = dict(max_cycles=200, min_frontier=3, cluster_cap=16)
    res_sh = region_grow_sharded(nbr_idx, jnp.asarray(seeds), mask,
                                 make_mesh(), **kw)
    # kt_max=256: the dense trunk-ring graph's max in-degree exceeds the
    # default push cap of 128 (which would silently fall back to gather and
    # void the engagement assert below)
    res_1d = region_grow(nbr_idx, jnp.asarray(seeds), mask, **kw,
                         kt_max=256)
    if claim in ("push", "band"):
        assert iso_mod.LAST_CLAIM_KERNEL == claim  # single-device engaged
    assert (np.asarray(res_sh.labels) >= 0).sum() > n // 2  # real growth
    np.testing.assert_array_equal(np.asarray(res_sh.labels),
                                  np.asarray(res_1d.labels))
    np.testing.assert_array_equal(np.asarray(res_sh.order),
                                  np.asarray(res_1d.order))
    np.testing.assert_array_equal(np.asarray(res_sh.active),
                                  np.asarray(res_1d.active))
    assert int(res_sh.cycles_run) == int(res_1d.cycles_run)


def test_sharded_banded_growth_matches_gather_and_single_device(rng,
                                                                monkeypatch):
    """At banded scale (n >= 32768, 256-aligned shard rows, few cluster
    ids) region_grow_sharded routes through the per-shard banded claim;
    labels/order/retirement must be IDENTICAL to both the gather-based
    sharded path and the single-device region_grow. (Band forced on — it is
    opt-in after the v5e measurement showed it slower than gather.)"""
    monkeypatch.setenv("PYQSM_CLAIM", "band")
    from pyqsm_tpu.models.isolation import region_grow
    from pyqsm_tpu.ops.neighbors import grid_self_radius_knn
    from pyqsm_tpu.ops.sparse import morton_codes
    from pyqsm_tpu.parallel import make_mesh
    from pyqsm_tpu.parallel import growth as growth_mod
    from pyqsm_tpu.parallel.growth import region_grow_sharded

    n = 32768
    per = n // 4
    pts = []
    for cx in (0.0, 6.0, 12.0, 18.0):
        th = rng.uniform(0, 2 * np.pi, per)
        z = rng.uniform(0, 5.0, per)
        r = 0.3 + rng.normal(0, 0.01, per)
        pts.append(np.stack([cx + r * np.cos(th), r * np.sin(th), z], 1))
    pts = np.concatenate(pts).astype(np.float32)
    mask = jnp.ones(n, bool)
    order_m = np.asarray(jnp.argsort(morton_codes(jnp.asarray(pts), mask)))
    pts = jnp.asarray(pts[order_m])

    _, nbr_idx = grid_self_radius_knn(pts, radius=0.25, k=12, mask=mask,
                                      sort=False, need_dists=False)
    z = np.asarray(pts[:, 2])
    seeds = np.full(n, -1, np.int32)
    base = z < 0.3
    x = np.asarray(pts[:, 0])
    for cid, (lo, hi) in enumerate([(-3, 3), (3, 9), (9, 15), (15, 21)]):
        rows = np.flatnonzero(base & (x >= lo) & (x < hi))[:50]
        seeds[rows] = cid

    mesh = make_mesh()
    kw = dict(max_cycles=200, min_frontier=3, cluster_cap=16)
    res_band = region_grow_sharded(nbr_idx, jnp.asarray(seeds), mask, mesh,
                                   **kw)

    # force the gather path by monkeypatching the band gate off
    orig = growth_mod._claim_band_shards
    try:
        growth_mod._claim_band_shards = lambda *a, **k: (None,) * 4 + (
            jnp.asarray(True),)
        res_gather = region_grow_sharded(nbr_idx, jnp.asarray(seeds), mask,
                                         mesh, **kw)
    finally:
        growth_mod._claim_band_shards = orig

    res_single = region_grow(nbr_idx, jnp.asarray(seeds), mask,
                             max_cycles=200, min_frontier=3, cluster_cap=16)

    lb, lg, ls = (np.asarray(r.labels) for r in
                  (res_band, res_gather, res_single))
    assert (np.asarray(res_band.labels) >= 0).sum() > n // 2  # real growth
    np.testing.assert_array_equal(lb, lg)
    np.testing.assert_array_equal(lb, ls)
    np.testing.assert_array_equal(np.asarray(res_band.order),
                                  np.asarray(res_gather.order))
    np.testing.assert_array_equal(np.asarray(res_band.active),
                                  np.asarray(res_gather.active))
