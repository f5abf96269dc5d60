"""Neighbor engine vs scipy cKDTree oracles (SURVEY.md §4 test strategy)."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

import jax.numpy as jnp

from pyqsm_tpu.ops.neighbors import (
    build_grid,
    grid_radius_knn,
    knn,
    max_cell_occupancy,
    radius_count,
    radius_knn,
    recommend_cell_cap,
)


@pytest.fixture
def cloud(rng):
    return rng.uniform(0, 5, size=(3000, 3)).astype(np.float32)


def test_knn_matches_scipy(cloud, rng):
    queries = rng.uniform(0, 5, size=(500, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(queries), jnp.asarray(cloud), k=8)
    tree = cKDTree(cloud)
    d_ref, i_ref = tree.query(queries, k=8)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=2e-3, atol=1e-4)
    # indices can differ on exact ties; compare distances of chosen idx instead
    chosen = np.linalg.norm(cloud[np.asarray(i)] - queries[:, None], axis=-1)
    np.testing.assert_allclose(chosen, d_ref, rtol=2e-3, atol=1e-4)


def test_knn_respects_point_mask(cloud):
    mask = np.ones(len(cloud), bool)
    mask[::2] = False
    d, i = knn(jnp.asarray(cloud[:100]), jnp.asarray(cloud), k=4,
               point_mask=jnp.asarray(mask))
    i = np.asarray(i)
    assert (i % 2 == 1).all()  # only odd (live) indices returned


def test_radius_knn_upper_bound(cloud, rng):
    queries = rng.uniform(0, 5, size=(200, 3)).astype(np.float32)
    r = 0.35
    d, i = radius_knn(jnp.asarray(queries), jnp.asarray(cloud), radius=r, k=16)
    d, i = np.asarray(d), np.asarray(i)
    tree = cKDTree(cloud)
    d_ref, i_ref = tree.query(queries, k=16, distance_upper_bound=r)
    valid = np.isfinite(d)
    valid_ref = np.isfinite(d_ref)
    np.testing.assert_array_equal(valid, valid_ref)
    np.testing.assert_allclose(d[valid], d_ref[valid_ref], rtol=2e-3, atol=1e-4)
    assert (i[~valid] == -1).all()


def test_radius_count(cloud, rng):
    queries = rng.uniform(0, 5, size=(100, 3)).astype(np.float32)
    r = 0.5
    c = np.asarray(radius_count(jnp.asarray(queries), jnp.asarray(cloud), radius=r))
    tree = cKDTree(cloud)
    ref = np.array([len(tree.query_ball_point(q, r)) for q in queries])
    np.testing.assert_array_equal(c, ref)


def test_grid_radius_knn_matches_bruteforce(cloud, rng):
    queries = rng.uniform(0, 5, size=(300, 3)).astype(np.float32)
    r = 0.3
    index = build_grid(jnp.asarray(cloud), cell_size=r)
    cap = recommend_cell_cap(index)
    assert int(max_cell_occupancy(index)) <= cap
    dg, ig = grid_radius_knn(index, jnp.asarray(queries), radius=r, k=12, cell_cap=cap)
    db, ib = radius_knn(jnp.asarray(queries), jnp.asarray(cloud), radius=r, k=12)
    dg, db = np.asarray(dg), np.asarray(db)
    np.testing.assert_allclose(
        np.where(np.isfinite(dg), dg, -1), np.where(np.isfinite(db), db, -1),
        rtol=2e-3, atol=1e-4,
    )


def test_grid_handles_mask(cloud):
    mask = np.ones(len(cloud), bool)
    mask[1000:] = False
    index = build_grid(jnp.asarray(cloud), cell_size=0.4, mask=jnp.asarray(mask))
    d, i = grid_radius_knn(index, jnp.asarray(cloud[:50]), radius=0.4, k=8, cell_cap=64)
    i = np.asarray(i)
    assert i.max() < 1000


def test_knn_self_query_excludes_self_with_k_plus_1(cloud):
    d, i = knn(jnp.asarray(cloud[:64]), jnp.asarray(cloud), k=2)
    assert (np.asarray(i)[:, 0] == np.arange(64)).all()
    assert np.allclose(np.asarray(d)[:, 0], 0, atol=1e-5)


def test_grid_self_radius_any_k_matches_bruteforce_sets(cloud):
    """Unsorted any-k: the neighbor SET must equal brute force whenever a
    point has <= k in-radius neighbors (with k >= max degree it is exact)."""
    from pyqsm_tpu.ops.neighbors import grid_self_radius_knn

    pts = jnp.asarray(cloud[:800])
    r = 0.35
    db, ib = radius_knn(pts, pts, radius=r, k=64)
    ib = np.asarray(ib)
    da, ia = grid_self_radius_knn(pts, radius=r, k=64, sort=False)
    ia, da = np.asarray(ia), np.asarray(da)
    for row in range(0, 800, 37):
        want = set(ib[row][ib[row] >= 0])
        got = set(ia[row][ia[row] >= 0])
        assert got == want, f"row {row}: {got ^ want}"
    # distances consistent with indices
    live = ia >= 0
    d_check = np.linalg.norm(
        cloud[:800][np.maximum(ia, 0)] - cloud[:800][:, None, :], axis=-1)
    np.testing.assert_allclose(da[live], d_check[live], rtol=2e-3, atol=1e-4)


def test_grid_self_radius_any_k_respects_mask(cloud):
    from pyqsm_tpu.ops.neighbors import grid_self_radius_knn

    mask = np.ones(800, bool)
    mask[400:] = False
    d, i = grid_self_radius_knn(
        jnp.asarray(cloud[:800]), radius=0.3, k=16,
        mask=jnp.asarray(mask), sort=False)
    i = np.asarray(i)
    assert i.max() < 400
    assert (i[400:] == -1).all()


def test_grid_radius_any_k_cross_cloud_vs_ckdtree(cloud, rng):
    """grid_radius_any_k: up-to-k UNSORTED in-radius neighbors for external
    query points against a built grid index (the cross-cloud radius-graph
    primitive, ref lib_integration.py:81-137 ball search)."""
    from pyqsm_tpu.ops.neighbors import build_grid, grid_radius_any_k

    r = 0.3
    queries = rng.uniform(0, 5, size=(400, 3)).astype(np.float32)
    index = build_grid(jnp.asarray(cloud), cell_size=r)
    d, i = grid_radius_any_k(index, jnp.asarray(queries), radius=r, k=64)
    i, d = np.asarray(i), np.asarray(d)
    tree = cKDTree(cloud)
    want_all = tree.query_ball_point(queries, r)
    for row in range(0, 400, 17):
        got = set(i[row][i[row] >= 0])
        want = set(want_all[row])
        # k=64 cap: if the row saturated, got must be a subset; else equal
        if (i[row] >= 0).sum() < 64:
            assert got == want, f"row {row}: {got ^ want}"
        else:
            assert got <= want
    live = i >= 0
    d_check = np.linalg.norm(
        cloud[np.maximum(i, 0)] - queries[:, None, :], axis=-1)
    np.testing.assert_allclose(d[live], d_check[live], rtol=2e-3, atol=1e-4)
    assert (d[live] <= r + 1e-5).all()


def test_grid_radius_any_k_radius_gate(cloud):
    from pyqsm_tpu.ops.neighbors import build_grid, grid_radius_any_k

    index = build_grid(jnp.asarray(cloud), cell_size=0.2)
    with pytest.raises(ValueError):
        grid_radius_any_k(index, jnp.asarray(cloud[:8]), radius=0.5, k=8)
