import numpy as np
import jax
import jax.numpy as jnp
import pytest
from sklearn.cluster import DBSCAN as SKDBSCAN
from sklearn.metrics import adjusted_rand_score

from pyqsm_tpu.ops.cluster import (
    dbscan, kmeans, kmeans_sweep, silhouette_score, top_clusters,
    largest_cluster_mask, connected_components,
)


def blobs(rng, centers, n_per=150, scale=0.05):
    pts = np.concatenate([rng.normal(c, scale, size=(n_per, 3)) for c in centers])
    return pts.astype(np.float32)


def test_dbscan_matches_sklearn(rng):
    pts = blobs(rng, [[0, 0, 0], [2, 0, 0], [0, 2, 0]])
    mask = jnp.ones(len(pts), bool)
    lab = np.asarray(dbscan(jnp.asarray(pts), mask, eps=0.3, min_samples=10, neighbor_cap=64))
    ref = SKDBSCAN(eps=0.3, min_samples=10).fit_predict(pts)
    # identical partition (incl. noise marks) up to label permutation
    assert adjusted_rand_score(ref, lab) == pytest.approx(1.0)
    assert ((lab == -1) == (ref == -1)).all()


def test_dbscan_noise(rng):
    pts = blobs(rng, [[0, 0, 0]])
    iso = rng.uniform(3, 4, size=(5, 3)).astype(np.float32)  # isolated noise
    allp = np.concatenate([pts, iso])
    lab = np.asarray(dbscan(jnp.asarray(allp), jnp.ones(len(allp), bool),
                            eps=0.3, min_samples=10, neighbor_cap=64))
    assert (lab[-5:] == -1).all()
    assert (lab[:-5] == lab[0]).all() and lab[0] >= 0


def test_dbscan_respects_mask(rng):
    pts = blobs(rng, [[0, 0, 0], [2, 0, 0]])
    mask = np.ones(len(pts), bool)
    mask[150:] = False  # second blob dead
    lab = np.asarray(dbscan(jnp.asarray(pts), jnp.asarray(mask), eps=0.3,
                            min_samples=10, neighbor_cap=64))
    assert (lab[150:] == -1).all()
    assert (lab[:150] >= 0).all()


def test_top_clusters(rng):
    pts = blobs(rng, [[0, 0, 0]], n_per=200)
    pts2 = blobs(rng, [[3, 0, 0]], n_per=50)
    allp = np.concatenate([pts, pts2])
    mask = jnp.ones(len(allp), bool)
    lab = dbscan(jnp.asarray(allp), mask, eps=0.3, min_samples=10, neighbor_cap=64)
    top = np.asarray(top_clusters(lab, 2))
    lab_np = np.asarray(lab)
    assert (lab_np[:200] == top[0]).all()  # biggest first
    assert (lab_np[200:] == top[1]).all()
    _, big_mask = largest_cluster_mask(jnp.asarray(allp), mask, 0.3, 10, 64)
    assert np.asarray(big_mask)[:200].all() and not np.asarray(big_mask)[200:].any()


def test_connected_components_chain():
    # path graph 0-1-2-3 ... 9, plus isolated 10..15
    n, k = 16, 2
    nbr = np.full((n, k), -1, np.int32)
    for i in range(10):
        if i > 0:
            nbr[i, 0] = i - 1
        if i < 9:
            nbr[i, 1] = i + 1
    lab = np.asarray(connected_components(jnp.asarray(nbr), jnp.asarray(nbr >= 0),
                                          jnp.ones(n, bool)))
    assert (lab[:10] == 0).all()
    assert (lab[10:] == np.arange(10, 16)).all()


def test_kmeans_recovers_blobs(rng):
    pts = blobs(rng, [[0, 0, 0], [3, 0, 0], [0, 3, 0]])
    centers, lab = kmeans(jnp.asarray(pts), jnp.ones(len(pts), bool), 3,
                          jax.random.PRNGKey(0))
    lab = np.asarray(lab)
    # each true blob maps to exactly one kmeans cluster
    for b in range(3):
        seg = lab[b * 150:(b + 1) * 150]
        vals, counts = np.unique(seg, return_counts=True)
        assert counts.max() / 150 > 0.99
    c = np.sort(np.asarray(centers), axis=0)
    ref = np.sort(np.array([[0, 0, 0], [3, 0, 0], [0, 3, 0]], np.float32), axis=0)
    np.testing.assert_allclose(c, ref, atol=0.05)


def test_silhouette_matches_sklearn(rng):
    from sklearn.metrics import silhouette_score as sk_sil
    pts = blobs(rng, [[0, 0, 0], [2, 0, 0]], n_per=60)
    lab = np.repeat([0, 1], 60)
    s = float(silhouette_score(jnp.asarray(pts), jnp.asarray(lab.astype(np.int32)),
                               jnp.ones(120, bool)))
    ref = sk_sil(pts, lab)
    assert s == pytest.approx(ref, abs=1e-3)


def test_kmeans_sweep_picks_right_k(rng):
    pts = blobs(rng, [[0, 0, 0], [3, 0, 0], [0, 3, 0]])
    _, _, k, score = kmeans_sweep(jnp.asarray(pts), jnp.ones(len(pts), bool),
                                  jax.random.PRNGKey(1), k_range=(2, 3, 4, 5))
    assert k == 3
    assert score > 0.4
