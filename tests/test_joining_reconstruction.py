import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.models.joining import (
    label_adjacency, auto_join_policy, join_clusters, rate_clusters,
    merge_labeled_scans,
)
from pyqsm_tpu.models.reconstruction import (
    recover_by_trace, recover_details, voxel_overlap_mask, transfer_attributes,
)
from pyqsm_tpu.ops.sampling import voxel_downsample


def three_clusters(rng):
    a = rng.normal([0, 0, 0], 0.1, (200, 3))
    b = rng.normal([0.5, 0, 0], 0.1, (200, 3))  # near a -> adjacent
    c = rng.normal([10, 0, 0], 0.1, (200, 3))  # far
    pts = np.concatenate([a, b, c]).astype(np.float32)
    labels = np.repeat([0, 1, 2], 200).astype(np.int32)
    return pts, labels


def test_adjacency_and_join(rng):
    pts, labels = three_clusters(rng)
    mask = jnp.ones(len(pts), bool)
    adj = label_adjacency(jnp.asarray(pts), jnp.asarray(labels), mask,
                          threshold=0.35, subsample_every=2)
    a = np.asarray(adj.adjacent)
    d = np.asarray(adj.min_dist)
    assert a[0, 1] and a[1, 0]
    assert not a[0, 2] and not a[1, 2]
    # far pairs may be inf (beyond nearest-other-cluster) — same sparsity as
    # the reference's thresholded sparse_distance_matrix
    assert d[0, 2] > 5 or np.isinf(d[0, 2])
    joins = auto_join_policy(adj)
    assert joins == [(0, 1)]
    new = np.asarray(join_clusters(jnp.asarray(labels), joins))
    assert (new[:400] == new[0]).all()
    assert new[400] != new[0]
    assert set(np.unique(new)) == {0, 1}


def test_rate_clusters(rng):
    tall = rng.uniform(0, 1, (300, 3)) * [0.5, 0.5, 5]
    flat = rng.uniform(0, 1, (300, 3)) * [3, 3, 0.5] + [10, 0, 0]
    tiny = rng.uniform(0, 1, (10, 3)) + [20, 0, 0]
    pts = np.concatenate([tall, flat, tiny]).astype(np.float32)
    labels = np.concatenate([np.zeros(300), np.ones(300), np.full(10, 2)]).astype(np.int32)
    r = rate_clusters(jnp.asarray(pts), jnp.asarray(labels), jnp.ones(len(pts), bool))
    assert r.rating == {0: "g", 1: "b", 2: "s"}


def test_merge_labeled_scans(rng):
    # scan A has cluster at x=0; scan B has a cluster overlapping it + one far
    a_pts = rng.normal([0, 0, 0], 0.1, (200, 3)).astype(np.float32)
    b_pts = np.concatenate([
        rng.normal([0.1, 0, 0], 0.1, (200, 3)),
        rng.normal([15, 0, 0], 0.1, (200, 3)),
    ]).astype(np.float32)
    a_lab = np.zeros(200, np.int32)
    b_lab = np.concatenate([np.zeros(200), np.ones(200)]).astype(np.int32)
    pts, labels, mask = merge_labeled_scans(
        [jnp.asarray(a_pts), jnp.asarray(b_pts)],
        [jnp.asarray(a_lab), jnp.asarray(b_lab)],
        [jnp.ones(200, bool), jnp.ones(400, bool)],
    )
    lab = np.asarray(labels)
    assert lab[0] == lab[250]  # overlapping clusters joined across scans
    assert lab[0] != lab[-1]
    assert len(np.unique(lab[lab >= 0])) == 2


def test_recover_by_trace(rng):
    pts = rng.uniform(0, 2, (3000, 3)).astype(np.float32)
    rep_pts, rep_mask, trace = voxel_downsample(jnp.asarray(pts), 0.2)
    # select coarse points with x < 1 -> recover all full-res points in those voxels
    coarse_sel = rep_mask & (rep_pts[:, 0] < 1.0)
    full = np.asarray(recover_by_trace(coarse_sel, trace, jnp.ones(3000, bool)))
    # recovered points' representatives are selected; others' are not
    tr = np.asarray(trace)
    cs = np.asarray(coarse_sel)
    np.testing.assert_array_equal(full, cs[tr])
    assert 0 < full.sum() < 3000


def test_recover_details_knn(rng):
    full = rng.uniform(0, 1, (2000, 3)).astype(np.float32)
    coarse = full[::10]  # coarse = every 10th point
    sel = np.zeros(200, bool)
    sel[:100] = True  # select coarse points (first half)
    rec = np.asarray(recover_details(jnp.asarray(coarse), jnp.asarray(sel),
                                     jnp.asarray(full), jnp.ones(2000, bool),
                                     radius=0.08, k=8))
    # every selected coarse point recovers at least itself
    assert rec[::10][:100].all()
    assert rec.sum() < 2000


def test_voxel_overlap(rng):
    occ = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    inside = occ[:50] + 0.01  # same voxels
    outside = rng.uniform(5, 6, (50, 3)).astype(np.float32)
    q = np.concatenate([inside, outside])
    m = np.asarray(voxel_overlap_mask(jnp.asarray(q), jnp.ones(100, bool),
                                      jnp.asarray(occ), jnp.ones(500, bool),
                                      voxel=0.2))
    assert m[:50].mean() > 0.9
    assert not m[50:].any()


def test_transfer_attributes(rng):
    src = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    vals = src[:, 0].astype(np.float32)
    dst = src + rng.normal(0, 0.002, src.shape).astype(np.float32)
    far = rng.uniform(10, 11, (20, 3)).astype(np.float32)
    dst_all = np.concatenate([dst, far])
    out, matched = transfer_attributes(jnp.asarray(src), jnp.asarray(vals),
                                       jnp.ones(300, bool), jnp.asarray(dst_all),
                                       jnp.ones(320, bool), radius=0.05)
    matched = np.asarray(matched)
    assert matched[:300].all() and not matched[300:].any()
    np.testing.assert_allclose(np.asarray(out)[:300], vals, atol=0.02)


def test_label_adjacency_not_shadowed_by_closer_third_cluster(rng):
    """ADVICE r1 (joining.py:58): a pair within threshold must be reported
    adjacent even when a third cluster is closer to every boundary point of
    both (the old single-nearest-neighbor reduction missed such joins)."""
    from pyqsm_tpu.models.joining import label_adjacency

    n = 120
    # A and B are 0.3 apart (<= 0.35); C sits 0.05 from both
    a = np.stack([rng.uniform(-0.5, 0.0, n), rng.uniform(0, 2, n),
                  np.zeros(n)], 1)
    a[:, 0] = np.minimum(a[:, 0], -0.001)
    b = a.copy(); b[:, 0] = -a[:, 0] + 0.30  # mirror at x=0.30..0.80
    c = np.stack([np.full(n, 0.15), rng.uniform(0, 2, n),
                  np.full(n, 0.02)], 1)
    pts = jnp.asarray(np.concatenate([a, b, c]).astype(np.float32))
    labels = jnp.asarray(np.repeat([0, 1, 2], n).astype(np.int32))
    mask = jnp.ones(3 * n, bool)
    adj = label_adjacency(pts, labels, mask, threshold=0.35, subsample_every=1)
    am = np.asarray(adj.adjacent)
    assert am[0, 1] and am[1, 0], "A-B adjacency shadowed by closer cluster C"
    assert am[0, 2] and am[1, 2]
    # and reported min distances are the true gaps
    d = np.asarray(adj.min_dist)
    assert abs(d[0, 2] - np.sqrt(0.15**2 + 0.02**2)) < 0.05
