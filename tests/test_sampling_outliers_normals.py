import numpy as np
import jax.numpy as jnp

from pyqsm_tpu.ops.sampling import voxel_downsample, uniform_downsample, farthest_point_sampling
from pyqsm_tpu.ops.outliers import statistical_outlier_mask, clean_cloud
from pyqsm_tpu.ops.normals import estimate_normals, angle_to_horizontal, filter_by_norm
from pyqsm_tpu.ops.linalg3 import sym_eig3, sym_eigvals3


def test_voxel_downsample_counts(rng):
    pts = rng.uniform(0, 2, size=(5000, 3)).astype(np.float32)
    rep_pts, rep_mask, trace = voxel_downsample(jnp.asarray(pts), 0.25)
    rep_mask = np.asarray(rep_mask)
    # number of representatives == number of occupied voxels
    vox = np.floor(pts / 0.25 - np.floor(pts.min(0) / 0.25 + 1e-7)).astype(int)
    vox = np.floor((pts - pts.min(0)) / 0.25).astype(int)
    n_vox = len(np.unique(vox, axis=0))
    assert rep_mask.sum() == n_vox
    # trace points at live representative rows
    trace = np.asarray(trace)
    assert (trace >= 0).all()
    assert rep_mask[trace].all()
    # representative is centroid of its voxel: mean error small
    rep_of_point = np.asarray(rep_pts)[trace]
    assert np.abs(rep_of_point - pts).max() < 0.25 * np.sqrt(3)


def test_voxel_downsample_respects_mask(rng):
    pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, bool); mask[:50] = True
    _, rep_mask, trace = voxel_downsample(jnp.asarray(pts), 0.05, jnp.asarray(mask))
    assert not np.asarray(rep_mask)[50:].any()
    assert (np.asarray(trace)[50:] == -1).all()


def test_uniform_downsample():
    mask = jnp.ones(100, bool)
    m = np.asarray(uniform_downsample(mask, 5))
    assert m.sum() == 20
    assert m[0] and not m[1]


def test_fps_spreads(rng):
    pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 32))
    assert len(np.unique(idx)) == 32
    # FPS min pairwise distance should beat random choice substantially
    sel = pts[idx]
    d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    rnd = pts[rng.choice(500, 32, replace=False)]
    dr = np.linalg.norm(rnd[:, None] - rnd[None], axis=-1)
    np.fill_diagonal(dr, np.inf)
    assert d.min() > dr.min()


def test_outlier_removal(rng):
    pts = rng.normal(0, 0.1, size=(1000, 3)).astype(np.float32)
    pts[:10] += 5.0  # gross outliers
    mask = statistical_outlier_mask(jnp.asarray(pts), jnp.ones(1000, bool),
                                    nb_neighbors=16, std_ratio=2.0)
    mask = np.asarray(mask)
    assert not mask[:10].any()
    assert mask[10:].mean() > 0.9


def test_clean_cloud_runs(rng):
    pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
    p, m, t = clean_cloud(jnp.asarray(pts), jnp.ones(2000, bool), voxel_size=0.05)
    assert np.asarray(m).sum() > 100


def test_sym_eig3_matches_numpy(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A + np.transpose(A, (0, 2, 1))
    vals, vecs = sym_eig3(jnp.asarray(A))
    vals, vecs = np.asarray(vals), np.asarray(vecs)
    ref = np.linalg.eigvalsh(A)
    np.testing.assert_allclose(vals, ref, rtol=1e-3, atol=1e-3)
    # eigenvector property  A v = lambda v
    for j in range(3):
        Av = np.einsum("nij,nj->ni", A, vecs[:, :, j])
        lv = vals[:, j:j + 1] * vecs[:, :, j]
        np.testing.assert_allclose(Av, lv, atol=5e-3)


def test_normals_on_plane(rng):
    # points on z=0 plane -> normals ±z, aligned consistently
    pts = np.concatenate([rng.uniform(0, 1, size=(800, 2)),
                          np.zeros((800, 1))], axis=1).astype(np.float32)
    n = np.asarray(estimate_normals(jnp.asarray(pts), jnp.ones(800, bool), k=12))
    assert np.abs(n[:, 2]).min() > 0.99
    assert (n[:, 2] > 0).all() or (n[:, 2] < 0).all()


def test_stem_filter_on_cylinder(cylinder_points):
    pts = cylinder_points  # vertical cylinder: normals ~horizontal
    mask = jnp.ones(len(pts), bool)
    n = estimate_normals(jnp.asarray(pts), mask, k=16)
    ang = np.asarray(angle_to_horizontal(n))
    assert np.median(ang) < 15
    kept = np.asarray(filter_by_norm(n, mask, angle_cutoff=20.0))
    assert kept.mean() > 0.8


def test_voxel_batch_kernels_match_single(rng):
    """voxel_count_batch / voxel_downsample_batch (per-tree traced voxel
    sizes) agree with the static-voxel single-tree kernel."""
    from pyqsm_tpu.ops.sampling import (
        compact_rows_batch, voxel_count_batch, voxel_downsample_batch,
    )

    t, p = 3, 2000
    pts = rng.uniform(0, 4, size=(t, p, 3)).astype(np.float32)
    masks = rng.uniform(size=(t, p)) < 0.8
    sizes = np.array([0.2, 0.35, 0.5], np.float32)
    counts = np.asarray(voxel_count_batch(
        jnp.asarray(pts), jnp.asarray(sizes), jnp.asarray(masks)))
    bp, bm, _ = voxel_downsample_batch(
        jnp.asarray(pts), jnp.asarray(sizes), jnp.asarray(masks))
    cp, cm = compact_rows_batch(bp, bm)
    cp, cm = np.asarray(cp), np.asarray(cm)
    for i in range(t):
        rp, rm, _ = voxel_downsample(
            jnp.asarray(pts[i]), float(sizes[i]), jnp.asarray(masks[i]))
        rm = np.asarray(rm)
        assert counts[i] == rm.sum()
        assert np.asarray(bm)[i].sum() == rm.sum()
        # batched reps equal the single-tree reps (as sets of centroids)
        a = np.sort(np.asarray(rp)[rm], axis=0)
        b = np.sort(cp[i][cm[i]], axis=0)
        np.testing.assert_allclose(a, b, atol=1e-5)
        # compaction is front-packed
        k = cm[i].sum()
        assert cm[i][:k].all() and not cm[i][k:].any()


def test_compact_rows_band_alignment(rng):
    """The banded paths (sparse.BAND_BLOCK=256 blocking; region_grow's
    use_band gate requires n % 256 == 0) rely on compact_rows padding to a
    256-multiple capacity. Guard the invariant: pad_multiple default stays
    a multiple of BAND_BLOCK and rows map back exactly."""
    import jax.numpy as jnp
    from pyqsm_tpu.ops.sampling import compact_rows
    from pyqsm_tpu.ops.sparse import BAND_BLOCK

    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    mask = rng.uniform(size=5000) < 0.37
    out, m2, rows = compact_rows(jnp.asarray(pts), jnp.asarray(mask))
    assert out.shape[0] % BAND_BLOCK == 0, out.shape
    n_live = int(mask.sum())
    assert int(m2.sum()) == n_live
    r = np.asarray(rows)[:n_live]
    np.testing.assert_array_equal(np.asarray(out)[:n_live], pts[r])
    assert (np.asarray(rows)[n_live:] == -1).all()


def test_label_segments_matches_numpy_unique(rng):
    """Device-side unique+counts+row-gather (the plot pipeline's ladder prep,
    which replaced a 40 MB label download + ~100 MB index upload) must match
    np.unique / np.flatnonzero exactly."""
    from pyqsm_tpu.ops.sampling import label_segments, rows_for_labels

    labels = rng.integers(-1, 12, size=3001).astype(np.int32)
    labels[rng.uniform(size=3001) < 0.3] = -1
    order, slab, vals, counts, n_uniq = label_segments(
        jnp.asarray(labels), u_cap=64)
    uniq_np, counts_np = np.unique(labels[labels >= 0], return_counts=True)
    assert int(n_uniq) == len(uniq_np)
    np.testing.assert_array_equal(np.asarray(vals)[: len(uniq_np)], uniq_np)
    np.testing.assert_array_equal(np.asarray(counts)[: len(uniq_np)], counts_np)
    assert (np.asarray(vals)[len(uniq_np):] == -1).all()

    kept = uniq_np[counts_np >= 100]
    cap = int(counts_np.max()) + 7
    idx = np.asarray(rows_for_labels(order, slab, jnp.asarray(kept), cap))
    for i, t in enumerate(kept):
        rows = np.flatnonzero(labels == t)
        np.testing.assert_array_equal(idx[i, : len(rows)], rows)
        assert (idx[i, len(rows):] == -1).all()
