import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqsm_tpu.ops.sparse import (
    ELLLaplacian, laplacian_matvec, laplacian_rmatvec, normal_matvec,
    normal_diag, pcg,
)
from pyqsm_tpu.ops.laplacian import point_cloud_laplacian
from pyqsm_tpu.ops.graph import boruvka_mst, simplify_degree2
from pyqsm_tpu.models.skeleton import (
    extract_skeleton, extract_topology, skeleton_to_qsm, skeletonize,
    set_amplification,
)
from pyqsm_tpu.config import SkeletonizeConfig
from tests.conftest import synthetic_branch, synthetic_tree


def random_ell(rng, n=50, k=5):
    idx = np.full((n, k), -1, np.int32)
    w = np.zeros((n, k), np.float32)
    for i in range(n):
        nbrs = rng.choice([j for j in range(n) if j != i], k - 1, replace=False)
        idx[i, :k - 1] = nbrs
        w[i, :k - 1] = rng.uniform(0.1, 1.0, k - 1)
    deg = w.sum(1)
    return ELLLaplacian(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(deg),
                        jnp.ones(n))


def dense_L(L):
    n, k = L.nbr_idx.shape
    A = np.diag(np.asarray(L.deg))
    idx, w = np.asarray(L.nbr_idx), np.asarray(L.w)
    for i in range(n):
        for s in range(k):
            if idx[i, s] >= 0:
                A[i, idx[i, s]] -= w[i, s]
    return A


def test_ell_matvecs_match_dense(rng):
    L = random_ell(rng)
    x = rng.normal(size=(50, 3)).astype(np.float32)
    A = dense_L(L)
    np.testing.assert_allclose(np.asarray(laplacian_matvec(L, jnp.asarray(x))),
                               A @ x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(laplacian_rmatvec(L, jnp.asarray(x))),
                               A.T @ x, rtol=1e-4, atol=1e-5)


def test_normal_matvec_and_diag(rng):
    L = random_ell(rng)
    wl = rng.uniform(0.5, 2, 50).astype(np.float32)
    wh = rng.uniform(0.5, 2, 50).astype(np.float32)
    A = dense_L(L)
    N = A.T @ np.diag(wl**2) @ A + np.diag(wh**2)
    x = rng.normal(size=(50, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(normal_matvec(L, jnp.asarray(wl), jnp.asarray(wh), jnp.asarray(x))),
        N @ x, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(normal_diag(L, jnp.asarray(wl), jnp.asarray(wh))),
        np.diag(N), rtol=1e-3, atol=1e-4)


def test_pcg_matches_direct_solve(rng):
    L = random_ell(rng)
    wl = rng.uniform(0.5, 2, 50).astype(np.float32)
    wh = rng.uniform(0.5, 2, 50).astype(np.float32)
    A = dense_L(L)
    N = A.T @ np.diag(wl**2) @ A + np.diag(wh**2)
    b = rng.normal(size=(50, 3)).astype(np.float32)
    x, res = pcg((L, jnp.asarray(wl), jnp.asarray(wh)), jnp.asarray(b),
                 normal_diag(L, jnp.asarray(wl), jnp.asarray(wh)), tol=1e-7)
    ref = np.linalg.solve(N, b)
    assert float(res) < 1e-5
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-2, atol=1e-3)


def test_laplacian_constant_nullspace(rng):
    pts = rng.uniform(0, 1, (300, 3)).astype(np.float32)
    L = point_cloud_laplacian(jnp.asarray(pts), jnp.ones(300, bool), 10)
    ones = jnp.ones((300, 1))
    out = np.asarray(laplacian_matvec(L, ones))
    np.testing.assert_allclose(out, 0.0, atol=1e-4)


def test_boruvka_on_known_graph():
    # 4-node graph, candidate edges as knn-style lists
    pts = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0], [10, 0, 0]], np.float32)
    from pyqsm_tpu.ops.neighbors import knn
    d, idx = knn(jnp.asarray(pts), jnp.asarray(pts), 4)
    d, idx = d[:, 1:], idx[:, 1:]
    eu, ev, sel, comp = boruvka_mst(idx, d, jnp.ones(4, bool))
    eu, ev, sel = np.asarray(eu), np.asarray(ev), np.asarray(sel)
    edges = {tuple(sorted((int(u), int(v)))) for u, v in zip(eu[sel], ev[sel])}
    assert edges == {(0, 1), (1, 2), (2, 3)}
    assert len(np.unique(np.asarray(comp))) == 1


def test_boruvka_weight_is_minimal(rng):
    pts = rng.uniform(0, 1, (60, 3)).astype(np.float32)
    from pyqsm_tpu.ops.neighbors import knn
    from scipy.sparse.csgraph import minimum_spanning_tree
    from scipy.spatial.distance import cdist
    d, idx = knn(jnp.asarray(pts), jnp.asarray(pts), 16)
    d, idx = d[:, 1:], idx[:, 1:]
    eu, ev, sel, comp = boruvka_mst(idx, d, jnp.ones(60, bool))
    sel = np.asarray(sel)
    w = np.linalg.norm(pts[np.asarray(eu)[sel]] - pts[np.asarray(ev)[sel]], axis=1)
    # compare to exact MST over the same kNN graph (dense fallback: full graph)
    full = cdist(pts, pts)
    ref = minimum_spanning_tree(full).sum()
    assert w.sum() == pytest.approx(ref, rel=1e-3)  # k=15 graph contains the MST whp
    assert sel.sum() == 59


def test_simplify_degree2_path():
    # path 0-1-2-3-4: junctions are endpoints (deg 1), chain = {1,2,3}
    eu = jnp.asarray(np.array([0, 1, 2, 3], np.int32))
    ev = jnp.asarray(np.array([1, 2, 3, 4], np.int32))
    g = simplify_degree2(eu, ev, jnp.ones(4, bool), jnp.ones(5, bool))
    m = np.asarray(g.edge_mask)
    u, v = np.asarray(g.edge_u)[m], np.asarray(g.edge_v)[m]
    assert len(u) == 1 and (u[0], v[0]) == (0, 4)
    chain = np.asarray(g.chain_id)
    assert chain[0] == -1 and chain[4] == -1
    assert (chain[1:4] == chain[1]).all() and chain[1] >= 0


def test_simplify_degree2_y_shape():
    # Y: 0-1-2 (junction 2), 2-3-4, 2-5-6 — three chains of one interior node each
    eu = jnp.asarray(np.array([0, 1, 2, 3, 2, 5], np.int32))
    ev = jnp.asarray(np.array([1, 2, 3, 4, 5, 6], np.int32))
    g = simplify_degree2(eu, ev, jnp.ones(6, bool), jnp.ones(7, bool))
    m = np.asarray(g.edge_mask)
    edges = {tuple(sorted((int(a), int(b))))
             for a, b in zip(np.asarray(g.edge_u)[m], np.asarray(g.edge_v)[m])}
    assert edges == {(0, 2), (2, 4), (2, 6)}


def test_set_amplification_tiers():
    assert set_amplification(500, 0.003) == (0.01, 1.0)
    assert set_amplification(50_000, 0.003) == (0.003, 5.0)
    assert set_amplification(600_000, 0.003) == (0.003, 5.0)


@pytest.mark.slow
def test_contraction_collapses_branch():
    pts = synthetic_branch(2000, radius=0.3, length=4.0, seed=1)
    cfg = SkeletonizeConfig(max_iter=10)
    res = extract_skeleton(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg)
    contracted = np.asarray(res.contracted)
    # contracted points should hug the z-axis (the true centerline)
    xy = np.linalg.norm(contracted[:, :2], axis=1)
    assert np.median(xy) < 0.1, f"median radial dist {np.median(xy)}"
    assert int(res.iterations) >= 1
    # shift magnitude ~ cylinder radius for surface points
    cmag = np.linalg.norm(np.asarray(res.total_shift), axis=1)
    assert 0.15 < np.median(cmag) < 0.45


@pytest.mark.slow
def test_full_skeleton_pipeline_on_tree(tree_points):
    pts = tree_points
    cfg = SkeletonizeConfig(max_iter=10)
    skel, topo, cyls = skeletonize(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg)
    n_edges = int(jnp.sum(topo.topology.edge_mask))
    assert n_edges >= 2  # trunk + at least one branch chain
    radii = np.asarray(cyls.radius)[np.asarray(cyls.mask)]
    assert (radii > 0.0).all()
    # trunk radius scale: cylinders near trunk should have radius ~0.25
    assert 0.05 < np.median(radii) < 0.6
    # vertex mapping covers live points
    p2v = np.asarray(topo.topology.point_to_vertex)
    assert (p2v >= 0).all()


def test_transpose_ell_overflow_falls_back_to_exact(rng):
    """In-degrees beyond the kt slots (contracted clouds collapse onto
    junctions) must not silently drop in-edges: the overflow flag routes
    rmatvec through the exact scatter path (ADVICE r1: sparse.py:45)."""
    from pyqsm_tpu.ops.sparse import build_transpose_ell

    n, k = 40, 5
    idx = np.full((n, k), -1, np.int32)
    w = np.zeros((n, k), np.float32)
    # every row points at node 0 -> in-degree(0) = n-1 >> kt
    for i in range(n):
        others = [0] if i != 0 else []
        pool = [j for j in range(1, n) if j != i]
        nbrs = others + list(rng.choice(pool, k - 1 - len(others), replace=False))
        idx[i, :len(nbrs)] = nbrs
        w[i, :len(nbrs)] = rng.uniform(0.1, 1.0, len(nbrs))
    deg = w.sum(1)
    kt = 8
    t_idx, t_w, overflow = build_transpose_ell(jnp.asarray(idx), jnp.asarray(w), kt=kt)
    assert bool(overflow)
    L = ELLLaplacian(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(deg),
                     jnp.ones(n), t_idx=t_idx, t_w=t_w, t_overflow=overflow)
    A = dense_L(L)
    x = rng.normal(size=(n, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(laplacian_rmatvec(L, jnp.asarray(x))),
                               A.T @ x, rtol=1e-4, atol=1e-5)
    # and the no-overflow case still takes the gather path losslessly
    t_idx2, t_w2, ov2 = build_transpose_ell(jnp.asarray(idx), jnp.asarray(w), kt=n)
    assert not bool(ov2)
    L2 = L._replace(t_idx=t_idx2, t_w=t_w2, t_overflow=ov2)
    np.testing.assert_allclose(np.asarray(laplacian_rmatvec(L2, jnp.asarray(x))),
                               A.T @ x, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # 16k-point two-level equality (~1 min CPU); the fast
# default variant is test_extract_skeleton_batch_banded_matches_quality
def test_two_level_contraction_matches_single_level(rng):
    """Coarse->fine contraction must land on the same skeleton attractor as
    the single-level loop: comparable contracted geometry (chamfer) and
    topology cylinder counts."""
    import numpy as np
    from pyqsm_tpu.config import SkeletonizeConfig
    from pyqsm_tpu.models.skeleton import (
        extract_skeleton_batch, extract_topology, skeleton_to_qsm,
    )

    def seg(p0, p1, n, r):
        t = rng.uniform(0, 1, n)[:, None]
        axis = np.asarray(p1, float) - np.asarray(p0, float)
        u = axis / np.linalg.norm(axis)
        c = np.asarray(p0) + t * axis
        d = rng.normal(size=(n, 3))
        d -= (d @ u)[:, None] * u
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return c + d * r

    pts = np.concatenate([
        seg([0, 0, 0], [0, 0, 5], 5000, 0.3),
        seg([0, 0, 5], [1.5, 0, 8], 2500, 0.15),
        seg([0, 0, 5], [-1.2, 0.8, 7.5], 2500, 0.12),
    ]).astype(np.float32)
    cap = 16384  # ≥ 8192*coarse_stride/2: triggers the two-level path
    p = np.zeros((1, cap, 3), np.float32)
    p[0, : len(pts)] = pts
    m = np.zeros((1, cap), bool)
    m[0, : len(pts)] = True
    p, m = jnp.asarray(p), jnp.asarray(m)
    cfg = SkeletonizeConfig()

    one = extract_skeleton_batch(p, m, cfg, two_level=False)
    two = extract_skeleton_batch(p, m, cfg, two_level=True)
    c1 = np.asarray(one.contracted[0])[: len(pts)]
    c2 = np.asarray(two.contracted[0])[: len(pts)]

    # radial-collapse ratchet for the POLISH path (the oracle suite pins
    # the single-level loop at n=2000; this is the only at-scale gate on
    # the two-level polish, whose CG budget is capped at cg_iters/2 —
    # measured p50 0.0070 m with the cap vs 0.0069 m at the full budget
    # on the r=0.3 m trunk, so the cap is quality-neutral here)
    trunk = np.asarray(two.contracted[0])[:5000]
    rad = np.hypot(trunk[:, 0], trunk[:, 1])
    assert np.percentile(rad, 50) < 0.02, np.percentile(rad, 50)
    assert np.percentile(rad, 90) < 0.05, np.percentile(rad, 90)
    # symmetric chamfer: same attractor geometry
    from scipy.spatial import cKDTree

    d12, _ = cKDTree(c1).query(c2, k=1)
    d21, _ = cKDTree(c2).query(c1, k=1)
    assert np.percentile(d12, 90) < 0.35, np.percentile(d12, 90)
    assert np.percentile(d21, 90) < 0.35, np.percentile(d21, 90)

    # same skeleton scale: total MST length within 40% (cylinder COUNT is
    # not comparable — a cleaner contraction fuses noise junctions into
    # longer degree-2 chains, which is closer to the true 3-segment tree)
    t1 = extract_topology(one.contracted[0], m[0], one.total_shift[0])
    t2 = extract_topology(two.contracted[0], m[0], two.total_shift[0])

    def mst_length(t):
        v = np.asarray(t.topology.vertices)
        e = np.asarray(t.topology.edges)
        em = np.asarray(t.topology.edge_mask)
        g = t.graph
        eu = np.asarray(g.edge_u)[em]
        ev = np.asarray(g.edge_v)[em]
        return float(np.linalg.norm(v[eu] - v[ev], axis=1).sum())

    # ground-truth skeleton length: 5 + |(1.5,0,3)| + |(-1.2,0.8,2.5)| ≈ 11.2
    true_len = 5.0 + np.linalg.norm([1.5, 0, 3.0]) + np.linalg.norm(
        [-1.2, 0.8, 2.5])
    l1, l2 = mst_length(t1), mst_length(t2)
    # the two-level skeleton must stay in range of the true length (the
    # single-level one is allowed more zigzag-noise inflation)
    assert 0.6 * true_len < l2 < 1.4 * true_len, (l2, true_len)
    assert 0.6 * true_len < l1 < 2.0 * true_len, (l1, true_len)
    # both produce sane cylinders with positive radii
    q2 = skeleton_to_qsm(t2)
    n2 = int(jnp.sum(q2.mask))
    assert n2 >= 2
    r2 = np.asarray(q2.radius)[np.asarray(q2.mask)]
    assert (r2 > 0.01).all() and (r2 < 1.0).all()
    # exact first_shift: nonzero for live points, zero elsewhere
    f = np.asarray(two.first_shift[0])
    assert np.abs(f[: len(pts)]).max() > 1e-4
    assert np.abs(f[len(pts):]).max() == 0.0


def _banded_from_ell(L, spill_cap):
    from pyqsm_tpu.ops.sparse import build_banded

    b_w, s_i, s_j, s_w, over = build_banded(L.nbr_idx, L.w, spill_cap)
    return L._replace(b_w=b_w, s_i=s_i, s_j=s_j, s_w=s_w, s_overflow=over)


def _random_ell_256(rng, n=512, k=6, local=False):
    idx = np.full((n, k), -1, np.int32)
    w = np.zeros((n, k), np.float32)
    for i in range(n):
        if local:  # neighbors near the diagonal (Morton-like locality)
            lo, hi = max(0, i - 100), min(n, i + 100)
            pool = [j for j in range(lo, hi) if j != i]
        else:
            pool = [j for j in range(n) if j != i]
        nbrs = rng.choice(pool, k - 1, replace=False)
        idx[i, : k - 1] = nbrs
        w[i, : k - 1] = rng.uniform(0.1, 1.0, k - 1)
    deg = w.sum(1)
    return ELLLaplacian(jnp.asarray(idx), jnp.asarray(w), jnp.asarray(deg),
                        jnp.ones(n))


def test_banded_matvecs_match_dense(rng):
    """Block-banded MXU form (local graph, small spill) is exact."""
    L = _random_ell_256(rng, local=True)
    Lb = _banded_from_ell(L, spill_cap=512)
    assert not bool(Lb.s_overflow)
    A = dense_L(L)
    x = rng.normal(size=(512, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(laplacian_matvec(Lb, jnp.asarray(x))), A @ x,
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(laplacian_rmatvec(Lb, jnp.asarray(x))), A.T @ x,
        rtol=1e-4, atol=1e-4)


def test_banded_spill_heavy_and_overflow(rng):
    """Non-local graph: spill list carries far edges exactly. An overflowed
    build FLAGS itself (``s_overflow``) — the matvecs are documented-lossy
    then (no traced cond: under vmap it would run both branches), and the
    host-stepped contraction loop rebuilds before any solve sees it."""
    L = _random_ell_256(rng, n=1024, local=False)
    A = dense_L(L)
    x = rng.normal(size=(1024, 2)).astype(np.float32)
    Lb = _banded_from_ell(L, spill_cap=1024 * 6)  # roomy: exact via spill
    assert not bool(Lb.s_overflow)
    np.testing.assert_allclose(
        np.asarray(laplacian_matvec(Lb, jnp.asarray(x))), A @ x,
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(laplacian_rmatvec(Lb, jnp.asarray(x))), A.T @ x,
        rtol=1e-4, atol=1e-4)
    Lo = _banded_from_ell(L, spill_cap=8)  # forced overflow: flagged lossy
    assert bool(Lo.s_overflow)


def test_banded_guard_rescues_overflow(rng):
    """The host guard re-Mortons + rebuilds on spill overflow; a batch whose
    overflow survives the re-sort drops to the exact ELL path."""
    from pyqsm_tpu.models.skeleton import _banded_guard

    n = 1024  # >= 4 blocks: a non-local graph genuinely spills the window
    pts = jnp.asarray(rng.normal(size=(1, n, 3)).astype(np.float32))
    msk = jnp.ones((1, n), bool)
    zeros2 = jnp.zeros((1, n), jnp.float32)
    zeros3 = jnp.zeros((1, n, 3), jnp.float32)
    L = _random_ell_256(rng, n=n, local=False)
    # fake a flagged-overflow banded L in a [1, ...] batch
    Lb = _banded_from_ell(L, spill_cap=8)
    Lbatch = jax.tree.map(lambda a: a[None], Lb)
    active = jnp.ones(1, bool)
    out = _banded_guard(pts, msk, zeros3, zeros3, zeros2, zeros2, zeros2,
                        Lbatch, None, True, active, 8, 1e-6)
    (pts2, msk2, _, _, _, _, _, L2, cum, banded_now) = out
    # guard acted: a permutation is now tracked, and whatever L came back
    # is safe to solve with (either re-sorted banded w/o overflow, or ELL)
    assert cum is not None
    if banded_now:
        assert not bool(jnp.any(L2.s_overflow))
    else:
        assert L2.b_w is None
    # the tracked permutation is a real permutation of the rows
    assert sorted(np.asarray(cum[0]).tolist()) == list(range(n))


def test_morton_banded_spill_fraction(rng):
    """On a Morton-ordered real tree cloud the spill stays small — the
    banded path (not the fallback) is what actually runs."""
    from pyqsm_tpu.ops.sparse import morton_codes, build_banded
    from pyqsm_tpu.ops.neighbors import knn

    pts = synthetic_tree(n_per=2048)[:4096]
    p = jnp.asarray(pts)
    m = jnp.ones(4096, bool)
    order = jnp.argsort(morton_codes(p, m))
    p = p[order]
    d, idx = knn(p, p, 21, query_mask=m, point_mask=m)
    idx = idx[:, 1:]
    w = jnp.where(idx >= 0, 1.0, 0.0)
    b_w, s_i, s_j, s_w, over = build_banded(idx, w, spill_cap=4 * 4096)
    assert not bool(over)
    spill_edges = int(jnp.sum(s_i < 4096))
    total = int(jnp.sum(idx >= 0))
    # Z-order tail: spill must stay a small fraction (the banded MXU path,
    # not the fallback, is what runs) and within the 4N default cap
    assert spill_edges / total < 0.25, f"spill {spill_edges}/{total}"
    assert spill_edges <= 4 * 4096


def test_extract_skeleton_batch_banded_matches_quality(rng):
    """Morton+banded batch contraction contracts a branch onto its axis the
    same way the single-tree ELL path does."""
    pts = synthetic_branch(2048)
    cap = 2048
    bp = jnp.asarray(pts)[None]
    bm = jnp.ones((1, cap), bool)
    from pyqsm_tpu.models.skeleton import extract_skeleton_batch

    cfg = SkeletonizeConfig(max_iter=8)
    res_b = extract_skeleton_batch(bp, bm, cfg, cg_iters=40, two_level=False)
    res_s = extract_skeleton(jnp.asarray(pts), jnp.ones(cap, bool), cfg,
                             cg_iters=40)
    # same contraction amount (mean |shift|) and same contracted spread
    sb = np.linalg.norm(np.asarray(res_b.total_shift[0]), axis=1).mean()
    ss = np.linalg.norm(np.asarray(res_s.total_shift), axis=1).mean()
    assert abs(sb - ss) / max(ss, 1e-9) < 0.05
    cb = np.asarray(res_b.contracted[0]).std(0)
    cs = np.asarray(res_s.contracted).std(0)
    np.testing.assert_allclose(cb, cs, rtol=0.1, atol=1e-3)


def test_band_transpose_matches_dense(rng):
    """band_transpose(b_w) is the banded form of Wᵀ: rmatvec through the
    precomputed transpose band equals the dense oracle (the route
    point_cloud_laplacian wires for the CG's Lᵀ applies)."""
    from pyqsm_tpu.ops.sparse import band_transpose

    L = _random_ell_256(rng, local=True)
    Lb = _banded_from_ell(L, spill_cap=512)
    assert not bool(Lb.s_overflow)
    Lt = Lb._replace(b_w_t=band_transpose(Lb.b_w))
    A = dense_L(L)
    x = rng.normal(size=(512, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(laplacian_rmatvec(Lt, jnp.asarray(x))), A.T @ x,
        rtol=1e-4, atol=1e-4)
    # the precomputed band alone matches the in-kernel transpose apply
    from pyqsm_tpu.ops.sparse import _band_apply, _band_apply_t

    np.testing.assert_allclose(
        np.asarray(_band_apply(Lt.b_w_t, jnp.asarray(x))),
        np.asarray(_band_apply_t(Lb.b_w, jnp.asarray(x))),
        rtol=1e-4, atol=1e-4)
