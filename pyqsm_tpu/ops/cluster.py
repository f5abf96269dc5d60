"""Clustering kernels: DBSCAN, connected components, k-means.

Replaces Open3D ``cluster_dbscan`` / sklearn ``DBSCAN``
(``point_cloud_processing.py:185``, ``fit.py:223``), sklearn ``KMeans`` with
silhouette sweep (``fit.py:168-214``), and the connected-component uses of
rustworkx (``qsm_generation.py:526-556``).

DBSCAN = radius graph (capped neighbor lists from the neighbor engine) +
parallel connected components over core-core edges, via iterated min-label
propagation with pointer jumping — O(log diameter) rounds, fully on device.
Semantics match sklearn: ``min_samples`` counts the point itself; border
points adopt the cluster of some core neighbor; noise = -1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.neighbors import radius_knn

Array = jax.Array
_BIG = jnp.int32(2**30)


@partial(jax.jit, static_argnames=("max_rounds",))
def propagate_min_labels(
    labels: Array,  # [N] i32, _BIG for non-participants
    nbr_idx: Array,  # [N, k] i32, -1 padding
    edge_valid: Array,  # [N, k] bool — usable edges
    node_active: Array,  # [N] bool — nodes that propagate (e.g. core points)
    max_rounds: int = 64,
) -> Array:
    """Connected components by min-label diffusion + pointer jumping.

    ``labels`` must start as unique ids (e.g. row index) on active nodes.
    Only active nodes exchange labels; returns converged labels.
    """
    n = labels.shape[0]
    gidx = jnp.maximum(nbr_idx, 0)

    def cond(state):
        labels, changed, it = state
        return changed & (it < max_rounds)

    def body(state):
        labels, _, it = state
        nbr_lab = labels[gidx]  # [N, k]
        nbr_lab = jnp.where(edge_valid, nbr_lab, _BIG)
        best = jnp.minimum(jnp.min(nbr_lab, axis=1), labels)
        new = jnp.where(node_active, best, labels)
        # pointer jumping: labels index rows, so chase twice
        safe = jnp.clip(new, 0, n - 1)
        jumped = jnp.where(new < _BIG, jnp.minimum(new, labels[safe]), new)
        safe2 = jnp.clip(jumped, 0, n - 1)
        jumped = jnp.where(jumped < _BIG, jnp.minimum(jumped, labels[safe2]), jumped)
        changed = jnp.any(jumped != labels)
        return jumped, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.array(True), jnp.int32(0))
    )
    return labels


@partial(jax.jit, static_argnames=("max_rounds",))
def connected_components(
    nbr_idx: Array, edge_valid: Array, node_mask: Array, max_rounds: int = 64
) -> Array:
    """Labels [N] i32 for an undirected graph given as capped neighbor lists.
    Dead nodes get -1. Labels are the min row index of each component."""
    n = nbr_idx.shape[0]
    init = jnp.where(node_mask, jnp.arange(n, dtype=jnp.int32), _BIG)
    lab = propagate_min_labels(init, nbr_idx, edge_valid, node_mask, max_rounds)
    return jnp.where(node_mask, lab, -1)


@partial(jax.jit, static_argnames=("min_samples", "neighbor_cap", "max_rounds"))
def dbscan_from_neighbors(
    nbr_idx: Array,  # [N, k] neighbors within eps (-1 padding), self included or not
    nbr_dist: Array,  # [N, k]
    mask: Array,
    min_samples: int = 10,
    neighbor_cap: int = 0,  # unused; kept for API clarity
    max_rounds: int = 64,
    core: Array | None = None,  # precomputed core mask (exact counts)
) -> Array:
    """DBSCAN given precomputed eps-neighbor lists. Returns labels [N] i32
    (noise/dead = -1), compacted to 0..C-1 by descending-id-independent order
    (component min-row id, then renumbered by first occurrence).

    When ``core`` is given (from an exact `radius_count`), the capped lists
    are used for connectivity only — required when min_samples exceeds the
    list cap (large top_k is pathologically slow on TPU)."""
    n = nbr_idx.shape[0]
    valid = (nbr_idx >= 0) & mask[:, None]
    if core is None:
        # neighbor lists from knn include self at distance 0
        n_nbrs = jnp.sum(valid, axis=1)
        core = mask & (n_nbrs >= min_samples)

    gidx = jnp.maximum(nbr_idx, 0)
    nbr_is_core = core[gidx] & valid
    # core-core edges
    edge_cc = nbr_is_core & core[:, None]
    init = jnp.where(core, jnp.arange(n, dtype=jnp.int32), _BIG)
    lab = propagate_min_labels(init, nbr_idx, edge_cc, core, max_rounds)

    # border points: adopt min core-neighbor label
    border_lab = jnp.min(jnp.where(nbr_is_core, lab[gidx], _BIG), axis=1)
    lab = jnp.where(core, lab, border_lab)
    lab = jnp.where(mask & (lab < _BIG), lab, -1)
    return compact_labels(lab)


@jax.jit
def compact_labels(labels: Array) -> Array:
    """Renumber nonnegative labels to 0..C-1 (order of root-row id); keep -1."""
    n = labels.shape[0]
    is_root = (labels == jnp.arange(n)) & (labels >= 0)
    new_id = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    safe = jnp.clip(labels, 0, n - 1)
    return jnp.where(labels >= 0, new_id[safe], -1)


def dbscan(
    points: Array,
    mask: Array,
    eps: float = 0.1,
    min_samples: int = 10,
    neighbor_cap: int = 32,
    max_rounds: int = 64,
) -> Array:
    """DBSCAN over 3D points (brute-force neighbor lists; use
    ``dbscan_from_neighbors`` with grid-index lists for big clouds).

    The core test is exact (``radius_count`` — a matmul+sum with no top-k),
    so ``min_samples`` may exceed ``neighbor_cap``; the capped lists carry
    connectivity only (cap >= ~2×density scale keeps dense regions
    transitively linked; validated vs sklearn in tests)."""
    from pyqsm_tpu.ops.neighbors import radius_count

    counts = radius_count(points, points, radius=eps, query_mask=mask, point_mask=mask)
    core = mask & (counts >= min_samples)
    d, i = radius_knn(points, points, radius=eps, k=neighbor_cap, query_mask=mask, point_mask=mask)
    return dbscan_from_neighbors(i, d, mask, min_samples=min_samples,
                                 max_rounds=max_rounds, core=core)


@jax.jit
def cluster_sizes(labels: Array) -> Array:
    """Size of each cluster id (length-N array indexed by label id)."""
    n = labels.shape[0]
    safe = jnp.where(labels >= 0, labels, n - 1)
    sizes = jax.ops.segment_sum(
        (labels >= 0).astype(jnp.int32), safe, num_segments=n
    )
    # if cluster n-1 exists it also collected the noise dummy writes of 0 — fine
    return sizes


@partial(jax.jit, static_argnames=("top",))
def top_clusters(labels: Array, top: int = 1) -> Array:
    """Ids of the ``top`` largest clusters (the reference's ``cluster_plus``
    top-N policy, ``point_cloud_processing.py:169-218``). -1 padded."""
    sizes = cluster_sizes(labels)
    _, ids = jax.lax.top_k(sizes, top)
    got = sizes[ids] > 0
    return jnp.where(got, ids, -1)


def largest_cluster_mask(points: Array, mask: Array, eps: float, min_samples: int,
                         neighbor_cap: int = 32) -> tuple[Array, Array]:
    """DBSCAN and keep only the largest cluster (``cluster_and_get_largest``,
    ``point_cloud_processing.py:205-218``). Returns (labels, refined mask)."""
    labels = dbscan(points, mask, eps, min_samples, neighbor_cap)
    best = top_clusters(labels, 1)[0]
    return labels, mask & (labels == best)


# ---------------------------------------------------------------------------
# k-means (Lloyd) + silhouette sweep
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(
    points: Array,
    mask: Array,
    k: int,
    key: Array,
    iters: int = 25,
) -> tuple[Array, Array]:
    """Lloyd k-means with k-means++-style farthest seeding.

    Returns ``(centers [k,3], labels [N] i32)`` (dead rows -1). Deterministic
    given ``key`` — the reference's sklearn KMeans was not (SURVEY.md §4
    determinism requirement).
    """
    n = points.shape[0]
    pts = jnp.where(mask[:, None], points, 0.0)
    live = mask.astype(points.dtype)

    # seeding: first center = random live point; rest = farthest-from-chosen
    w = jnp.where(mask, 1.0, 0.0)
    first = jax.random.choice(key, n, p=w / jnp.maximum(jnp.sum(w), 1))

    def seed_body(carry, _):
        centers, n_chosen, min_d2 = carry
        last = centers[n_chosen - 1]
        d2 = jnp.sum((pts - last[None, :]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, jnp.where(mask, d2, -jnp.inf))
        nxt = pts[jnp.argmax(min_d2)]
        centers = centers.at[n_chosen].set(nxt)
        return (centers, n_chosen + 1, min_d2), None

    centers0 = jnp.zeros((k, 3), points.dtype).at[0].set(pts[first])
    (centers, _, _), _ = jax.lax.scan(
        seed_body, (centers0, 1, jnp.where(mask, jnp.inf, -jnp.inf)), None, length=k - 1
    )

    def lloyd(centers, _):
        d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # [N,k]
        lab = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(lab, k, dtype=points.dtype) * live[:, None]
        sums = onehot.T @ pts
        cnts = jnp.sum(onehot, axis=0)
        new = jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts, 1)[:, None], centers)
        return new, None

    centers, _ = jax.lax.scan(lloyd, centers, None, length=iters)
    d2 = jnp.sum((pts[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    labels = jnp.where(mask, jnp.argmin(d2, axis=1).astype(jnp.int32), -1)
    return centers, labels


_PAIRWISE_CAP = 8192  # hard cap: these kernels materialise [N, N]


@jax.jit
def silhouette_score(points: Array, labels: Array, mask: Array) -> Array:
    """Mean silhouette coefficient (full pairwise — intended for the small
    clusters the reference sweeps, ``fit.py:183-202``).

    CAP: materialises an [N, N] distance matrix + one-hot. Inputs above
    ``_PAIRWISE_CAP`` rows are strided-subsampled at trace time with a
    logged warning — the mean silhouette over a uniform row subsample is a
    consistent estimate (``models/qsm.py`` / ``models/canopy.py`` already
    pre-subsample)."""
    if points.shape[0] > _PAIRWISE_CAP:
        import logging

        stride = -(-points.shape[0] // _PAIRWISE_CAP)
        logging.getLogger("pyqsm.calc").warning(
            "silhouette_score: N=%d exceeds the %d pairwise cap; "
            "auto-subsampling every %dth row",
            points.shape[0], _PAIRWISE_CAP, stride)
        points = points[::stride]
        labels = labels[::stride]
        mask = mask[::stride]
    n = points.shape[0]
    pts = jnp.where(mask[:, None], points, jnp.inf)
    live = mask & (labels >= 0)
    diff = pts[:, None, :] - pts[None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.nan_to_num(jnp.sum(diff * diff, axis=-1), posinf=jnp.inf), 0.0))
    same = (labels[:, None] == labels[None, :]) & live[:, None] & live[None, :]
    eye = jnp.eye(n, dtype=bool)
    same_n = same & ~eye
    a_cnt = jnp.sum(same_n, axis=1)
    a = jnp.sum(jnp.where(same_n, d, 0.0), axis=1) / jnp.maximum(a_cnt, 1)

    # mean distance to each other cluster, then min
    k = n  # labels < n
    lab_safe = jnp.where(live, labels, k - 1)
    onehot = jax.nn.one_hot(lab_safe, k, dtype=points.dtype) * live[:, None]
    dsum = jnp.where(live[:, None] & live[None, :], d, 0.0) @ onehot  # [N, k]
    cnts = jnp.sum(onehot, axis=0)  # [k]
    mean_to = dsum / jnp.maximum(cnts[None, :], 1)
    own = jax.nn.one_hot(lab_safe, k, dtype=bool)
    empty = (cnts == 0)[None, :]
    b = jnp.min(jnp.where(own | empty, jnp.inf, mean_to), axis=1)
    s = (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12)
    s = jnp.where(live & (a_cnt > 0) & jnp.isfinite(b), s, 0.0)
    n_valid = jnp.maximum(jnp.sum(live & (a_cnt > 0) & jnp.isfinite(b)), 1)
    return jnp.sum(s) / n_valid


def kmeans_sweep(
    points: Array,
    mask: Array,
    key: Array,
    k_range: tuple[int, ...],
    min_silhouette: float = 0.4,
    iters: int = 25,
) -> tuple[Array, Array, int, float]:
    """Reference policy (``fit.py:168-214``): try k in ``k_range`` (their
    n..n+3), pick the best silhouette; accept only above ``min_silhouette``
    else fall back to the smallest k.

    Returns (centers, labels, chosen_k, score). Host-side loop over the small
    static range; each candidate is jitted.
    """
    best = None
    for k in k_range:
        key, sub = jax.random.split(key)
        centers, labels = kmeans(points, mask, k, sub, iters=iters)
        score = float(silhouette_score(points, labels, mask))
        if best is None or score > best[3]:
            best = (centers, labels, k, score)
    if best[3] < min_silhouette:
        k0 = k_range[0]
        key, sub = jax.random.split(key)
        centers, labels = kmeans(points, mask, k0, sub, iters=iters)
        return centers, labels, k0, best[3]
    return best
