"""Neighbor engine — the keystone kernel (SURVEY.md §7 item 2).

Replaces every KD-tree in the reference (Open3D ``KDTreeFlann``, scipy
``cKDTree``: ``tree_isolation.py:124-137,207-211``, ``reconstruction.py:240``,
``lib_integration.py:56-57,114-115``, ``cluster_joining.py:92,149``) with two
TPU-native strategies:

1. **Tiled brute force** (`knn`) — exact k-nearest-neighbors via the
   ``d² = |q|² + |p|² − 2·q·pᵀ`` expansion. The cross term is a matmul that
   rides the MXU; candidates stream through a `lax.scan` with a running
   top-k, so memory is O(query_tile × candidate_tile) regardless of N.
   Right for the downsampled clouds the reference's algorithms actually run
   on (contraction ~1e5 pts, MST, normals).

2. **Sorted voxel grid** (`GridIndex` + `grid_radius_knn`) — for
   radius-bounded queries on full-resolution clouds (region growing k=200
   d≤0.1 on 10M+ pts). Points are sorted by voxel cell id once; each query
   gathers candidates from the 27 adjacent cells via vectorized
   `searchsorted` range lookups. Build = one sort (device-resident); query =
   gather + masked top-k. Exact when per-cell occupancy ≤ `cell_cap`
   (checked at build).

Both return fixed-shape `(dists, idx)` with `idx = -1` / `dist = inf`
padding — the masked-array convention every downstream kernel consumes.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_INF = jnp.inf
_INT32_MAX = np.iinfo(np.int32).max


def _pad_rows(x: Array, multiple: int, fill) -> Array:
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


# ---------------------------------------------------------------------------
# 1. Tiled brute-force kNN
# ---------------------------------------------------------------------------


def _knn_query_tile(
    q: Array,  # [QT, 3] queries (inf rows = padding)
    pts_tiles: Array,  # [T, CT, 3] candidate tiles (inf rows = padding)
    idx_tiles: Array,  # [T, CT] global indices (-1 = padding)
    k: int,
) -> tuple[Array, Array]:
    qt = q.shape[0]
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # [QT, 1]
    # replace inf padding by huge-but-finite so arithmetic stays NaN-free
    q_sq = jnp.where(jnp.isfinite(q_sq), q_sq, 1e30)
    qf = jnp.where(jnp.isfinite(q), q, 0.0)

    def step(carry, tile):
        best_d, best_i = carry
        pts, idx = tile  # [CT, 3], [CT]
        p_sq = jnp.sum(pts * pts, axis=-1)  # [CT]
        p_sq = jnp.where(jnp.isfinite(p_sq), p_sq, jnp.inf)
        pf = jnp.where(jnp.isfinite(pts), pts, 0.0)
        # HIGHEST precision: the |q|²+|p|²−2q·p expansion cancels catastrophically
        # under the MXU's default bf16 passes when d << |coords|.
        cross = jnp.dot(
            qf, pf.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [QT, CT] MXU
        d2 = q_sq + p_sq[None, :] - 2.0 * cross
        d2 = jnp.where(idx[None, :] >= 0, d2, jnp.inf)
        cat_d = jnp.concatenate([best_d, d2], axis=1)  # [QT, k+CT]
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx[None, :], d2.shape)], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cat_i, arg, axis=1)
        return (new_d, new_i), None

    init = (jnp.full((qt, k), jnp.inf), jnp.full((qt, k), -1, dtype=jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(step, init, (pts_tiles, idx_tiles))
    return best_d, best_i


def _knn_query_tile_approx(
    q: Array,  # [QT, 3]
    pts: Array,  # [NP, 3] (inf rows = padding)
    idx: Array,  # [NP] global indices (-1 = padding)
    k: int,
    recall_target: float,
) -> tuple[Array, Array]:
    """One [QT, NP] distance block + hardware ``approx_min_k`` — no candidate
    scan, no exact partial sort. The TPU's approximate top-k unit makes this
    ~5-10x faster than the running-top-k merge at these sizes."""
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    q_sq = jnp.where(jnp.isfinite(q_sq), q_sq, 1e30)
    qf = jnp.where(jnp.isfinite(q), q, 0.0)
    p_sq = jnp.sum(pts * pts, axis=-1)
    p_sq = jnp.where(jnp.isfinite(p_sq), p_sq, jnp.inf)
    pf = jnp.where(jnp.isfinite(pts), pts, 0.0)
    cross = jnp.dot(
        qf, pf.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [QT, NP] MXU
    d2 = q_sq + p_sq[None, :] - 2.0 * cross
    d2 = jnp.where(idx[None, :] >= 0, d2, jnp.inf)
    neg, arg = jax.lax.approx_max_k(
        -d2, k, recall_target=recall_target, aggregate_to_topk=True
    )
    best_i = idx[arg]
    return -neg, jnp.where(jnp.isfinite(neg), best_i, -1)


@partial(jax.jit, static_argnames=("k", "query_tile", "candidate_tile", "approx"))
def knn(
    queries: Array,
    points: Array,
    k: int,
    query_mask: Array | None = None,
    point_mask: Array | None = None,
    query_tile: int = 1024,
    candidate_tile: int = 2048,
    approx: bool = False,
) -> tuple[Array, Array]:
    """Exact kNN: for each query, the k nearest live points.

    Returns ``(dists [Q,k] f32, idx [Q,k] i32)`` sorted ascending; padding
    entries are ``(inf, -1)``. Self-matches are *not* excluded — callers that
    query a cloud against itself and want proper neighbors should ask for
    ``k+1`` and drop column 0 (exactly scipy's convention).

    ``approx=True`` routes through the TPU's hardware approximate-top-k
    (recall ≈ 0.95 per the XLA default): right for neighbor GRAPHS consumed
    by smoothing/Laplacian builds where a ~1-in-20 swapped far neighbor is
    noise, wrong for exact-oracle paths (DBSCAN core counts, detail
    recovery). On CPU it lowers to exact top-k, so results stay exact there.
    """
    nq = queries.shape[0]
    npt = points.shape[0]
    if point_mask is None:
        point_mask = jnp.ones(npt, dtype=bool)
    if query_mask is None:
        query_mask = jnp.ones(nq, dtype=bool)

    pts = jnp.where(point_mask[:, None], points, jnp.inf)
    idx = jnp.where(point_mask, jnp.arange(npt, dtype=jnp.int32), -1)

    q = jnp.where(query_mask[:, None], queries, jnp.inf)
    q = _pad_rows(q, query_tile, jnp.inf)
    q_tiles = q.reshape(-1, query_tile, 3)

    if approx:
        pts_p = _pad_rows(pts, 128, jnp.inf)
        idx_p = _pad_rows(idx, 128, -1)
        d, i = jax.lax.map(
            lambda qt: _knn_query_tile_approx(qt, pts_p, idx_p, k, 0.95),
            q_tiles,
        )
    else:
        pts_t = _pad_rows(pts, candidate_tile, jnp.inf)
        idx_t = _pad_rows(idx, candidate_tile, -1)
        t = pts_t.shape[0] // candidate_tile
        pts_tiles = pts_t.reshape(t, candidate_tile, 3)
        idx_tiles = idx_t.reshape(t, candidate_tile)
        d, i = jax.lax.map(
            lambda qt: _knn_query_tile(qt, pts_tiles, idx_tiles, k), q_tiles
        )
    d = d.reshape(-1, k)[:nq]
    i = i.reshape(-1, k)[:nq]
    d = jnp.where(query_mask[:, None], d, jnp.inf)
    i = jnp.where(query_mask[:, None], i, -1)
    return jnp.sqrt(jnp.maximum(d, 0.0)), i


def radius_knn(
    queries: Array,
    points: Array,
    radius: float,
    k: int,
    query_mask: Array | None = None,
    point_mask: Array | None = None,
    **kw,
) -> tuple[Array, Array]:
    """k nearest within ``radius`` (scipy ``query(k=,distance_upper_bound=)``
    semantics). Entries beyond the radius become ``(inf, -1)``."""
    d, i = knn(queries, points, k, query_mask=query_mask, point_mask=point_mask, **kw)
    ok = d <= radius
    return jnp.where(ok, d, jnp.inf), jnp.where(ok, i, -1)


@partial(jax.jit, static_argnames=("query_tile", "candidate_tile"))
def radius_count(
    queries: Array,
    points: Array,
    radius: float,
    query_mask: Array | None = None,
    point_mask: Array | None = None,
    query_tile: int = 1024,
    candidate_tile: int = 2048,
    weights: Array | None = None,
) -> Array:
    """Number of live points within ``radius`` of each query (degree in the
    radius graph — `lib_integration.get_pairs` capability, without the cap).

    With ``weights`` [n_points] f32, returns the SUM of live in-radius
    weights instead (f32) — e.g. per-representative multiplicities, so a
    coarsened cloud still counts original rows."""
    nq = queries.shape[0]
    npt = points.shape[0]
    if point_mask is None:
        point_mask = jnp.ones(npt, dtype=bool)
    if query_mask is None:
        query_mask = jnp.ones(nq, dtype=bool)
    pts = jnp.where(point_mask[:, None], points, jnp.inf)
    pts = _pad_rows(pts, candidate_tile, jnp.inf)
    live = _pad_rows(point_mask, candidate_tile, False)
    t = pts.shape[0] // candidate_tile
    pts_tiles = pts.reshape(t, candidate_tile, 3)
    live_tiles = live.reshape(t, candidate_tile)
    w_tiles = None
    if weights is not None:
        w = _pad_rows(jnp.asarray(weights, jnp.float32), candidate_tile, 0.0)
        w_tiles = w.reshape(t, candidate_tile)
    q = jnp.where(query_mask[:, None], queries, jnp.inf)
    q = _pad_rows(q, query_tile, jnp.inf)
    q_tiles = q.reshape(-1, query_tile, 3)
    r2 = radius * radius

    def per_tile(qt):
        q_sq = jnp.nan_to_num(jnp.sum(qt * qt, axis=-1, keepdims=True), posinf=1e30)
        qf = jnp.where(jnp.isfinite(qt), qt, 0.0)

        def step(count, tile):
            if weights is None:
                pts_, live_ = tile
            else:
                pts_, live_, w_ = tile
            p_sq = jnp.sum(pts_ * pts_, axis=-1)
            p_sq = jnp.where(live_, p_sq, jnp.inf)
            pf = jnp.where(jnp.isfinite(pts_), pts_, 0.0)
            d2 = q_sq + p_sq[None, :] - 2.0 * jnp.dot(
                qf, pf.T, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            inr = d2 <= r2
            if weights is None:
                return count + jnp.sum(inr.astype(jnp.int32), axis=1), None
            return count + jnp.sum(jnp.where(inr, w_[None, :], 0.0),
                                   axis=1), None

        zero = (jnp.zeros(qt.shape[0], jnp.int32) if weights is None
                else jnp.zeros(qt.shape[0], jnp.float32))
        tiles = ((pts_tiles, live_tiles) if weights is None
                 else (pts_tiles, live_tiles, w_tiles))
        c, _ = jax.lax.scan(step, zero, tiles)
        return c

    counts = jax.lax.map(per_tile, q_tiles).reshape(-1)[:nq]
    return jnp.where(query_mask, counts, 0)


# ---------------------------------------------------------------------------
# 2. Sorted voxel-grid index for bounded-radius queries at scale
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GridIndex:
    """Points sorted by voxel cell id. ``cell_size >= query radius`` so the
    27-cell neighborhood is complete."""

    sorted_points: Array  # [N, 3]
    sorted_idx: Array  # [N] i32 original indices (-1 for dead rows at tail)
    sorted_cell: Array  # [N] i32 cell ids, ascending (dead rows = INT32_MAX)
    origin: Array  # [3]
    dims: Array  # [3] i32 cells per axis
    cell_size: float = dataclasses.field(metadata=dict(static=True), default=0.1)


def _cell_coords(points: Array, origin: Array, cell_size: float) -> Array:
    return jnp.floor((points - origin[None, :]) / cell_size).astype(jnp.int32)


def _cell_id(coords: Array, dims: Array) -> Array:
    cx, cy, cz = coords[..., 0], coords[..., 1], coords[..., 2]
    inb = (
        (cx >= 0) & (cx < dims[0]) & (cy >= 0) & (cy < dims[1]) & (cz >= 0) & (cz < dims[2])
    )
    cid = (cx * dims[1] + cy) * dims[2] + cz
    return jnp.where(inb, cid, _INT32_MAX)


@partial(jax.jit, static_argnames=("cell_size",))
def build_grid(points: Array, cell_size: float, mask: Array | None = None) -> GridIndex:
    """Build the sorted-grid index (one device sort)."""
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=bool)
    finite = jnp.all(jnp.isfinite(points), axis=-1) & mask
    safe_pts = jnp.where(finite[:, None], points, 0.0)
    big = jnp.where(finite[:, None], safe_pts, -jnp.inf)
    small = jnp.where(finite[:, None], safe_pts, jnp.inf)
    lo = jnp.min(small, axis=0)
    hi = jnp.max(big, axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
    origin = lo - cell_size  # one-cell margin so query cells never go negative
    dims = jnp.maximum(((hi - origin) / cell_size).astype(jnp.int32) + 2, 1)
    cid = _cell_id(_cell_coords(safe_pts, origin, cell_size), dims)
    cid = jnp.where(finite, cid, _INT32_MAX)
    order = jnp.argsort(cid)
    cid_s = cid[order]
    pts_s = jnp.where((cid_s < _INT32_MAX)[:, None], points[order], jnp.inf)
    idx_s = jnp.where(cid_s < _INT32_MAX, order.astype(jnp.int32), -1)
    return GridIndex(pts_s, idx_s, cid_s, origin, dims, cell_size)


_NBR_OFFSETS = np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)  # [27, 3]


def _grid_tile_query(
    q: Array,  # [QT, 3]
    index: GridIndex,
    radius: float,
    k: int,
    cell_cap: int,
) -> tuple[Array, Array]:
    qt = q.shape[0]
    n = index.sorted_points.shape[0]
    qf = jnp.where(jnp.isfinite(q), q, 0.0)
    coords = _cell_coords(qf, index.origin, index.cell_size)  # [QT, 3]
    nbr = coords[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None, :, :]  # [QT, 27, 3]
    cids = _cell_id(nbr, index.dims)  # [QT, 27]
    starts = jnp.searchsorted(index.sorted_cell, cids, side="left")  # [QT, 27]
    ends = jnp.searchsorted(index.sorted_cell, cids, side="right")
    offs = jnp.arange(cell_cap, dtype=jnp.int32)
    gather = starts[:, :, None] + offs[None, None, :]  # [QT, 27, cap]
    valid = (gather < ends[:, :, None]) & (cids[:, :, None] < _INT32_MAX)
    gather = jnp.clip(gather, 0, n - 1)
    cand_pts = index.sorted_points[gather.reshape(qt, -1)]  # [QT, 27*cap, 3]
    cand_idx = jnp.where(
        valid.reshape(qt, -1), index.sorted_idx[gather.reshape(qt, -1)], -1
    )
    diff = cand_pts - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where((cand_idx >= 0) & (d2 <= radius * radius), d2, jnp.inf)
    neg_top, arg = jax.lax.top_k(-d2, k)
    best_d = -neg_top
    best_i = jnp.take_along_axis(cand_idx, arg, axis=1)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return jnp.sqrt(jnp.maximum(best_d, 0.0)), best_i


@partial(jax.jit, static_argnames=("radius", "k", "cell_cap", "query_tile"))
def grid_radius_knn(
    index: GridIndex,
    queries: Array,
    radius: float,
    k: int,
    query_mask: Array | None = None,
    cell_cap: int = 64,
    query_tile: int = 1024,
) -> tuple[Array, Array]:
    """k nearest within ``radius`` using the grid index.

    Exact when every cell holds ≤ ``cell_cap`` points (check with
    `max_cell_occupancy`). ``radius`` must be ≤ ``index.cell_size``.
    """
    if radius > index.cell_size + 1e-9:
        raise ValueError(f"radius {radius} exceeds cell_size {index.cell_size}")
    nq = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones(nq, dtype=bool)
    q = jnp.where(query_mask[:, None], queries, jnp.inf)
    q = _pad_rows(q, query_tile, jnp.inf)
    q_tiles = q.reshape(-1, query_tile, 3)
    d, i = jax.lax.map(
        lambda qt: _grid_tile_query(qt, index, radius, k, cell_cap), q_tiles
    )
    d = d.reshape(-1, k)[:nq]
    i = i.reshape(-1, k)[:nq]
    d = jnp.where(query_mask[:, None], d, jnp.inf)
    i = jnp.where(query_mask[:, None], i, -1)
    return d, i


def _grid_tile_any_k(
    q: Array, index: GridIndex, radius: float, k: int, cell_cap: int
) -> tuple[Array, Array]:
    """Unsorted within-radius selection: take the first k candidates that
    pass the radius test via a cumsum position + one-hot contraction —
    avoids `top_k`, which dominates the sorted path's runtime on TPU."""
    qt = q.shape[0]
    n = index.sorted_points.shape[0]
    qf = jnp.where(jnp.isfinite(q), q, 0.0)
    coords = _cell_coords(qf, index.origin, index.cell_size)
    nbr = coords[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None, :, :]
    cids = _cell_id(nbr, index.dims)
    starts = jnp.searchsorted(index.sorted_cell, cids, side="left")
    ends = jnp.searchsorted(index.sorted_cell, cids, side="right")
    offs = jnp.arange(cell_cap, dtype=jnp.int32)
    gather = starts[:, :, None] + offs[None, None, :]
    valid = (gather < ends[:, :, None]) & (cids[:, :, None] < _INT32_MAX)
    gather = jnp.clip(gather, 0, n - 1).reshape(qt, -1)
    cand_pts = index.sorted_points[gather]
    cand_idx = jnp.where(valid.reshape(qt, -1), index.sorted_idx[gather], -1)
    diff = cand_pts - q[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    ok = (cand_idx >= 0) & (d2 <= radius * radius)
    pos = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1  # [qt, C]
    take = ok & (pos < k)
    # single flat scatter: positions are unique per row among taken entries
    # (flattened index — stacked 2-component scatter indices get a padded
    # s32[*, 2] -> [*, 128] copy on TPU, see sparse.build_banded)
    rows = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 0)
    slot = jnp.where(take, pos, k)  # k = the row's drop lane
    flat = rows * (k + 1) + slot
    out_idx = jnp.full(qt * (k + 1), -1, jnp.int32).at[flat].set(
        cand_idx, mode="drop"
    ).reshape(qt, k + 1)[:, :k]
    out_d = jnp.full(qt * (k + 1), jnp.inf).at[flat].set(
        jnp.sqrt(jnp.maximum(d2, 0.0)), mode="drop"
    ).reshape(qt, k + 1)[:, :k]
    return out_d, out_idx


@partial(jax.jit, static_argnames=("radius", "k", "cell_cap", "query_tile"))
def grid_radius_any_k(
    index: GridIndex,
    queries: Array,
    radius: float,
    k: int,
    query_mask: Array | None = None,
    cell_cap: int = 64,
    query_tile: int = 1024,
) -> tuple[Array, Array]:
    """Up to k points within ``radius`` per query, *unsorted* (no top-k).
    The right primitive for radius graphs — DBSCAN connectivity and region
    growing — where nearest-ordering is irrelevant."""
    if radius > index.cell_size + 1e-9:
        raise ValueError(f"radius {radius} exceeds cell_size {index.cell_size}")
    nq = queries.shape[0]
    if query_mask is None:
        query_mask = jnp.ones(nq, dtype=bool)
    q = jnp.where(query_mask[:, None], queries, jnp.inf)
    q = _pad_rows(q, query_tile, jnp.inf)
    q_tiles = q.reshape(-1, query_tile, 3)
    d, i = jax.lax.map(
        lambda qt: _grid_tile_any_k(qt, index, radius, k, cell_cap), q_tiles
    )
    d = d.reshape(-1, k)[:nq]
    i = i.reshape(-1, k)[:nq]
    d = jnp.where(query_mask[:, None], d, jnp.inf)
    i = jnp.where(query_mask[:, None], i, -1)
    return d, i


# ---------------------------------------------------------------------------
# 3. Cell-blocked radius kNN — the fast exact path
# ---------------------------------------------------------------------------
#
# Per-QUERY searchsorted + row gathers dominate the naive grid query on TPU
# (measured 40x slower than MXU work). Here the lookup is per-CELL: points
# are packed into padded per-cell buckets once, each occupied cell finds its
# 27 neighbor buckets with NC×27 searches (NC ≈ N/occupancy), and distances
# are computed as dense [C, 27·C] blocks per cell tile — matmul-shaped work
# the MXU eats. Exact when bucket capacity ≥ max cell occupancy.


@partial(jax.jit, static_argnames=("nc_cap", "cap"))
def _build_buckets(index: GridIndex, nc_cap: int, cap: int):
    """Bucketize the sorted points: returns (cell_ids [NC], starts [NC],
    lens [NC], n_cells) padded to nc_cap."""
    sc = index.sorted_cell
    n = sc.shape[0]
    first = jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]])
    first = first & (sc < _INT32_MAX)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment index per row
    n_cells = jnp.maximum(jnp.max(jnp.where(first, seg + 1, 0)), 0)
    starts = jnp.full(nc_cap, n, jnp.int32).at[
        jnp.where(first, seg, nc_cap)
    ].min(jnp.arange(n, dtype=jnp.int32), mode="drop")
    cell_of_seg = jnp.full(nc_cap, _INT32_MAX, jnp.int32).at[
        jnp.where(first, seg, nc_cap)
    ].min(sc, mode="drop")
    counts = jnp.zeros(nc_cap, jnp.int32).at[
        jnp.where(sc < _INT32_MAX, seg, nc_cap)
    ].add(1, mode="drop")
    return cell_of_seg, starts, counts, n_cells


@partial(jax.jit, static_argnames=("radius", "k", "nc_cap", "cap", "cell_tile"))
def _cell_blocked_query(
    index: GridIndex,
    radius: float,
    k: int,
    nc_cap: int,
    cap: int,
    cell_tile: int = 256,
) -> tuple[Array, Array]:
    """Self radius-kNN of all indexed points. Returns results in ORIGINAL
    point order: (dists [N,k], idx [N,k] original indices)."""
    n = index.sorted_points.shape[0]
    cell_ids, starts, counts, _ = _build_buckets(index, nc_cap, cap)
    sp = index.sorted_points

    # neighbor bucket positions per cell. Cell ids are z-minor, so the three
    # z-neighbors of any (dx,dy) column are consecutive ids: one searchsorted
    # for the middle id locates all three at slots {s-1, s, s+1} (verified by
    # id equality) — 9 binary searches instead of 27.
    dims = index.dims
    cid = jnp.where(cell_ids < _INT32_MAX, cell_ids, 0)
    cz = cid % dims[2]
    cy = (cid // dims[2]) % dims[1]
    cx = cid // (dims[1] * dims[2])
    coords = jnp.stack([cx, cy, cz], axis=1)  # [NC, 3]
    xy_off = np.array([[dx, dy, 0] for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                      dtype=np.int32)  # [9, 3]
    mid_coords = coords[:, None, :] + jnp.asarray(xy_off)[None]  # [NC, 9, 3]
    mid_cid = _cell_id(mid_coords, dims)  # [NC, 9]
    mid_safe = jnp.where(mid_cid < _INT32_MAX, mid_cid, 0)
    s = jnp.searchsorted(cell_ids, mid_safe)  # [NC, 9]
    dz = jnp.asarray(np.array([-1, 0, 1], np.int32))
    # candidate slots {s-1, s, s+1}; each wanted id {mid-1, mid, mid+1} may
    # sit at ANY of them when some ids are absent — match ids × slots
    slots = s[:, :, None] + dz[None, None, :]  # [NC, 9, 3slots]
    slots_clip = jnp.clip(slots, 0, nc_cap - 1)
    slot_ids = cell_ids[slots_clip]  # [NC, 9, 3]
    slot_ok = (slots >= 0) & (slots < nc_cap)
    want_cid = mid_safe[:, :, None] + dz[None, None, :]  # [NC, 9, 3ids]
    # z-boundary cells would alias the neighbor column's id — mask them
    z_ok = (
        (coords[:, None, 2:3] + dz[None, None, :] >= 0)
        & (coords[:, None, 2:3] + dz[None, None, :] < dims[2])
    )
    match = (
        (slot_ids[:, :, None, :] == want_cid[:, :, :, None])  # [NC,9,id,slot]
        & slot_ok[:, :, None, :]
        & (mid_cid[:, :, None, None] < _INT32_MAX)
        & z_ok[:, :, :, None]
    )
    found3 = jnp.any(match, axis=-1)  # [NC, 9, 3ids]
    pos3 = jnp.max(jnp.where(match, slots_clip[:, :, None, :], 0), axis=-1)
    nbr_pos = jnp.where(found3, pos3, nc_cap - 1).reshape(-1, 27)
    found = found3.reshape(-1, 27)

    offs = jnp.arange(cap, dtype=jnp.int32)
    r2 = radius * radius
    nt = nc_cap // cell_tile

    def tile(ti):
        csl = lambda a: jax.lax.dynamic_slice_in_dim(a, ti * cell_tile, cell_tile)
        t_starts = csl(starts)
        t_counts = csl(counts)
        t_nbr_pos = csl(nbr_pos)  # [ct, 27]
        t_found = csl(found)
        # query block: this tile's own points [ct, cap, 3]
        q_idx = jnp.clip(t_starts[:, None] + offs[None, :], 0, n - 1)
        q_valid = offs[None, :] < t_counts[:, None]
        q = sp[q_idx]  # [ct, cap, 3] — contiguous rows
        # candidate block: 27 neighbor buckets [ct, 27, cap, 3]
        c_starts = starts[t_nbr_pos]  # [ct, 27]
        c_counts = jnp.where(t_found, counts[t_nbr_pos], 0)
        c_idx = jnp.clip(c_starts[:, :, None] + offs[None, None, :], 0, n - 1)
        c_valid = offs[None, None, :] < c_counts[:, :, None]
        cpts = sp[c_idx.reshape(cell_tile, -1)]  # [ct, 27*cap, 3]
        # dense distances on the MXU
        q_sq = jnp.sum(q * q, axis=-1)  # [ct, cap]
        c_sq = jnp.sum(cpts * cpts, axis=-1)  # [ct, 27cap]
        cross = jnp.einsum(
            "tqc,tpc->tqp", q, cpts, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = q_sq[:, :, None] + c_sq[:, None, :] - 2.0 * cross  # [ct, cap, 27cap]
        ok = c_valid.reshape(cell_tile, 1, -1) & (d2 <= r2)
        d2 = jnp.where(ok, d2, jnp.inf)
        neg, arg = jax.lax.top_k(-d2, k)  # [ct, cap, k]
        best_d = jnp.sqrt(jnp.maximum(-neg, 0.0))
        cand_sorted = c_idx.reshape(cell_tile, 1, -1)
        best_sorted = jnp.take_along_axis(
            jnp.broadcast_to(cand_sorted, d2.shape), arg, axis=2
        )
        best_orig = index.sorted_idx[jnp.clip(best_sorted, 0, n - 1)]
        best_orig = jnp.where(jnp.isfinite(best_d), best_orig, -1)
        best_d = jnp.where(jnp.isfinite(best_d), best_d, jnp.inf)
        # rows' original ids for scatter-back
        row_orig = jnp.where(q_valid, index.sorted_idx[q_idx], -1)
        return best_d, best_orig, row_orig

    # batch tiles: sequential lax.map is latency-bound at ~256 small tiles
    d_t, i_t, rows_t = jax.lax.map(
        tile, jnp.arange(nt), batch_size=min(16, nt)
    )
    d_flat = d_t.reshape(-1, k)
    i_flat = i_t.reshape(-1, k)
    rows = rows_t.reshape(-1)
    out_d = jnp.full((n + 1, k), jnp.inf).at[
        jnp.where(rows >= 0, rows, n)
    ].set(d_flat, mode="drop")[:n]
    out_i = jnp.full((n + 1, k), -1, jnp.int32).at[
        jnp.where(rows >= 0, rows, n)
    ].set(i_flat, mode="drop")[:n]
    return out_d, out_i


_FIRST_K_LOOP_MAX = 16


def _first_k_extract(ok, cand_ids, d2, k, need_dists):
    """First-k in-radius candidate extraction along the LAST axis, unsorted
    (cell-order) — the shared tail of the three any-k kernels.

    Small k: per-slot masked max-reduce (k static reductions; each slot j has
    exactly one candidate with cumsum-pos == j). Larger k: ONE ``lax.top_k``
    on the ok flags — equal keys resolve by ascending index, so it selects
    the first k ok candidates directly. The k-pass loop at k=64 × cap=128
    previously unrolled into a compile explosion (356 s CPU compile on a
    600-point input).

    ok:       [..., C] bool
    cand_ids: [..., C] i32 (broadcastable against ok)
    d2:       [..., C] f32 (broadcastable), squared distances
    Returns (out_d [..., k] distances or inf, out_i [..., k] ids or -1).
    """
    if k <= _FIRST_K_LOOP_MAX:
        pos = jnp.cumsum(ok.astype(jnp.int32), axis=-1) - 1
        outs_i, outs_d = [], []
        for j in range(k):
            mj = ok & (pos == j)
            outs_i.append(jnp.max(jnp.where(mj, cand_ids, -1), axis=-1))
            if need_dists:
                outs_d.append(jnp.max(jnp.where(mj, d2, -jnp.inf), axis=-1))
        out_i = jnp.stack(outs_i, axis=-1)
        if need_dists:
            out_d2 = jnp.stack(outs_d, axis=-1)
            out_d = jnp.where(out_i >= 0,
                              jnp.sqrt(jnp.maximum(out_d2, 0.0)), jnp.inf)
        else:
            out_d = jnp.where(out_i >= 0, 0.0, jnp.inf)
        return out_d, out_i
    vals, sel = jax.lax.top_k(ok.astype(jnp.int32), k)
    got = vals > 0
    cand_b = jnp.broadcast_to(cand_ids, ok.shape)
    out_i = jnp.where(got, jnp.take_along_axis(cand_b, sel, axis=-1), -1)
    if need_dists:
        d2_b = jnp.broadcast_to(d2, ok.shape)
        d2_sel = jnp.take_along_axis(d2_b, sel, axis=-1)
        out_d = jnp.where(got, jnp.sqrt(jnp.maximum(d2_sel, 0.0)), jnp.inf)
    else:
        out_d = jnp.where(got, 0.0, jnp.inf)
    return out_d, out_i


@partial(jax.jit, static_argnames=("radius", "k", "nc_cap", "cap", "cell_tile",
                                   "need_dists"))
def _cell_blocked_any_k(
    index: GridIndex,
    radius: float,
    k: int,
    nc_cap: int,
    cap: int,
    cell_tile: int = 1024,
    need_dists: bool = True,
) -> tuple[Array, Array]:
    """Self radius-ANY-k of all indexed points: up to k in-radius neighbors
    per point, UNSORTED (first-k in cell order via cumsum slots + a one-hot
    einsum contraction).

    `top_k` + take_along_axis over the [cap, 27·cap] candidate block is the
    sorted variant's dominant cost on TPU (measured 2.1 s of 3.5 s at 408k
    pts); radius graphs for region growing / DBSCAN don't need nearest
    ordering, so this path replaces the sort with two MXU-shaped one-hot
    contractions (indices stay exact in f32 below 2^24 rows). Results are in
    ORIGINAL point order."""
    n = index.sorted_points.shape[0]
    cell_ids, starts, counts, _ = _build_buckets(index, nc_cap, cap)
    sp = index.sorted_points

    # 9-search z-triple neighbor lookup (identical to _cell_blocked_query)
    dims = index.dims
    cid = jnp.where(cell_ids < _INT32_MAX, cell_ids, 0)
    cz = cid % dims[2]
    cy = (cid // dims[2]) % dims[1]
    cx = cid // (dims[1] * dims[2])
    coords = jnp.stack([cx, cy, cz], axis=1)
    xy_off = np.array([[dx, dy, 0] for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                      dtype=np.int32)
    mid_coords = coords[:, None, :] + jnp.asarray(xy_off)[None]
    mid_cid = _cell_id(mid_coords, dims)
    mid_safe = jnp.where(mid_cid < _INT32_MAX, mid_cid, 0)
    s = jnp.searchsorted(cell_ids, mid_safe)
    dz = jnp.asarray(np.array([-1, 0, 1], np.int32))
    slots = s[:, :, None] + dz[None, None, :]
    slots_clip = jnp.clip(slots, 0, nc_cap - 1)
    slot_ids = cell_ids[slots_clip]
    slot_ok = (slots >= 0) & (slots < nc_cap)
    want_cid = mid_safe[:, :, None] + dz[None, None, :]
    z_ok = (
        (coords[:, None, 2:3] + dz[None, None, :] >= 0)
        & (coords[:, None, 2:3] + dz[None, None, :] < dims[2])
    )
    match = (
        (slot_ids[:, :, None, :] == want_cid[:, :, :, None])
        & slot_ok[:, :, None, :]
        & (mid_cid[:, :, None, None] < _INT32_MAX)
        & z_ok[:, :, :, None]
    )
    found3 = jnp.any(match, axis=-1)
    pos3 = jnp.max(jnp.where(match, slots_clip[:, :, None, :], 0), axis=-1)
    nbr_pos = jnp.where(found3, pos3, nc_cap - 1).reshape(-1, 27)
    found = found3.reshape(-1, 27)

    offs = jnp.arange(cap, dtype=jnp.int32)
    r2 = radius * radius
    nt = nc_cap // cell_tile

    def tile(ti):
        csl = lambda a: jax.lax.dynamic_slice_in_dim(a, ti * cell_tile, cell_tile)
        t_starts = csl(starts)
        t_counts = csl(counts)
        t_nbr_pos = csl(nbr_pos)
        t_found = csl(found)
        q_idx = jnp.clip(t_starts[:, None] + offs[None, :], 0, n - 1)
        q_valid = offs[None, :] < t_counts[:, None]
        q = sp[q_idx]  # [ct, cap, 3]
        c_starts = starts[t_nbr_pos]
        c_counts = jnp.where(t_found, counts[t_nbr_pos], 0)
        c_idx = jnp.clip(c_starts[:, :, None] + offs[None, None, :], 0, n - 1)
        c_valid = offs[None, None, :] < c_counts[:, :, None]
        cpts = sp[c_idx.reshape(cell_tile, -1)]  # [ct, 27cap, 3]
        q_sq = jnp.sum(q * q, axis=-1)
        c_sq = jnp.sum(cpts * cpts, axis=-1)
        cross = jnp.einsum(
            "tqc,tpc->tqp", q, cpts, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        d2 = q_sq[:, :, None] + c_sq[:, None, :] - 2.0 * cross  # [ct, cap, 27cap]
        ok = c_valid.reshape(cell_tile, 1, -1) & (d2 <= r2) & q_valid[:, :, None]
        cand_orig = index.sorted_idx[c_idx.reshape(cell_tile, -1)]  # [ct, 27cap]
        cand_b = cand_orig[:, None, :]  # [ct, 1, 27cap]
        out_d, out_i = _first_k_extract(ok, cand_b, d2, k, need_dists)
        out_i = out_i.reshape(-1, k)
        if need_dists:
            out_d = out_d.reshape(-1, k)
        else:
            out_d = jnp.where(out_i >= 0, 0.0, jnp.inf)
        row_orig = jnp.where(q_valid, index.sorted_idx[q_idx], -1).reshape(-1)
        return out_d, out_i, row_orig

    d_t, i_t, rows_t = jax.lax.map(tile, jnp.arange(nt), batch_size=min(8, nt))
    i_flat = i_t.reshape(-1, k)
    rows = rows_t.reshape(-1)
    safe_rows = jnp.where(rows >= 0, rows, n)
    out_i = jnp.full((n + 1, k), -1, jnp.int32).at[safe_rows].set(
        i_flat, mode="drop"
    )[:n]
    if need_dists:
        out_d = jnp.full((n + 1, k), jnp.inf).at[safe_rows].set(
            d_t.reshape(-1, k), mode="drop"
        )[:n]
    else:
        out_d = jnp.where(out_i >= 0, 0.0, jnp.inf)
    return out_d, out_i


@partial(jax.jit, static_argnames=("radius", "k", "nc_cap", "cap", "dense_cap",
                                   "cell_tile", "need_dists"))
def _bucket_rows_any_k(
    index: GridIndex,
    radius: float,
    k: int,
    nc_cap: int,
    cap: int,
    dense_cap: int,
    cell_tile: int = 512,
    need_dists: bool = True,
) -> tuple[Array, Array]:
    """Bucket-row self radius-any-k: densify each occupied cell's bucket into
    ONE row of a [NC, cap·3] array, then candidate fetch per cell is a row
    gather of its 27 neighbor buckets — [cells × 27] gather indices instead
    of the point-tiled path's [N × 27 × cap] (TPU gather cost scales with
    index count, not row bytes, so whole buckets ride one fetch). The
    distance block is dense [cell_tile, cap, 27·cap] VPU work. Results in
    ORIGINAL point order; unsorted within each row."""
    n = index.sorted_points.shape[0]
    sp = index.sorted_points
    sc = index.sorted_cell
    cell_ids, starts, counts, _ = _build_buckets(index, nc_cap, cap)

    # densified buckets (one scatter): coords + original ids per (cell, slot)
    first = jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]])
    first = first & (sc < _INT32_MAX)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    within = jnp.arange(n, dtype=jnp.int32) - starts[jnp.clip(seg, 0, nc_cap - 1)]
    row_ok = (sc < _INT32_MAX) & (within >= 0) & (within < cap)
    b_row = jnp.where(row_ok, seg, nc_cap)
    b_slot = jnp.where(row_ok, within, 0)
    bucket_pts = jnp.full((nc_cap + 1, cap, 3), jnp.inf, sp.dtype).at[
        b_row, b_slot
    ].set(sp, mode="drop")
    bucket_idx = jnp.full((nc_cap + 1, cap), -1, jnp.int32).at[
        b_row, b_slot
    ].set(index.sorted_idx, mode="drop")

    # dense LUT: dense cell id -> bucket position (-1 empty)
    live_cell = cell_ids < _INT32_MAX
    lut = jnp.full(dense_cap + 1, -1, jnp.int32).at[
        jnp.where(live_cell, jnp.clip(cell_ids, 0, dense_cap), dense_cap)
    ].set(jnp.arange(nc_cap, dtype=jnp.int32), mode="drop")[:dense_cap]

    dims = index.dims
    cid = jnp.where(live_cell, cell_ids, 0)
    cz = cid % dims[2]
    cy = (cid // dims[2]) % dims[1]
    cx = cid // (dims[1] * dims[2])
    coords = jnp.stack([cx, cy, cz], axis=1)
    nbr_coords = coords[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None]
    nbr_cid = _cell_id(nbr_coords, dims)
    inb = (nbr_cid < _INT32_MAX) & live_cell[:, None]
    nbr_pos = jnp.where(inb, lut[jnp.clip(nbr_cid, 0, dense_cap - 1)], -1)

    r2 = radius * radius
    nt = nc_cap // cell_tile

    def tile(ti):
        sl = partial(jax.lax.dynamic_slice_in_dim,
                     start_index=ti * cell_tile, slice_size=cell_tile)
        t_npos = sl(nbr_pos)  # [ct, 27]
        has = t_npos >= 0
        npos_safe = jnp.where(has, t_npos, nc_cap)
        cand_p = bucket_pts[npos_safe]  # [ct, 27, cap, 3] — row gathers
        cand_i = bucket_idx[npos_safe]  # [ct, 27, cap]
        cand_ok = (cand_i >= 0) & has[:, :, None]
        q_p = sl(bucket_pts[:nc_cap])  # [ct, cap, 3] contiguous slice
        q_i = sl(bucket_idx[:nc_cap])  # [ct, cap]
        q_ok = q_i >= 0
        qf = jnp.where(jnp.isfinite(q_p), q_p, 0.0)
        diff = qf[:, :, None, None, :] - jnp.where(
            jnp.isfinite(cand_p), cand_p, 1e9)[:, None, :, :, :]
        d2 = jnp.sum(diff * diff, axis=-1).reshape(cell_tile, cap, 27 * cap)
        ok = (cand_ok.reshape(cell_tile, 1, -1) & (d2 <= r2)
              & q_ok[:, :, None])
        ci = cand_i.reshape(cell_tile, 1, -1)
        out_d, out_i = _first_k_extract(ok, ci, d2, k, need_dists)
        return out_d.reshape(-1, k), out_i.reshape(-1, k), q_i.reshape(-1)

    d_t, i_t, rows_t = jax.lax.map(tile, jnp.arange(nt),
                                   batch_size=min(8, nt))
    rows = rows_t.reshape(-1)
    safe_rows = jnp.where(rows >= 0, rows, n)
    out_i = jnp.full((n + 1, k), -1, jnp.int32).at[safe_rows].set(
        i_t.reshape(-1, k), mode="drop"
    )[:n]
    if need_dists:
        out_d = jnp.full((n + 1, k), jnp.inf).at[safe_rows].set(
            d_t.reshape(-1, k), mode="drop"
        )[:n]
    else:
        out_d = jnp.where(out_i >= 0, 0.0, jnp.inf)
    return out_d, out_i


@partial(jax.jit, static_argnames=("radius", "k", "nc_cap", "cap", "dense_cap",
                                   "pt_tile", "need_dists"))
def _point_tiled_any_k(
    index: GridIndex,
    radius: float,
    k: int,
    nc_cap: int,
    cap: int,
    dense_cap: int,
    pt_tile: int = 2048,
    need_dists: bool = True,
) -> tuple[Array, Array]:
    """Point-tiled self radius-any-k: one query row per POINT (not per padded
    cell slot) so no distance/selection work is spent on bucket padding (the
    cell-blocked path wastes cap/mean_occupancy ≈ 5x of it), and tiles are
    contiguous runs of the sorted array (no per-tile scatter). Neighbor
    buckets resolve through a dense cell-id → bucket LUT (``dense_cap`` =
    static upper bound on the dense grid size) instead of binary searches.
    Returns results in ORIGINAL point order; unsorted within each row."""
    n = index.sorted_points.shape[0]
    sp = index.sorted_points
    sc = index.sorted_cell
    cell_ids, starts, counts, _ = _build_buckets(index, nc_cap, cap)

    # dense LUT: dense cell id -> bucket position (-1 empty)
    live_cell = cell_ids < _INT32_MAX
    lut = jnp.full(dense_cap + 1, -1, jnp.int32).at[
        jnp.where(live_cell, jnp.clip(cell_ids, 0, dense_cap), dense_cap)
    ].set(jnp.arange(nc_cap, dtype=jnp.int32), mode="drop")[:dense_cap]

    # per occupied cell: 27 neighbor bucket positions via LUT gathers
    dims = index.dims
    cid = jnp.where(live_cell, cell_ids, 0)
    cz = cid % dims[2]
    cy = (cid // dims[2]) % dims[1]
    cx = cid // (dims[1] * dims[2])
    coords = jnp.stack([cx, cy, cz], axis=1)  # [NC, 3]
    nbr_coords = coords[:, None, :] + jnp.asarray(_NBR_OFFSETS)[None]  # [NC,27,3]
    nbr_cid = _cell_id(nbr_coords, dims)  # [NC, 27] (INT32_MAX out of bounds)
    inb = (nbr_cid < _INT32_MAX) & live_cell[:, None]
    nbr_pos = jnp.where(
        inb, lut[jnp.clip(nbr_cid, 0, dense_cap - 1)], -1
    )  # [NC, 27] bucket positions, -1 absent

    # per sorted row: its bucket (segment) id
    first = jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]])
    first = first & (sc < _INT32_MAX)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # [n]

    offs = jnp.arange(cap, dtype=jnp.int32)
    r2 = radius * radius
    n_pad = -(-n // pt_tile) * pt_tile
    nt = n_pad // pt_tile
    sp_p = _pad_rows(sp, pt_tile, jnp.inf)
    sc_p = _pad_rows(sc, pt_tile, _INT32_MAX)
    seg_p = _pad_rows(seg, pt_tile, 0)

    def tile(ti):
        start_row = ti * pt_tile
        q = jax.lax.dynamic_slice_in_dim(sp_p, start_row, pt_tile)  # [pt, 3]
        q_live = jax.lax.dynamic_slice_in_dim(sc_p, start_row, pt_tile) < _INT32_MAX
        q_seg = jnp.clip(
            jax.lax.dynamic_slice_in_dim(seg_p, start_row, pt_tile), 0, nc_cap - 1
        )
        npos = nbr_pos[q_seg]  # [pt, 27]
        has = (npos >= 0) & q_live[:, None]
        c_start = starts[jnp.maximum(npos, 0)]
        c_count = jnp.where(has, counts[jnp.maximum(npos, 0)], 0)
        c_idx = jnp.clip(c_start[:, :, None] + offs[None, None, :], 0, n - 1)
        c_valid = offs[None, None, :] < c_count[:, :, None]  # [pt, 27, cap]
        flat_idx = c_idx.reshape(pt_tile, -1)  # [pt, 27cap]
        cand = sp[flat_idx]  # [pt, 27cap, 3]
        qf = jnp.where(jnp.isfinite(q), q, 0.0)
        diff = cand - qf[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)  # [pt, 27cap]
        ok = c_valid.reshape(pt_tile, -1) & (d2 <= r2) & q_live[:, None]
        cand_orig = index.sorted_idx[flat_idx]  # [pt, 27cap]
        return _first_k_extract(ok, cand_orig, d2, k, need_dists)

    d_t, i_t = jax.lax.map(tile, jnp.arange(nt), batch_size=min(8, nt))
    i_sorted = i_t.reshape(-1, k)[:n]
    # permutation scatter back to original point order
    rows = jnp.where(index.sorted_idx >= 0, index.sorted_idx, n)
    out_i = jnp.full((n + 1, k), -1, jnp.int32).at[rows].set(
        i_sorted, mode="drop"
    )[:n]
    if need_dists:
        out_d = jnp.full((n + 1, k), jnp.inf).at[rows].set(
            d_t.reshape(-1, k)[:n], mode="drop"
        )[:n]
    else:
        out_d = jnp.where(out_i >= 0, 0.0, jnp.inf)
    return out_d, out_i


def grid_self_radius_knn(
    points: Array,
    radius: float,
    k: int,
    mask: Array | None = None,
    cell_tile: int = 256,
    max_bucket: int = 64,
    sort: bool = True,
    need_dists: bool = True,
) -> tuple[Array, Array]:
    """Exact self radius-kNN over a full cloud using the cell-blocked path.

    Host wrapper: builds the grid, reads occupancy/cell count, picks padded
    static sizes (pow2 buckets bound recompiles), runs the jitted query.
    Includes self-matches (column 0 is the point itself, distance 0).

    ``sort=False`` returns up to k in-radius neighbors in arbitrary order
    (first-in-cell-order) — much faster (no per-point partial sort) and the
    right contract for radius graphs (region growing, DBSCAN connectivity).

    Exact when per-cell occupancy ≤ ``max_bucket``. Guarantee it by
    voxel-downsampling to ``radius/2`` first (occupancy ≤ 8 by construction)
    — the pattern ``build_trees`` uses; a denser cell spills (its overflow
    points neither query nor serve as candidates) and a warning is logged.
    """
    import logging

    n = points.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=bool)
    index = build_grid(points, cell_size=radius, mask=mask)
    occ = int(max_cell_occupancy(index))
    # tight cap (multiple of 4): padding waste scales the whole kernel
    cap = min(max(4, -4 * (-occ // 4)), max_bucket)
    if occ > cap:
        logging.getLogger("pyqsm_tpu.calc").warning(
            "grid_self_radius_knn: cell occupancy %d exceeds bucket %d — "
            "overflow points dropped; pre-voxelize at radius/2 for exactness",
            occ, cap,
        )
    sc = index.sorted_cell
    n_cells = int(jnp.sum(jnp.concatenate([jnp.array([True]), sc[1:] != sc[:-1]])
                          & (sc < _INT32_MAX)))
    if not sort:
        cell_tile = max(cell_tile, 1024)
    nc_cap = 64
    while nc_cap < n_cells:
        nc_cap *= 2
    # small clouds: don't pad a handful of occupied cells up to a full tile
    # (the [cell_tile, cap, 27·cap] tensors would dominate compile+run)
    cell_tile = min(cell_tile, nc_cap)
    if sort:
        return _cell_blocked_query(index, radius, k, nc_cap, cap, cell_tile)
    # bucket-row path when the dense cell grid fits a LUT (pow2 to bound
    # recompiles); falls back to the searchsorted cell-blocked kernel
    dense = int(np.prod(np.asarray(index.dims)))
    if dense <= 64 * 1024 * 1024:
        dense_cap = 1024
        while dense_cap < dense:
            dense_cap *= 2
        return _bucket_rows_any_k(index, radius, k, nc_cap, cap, dense_cap,
                                  cell_tile=min(cell_tile, 512),
                                  need_dists=need_dists)
    return _cell_blocked_any_k(index, radius, k, nc_cap, cap, cell_tile,
                               need_dists=need_dists)


@jax.jit
def max_cell_occupancy(index: GridIndex) -> Array:
    """Largest number of points in any occupied cell (to validate cell_cap)."""
    cid = index.sorted_cell
    live = cid < _INT32_MAX
    new_seg = jnp.concatenate([jnp.array([True]), cid[1:] != cid[:-1]])
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1
    counts = jax.ops.segment_sum(
        live.astype(jnp.int32), seg, num_segments=cid.shape[0]
    )
    return jnp.max(counts)


def recommend_cell_cap(index: GridIndex) -> int:
    """Host helper: next power of two ≥ max occupancy."""
    occ = int(max_cell_occupancy(index))
    cap = 8
    while cap < occ:
        cap *= 2
    return cap
