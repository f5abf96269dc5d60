"""Downsampling kernels.

Replaces Open3D's ``voxel_down_sample`` / ``voxel_down_sample_and_trace``
(``point_cloud_processing.py:113``, ``tree_isolation.py:156-163``),
``uniform_down_sample`` (``canopy_metrics.py:181-191``), and
``farthest_point_down_sample`` (``skeletonize.py:127-133``) with
device-resident equivalents over masked padded arrays.

The voxel downsample keeps the *trace* (original point → representative row)
as a first-class output: detail recovery (``reconstruction.py:23-228``, which
the reference does by rescanning 41 file tiles) becomes a single gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
_INT32_MAX = np.iinfo(np.int32).max


def _voxel_downsample_body(
    points: Array,
    voxel_size: Array | float,
    mask: Array,
) -> tuple[Array, Array, Array]:
    """Shared body of the voxel downsample; ``voxel_size`` may be a traced
    scalar (the batched ladder vmaps this over per-tree sizes)."""
    n = points.shape[0]
    finite = mask & jnp.all(jnp.isfinite(points), axis=-1)
    safe = jnp.where(finite[:, None], points, 0.0)
    lo = jnp.min(jnp.where(finite[:, None], safe, jnp.inf), axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    coords = jnp.floor((safe - lo[None, :]) / voxel_size).astype(jnp.int32)
    # collision-free grouping via lexsort on the raw 3D coords (no packed
    # int64 key — x64 is disabled); dead rows pushed to the end
    coords = jnp.where(finite[:, None], coords, np.iinfo(np.int32).max)
    order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    coords_s = coords[order]
    live_s = finite[order]
    pts_s = safe[order]
    new_seg = jnp.concatenate(
        [jnp.array([True]), jnp.any(coords_s[1:] != coords_s[:-1], axis=1)]
    )
    seg = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [N] compressed segment idx
    seg_sum = jax.ops.segment_sum(jnp.where(live_s[:, None], pts_s, 0.0), seg, num_segments=n)
    seg_cnt = jax.ops.segment_sum(live_s.astype(jnp.float32), seg, num_segments=n)
    centroid = seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None]

    # representative = first sorted row of each segment; map back to original rows
    first_in_seg = new_seg & live_s
    # original row index of the first row of segment s:
    first_orig = jax.ops.segment_min(
        jnp.where(live_s, order, _INT32_MAX), seg, num_segments=n
    )  # [n_seg] first (lowest) original row per segment
    rep_row_per_point_sorted = first_orig[seg]  # [N] in sorted order
    trace = jnp.full(n, -1, dtype=jnp.int32)
    trace = trace.at[order].set(
        jnp.where(live_s, rep_row_per_point_sorted.astype(jnp.int32), -1)
    )
    rep_mask = jnp.zeros(n, dtype=bool)
    rep_mask = rep_mask.at[jnp.where(first_in_seg, first_orig[seg], n)].set(
        True, mode="drop"
    )
    rep_points = points
    # write centroids into representative rows
    seg_of_first = jnp.where(first_in_seg, seg, n)
    rep_points = rep_points.at[jnp.where(first_in_seg, first_orig[seg], n)].set(
        centroid[jnp.minimum(seg_of_first, n - 1)], mode="drop"
    )
    return rep_points, rep_mask & finite, trace


@jax.jit
def voxel_downsample(
    points: Array,
    voxel_size: Array | float,
    mask: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Voxel-grid downsample with centroid representatives and trace.

    Returns ``(rep_points [N,3], rep_mask [N] bool, trace [N] i32)``:
    representative rows keep their original row position (rep_mask marks one
    row per occupied voxel; its coordinates become the voxel centroid — the
    same semantics as Open3D's averaging voxel_down_sample), and ``trace[i]``
    is the representative row index for original point i (-1 for dead rows).

    ``voxel_size`` is TRACED (the body never shapes on it): marking it
    static compiled one full N-sized program per distinct float — 150
    variants in the round-3 compile cache, and the sphere-QSM ×1.3 voxel
    ladder paid a fresh multi-minute axon compile per rung.
    """
    if mask is None:
        mask = jnp.ones(points.shape[0], dtype=bool)
    return _voxel_downsample_body(points, voxel_size, mask)


@jax.jit
def voxel_downsample_batch(
    points: Array,  # [T, P, 3]
    voxel_sizes: Array,  # [T] f32 — traced, may differ per tree
    masks: Array,  # [T, P]
) -> tuple[Array, Array, Array]:
    """Batched voxel downsample with PER-TREE voxel sizes in one dispatch.
    The plot pipeline's resolution ladder uses this to probe/realise every
    tree's rung simultaneously instead of one host-synced dispatch per tree
    per rung."""
    return jax.vmap(_voxel_downsample_body)(points, voxel_sizes, masks)


@jax.jit
def voxel_count_batch(
    points: Array,  # [T, P, 3]
    voxel_sizes: Array,  # [T] f32
    masks: Array,  # [T, P]
) -> Array:
    """Occupied-voxel count per tree at per-tree voxel sizes — the ladder's
    search probe. One batched lexsort; no centroid/trace work."""

    def one(pts, v, mask):
        finite = mask & jnp.all(jnp.isfinite(pts), axis=-1)
        safe = jnp.where(finite[:, None], pts, 0.0)
        lo = jnp.min(jnp.where(finite[:, None], safe, jnp.inf), axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        coords = jnp.floor((safe - lo[None, :]) / v).astype(jnp.int32)
        coords = jnp.where(finite[:, None], coords, _INT32_MAX)
        order = jnp.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
        cs = coords[order]
        live = finite[order]
        new_seg = jnp.concatenate(
            [jnp.array([True]), jnp.any(cs[1:] != cs[:-1], axis=1)]
        )
        return jnp.sum((new_seg & live).astype(jnp.int32))

    return jax.vmap(one)(points, voxel_sizes, masks)


@jax.jit
def compact_rows_batch(points: Array, masks: Array) -> tuple[Array, Array]:
    """Device-side batched compaction: per batch row, move live entries to
    the front (stable). Returns ``(points', masks')`` at the same capacity —
    callers slice the leading columns once the live maximum is known."""
    order = jnp.argsort(jnp.where(masks, 0, 1), axis=1, stable=True)
    pts = jnp.take_along_axis(points, order[..., None], axis=1)
    msk = jnp.take_along_axis(masks, order, axis=1)
    return jnp.where(msk[..., None], pts, 0.0), msk


@partial(jax.jit, static_argnames=("u_cap",))
def label_segments(labels: Array, u_cap: int) -> tuple:
    """Device-side ``np.unique(labels[labels >= 0], return_counts=True)``.

    Returns ``(order, slab, vals, counts, n_unique)`` where ``order`` is the
    stable sort permutation, ``slab = labels[order]``, and ``vals``/``counts``
    are the ascending unique non-negative labels (-1 / 0 padded to
    ``u_cap``). Downloading ``vals``/``counts`` costs KBs where the full
    label array is 40 MB at 10M points — over the TPU tunnel that transfer
    (plus the matching index re-upload) was most of the plot pipeline's
    ladder-prep wall. ``order``/``slab`` stay on device for
    :func:`rows_for_labels` to reuse."""
    order = jnp.argsort(labels, stable=True).astype(jnp.int32)
    slab = labels[order]
    first = jnp.concatenate([jnp.ones(1, bool), slab[1:] != slab[:-1]])
    first = first & (slab >= 0)
    starts = nonzero_rows(first, u_cap)
    vals = jnp.where(starts >= 0, slab[jnp.maximum(starts, 0)], -1)
    ends = jnp.searchsorted(slab, vals, side="right").astype(jnp.int32)
    begins = jnp.searchsorted(slab, vals, side="left").astype(jnp.int32)
    counts = jnp.where(starts >= 0, ends - begins, 0)
    return order, slab, vals, counts, jnp.sum(first.astype(jnp.int32))


@partial(jax.jit, static_argnames=("cap",))
def rows_for_labels(order: Array, slab: Array, kept: Array, cap: int) -> Array:
    """Row indices of each kept label as a ``[T, cap]`` buffer (-1 padded),
    rows ascending within each tree (stable sort order). Built entirely on
    device from :func:`label_segments`'s sort — replaces a host
    ``np.flatnonzero`` loop plus a [T, cap] index upload."""
    n = order.shape[0]
    starts = jnp.searchsorted(slab, kept, side="left").astype(jnp.int32)
    counts = jnp.searchsorted(slab, kept, side="right").astype(jnp.int32) - starts
    j = jnp.arange(cap, dtype=jnp.int32)
    pos = jnp.clip(starts[:, None] + j[None, :], 0, n - 1)
    ok = j[None, :] < counts[:, None]
    return jnp.where(ok, order[pos], -1)


@partial(jax.jit, static_argnames=("cap",))
def nonzero_rows(mask: Array, cap: int) -> Array:
    """Device-side compaction index: the live row indices front-packed into
    a ``cap``-length buffer (-1 padding). The only host sync a caller needs
    is the 4-byte live COUNT (to pick a static cap) — not the full mask
    (a 10M-point bool mask is a 10 MB transfer over the TPU tunnel)."""
    return jnp.nonzero(mask, size=cap, fill_value=-1)[0].astype(jnp.int32)


def compact_rows(
    points: Array,
    mask: Array,
    *extra: Array,
    pad_multiple: int = 2048,
) -> tuple:
    """Gather live rows into a fresh buffer padded to the next multiple of
    ``pad_multiple``. Use at capacity boundaries — padded capacity drives
    the cost of every downstream O(N·M) kernel (a 1M-capacity buffer with
    40k live rows runs brute-force kNN at 1M², not 40k²). Device-resident:
    only the live count crosses to the host.

    Returns ``(points', mask', rows, *extra')`` where ``rows`` maps compact
    rows back to original indices (-1 on padding)."""
    m = int(jnp.sum(mask))
    cap = max(pad_multiple, -pad_multiple * (-m // pad_multiple))
    rows = nonzero_rows(mask, cap)
    valid = rows >= 0
    safe = jnp.maximum(rows, 0)
    out_pts = jnp.where(valid[:, None], points[safe], 0.0)
    outs = []
    for arr in extra:
        v = arr[safe]
        fill = jnp.zeros((), v.dtype) if v.dtype != jnp.int32 else jnp.int32(-1)
        if v.ndim == 1:
            outs.append(jnp.where(valid, v, fill))
        else:
            outs.append(jnp.where(valid.reshape(-1, *([1] * (v.ndim - 1))), v, fill))
    return (out_pts, valid, rows, *outs)


@partial(jax.jit, static_argnames=("every_k",))
def uniform_downsample(mask: Array, every_k: int) -> Array:
    """Keep every k-th live point (Open3D ``uniform_down_sample`` semantics:
    index-ordered). Returns refined mask."""
    live_rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    return mask & (live_rank % every_k == 0)


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    points: Array,
    n_samples: int,
    mask: Array | None = None,
    start: int = 0,
) -> Array:
    """FPS: returns ``idx [n_samples] i32`` of selected rows (first = lowest
    live row unless ``start`` given). Classic O(S·N) min-distance update,
    fully on device (cf. PAPERS.md FuseFPS/FlashFPS for pruning directions).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones(n, dtype=bool)
    pts = jnp.where(mask[:, None], points, jnp.inf)
    safe = jnp.where(mask[:, None], points, 0.0)
    # first live row at/after `start`
    live_idx = jnp.where(mask, jnp.arange(n), n)
    first = jnp.min(jnp.where(live_idx >= start, live_idx, n))
    first = jnp.where(first >= n, jnp.argmax(mask), first).astype(jnp.int32)

    def body(carry, _):
        min_d2, last = carry
        diff = safe - safe[last][None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(mask, d2, -jnp.inf)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        return (min_d2, nxt), last

    init = (jnp.where(mask, jnp.inf, -jnp.inf), first)
    (_, _), picks = jax.lax.scan(body, init, None, length=n_samples)
    return picks
