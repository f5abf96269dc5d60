"""Plot-scale tree isolation.

TPU-native rebuild of ``pyQSM/tree_isolation.py``:

- ``id_trunk_bases`` (ref :285-326): z-percentile split (low 0–3%), clean,
  building-region exclusion, DBSCAN(eps=1, min=300) on the low slice.
- ``extend_seed_clusters`` (ref :63-283): the reference loops serially over
  clusters × cycles, issuing one KD-tree query per cluster per cycle and
  claiming points through a python dict — the scaling bottleneck named in
  BASELINE.md. Here the whole growth is **synchronous parallel label
  propagation** over a static radius graph: one fused kernel per cycle claims
  for *all* clusters at once (scatter-min tie-break on cluster id), with the
  reference's retirement rule (cluster stops when its new frontier < 5,
  ref :250-261) applied per cycle via segment counts.

Differences (documented policies, not bugs): claims are tie-broken by
smallest cluster id instead of serial visit order; the per-cycle k=200 cap
becomes a per-edge cap on the radius graph (growth still saturates through
cycles); the interactive ``input()`` continue-gate (ref :262-265) and DBSCAN
runaway check (ref :213-225) become the ``max_cycles`` parameter and an
optional growth-order output for post-hoc auditing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.config import IsolationConfig
from pyqsm_tpu.ops.cluster import dbscan_from_neighbors
from pyqsm_tpu.ops.geometry import percentile_mask, zoom_mask
from pyqsm_tpu.ops.neighbors import radius_knn


Array = jax.Array
_BIG = jnp.int32(2**30)


class GrowthResult(NamedTuple):
    labels: Array  # [N] i32 tree id per point (-1 unclaimed)
    order: Array  # [N] i32 cycle at which each point was claimed (-1)
    cycles_run: Array  # scalar i32
    active: Array  # [cluster_cap (or N)] bool — cluster-id-indexed activity at exit


# Diagnostic: the claim kernel the last region_grow call actually ran
# ("gather" | "push" | "band"). The push/band paths silently fall back to
# gather when their preconditions fail (in-degree cap, spill overflow), so
# equality tests read this to prove the intended kernel engaged rather than
# comparing gather to itself (ADVICE r4).
LAST_CLAIM_KERNEL: str = "?"


def region_grow(
    nbr_idx: Array,  # [N, k] radius-graph neighbors (-1 padded)
    seed_labels: Array,  # [N] i32 initial cluster ids (-1 = unclaimed)
    mask: Array,  # [N] live points
    max_cycles: int = 200,
    min_frontier: int = 5,
    scatter_push: bool = False,
    cluster_cap: int | None = None,
    active0: Array | None = None,
    kt_max: int = 128,
) -> GrowthResult:
    """Grow all seed clusters simultaneously until frontier exhaustion.

    ``scatter_push`` additionally propagates along in-edges (frontier points
    push labels at their neighbors) — needed only when the k-cap makes the
    graph strongly asymmetric; TPU scatters are expensive, and gather-only
    claims converge to the same labels through closer-neighbor chains.

    ``cluster_cap``: static upper bound on label VALUES (labels < cap). With
    compacted ids (see ``build_trees``) the per-cycle retirement count is a
    segment-sum over ~#trees segments instead of N — the N-segment scatter
    was the cycle's dominant cost (measured ~50 ms/cycle at 409k pts).

    ``active0``: optional [cluster_cap] activity carried in from a previous
    chunk — lets callers observe growth in host-stepped chunks (TB-3D-style
    logging, ref tree_isolation.py:81-87) with identical final labels.

    Dispatch: at plot scale (rows a multiple of 256, few cluster ids, rows
    spatially ordered by the caller) the per-cycle claim runs BLOCK-BANDED —
    the min-id claim over frontier neighbors is a one-hot OR over the radius
    graph, so the same banded window + exact spill list the contraction CG
    uses turns the cycle's [N, k] scalar gather (its dominant cost: ~0.24 s
    per cycle at [1.53M, 16] on v5e) into batched MXU matmuls. Claims are
    bit-identical to the gather path (same edge set, same min-id
    tie-break); spill overflow falls back to the gather path."""
    n, k = nbr_idx.shape
    # The banded claim is kept as an opt-in (PYQSM_CLAIM=band): measured on
    # v5e at the 10M-pt headline (1.53M reps, k=16, 42 cycles) it runs 3x
    # SLOWER than the gather kernel (29.8 s vs 10.0 s steady, plus a 16 s
    # band build) — the one-hot OR reads the full 768-wide bf16 band
    # (~2.3 GB) every cycle while the gather reads ~100 MB of [N, k] rows.
    # MXU eligibility doesn't pay when the claim is bandwidth-bound and the
    # band carries 3 x BAND_BLOCK columns for k=16 edges. Labels are
    # bit-identical either way (equality- and fuzz-tested).
    import os

    mode = os.environ.get("PYQSM_CLAIM", "auto")
    use_band = (
        mode == "band"
        and not scatter_push
        and cluster_cap is not None
        and cluster_cap <= 128
        and n % 256 == 0
        and n >= 32768
        and _band_claim_bytes(n, int(cluster_cap)) <= _band_bytes_budget()
    )
    global LAST_CLAIM_KERNEL
    if use_band:
        b_adj, s_i, s_j, s_w, over = _claim_band(nbr_idx, mask)
        if not bool(over):
            LAST_CLAIM_KERNEL = "band"
            return _region_grow_banded(
                b_adj, s_i, s_j, s_w, seed_labels, mask,
                max_cycles=max_cycles, min_frontier=min_frontier,
                cluster_cap=int(cluster_cap), active0=active0)
    # frontier-compacted push (the default at scale): per-cycle cost is
    # proportional to the claim FRONT, not the cloud — every row is claimed
    # once, so total claim work is O(N·kt) over the whole run instead of
    # O(cycles·N·k). Bit-identical labels (same edge set, same min-id
    # tie-break); falls back to the gather kernel when the transpose
    # in-degree overflows its cap.
    use_push = (
        mode in ("auto", "push")
        and not scatter_push
        and cluster_cap is not None
        and (n >= 262144 or mode == "push")
    )
    if use_push:
        res = _region_grow_push(
            nbr_idx, seed_labels, mask, max_cycles=max_cycles,
            min_frontier=min_frontier, cluster_cap=int(cluster_cap),
            active0=active0, kt_max=kt_max)
        if res is not None:
            LAST_CLAIM_KERNEL = "push"
            return res
    LAST_CLAIM_KERNEL = "gather"
    return _region_grow_gather(
        nbr_idx, seed_labels, mask, max_cycles=max_cycles,
        min_frontier=min_frontier, scatter_push=scatter_push,
        cluster_cap=cluster_cap, active0=active0)


def _band_claim_bytes(n: int, cluster_cap: int) -> int:
    """Resident-HBM estimate of the banded claim at ``n`` rows: the
    [n/256, 256, 768] bf16 window blocks (1536 B/row — ~24x the k=16 ELL
    footprint), the 6n-entry spill triplet (i32+i32+bf16), and the per-cycle
    one-hot frontier / proposer-count pair ([n, c] bf16 + f32)."""
    return n * (1536 + 6 * 10 + 6 * cluster_cap)


def _band_bytes_budget() -> int:
    """Upper bound on banded-claim HBM (default 8 GiB — at 10M-pt plots the
    ~3-4M voxel representatives cost ~5-6 GiB of band, which fits v5e's
    16 GiB alongside the resident cloud; larger inputs must ride the gather
    kernel rather than risk RESOURCE_EXHAUSTED mid-bench). Override with
    ``PYQSM_BAND_BYTES_BUDGET``."""
    import os

    return int(os.environ.get("PYQSM_BAND_BYTES_BUDGET", 8 << 30))


@jax.jit
def _claim_band(nbr_idx: Array, mask: Array):
    """Block-banded adjacency of the (masked) radius graph, weights 1."""
    from pyqsm_tpu.ops.sparse import build_banded

    n = nbr_idx.shape[0]
    edge = (nbr_idx >= 0) & mask[:, None] & mask[jnp.clip(nbr_idx, 0, n - 1)]
    idx = jnp.where(edge, nbr_idx, -1)
    w = edge.astype(jnp.bfloat16)
    return build_banded(idx, w, spill_cap=6 * n)


@partial(jax.jit, static_argnames=("max_cycles", "min_frontier", "cluster_cap"))
def _region_grow_banded(
    b_adj: Array, s_i: Array, s_j: Array, s_w: Array,
    seed_labels: Array, mask: Array,
    max_cycles: int, min_frontier: int, cluster_cap: int,
    active0: Array | None = None,
) -> GrowthResult:
    from pyqsm_tpu.ops.sparse import _band_apply, _spill_apply

    n = seed_labels.shape[0]
    c = int(cluster_cap)
    cids = jnp.arange(c, dtype=jnp.int32)

    labels0 = jnp.where(mask, seed_labels, -1)
    frontier0 = labels0 >= 0
    order0 = jnp.where(frontier0, 0, -1)
    if active0 is None:
        active0 = jnp.ones(c, dtype=bool)

    def cond(state):
        labels, frontier, order, active, cyc = state
        return jnp.any(frontier) & (cyc < max_cycles)

    def body(state):
        labels, frontier, order, active, cyc = state
        lab_c = jnp.clip(labels, 0, c - 1)
        # one-hot frontier (proposer's cluster must be active), bf16: the
        # banded matmul counts proposers per cluster — only >0 matters, and
        # nonneg bf16 sums never round a positive count to zero
        F = (frontier & active[lab_c] & (labels >= 0))[:, None] & (
            lab_c[:, None] == cids[None, :])
        Fb = F.astype(jnp.bfloat16)
        Y = _band_apply(b_adj, Fb) + _spill_apply(s_i, s_j, s_w, Fb, n,
                                                  sorted_dst=True)
        has = Y > 0
        first = jnp.argmax(has, axis=1).astype(jnp.int32)  # min id = first set
        cand = jnp.where(jnp.any(has, axis=1), first, _BIG)

        unclaimed = mask & (labels < 0)
        newly = unclaimed & (cand < _BIG)
        labels = jnp.where(newly, cand, labels)
        order = jnp.where(newly, cyc + 1, order)

        key = jnp.where(newly, jnp.clip(labels, 0, c - 1), c)
        new_counts = jax.ops.segment_sum(
            newly.astype(jnp.int32), key, num_segments=c + 1
        )[:c]
        active = active & (new_counts >= min_frontier)
        frontier = newly & active[jnp.clip(labels, 0, c - 1)]
        return labels, frontier, order, active, cyc + 1

    labels, _, order, active, cyc = jax.lax.while_loop(
        cond, body, (labels0, frontier0, order0, active0, jnp.int32(0))
    )
    return GrowthResult(labels, order, cyc, active)


@jax.jit
def _masked_edges_and_indeg(nbr_idx: Array, mask: Array):
    """Edge-masked neighbor lists (the exact edge set the gather claim uses)
    plus the max in-degree — sizes the transpose ELL cap."""
    n = nbr_idx.shape[0]
    edge = (nbr_idx >= 0) & mask[:, None] & mask[jnp.clip(nbr_idx, 0, n - 1)]
    idx_m = jnp.where(edge, nbr_idx, -1)
    dst = jnp.where(edge, nbr_idx, n).reshape(-1)
    cnt = jax.ops.segment_sum(
        jnp.ones_like(dst), dst, num_segments=n + 1)[:n]
    return idx_m, edge, jnp.max(cnt)


@partial(jax.jit, static_argnames=("min_frontier", "cluster_cap", "f_cap"))
def _push_cycle(
    t_idx: Array, labels: Array, order: Array, active: Array,
    f_rows: Array, mask: Array, cyc: Array,
    min_frontier: int, cluster_cap: int, f_cap: int,
):
    """One claim cycle driven from the compacted frontier: each frontier row
    pushes its cluster id (scatter-MIN — the gather path's min-id tie-break)
    along its in-edge transpose rows; unclaimed receivers claim."""
    n = labels.shape[0]
    c = cluster_cap
    fr = jnp.maximum(f_rows, 0)
    valid = f_rows >= 0
    lab_f = labels[fr]
    act_f = valid & (lab_f >= 0) & active[jnp.clip(lab_f, 0, c - 1)]
    tgt = t_idx[fr]  # [f_cap, kt] rows whose neighbor lists contain fr
    tgt_ok = act_f[:, None] & (tgt >= 0)
    code_f = jnp.where(act_f, lab_f, _BIG)
    cand = jnp.full(n + 1, _BIG, jnp.int32).at[
        jnp.where(tgt_ok, tgt, n)
    ].min(jnp.broadcast_to(code_f[:, None], tgt.shape), mode="drop")[:n]

    unclaimed = mask & (labels < 0)
    newly = unclaimed & (cand < _BIG)
    labels = jnp.where(newly, cand, labels)
    order = jnp.where(newly, cyc + 1, order)

    key = jnp.where(newly, jnp.clip(labels, 0, c - 1), c)
    new_counts = jax.ops.segment_sum(
        newly.astype(jnp.int32), key, num_segments=c + 1)[:c]
    active = active & (new_counts >= min_frontier)
    frontier = newly & active[jnp.clip(labels, 0, c - 1)]
    return labels, order, active, frontier, jnp.sum(frontier)


def _region_grow_push(
    nbr_idx: Array,
    seed_labels: Array,
    mask: Array,
    max_cycles: int,
    min_frontier: int,
    cluster_cap: int,
    active0: Array | None = None,
    kt_max: int = 128,
) -> GrowthResult | None:
    """Frontier-compacted growth, bit-identical to ``_region_grow_gather``
    (equality- and fuzz-tested). The radius graph's transpose is built once
    (ELL rows of in-edges, exact up to ``kt_max`` in-degree — beyond that
    return None and let the caller fall back); each cycle then costs
    O(frontier·kt) scatter-min plus O(N) elementwise, with one 4-byte
    frontier-count sync. Measured v5e @10M headline: gather 10.0 s for 42
    cycles at [1.53M, 16]; the push front touches each row once."""
    from pyqsm_tpu.ops.sampling import nonzero_rows
    from pyqsm_tpu.ops.sparse import build_transpose_ell

    n, k = nbr_idx.shape
    c = int(cluster_cap)
    idx_m, edge, deg_max = _masked_edges_and_indeg(nbr_idx, mask)
    kt = 8
    while kt < int(deg_max):
        kt *= 2
    if kt > kt_max:
        return None
    t_idx, _, over = build_transpose_ell(idx_m, edge.astype(jnp.float32), kt=kt)
    if bool(over):  # cannot happen with kt >= deg_max; guard anyway
        return None

    labels = jnp.where(mask, seed_labels, -1)
    frontier = labels >= 0
    order = jnp.where(frontier, 0, -1)
    active = (jnp.ones(c, dtype=bool) if active0 is None
              else jnp.asarray(active0))
    nf = int(jnp.sum(frontier))
    cyc = 0
    while nf > 0 and cyc < max_cycles:
        f_cap = 1024
        while f_cap < nf:
            f_cap *= 4
        f_rows = nonzero_rows(frontier, f_cap)
        labels, order, active, frontier, nf_d = _push_cycle(
            t_idx, labels, order, active, f_rows, mask, jnp.int32(cyc),
            min_frontier=min_frontier, cluster_cap=c, f_cap=f_cap)
        nf = int(nf_d)
        cyc += 1
    return GrowthResult(labels, order, jnp.int32(cyc), active)


@partial(jax.jit, static_argnames=("max_cycles", "min_frontier", "scatter_push",
                                   "cluster_cap"))
def _region_grow_gather(
    nbr_idx: Array,
    seed_labels: Array,
    mask: Array,
    max_cycles: int = 200,
    min_frontier: int = 5,
    scatter_push: bool = False,
    cluster_cap: int | None = None,
    active0: Array | None = None,
) -> GrowthResult:
    n, k = nbr_idx.shape
    c = n if cluster_cap is None else int(cluster_cap)
    gidx = jnp.maximum(nbr_idx, 0)
    edge = (nbr_idx >= 0) & mask[:, None] & mask[jnp.clip(nbr_idx, 0, n - 1)]

    labels0 = jnp.where(mask, seed_labels, -1)
    frontier0 = labels0 >= 0
    order0 = jnp.where(frontier0, 0, -1)
    if active0 is None:
        active0 = jnp.ones(c, dtype=bool)  # indexed by cluster id

    def cond(state):
        labels, frontier, order, active, cyc = state
        return jnp.any(frontier) & (cyc < max_cycles)

    def body(state):
        labels, frontier, order, active, cyc = state
        # candidate label per unclaimed point: min cluster id among frontier
        # neighbors of still-active clusters. Fused: one [N] gather folds the
        # cluster-activity bit into a per-row code, so the inner loop costs a
        # single [N,k] gather (gathers are the cycle's bottleneck on TPU).
        act_self = active[jnp.clip(labels, 0, c - 1)]
        code = jnp.where(frontier & act_self & (labels >= 0), labels, _BIG)
        cand = jnp.min(jnp.where(edge, code[gidx], _BIG), axis=1)
        if scatter_push:
            # in-edges: frontier points push their label at their neighbors
            push_lab = jnp.where(
                (frontier & active[jnp.clip(labels, 0, c - 1)])[:, None] & edge,
                labels[:, None], _BIG,
            )
            tgt = jnp.where(edge, gidx, n)
            cand_in = jnp.full(n + 1, _BIG).at[tgt.reshape(-1)].min(
                jnp.broadcast_to(push_lab, tgt.shape).reshape(-1), mode="drop"
            )[:n]
            cand = jnp.minimum(cand, cand_in)

        unclaimed = mask & (labels < 0)
        newly = unclaimed & (cand < _BIG)
        labels = jnp.where(newly, cand, labels)
        order = jnp.where(newly, cyc + 1, order)

        # retirement: clusters with < min_frontier new points stop growing
        key = jnp.where(newly, jnp.clip(labels, 0, c - 1), c)
        new_counts = jax.ops.segment_sum(
            newly.astype(jnp.int32), key, num_segments=c + 1
        )[:c]
        active = active & (new_counts >= min_frontier)
        frontier = newly & active[jnp.clip(labels, 0, c - 1)]
        return labels, frontier, order, active, cyc + 1

    labels, _, order, active, cyc = jax.lax.while_loop(
        cond, body, (labels0, frontier0, order0, active0, jnp.int32(0))
    )
    return GrowthResult(labels, order, cyc, active)


def id_trunk_bases(
    points: Array,
    mask: Array,
    cfg: IsolationConfig | None = None,
    exclude_regions: list | None = None,
    clean: bool = True,
    coarsen_rows: int = 65536,
) -> tuple[Array, Array, Array]:
    """Find trunk-base seed clusters on the low z-slice
    (ref ``id_trunk_bases``, ``tree_isolation.py:285-326``).

    Returns ``(seed_labels [N], low_mask [N], high_mask [N])`` where
    seed_labels carries DBSCAN cluster ids on the low slice (-1 elsewhere).
    """
    if cfg is None:
        cfg = IsolationConfig()
    z = points[:, 2]
    low = percentile_mask(z, mask, 0.0, cfg.low_pctile)
    high = percentile_mask(z, mask, cfg.low_pctile, 100.0)
    if exclude_regions:
        for region in exclude_regions:
            low = zoom_mask(points, low, jnp.asarray(region), reverse=True)
            high = zoom_mask(points, high, jnp.asarray(region), reverse=True)
    # Compact the low slice to a small padded buffer before the O(M²) ops —
    # running them masked over the full array wastes 25x the work (the slice
    # is a few % of the cloud). Device-side nonzero: only the count syncs.
    from pyqsm_tpu.ops.sampling import nonzero_rows

    m = int(jnp.sum(low))
    cap = 1024
    while cap < m:
        cap *= 2
    bidx = nonzero_rows(low, cap)
    bmask = bidx >= 0
    bpts = points[jnp.maximum(bidx, 0)]

    # Seed-scale coarsening: DBSCAN(eps, min_points) only needs density at
    # the eps scale, but the O(M²) core-count/kNN below run at the INPUT
    # resolution — at reference isolation params (10M pts, 0.05 m reps)
    # the 3% slice is ~131k rows and these ops were the single largest
    # ref-params isolation stage (14.7 s steady on v5e). When the slice is
    # large, re-voxel it at eps/8 with per-rep multiplicity WEIGHTS: core
    # counting still counts slice ROWS (ref semantics: raw point counts,
    # tree_isolation.py:316), each displaced at most eps·√3/16. Small
    # slices keep the exact row-resolution path (bit-identical behavior).
    coarsen = cap > coarsen_rows
    if coarsen:
        from pyqsm_tpu.ops.sampling import compact_rows, voxel_downsample

        vpts, vmask, vtrace = voxel_downsample(
            bpts, float(cfg.base_eps) / 8.0, bmask)
        w_rep = jnp.zeros(cap + 1, jnp.float32).at[
            jnp.where(bmask & (vtrace >= 0), vtrace, cap)
        ].add(1.0, mode="drop")[:cap]
        spts, smask, srows, sweights = compact_rows(vpts, vmask, w_rep)
    else:
        spts, smask, sweights = bpts, bmask, None

    if clean:
        smask = _clean_slice(spts, smask)

    # DBSCAN on the low slice: eps=1 m, min 300 pts (ref :316). Exact core
    # counting via radius_count; small capped lists carry connectivity only
    # (large top_k is pathologically slow on TPU).
    from pyqsm_tpu.ops.neighbors import radius_count

    counts = radius_count(spts, spts, radius=cfg.base_eps,
                          query_mask=smask, point_mask=smask,
                          weights=sweights)
    core = smask & (counts >= cfg.base_min_points)
    d, i = radius_knn(spts, spts, radius=cfg.base_eps, k=32,
                      query_mask=smask, point_mask=smask)
    blabels = dbscan_from_neighbors(i, d, smask, min_samples=cfg.base_min_points,
                                    core=core)
    if coarsen:
        # expand rep labels to slice rows: slice row -> rep row (vtrace)
        # -> compact rep row (inverse of srows) -> label
        inv_v = jnp.full(cap + 1, -1, jnp.int32).at[
            jnp.where(smask, srows, cap)
        ].set(jnp.arange(srows.shape[0], dtype=jnp.int32), mode="drop")[:cap]
        crow = inv_v[jnp.maximum(vtrace, 0)]
        ok = bmask & (vtrace >= 0) & (crow >= 0)
        blabels = jnp.where(ok, blabels[jnp.maximum(crow, 0)], -1)
        # rows whose rep was cleaned away leave the low set entirely
        bmask = ok
    # scatter labels back to full rows
    n = points.shape[0]
    labels = jnp.full(n + 1, -1, jnp.int32).at[
        jnp.where(bmask, bidx, n)
    ].set(blabels, mode="drop")[:n]
    low = jnp.zeros(n + 1, bool).at[jnp.where(bmask, bidx, n)].set(
        True, mode="drop"
    )[:n]
    return labels, low, high


def _clean_slice(points: Array, mask: Array) -> Array:
    """Light outlier clean of the base slice (ref clean_cloud at :300-301),
    without voxelization so row identity is preserved."""
    from pyqsm_tpu.ops.outliers import statistical_outlier_mask

    return statistical_outlier_mask(points, mask, nb_neighbors=8, std_ratio=3.0)


def build_trees(
    points: Array,
    mask: Array,
    cfg: IsolationConfig | None = None,
    exclude_regions: list | None = None,
    neighbor_cap: int = 16,
    pre_voxel: float | None = None,
    mesh=None,
    observer=None,
    observe_every: int = 20,
) -> GrowthResult:
    """Full isolation: trunk bases → parallel region growing
    (ref ``build_trees_nogrid``, ``tree_isolation.py:400-423``; the grid-
    sharded ``build_trees_knn`` variant is unnecessary on TPU — the whole
    plot stays resident in HBM).

    NOTE: with pre-voxelization on, ``base_min_points`` counts voxel
    REPRESENTATIVES, not raw points — scale thresholds accordingly (a 0.05 m
    voxel reduces dense trunk slices ~5-20x).

    Scaling design: the cloud is voxel-downsampled to ``pre_voxel``
    (default ``max_dist/2`` — which *bounds* grid-cell occupancy, making the
    cell-blocked neighbor query exact and fast), the growth runs on the
    representatives, and labels/orders expand back to full resolution
    through the voxel trace — a gather, not the reference's 41-file rescan.

    ``mesh``: optional ``jax.sharding.Mesh`` — the growth loop then runs
    sharded over the mesh (graph rows over the point axis, ICI label
    exchange per cycle; see ``parallel/growth.py``) with identical semantics.

    ``observer``: optional callable ``(cycle, points, labels, order)`` fired
    every ``observe_every`` cycles with the representative cloud and current
    labels — the stepwise-growth observability of the reference's
    TensorBoard-3D summaries (``tree_isolation.py:81-87,163-179``); pair it
    with ``utils.viz.StepLogger.log``. Growth runs in host-stepped chunks
    with carried retirement state, so final labels are identical to the
    unobserved run.
    """
    from pyqsm_tpu.ops.neighbors import grid_self_radius_knn
    from pyqsm_tpu.ops.sampling import compact_rows, voxel_downsample

    if cfg is None:
        cfg = IsolationConfig()
    if pre_voxel is None:
        pre_voxel = cfg.max_dist / 2.0

    rep_pts, rep_mask, trace = voxel_downsample(points, pre_voxel, mask)
    # compact the representatives: the padded input capacity would otherwise
    # drive every growth-cycle gather (~2.5x waste at typical voxel ratios)
    rep_pts, rep_mask, rep_rows = compact_rows(rep_pts, rep_mask)
    # Morton-order the representatives: spatial locality in the row index is
    # what lets the growth cycles run their claim step block-banded on the
    # MXU (see region_grow). Dead rows sort to the tail; rep_rows keeps the
    # map back to original rows, so the final expansion is unchanged.
    from pyqsm_tpu.ops.sparse import morton_codes

    mperm = jnp.argsort(morton_codes(rep_pts, rep_mask))
    rep_pts = rep_pts[mperm]
    rep_mask = rep_mask[mperm]
    rep_rows = rep_rows[mperm]
    seed_labels, low, high = id_trunk_bases(rep_pts, rep_mask, cfg, exclude_regions)
    search = low | high
    # unsorted idx-only any-k: region growing needs connectivity, not
    # nearest ordering or distances — skipping the partial sort + distance
    # extraction halves the query (measured v5e)
    _, nbr_idx = grid_self_radius_knn(
        rep_pts, radius=cfg.max_dist, k=neighbor_cap, mask=search,
        sort=False, need_dists=False,
    )
    # compact seed ids to [0, C): ascending remap preserves the min-id
    # tie-break, and the per-cycle retirement segment-sum shrinks from N
    # segments to ~#trees (pow2 cap bounds recompiles). Runs on device —
    # the host path downloaded the full rep-scale label array (~16 MB at
    # 10M points) over the tunnel just to count unique ids.
    from pyqsm_tpu.ops.sampling import label_segments

    _, _, seg_vals, _, seg_n = label_segments(seed_labels, u_cap=4096)
    n_seed = int(seg_n)
    if n_seed > 4096:  # more seed clusters than the device table — host path
        lab_host = np.asarray(seed_labels)
        uniq_np = np.unique(lab_host[lab_host >= 0])
        n_seed = len(uniq_np)
        seg_vals = jnp.asarray(
            np.concatenate([uniq_np, np.full(1, -1, np.int32)]))
    ccap = 16
    while ccap < max(n_seed, 1):
        ccap *= 2
    vals_n = seg_vals[: max(n_seed, 1)]
    pos = jnp.searchsorted(vals_n, seed_labels).astype(jnp.int32)
    compact = jnp.where(seed_labels >= 0, pos, -1)
    if mesh is not None:
        from pyqsm_tpu.parallel.growth import region_grow_sharded

        res = region_grow_sharded(
            nbr_idx, jnp.asarray(compact), search, mesh,
            max_cycles=cfg.cycles, min_frontier=cfg.min_frontier,
            cluster_cap=ccap,
        )
    elif observer is not None:
        # host-stepped chunks: resume each chunk from the claimed labels
        # with the previous chunk's retirement state — claim fronts are
        # identical to one uninterrupted run (any unclaimed point's claimed
        # neighbors were claimed in the chunk's final cycle, so the next
        # chunk's first cycle sees exactly the same proposers)
        labels_c = jnp.asarray(compact)
        order_c = jnp.where(labels_c >= 0, 0, -1)
        active_c = None
        done = 0
        res = None
        while done < cfg.cycles:
            chunk = min(observe_every, cfg.cycles - done)
            res = region_grow(
                nbr_idx, labels_c, search,
                max_cycles=chunk, min_frontier=cfg.min_frontier,
                cluster_cap=ccap, active0=active_c,
            )
            ran = int(res.cycles_run)
            order_c = jnp.where(
                (order_c < 0) & (res.order > 0), done + res.order, order_c
            )
            labels_c, active_c = res.labels, res.active
            done += ran
            observer(done, rep_pts, labels_c, order_c)
            if ran < chunk:  # converged inside the chunk
                break
        res = GrowthResult(labels_c, order_c, jnp.int32(done), active_c)
    else:
        res = region_grow(
            nbr_idx, jnp.asarray(compact), search,
            max_cycles=cfg.cycles, min_frontier=cfg.min_frontier,
            cluster_cap=ccap,
        )
    # map compact ids back to the original DBSCAN ids
    lut = jnp.concatenate([vals_n, jnp.full(1, -1, jnp.int32)])
    res = res._replace(labels=jnp.where(
        res.labels >= 0,
        lut[jnp.clip(res.labels, 0, n_seed)], -1,
    ))
    # expand representative labels/orders to the full cloud: original-row ->
    # rep row (trace) -> compact row (inverse of rep_rows)
    n = points.shape[0]
    inv = jnp.full(n + 1, -1, jnp.int32).at[
        jnp.where(rep_mask, rep_rows, n)
    ].set(jnp.arange(rep_rows.shape[0], dtype=jnp.int32), mode="drop")[:n]
    crow = inv[jnp.maximum(trace, 0)]
    ok = mask & (trace >= 0) & (crow >= 0)
    safe = jnp.maximum(crow, 0)
    labels_full = jnp.where(ok, res.labels[safe], -1)
    order_full = jnp.where(ok, res.order[safe], -1)
    return GrowthResult(labels_full, order_full, res.cycles_run, res.active)
