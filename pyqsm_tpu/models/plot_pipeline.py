"""Whole-plot pipeline: isolate → per-tree skeleton QSM + metrics.

The end-to-end driver for BASELINE config 3 ("multi-tree 10M-pt plot: kNN
graph + tree isolation + per-tree QSM") — the composition the reference
spreads across ``tree_isolation.py`` → ``pipeline.loop_over_files`` →
``qsm_generation.py``/``canopy_metrics.py`` with pickles in between. Here
the plot stays device-resident; each tree is compacted to a tight buffer
(shared capacity buckets keep recompiles bounded) and skeletonized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.config import Config, IsolationConfig
from pyqsm_tpu.models.canopy import canopy_metrics
from pyqsm_tpu.models.isolation import GrowthResult, build_trees

from pyqsm_tpu.state import Cylinders

Array = jax.Array


class TreeResult(NamedTuple):
    tree_id: int
    n_points: int
    cylinders: Cylinders
    metrics: dict | None


class PlotResult(NamedTuple):
    growth: GrowthResult
    trees: list[TreeResult]
    timings: dict | None = None  # per-stage wall seconds (forced syncs)


def process_plot(
    points: Array,
    mask: Array,
    cfg: Config | None = None,
    iso_cfg: IsolationConfig | None = None,
    skeleton_voxel: float = 0.05,
    max_skeleton_points: int = 50_000,
    min_tree_points: int = 500,
    with_metrics: bool = False,
    max_trees: int | None = None,
    mesh=None,
    progress=None,
) -> PlotResult:
    """Isolate every tree and fit a skeleton QSM per tree.

    ``mesh``: optional ``jax.sharding.Mesh`` — the growth loop runs sharded
    over the point axis (ICI label exchange) and the batched contraction
    runs data-parallel over the trees axis; semantics identical to the
    single-device path (tested for equality).

    ``progress``: optional ``callable(stage: str, stage_s: float)`` fired
    after each stage completes (isolation/ladder/contraction/topology) —
    lets a deadline-bounded caller (bench.py) publish partial progress so
    a mid-pipeline kill still leaves evidence of work done. Exceptions from
    the callback are swallowed."""
    import time

    if cfg is None:
        cfg = Config()

    def _tick(stage: str, stage_s: float) -> None:
        if progress is not None:
            try:
                progress(stage, stage_s)
            except Exception:  # noqa: BLE001 — observer must not kill the run
                pass

    timings: dict = {}
    t0 = time.perf_counter()
    growth = build_trees(points, mask, iso_cfg, mesh=mesh)
    # honest stage timing without the 40 MB label download: a 4-byte scalar
    # forces the device queue to drain over the tunnel (block_until_ready
    # returns early on axon)
    from pyqsm_tpu.ops.sampling import label_segments, rows_for_labels

    seg_order, seg_slab, seg_vals, seg_counts, seg_n = label_segments(
        growth.labels, u_cap=4096)
    n_uniq = int(seg_n)
    timings["isolation_s"] = round(time.perf_counter() - t0, 2)
    _tick("isolation", timings["isolation_s"])
    t0 = time.perf_counter()
    if n_uniq > 4096:  # more trees than the device buffer — host fallback
        lab = np.asarray(growth.labels)
        uniq, counts = np.unique(lab[lab >= 0], return_counts=True)
    else:
        uniq = np.asarray(seg_vals[:n_uniq])
        counts = np.asarray(seg_counts[:n_uniq])
    order = np.argsort(-counts)
    uniq, counts = uniq[order], counts[order]
    if max_trees is not None:
        uniq, counts = uniq[:max_trees], counts[:max_trees]

    # batched resolution ladder: ALL trees are gathered into one [T, capT]
    # buffer and their rungs found together — a per-tree binary search over
    # the shared geometric rung grid skeleton_voxel·1.3^k, every probe ONE
    # batched dispatch + ONE host sync for the whole plot (the sequential
    # per-tree ladder was ~30 synced dispatches ≈ 10s of tunnel latency at
    # 8 trees; this is ≤ ceil(log2(#rungs)) + 2).
    kept_ids = [int(t) for t, c in zip(uniq, counts) if c >= min_tree_points]
    kept_counts = [int(c) for t, c in zip(uniq, counts) if c >= min_tree_points]
    if not kept_ids:
        return PlotResult(growth, [], timings)
    t_n = len(kept_ids)
    cap_t = -2048 * (-max(kept_counts) // 2048)
    # per-tree row gather on device (reuses label_segments' sort): the host
    # path materialized and uploaded a [T, cap_t] index array — ~100 MB at
    # plot scale, paid at tunnel upload rates
    idx_raw = rows_for_labels(seg_order, seg_slab,
                              jnp.asarray(kept_ids, jnp.int32), cap_t)
    tree_m = idx_raw >= 0
    tree_p = jnp.where(tree_m[..., None], points[jnp.maximum(idx_raw, 0)], 0.0)

    # rung policy: finest rung with occupied-voxel count <= cap (monotone in
    # rung → per-tree binary search, all trees probed per iteration), bounded
    # by the first rung at voxel >= 0.5 (the sequential ladder's stop rule)
    from pyqsm_tpu.ops.sampling import (
        compact_rows_batch, voxel_count_batch, voxel_downsample_batch,
    )

    n_rungs = 1
    while skeleton_voxel * 1.3 ** (n_rungs - 1) < 0.5:
        n_rungs += 1
    lo_r = np.zeros(t_n, np.int32)
    hi_r = np.full(t_n, n_rungs - 1, np.int32)
    while np.any(lo_r < hi_r):
        act = lo_r < hi_r
        mid = (lo_r + hi_r) // 2
        voxels = (skeleton_voxel * 1.3 ** mid).astype(np.float32)
        cnt = np.asarray(voxel_count_batch(tree_p, jnp.asarray(voxels), tree_m))
        ok = cnt <= max_skeleton_points
        hi_r = np.where(act & ok, mid, hi_r)
        lo_r = np.where(act & ~ok, mid + 1, lo_r)
    final_v = (skeleton_voxel * 1.3 ** lo_r).astype(np.float32)
    rep_p, rep_m, _ = voxel_downsample_batch(tree_p, jnp.asarray(final_v), tree_m)
    rep_p, rep_m = compact_rows_batch(rep_p, rep_m)
    n_rep = int(np.asarray(jnp.max(jnp.sum(rep_m, axis=1))))
    # bucket the shared capacity to a coarse grid: contraction compiles are
    # minutes on remote TPUs, and per-plot caps otherwise vary by one
    # 2048-row pad step between runs
    cap = int(-8192 * (-max(n_rep, 1) // 8192))
    if cap <= cap_t:
        batch_p = rep_p[:, :cap]
        batch_m = rep_m[:, :cap]
    else:
        batch_p = jnp.pad(rep_p, ((0, 0), (0, cap - cap_t), (0, 0)))
        batch_m = jnp.pad(rep_m, ((0, 0), (0, cap - cap_t)))
    tree_arrays = [
        (batch_p[i], batch_m[i], kept_counts[i]) for i in range(t_n)
    ]

    from pyqsm_tpu.models.skeleton import (
        extract_skeleton_batch, extract_topology, skeleton_to_qsm,
    )

    timings["ladder_s"] = round(time.perf_counter() - t0, 2)
    _tick("ladder", timings["ladder_s"])
    t0 = time.perf_counter()
    skels = extract_skeleton_batch(batch_p, batch_m, cfg.skeletonize, mesh=mesh)
    jax.block_until_ready(skels.contracted)
    _ = float(jnp.sum(skels.total_shift))  # axon: block returns early
    timings["contraction_s"] = round(time.perf_counter() - t0, 2)
    _tick("contraction", timings["contraction_s"])
    t0 = time.perf_counter()

    trees: list[TreeResult] = []
    for i, (tree_id, (p2, m2, n_tree)) in enumerate(zip(kept_ids, tree_arrays)):
        topo = extract_topology(
            skels.contracted[i][: p2.shape[0]], m2,
            skels.total_shift[i][: p2.shape[0]], cfg.skeletonize.graph_k_n,
        )
        cyls = skeleton_to_qsm(topo)
        metrics = None
        if with_metrics:
            metrics = canopy_metrics(
                p2, m2, shift=skels.first_shift[i][: p2.shape[0]])
        trees.append(TreeResult(tree_id, n_tree, cyls, metrics))
    timings["topology_s"] = round(time.perf_counter() - t0, 2)
    _tick("topology", timings["topology_s"])
    return PlotResult(growth, trees, timings)
