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

from pyqsm_tpu.ops.sampling import compact_rows, voxel_downsample
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
) -> PlotResult:
    """Isolate every tree and fit a skeleton QSM per tree.

    ``mesh``: optional ``jax.sharding.Mesh`` — the growth loop runs sharded
    over the point axis (ICI label exchange) and the batched contraction
    runs data-parallel over the trees axis; semantics identical to the
    single-device path (tested for equality)."""
    import time

    if cfg is None:
        cfg = Config()
    timings: dict = {}
    t0 = time.perf_counter()
    growth = build_trees(points, mask, iso_cfg, mesh=mesh)
    lab = np.asarray(growth.labels)  # forced transfer = honest stage timing
    timings["isolation_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    uniq, counts = np.unique(lab[lab >= 0], return_counts=True)
    order = np.argsort(-counts)
    uniq, counts = uniq[order], counts[order]
    if max_trees is not None:
        uniq, counts = uniq[:max_trees], counts[:max_trees]

    # per-tree downsample + compaction into ONE shared capacity bucket so the
    # batched contraction compiles once and vmaps over the trees axis
    kept_ids: list[int] = []
    tree_arrays: list[tuple] = []
    warm_rung = 0  # similar-density trees start near the answer
    for tree_id, n_tree in zip(uniq, counts):
        if n_tree < min_tree_points:
            continue
        # compact the tree FIRST: the voxel ladder then runs on a tree-sized
        # buffer instead of the full plot capacity (at 10M-pt plots every
        # ladder rung would otherwise be a full-capacity dispatch per tree)
        tpts, tmask_c, _ = compact_rows(points, jnp.asarray(lab == tree_id))
        # warm-started ladder: step DOWN while comfortably under the cap,
        # step UP while over — trees in a plot share density, so after the
        # first tree this is ~1 rung instead of ~9 (each rung is a synced
        # full-tree dispatch; the cold ladder was 30% of pipeline time).
        # Rungs live on the fixed geometric grid skeleton_voxel·1.3^k so
        # the static voxel values (jit keys) stay identical across trees.
        rung = warm_rung
        voxel = skeleton_voxel * 1.3 ** rung
        p2, m2, _ = voxel_downsample(tpts, voxel, tmask_c)
        n2 = int(jnp.sum(m2))
        while n2 < 0.6 * max_skeleton_points and rung > 0:
            rung -= 1
            voxel = skeleton_voxel * 1.3 ** rung
            p2, m2, _ = voxel_downsample(tpts, voxel, tmask_c)
            n2 = int(jnp.sum(m2))
        while n2 > max_skeleton_points and voxel < 0.5:
            rung += 1
            voxel = skeleton_voxel * 1.3 ** rung
            p2, m2, _ = voxel_downsample(tpts, voxel, tmask_c)
            n2 = int(jnp.sum(m2))
        warm_rung = rung
        p2, m2, _ = compact_rows(p2, m2)
        kept_ids.append(int(tree_id))
        tree_arrays.append((p2, m2, int(n_tree)))
    if not tree_arrays:
        return PlotResult(growth, [], timings)

    # bucket the shared capacity to a coarse grid: contraction compiles are
    # minutes on remote TPUs, and per-plot caps otherwise vary by one
    # 2048-row pad step between runs
    cap = max(p.shape[0] for p, _, _ in tree_arrays)
    cap = -8192 * (-cap // 8192)
    batch_p = jnp.stack([
        jnp.pad(p, ((0, cap - p.shape[0]), (0, 0))) for p, _, _ in tree_arrays
    ])
    batch_m = jnp.stack([
        jnp.pad(m, (0, cap - m.shape[0])) for _, m, _ in tree_arrays
    ])

    from pyqsm_tpu.models.skeleton import (
        extract_skeleton_batch, extract_topology, skeleton_to_qsm,
    )

    timings["ladder_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    skels = extract_skeleton_batch(batch_p, batch_m, cfg.skeletonize, mesh=mesh)
    jax.block_until_ready(skels.contracted)
    _ = float(jnp.sum(skels.total_shift))  # axon: block returns early
    timings["contraction_s"] = round(time.perf_counter() - t0, 2)
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
    return PlotResult(growth, trees, timings)
