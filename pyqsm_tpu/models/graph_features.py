"""Radius-graph structural features: leaf/branch separation & density masks.

Rebuilds the reference's graph-based segmentation utilities:

- ``leaf_mask_by_degree`` — degree-percentile split on the radius pair graph
  (``scripts/graph_based_leaf_id.py:33-38,80-99``): low-degree points are
  branch/wood (thin structures), high-degree points are leaf clumps.
- ``exclude_dense_areas`` — drop the largest connected components of the
  high-degree subgraph (``qsm_generation.py:526-556``, rustworkx connected
  components on the radius graph) so the QSM walk doesn't drown in foliage.
- ``leaf_mask_by_order_diff`` — growth-order differencing
  (``scripts/draw_completed_by_order.py:8-32``): points claimed in late
  region-growing cycles relative to their neighborhood are leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.cluster import connected_components, top_clusters
from pyqsm_tpu.ops.geometry import masked_percentile
from pyqsm_tpu.ops.neighbors import radius_count, radius_knn

Array = jax.Array


def leaf_mask_by_degree(
    points: Array,
    mask: Array,
    radius: float = 0.2,
    degree_pctile: float = 50.0,
) -> tuple[Array, Array]:
    """(leaf_mask, degree): split live points at the degree percentile of
    the radius pair graph — low degree = branch, high degree = leaf."""
    deg = radius_count(points, points, radius=radius,
                       query_mask=mask, point_mask=mask) - 1  # exclude self
    thresh = masked_percentile(deg.astype(jnp.float32), mask, degree_pctile)
    leaf = mask & (deg.astype(jnp.float32) > thresh)
    return leaf, deg


def exclude_dense_areas(
    points: Array,
    mask: Array,
    radius: float = 0.2,
    degree_pctile: float = 75.0,
    top_components: int = 4,
    neighbor_cap: int = 16,
) -> Array:
    """Refined mask with the largest high-density connected components
    removed (the foliage-exclusion step before sphere-following)."""
    dense, _ = leaf_mask_by_degree(points, mask, radius, degree_pctile)
    d, idx = radius_knn(points, points, radius=radius, k=neighbor_cap,
                        query_mask=dense, point_mask=dense)
    labels = connected_components(idx, idx >= 0, dense)
    big = top_clusters(labels, top_components)
    drop = jnp.zeros_like(mask)
    for i in range(top_components):
        drop = drop | (labels == big[i]) & (big[i] >= 0)
    return mask & ~drop


def leaf_mask_by_order_diff(
    points: Array,
    order: Array,  # [N] i32 region-growing claim cycle (from GrowthResult)
    mask: Array,
    radius: float = 0.2,
    k: int = 16,
    diff_threshold: float = 3.0,
) -> Array:
    """Points claimed much later than their spatial neighbors are leaves
    hanging off the main growth wavefront (growth-order differencing)."""
    d, idx = radius_knn(points, points, radius=radius, k=k,
                        query_mask=mask, point_mask=mask)
    valid = idx >= 0
    nbr_order = jnp.where(valid, order[jnp.maximum(idx, 0)].astype(jnp.float32), jnp.nan)
    med = jnp.nanmedian(nbr_order, axis=1)
    diff = order.astype(jnp.float32) - med
    return mask & (order >= 0) & (diff > diff_threshold)
