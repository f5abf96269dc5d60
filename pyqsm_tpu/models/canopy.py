"""Canopy metrics & epiphyte segmentation.

TPU-native rebuild of ``pyQSM/canopy_metrics.py``:

- ``get_shift`` (ref :114-140): one-iteration Laplacian contraction
  (contraction=3, attraction=0.8) producing the per-point shift vector.
- ``identify_epiphytes`` (ref :60-84): contraction-magnitude 65th-percentile
  split; the high-contraction part splits again on the z-component of the
  shift at the 60th percentile — leaves contract downward strongly, epiphytes
  do not.
- ``width_at_height`` (ref :254-314): slice at breast height ±tol, p95 of
  pairwise distances.
- ``project_in_slices`` (ref :316-341): z-percentile bins [0,20,40,60,80,100]
  → per-slice projected areas.
- ``project_components_in_clusters`` (ref :370-423): per class
  (epi/leaf/wood), KMeans(k=20) clumps → per-clump projected areas →
  metrics dict (keys match the reference's pickled results).

Projected area = rasterized-occupancy (``ops/area.py``) instead of VTK
``delaunay_2d(alpha)`` — documented deviation with a Delaunay oracle in
tests.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.config import SkeletonizeConfig
from pyqsm_tpu.models.skeleton import extract_skeleton
from pyqsm_tpu.ops.area import rasterized_area, width_p95
from pyqsm_tpu.ops.cluster import kmeans
from pyqsm_tpu.ops.color import split_on_percentile
from pyqsm_tpu.ops.geometry import masked_percentile

Array = jax.Array


def get_shift(
    points: Array,
    mask: Array,
    contraction: float = 3.0,
    attraction: float = 0.8,
    iters: int = 1,
    n_neighbors: int = 20,
) -> Array:
    """Single-iteration contraction shift (ref ``get_shift``)."""
    cfg = SkeletonizeConfig(
        init_contraction=contraction,
        init_attraction=attraction,
        max_iter=iters,
        step_wise_contraction_amplification=contraction,
        n_neighbors=n_neighbors,
        termination_ratio=0.0,  # run exactly `iters` iterations
    )
    res = extract_skeleton(points, mask, cfg, amplify_auto=False)
    return res.first_shift if iters == 1 else res.total_shift


class EpiphyteSplit(NamedTuple):
    epis: Array  # [N] bool
    leaves: Array  # [N] bool
    wood: Array  # [N] bool (low-contraction remainder)
    c_mag: Array  # [N] contraction magnitude


@jax.jit
def identify_epiphytes(
    shift: Array,  # [N, 3] single-iteration contraction shift
    mask: Array,
    cmag_pctile: float = 65.0,
    zshift_pctile: float = 60.0,
) -> EpiphyteSplit:
    """Epiphyte / leaf / wood split (ref ``identify_epiphytes``)."""
    c_mag = jnp.linalg.norm(shift, axis=-1)
    highc, lowc = split_on_percentile(c_mag, mask, cmag_pctile)
    z_mag = shift[:, 2]
    leaves, epis = split_on_percentile(jnp.where(highc, z_mag, jnp.nan), highc, zshift_pctile)
    return EpiphyteSplit(epis=epis, leaves=leaves, wood=lowc, c_mag=c_mag)


def width_at_height(
    points: Array,
    mask: Array,
    height: float = 1.37,
    tolerance: float = 0.1,
    max_slice_points: int = 2048,
) -> float:
    """DBH-style width: p95 of pairwise distances in the slice at
    ``height`` ± tolerance above the cloud base (ref ``width_at_height``).

    ESTIMATOR above 2048 slice points: rows are strided-subsampled here
    (and again inside ``width_p95`` past its 8192 pairwise cap) before the
    O(N²) distance matrix — the returned width is then the p95 of a uniform
    row subsample, a consistent estimate of the slice statistic rather than
    the exact value (see PARITY.md, canopy metrics)."""
    z = points[:, 2]
    zmin = jnp.min(jnp.where(mask, z, jnp.inf))
    band = mask & (z >= zmin + height - tolerance) & (z <= zmin + height + tolerance)
    rows = np.flatnonzero(np.asarray(band))
    if len(rows) < 2:
        return 0.0
    if len(rows) > max_slice_points:
        rows = rows[:: len(rows) // max_slice_points + 1]
    sel = jnp.asarray(rows)
    block = points[sel]
    return float(width_p95(block, jnp.ones(block.shape[0], bool)))


def project_in_slices(
    points: Array,
    mask: Array,
    pctiles: tuple[float, ...] = (0, 20, 40, 60, 80, 100),
    cell: float = 0.05,
    grid_n: int = 512,
) -> list[float]:
    """Projected area per z-percentile slice (ref ``project_in_slices``)."""
    z = points[:, 2]
    bounds = [float(masked_percentile(z, mask, p)) for p in pctiles]
    areas = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        band = mask & (z >= lo) & (z <= hi)
        areas.append(float(rasterized_area(points, band, cell=cell, grid_n=grid_n)))
    return areas


def project_components_in_clusters(
    points: Array,
    class_masks: dict[str, Array],
    n_clumps: int = 20,
    cell: float = 0.05,
    grid_n: int = 512,
    seed: int = 0,
) -> dict[str, dict]:
    """Per-class clump-wise projected areas (ref
    ``project_components_in_clusters``: per class voxel-down + KMeans(20)
    then per-clump ``project_pcd`` areas). Returns
    ``{class: {"areas": [...], "total": float}}`` mirroring the reference's
    pickled metric dicts (``canopy_metrics.py:349-368``)."""
    out: dict[str, dict] = {}
    key = jax.random.PRNGKey(seed)
    for name, m in class_masks.items():
        n_live = int(jnp.sum(m))
        if n_live == 0:
            out[name] = {"areas": [], "total": 0.0}
            continue
        k = min(n_clumps, max(n_live // 10, 1))
        key, sub = jax.random.split(key)
        _, labels = kmeans(points, m, k, sub)
        areas = []
        for c in range(k):
            clump = m & (labels == c)
            if int(jnp.sum(clump)) < 3:
                continue
            areas.append(float(rasterized_area(points, clump, cell=cell, grid_n=grid_n)))
        out[name] = {"areas": areas, "total": float(np.sum(areas))}
    return out


def canopy_metrics(
    points: Array,
    mask: Array,
    shift: Array | None = None,
    cell: float = 0.05,
) -> dict:
    """End-to-end per-tree canopy metrics (the ``identify_epiphytes``
    workflow of ``loop_over_files``, SURVEY.md §3.4): epiphyte split +
    per-class clump areas + slice areas + width at breast height."""
    if shift is None:
        shift = get_shift(points, mask)
    split = identify_epiphytes(shift, mask)
    class_masks = {"epis": split.epis, "leaves": split.leaves, "wood": split.wood}
    per_class = project_components_in_clusters(points, class_masks, cell=cell)
    return {
        "classes": per_class,
        "slice_areas": project_in_slices(points, mask, cell=cell),
        "width_at_bh": width_at_height(points, mask),
        "counts": {k: int(jnp.sum(v)) for k, v in class_masks.items()},
    }
