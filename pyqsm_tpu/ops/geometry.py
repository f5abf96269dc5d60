"""Geometric utilities — parity with ``math_utils/general.py`` and
``geometry/general.py``: percentile selection, Rodrigues rotations, centroid
variants, mean radius, spatial grids with overlap, region zoom filters.

All mask-based: selection refines a boolean mask over the padded cloud
instead of materialising index arrays (the reference's ``(pcd, idxs)``
convention, ``point_cloud_processing.py:148-158``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@jax.jit
def masked_percentile(values: Array, mask: Array, q: Array | float) -> Array:
    """Percentile over live entries only (jit-safe: dead entries pushed to
    NaN and ignored via nanpercentile)."""
    v = jnp.where(mask, values, jnp.nan)
    return jnp.nanpercentile(v, q)


@jax.jit
def percentile_mask(
    values: Array, mask: Array, low: float, high: float
) -> Array:
    """Keep live rows whose value lies in the [low, high] percentile band —
    `get_percentile` (``math_utils/general.py:9-35``) /
    `crop_by_percentile` (``point_cloud_processing.py:148-158``) semantics."""
    lo = masked_percentile(values, mask, low)
    hi = masked_percentile(values, mask, high)
    return mask & (values >= lo) & (values <= hi)


@jax.jit
def crop_mask(
    points: Array,
    mask: Array,
    minx: float = -jnp.inf, maxx: float = jnp.inf,
    miny: float = -jnp.inf, maxy: float = jnp.inf,
    minz: float = -jnp.inf, maxz: float = jnp.inf,
) -> Array:
    """Axis-aligned crop (``point_cloud_processing.py:129-146``)."""
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    return (
        mask
        & (x >= minx) & (x <= maxx)
        & (y >= miny) & (y <= maxy)
        & (z >= minz) & (z <= maxz)
    )


@jax.jit
def zoom_mask(points: Array, mask: Array, region: Array, reverse: bool = False) -> Array:
    """Keep (or with ``reverse`` exclude) points inside an AABB region given
    as ``[[minx,miny(,minz)],[maxx,maxy(,maxz)]]`` — 2D regions extend over
    all z, matching ``zoom_pcd``/``zoom`` (``geometry/general.py:17-84``)."""
    region = jnp.asarray(region, dtype=points.dtype)
    lo, hi = region[0], region[1]
    inside = (
        (points[:, 0] >= lo[0]) & (points[:, 0] <= hi[0])
        & (points[:, 1] >= lo[1]) & (points[:, 1] <= hi[1])
    )
    if region.shape[1] > 2:
        inside = inside & (points[:, 2] >= lo[2]) & (points[:, 2] <= hi[2])
    keep = jnp.where(reverse, ~inside, inside)
    return mask & keep


@jax.jit
def rotation_matrix_from_vectors(a: Array, b: Array) -> Array:
    """Rodrigues rotation taking unit direction ``a`` onto ``b``
    (``math_utils/general.py:71-87``)."""
    a = a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
    b = b / jnp.maximum(jnp.linalg.norm(b), 1e-12)
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    s2 = jnp.sum(v * v)
    K = jnp.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]], dtype=a.dtype
    )
    R = jnp.eye(3, dtype=a.dtype) + K + K @ K * ((1 - c) / jnp.maximum(s2, 1e-20))
    # antiparallel fallback: 180° about any perpendicular axis
    perp = jnp.where(jnp.abs(a[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    axis = jnp.cross(a, perp)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    R180 = 2.0 * jnp.outer(axis, axis) - jnp.eye(3, dtype=a.dtype)
    return jnp.where(s2 < 1e-16, jnp.where(c > 0, jnp.eye(3, dtype=a.dtype), R180), R)


@partial(jax.jit, static_argnames=("method",))
def get_center(points: Array, mask: Array, method: str = "centroid") -> Array:
    """Centroid / top / bottom center (``math_utils/general.py:127-160``):
    'top'/'bottom' use the xy-centroid at max/min z."""
    w = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(points[:, 0] * w) / n
    cy = jnp.sum(points[:, 1] * w) / n
    if method == "centroid":
        cz = jnp.sum(points[:, 2] * w) / n
    elif method == "top":
        cz = jnp.max(jnp.where(mask, points[:, 2], -jnp.inf))
    elif method == "bottom":
        cz = jnp.min(jnp.where(mask, points[:, 2], jnp.inf))
    else:
        raise ValueError(method)
    return jnp.stack([cx, cy, cz])


@jax.jit
def get_radius(points: Array, mask: Array) -> Array:
    """Mean XY distance from the xy-centroid (``math_utils/general.py:162-171``)."""
    c = get_center(points, mask, method="centroid")
    d = jnp.sqrt((points[:, 0] - c[0]) ** 2 + (points[:, 1] - c[1]) ** 2)
    w = mask.astype(points.dtype)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def generate_grid(
    lo: tuple[float, float],
    hi: tuple[float, float],
    nx: int = 2,
    ny: int = 3,
    overlap: float = 1.0 / 7.0,
) -> list[tuple[tuple[float, float], tuple[float, float]]]:
    """Overlapping 2D tiling of the plot footprint
    (``math_utils/general.py:173-199``: 2×3 cells, 1/7 overlap). Host-side —
    used to define shard regions; the TPU path replaces the overlap with halo
    exchange but keeps this for CPU-compatible sharding and tests."""
    x0, y0 = lo
    x1, y1 = hi
    w = (x1 - x0) / nx
    h = (y1 - y0) / ny
    ox, oy = w * overlap, h * overlap
    cells = []
    for i in range(nx):
        for j in range(ny):
            cells.append(
                (
                    (x0 + i * w - ox, y0 + j * h - oy),
                    (x0 + (i + 1) * w + ox, y0 + (j + 1) * h + oy),
                )
            )
    return cells


@jax.jit
def obb_axes(points: Array, mask: Array) -> tuple[Array, Array, Array]:
    """PCA-oriented bounding box: (center, axes [3,3] rows=axes, half-extents).
    Replaces Open3D ``get_oriented_bounding_box`` for the contraction clamp
    (``skeletonize.py:240-241,291-296``)."""
    from pyqsm_tpu.ops.linalg3 import sym_eig3

    w = mask.astype(points.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(points * w, axis=0) / n
    centered = (points - mean) * w
    cov = centered.T @ centered / n
    _, vecs = sym_eig3(cov)
    axes = vecs.T  # rows = eigenvectors
    proj = centered @ axes.T
    half = jnp.max(jnp.abs(jnp.where(mask[:, None], proj, 0.0)), axis=0)
    return mean, axes, half


@jax.jit
def clamp_to_obb(points: Array, center: Array, axes: Array, half: Array) -> Array:
    """Clamp points into the OBB (contraction stabiliser)."""
    local = (points - center[None, :]) @ axes.T
    local = jnp.clip(local, -half[None, :], half[None, :])
    return local @ axes + center[None, :]
