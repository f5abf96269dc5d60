"""Environmental ray-casting simulation workflows.

The L4 simulation layer of the reference (``viz/ray_casting.py``): exposed
surface areas from camera or sun bundles, swept sun angles (the
sunlight/rain exposure study of ``data/notes/methods.md``), hit-point cloud
extraction, and signed-distance slabs — built on the ``ops.raytrace`` engine
and ``ops.mesh`` constructors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.config import RaycastConfig
from pyqsm_tpu.ops.mesh import TriMesh
from pyqsm_tpu.ops.raytrace import (
    Hits, cast_rays, exposed_surface_area, hit_points, occupancy,
    parallel_rays, pinhole_rays, unsigned_distance,
)

Array = jax.Array


class ExposureResult(NamedTuple):
    hits: Hits
    surface_area_3d: float
    surface_area_2d: float
    hit_fraction: float


def cast_scene(
    mesh: TriMesh,
    eye: Array | None = None,
    center: Array | None = None,
    cfg: RaycastConfig | None = None,
) -> ExposureResult:
    """Pinhole cast + exposed-surface-area metrics (ref ``cast_rays``,
    ray_casting.py:262-313: eye defaults to center + 10z)."""
    if cfg is None:
        cfg = RaycastConfig()
    v = mesh.vertices
    if center is None:
        center = jnp.mean(v, axis=0)
    if eye is None:
        eye = center + jnp.array([0.0, 0.0, 10.0])
    up = jnp.array([0.0, 1.0, 0.0])
    if mesh.triangles.shape[0] >= 2048:
        # screen-space tiled casting (Embree-BVH stand-in): exact closest
        # hits + counts at 10-100x the brute path on big canopy scenes
        from pyqsm_tpu.ops.raygrid import build_image_grid, image_cast

        grid = build_image_grid(mesh.vertices, mesh.triangles, eye, center,
                                up, cfg.fov_deg, cfg.width_px, cfg.height_px)
        hits = image_cast(grid)
    else:
        origins, dirs = pinhole_rays(eye, center, up,
                                     cfg.fov_deg, cfg.width_px, cfg.height_px)
        hits = cast_rays(origins, dirs, mesh.vertices, mesh.triangles)
    a3, a2 = exposed_surface_area(hits, mesh.vertices, mesh.triangles)
    frac = float(jnp.mean((hits.tri >= 0).astype(jnp.float32)))
    return ExposureResult(hits, float(a3), float(a2), frac)


def sun_exposure(
    mesh: TriMesh,
    azimuth_deg: float = 0.0,
    elevation_deg: float = 90.0,
    nx: int = 256,
    ny: int = 256,
    backend: str = "grid",
) -> ExposureResult:
    """Parallel-ray (sun/rain) exposure from a given sun angle
    (the nadir bundle of ``sparse_cast_w_intersections`` generalised to
    swept angles — BASELINE config 5).

    ``backend='grid'`` bins triangles into a bundle-perpendicular 2D grid so
    each ray tests only its own cell (``ops.raygrid``) — exact and ~
    n_triangles/cell_cap faster than brute tiles; 'brute' keeps the scanned
    Möller–Trumbore path."""
    az = np.radians(azimuth_deg)
    el = np.radians(elevation_deg)
    direction = -jnp.asarray([
        np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el),
    ], dtype=jnp.float32)
    v = np.asarray(mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    origins, dirs = parallel_rays(lo, hi, direction, nx, ny, z_offset=1.0)
    if backend == "grid":
        from pyqsm_tpu.ops.raygrid import build_ray_grid, grid_cast_parallel

        try:
            grid = build_ray_grid(mesh.vertices, mesh.triangles,
                                  np.asarray(direction), cell_cap=256)
            hits = grid_cast_parallel(grid, origins, dirs)
        except ValueError:
            hits = cast_rays(origins, dirs, mesh.vertices, mesh.triangles)
    else:
        hits = cast_rays(origins, dirs, mesh.vertices, mesh.triangles)
    a3, a2 = exposed_surface_area(hits, mesh.vertices, mesh.triangles)
    frac = float(jnp.mean((hits.tri >= 0).astype(jnp.float32)))
    return ExposureResult(hits, float(a3), float(a2), frac)


def sun_sweep(
    mesh: TriMesh,
    elevations: tuple[float, ...] = (30.0, 45.0, 60.0, 75.0, 90.0),
    azimuth_deg: float = 180.0,
    nx: int = 256,
    ny: int = 256,
) -> dict[float, ExposureResult]:
    """Swept sun-angle exposure table (methods.md 'Raycasting Projection')."""
    return {
        el: sun_exposure(mesh, azimuth_deg, el, nx, ny) for el in elevations
    }


def raycast_to_pcd(mesh: TriMesh, hits: Hits) -> Array:
    """Hit-point cloud (ref ``raycast_to_pcd``, ray_casting.py:315-330):
    NaN rows = misses."""
    return hit_points(hits, mesh.vertices, mesh.triangles)


def sparse_cast_with_intersections(
    mesh: TriMesh,
    nx: int = 64,
    ny: int = 64,
    max_hits: int = 8,
    direction=(0.0, 0.0, -1.0),
) -> tuple["HitList", Array]:
    """Parallel-ray grid (nadir by default) with EVERY crossing enumerated
    per ray (ref ``sparse_cast_w_intersections``, ray_casting.py:151-192:
    ray grid :159-165, ``list_intersections`` + barycentric interior-point
    reconstruction :171-180; ``direction`` generalises to tilted sun angles).

    Returns the [R, max_hits] hit list and the [R, max_hits, 3] world-space
    crossing cloud (NaN past each ray's count) — the reference uses these
    interior crossings to see through the canopy, not just its skin."""
    from pyqsm_tpu.ops.raytrace import hit_points_list, list_intersections

    v = np.asarray(mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    origins, dirs = parallel_rays(
        lo, hi, jnp.asarray(direction, jnp.float32), nx, ny,
        z_offset=1.0)
    hl = list_intersections(origins, dirs, mesh.vertices, mesh.triangles,
                            max_hits=max_hits)
    return hl, hit_points_list(origins, dirs, hl)


def mri_slices(
    mesh: TriMesh,
    axis: int = 2,
    n_slices: int = 8,
    resolution: int = 64,
) -> Array:
    """Signed-distance slabs through the mesh (ref ``mri``,
    ray_casting.py:237-260). Returns [n_slices, res, res] signed distances."""
    v = np.asarray(mesh.vertices)
    lo, hi = v.min(0), v.max(0)
    other = [i for i in range(3) if i != axis]
    slabs = np.linspace(lo[axis], hi[axis], n_slices)
    xs = np.linspace(lo[other[0]], hi[other[0]], resolution)
    ys = np.linspace(lo[other[1]], hi[other[1]], resolution)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    out = []
    for s in slabs:
        pts = np.zeros((resolution * resolution, 3), np.float32)
        pts[:, other[0]] = gx.ravel()
        pts[:, other[1]] = gy.ravel()
        pts[:, axis] = s
        p = jnp.asarray(pts)
        d = unsigned_distance(p, mesh.vertices, mesh.triangles)
        inside = occupancy(p, mesh.vertices, mesh.triangles)
        sd = jnp.where(inside, -d, d)
        out.append(np.asarray(sd).reshape(resolution, resolution))
    return jnp.asarray(np.stack(out))
