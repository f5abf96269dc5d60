"""Device-side surface reconstruction: density field → marching tetrahedra.

TPU-native replacement for the reference's Open3D Poisson / ball-pivot
surface reconstruction (``surf_recon.py:87-116``, ``mesh_processing.py:
196-217``): points are splatted into a voxel density grid (scatter-add),
smoothed with a separable box blur (the Poisson indicator-function analog),
and an isosurface is extracted with marching *tetrahedra* — each cube is
split into 6 Kuhn tetrahedra around its main diagonal, giving a 16-case
table that is simple enough to be exactly enumerable (no 256-entry MC
tables to transcribe) while staying watertight across cube faces: the
uniform decomposition puts the SAME diagonal on both sides of every shared
face.

All field construction and triangle emission is jitted; the host only picks
grid bounds and compacts the emitted triangle buffer (a stage boundary, like
the ray-grid build). Scales to millions of points — the work is one
scatter-add plus O(active cells) triangle emission.

The output mesh has duplicated (unwelded) vertices — exact for area,
ray casting, and occupancy; ``weld_vertices`` merges them for topology
audits (``mesh_properties``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.ops.mesh import TriMesh

Array = jax.Array

# Kuhn decomposition: 6 tetrahedra around the 0-7 cube diagonal. Cube
# corners are bit-indexed (x<<2 | y<<1 | z) offsets.
_TETS = np.array([
    [0, 1, 3, 7],
    [0, 3, 2, 7],
    [0, 2, 6, 7],
    [0, 6, 4, 7],
    [0, 4, 5, 7],
    [0, 5, 1, 7],
], np.int32)

# tet edges: pairs of local tet-corner indices (0..3)
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# case (4-bit: bit i set = corner i ≥ iso) → up to 2 triangles of edge ids
_TET_TRIS = -np.ones((16, 2, 3), np.int32)
_TET_TRIS[1, 0] = [0, 1, 2]   # corner 0 inside
_TET_TRIS[14, 0] = [0, 1, 2]
_TET_TRIS[2, 0] = [0, 3, 4]   # corner 1
_TET_TRIS[13, 0] = [0, 3, 4]
_TET_TRIS[4, 0] = [1, 3, 5]   # corner 2
_TET_TRIS[11, 0] = [1, 3, 5]
_TET_TRIS[8, 0] = [2, 4, 5]   # corner 3
_TET_TRIS[7, 0] = [2, 4, 5]
_TET_TRIS[3] = [[1, 2, 4], [1, 4, 3]]    # corners 0,1
_TET_TRIS[12] = [[1, 2, 4], [1, 4, 3]]
_TET_TRIS[5] = [[0, 2, 5], [0, 5, 3]]    # corners 0,2
_TET_TRIS[10] = [[0, 2, 5], [0, 5, 3]]
_TET_TRIS[9] = [[0, 1, 5], [0, 5, 4]]    # corners 0,3
_TET_TRIS[6] = [[0, 1, 5], [0, 5, 4]]


@partial(jax.jit, static_argnames=("nx", "ny", "nz", "blur_iters"))
def density_grid(
    points: Array,
    mask: Array,
    lo: Array,
    voxel: float,
    nx: int, ny: int, nz: int,
    blur_iters: int = 2,
) -> Array:
    """Point-count density field on an (nx, ny, nz) corner lattice, box-
    blurred ``blur_iters`` times (each pass widens support by one cell —
    the smoothed indicator that stands in for Poisson's solved potential)."""
    c = jnp.floor((points - lo[None, :]) / voxel).astype(jnp.int32)
    ok = mask & jnp.all((c >= 0) & (c < jnp.array([nx, ny, nz])), axis=1)
    flat = jnp.where(ok, (c[:, 0] * ny + c[:, 1]) * nz + c[:, 2], nx * ny * nz)
    field = jnp.zeros(nx * ny * nz + 1, jnp.float32).at[flat].add(
        1.0, mode="drop")[:-1].reshape(nx, ny, nz)

    def blur_axis(f, axis):
        lo_ = jnp.roll(f, 1, axis)
        hi_ = jnp.roll(f, -1, axis)
        # zero outside the volume (roll wraps; mask the wrapped slice)
        idx = [slice(None)] * 3
        idx[axis] = 0
        lo_ = lo_.at[tuple(idx)].set(0.0)
        idx[axis] = -1
        hi_ = hi_.at[tuple(idx)].set(0.0)
        return (f + lo_ + hi_) / 3.0

    for _ in range(blur_iters):
        for ax in range(3):
            field = blur_axis(field, ax)
    return field


@partial(jax.jit, static_argnames=("nx", "ny", "nz"))
def _cell_active(field: Array, iso: Array, nx: int, ny: int, nz: int) -> Array:
    """[ncells] bool: cube has corners on both sides of iso."""
    f = field.reshape(nx, ny, nz)
    above = f >= iso
    cells_any = jnp.zeros((nx - 1, ny - 1, nz - 1), bool)
    cells_all = jnp.ones((nx - 1, ny - 1, nz - 1), bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                a = above[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
                cells_any = cells_any | a
                cells_all = cells_all & a
    return (cells_any & ~cells_all).reshape(-1)


@partial(jax.jit, static_argnames=("nx", "ny", "nz"))
def _emit_triangles(
    field: Array, iso: Array, cell_ids: Array,
    lo: Array, voxel: float, nx: int, ny: int, nz: int,
) -> tuple[Array, Array]:
    """Triangles for the given cells: returns (verts [M, 12, 3, 3], valid
    [M, 12]) — 6 tets × 2 triangle slots per cell."""
    f = field.reshape(-1)
    m = cell_ids.shape[0]
    live = cell_ids >= 0
    cid = jnp.maximum(cell_ids, 0)
    cz = cid % (nz - 1)
    cy = (cid // (nz - 1)) % (ny - 1)
    cx = cid // ((nz - 1) * (ny - 1))
    corner_off = jnp.asarray(
        [[(i >> 2) & 1, (i >> 1) & 1, i & 1] for i in range(8)], jnp.int32)
    # corner lattice ids + positions + values: [M, 8]
    gx = cx[:, None] + corner_off[None, :, 0]
    gy = cy[:, None] + corner_off[None, :, 1]
    gz = cz[:, None] + corner_off[None, :, 2]
    gid = (gx * ny + gy) * nz + gz
    vals = f[gid]  # [M, 8]
    pos = lo[None, None, :] + voxel * jnp.stack(
        [gx, gy, gz], axis=-1).astype(jnp.float32)  # [M, 8, 3]

    tets = jnp.asarray(_TETS)  # [6, 4]
    tet_edges = jnp.asarray(_TET_EDGES)  # [6e, 2]
    tet_tris = jnp.asarray(_TET_TRIS)  # [16, 2, 3]

    tvals = vals[:, tets]  # [M, 6, 4]
    tpos = pos[:, tets]  # [M, 6, 4, 3]
    case = jnp.sum(
        (tvals >= iso).astype(jnp.int32) * jnp.asarray([1, 2, 4, 8])[None, None, :],
        axis=-1)  # [M, 6]

    # all 6 edge intersection points per tet: [M, 6, 6e, 3]
    a = tpos[:, :, tet_edges[:, 0]]
    b = tpos[:, :, tet_edges[:, 1]]
    va = tvals[:, :, tet_edges[:, 0]]
    vb = tvals[:, :, tet_edges[:, 1]]
    denom = vb - va
    t = jnp.clip((iso - va) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom),
                 0.0, 1.0)
    epts = a + t[..., None] * (b - a)  # [M, 6, 6e, 3]

    tri_edges = tet_tris[case]  # [M, 6, 2, 3] edge ids (-1 = unused)
    ok = live[:, None, None] & (tri_edges[..., 0] >= 0)  # [M, 6, 2]
    safe = jnp.maximum(tri_edges, 0)
    verts = jnp.take_along_axis(
        epts[:, :, None, :, :],  # [M, 6, 1, 6e, 3]
        safe[..., None].repeat(3, -1)[:, :, :, :, :],  # [M, 6, 2, 3, 3]
        axis=3,
    )  # [M, 6, 2, 3, 3]
    return verts.reshape(m, 12, 3, 3), ok.reshape(m, 12)


def marching_tetrahedra(
    field: Array,
    lo: Array,
    voxel: float,
    iso: float,
) -> TriMesh:
    """Isosurface of a [nx, ny, nz] scalar field (host-compacted active
    cells, jitted emission)."""
    nx, ny, nz = field.shape
    active = _cell_active(field.reshape(-1), jnp.float32(iso), nx, ny, nz)
    rows = np.flatnonzero(np.asarray(active))
    if len(rows) == 0:
        return TriMesh(jnp.zeros((3, 3), jnp.float32),
                       jnp.full((1, 3), -1, jnp.int32))
    cap = 256
    while cap < len(rows):
        cap *= 2
    ids = np.full(cap, -1, np.int32)
    ids[: len(rows)] = rows
    verts, ok = _emit_triangles(
        field.reshape(-1), jnp.float32(iso), jnp.asarray(ids),
        jnp.asarray(lo, jnp.float32), float(voxel), nx, ny, nz,
    )
    v = np.asarray(verts).reshape(-1, 3, 3)
    keep = np.asarray(ok).reshape(-1)
    v = v[keep]
    nt = len(v)
    vertices = v.reshape(-1, 3).astype(np.float32)
    triangles = np.arange(nt * 3, dtype=np.int32).reshape(nt, 3)
    return TriMesh(jnp.asarray(vertices), jnp.asarray(triangles))


def poisson_like_mesh(
    points: Array,
    mask: Array | None = None,
    voxel: float = 0.1,
    blur_iters: int = 2,
    iso_pctile: float = 30.0,
    max_cells_per_axis: int = 192,
) -> TriMesh:
    """Watertight-style surface around a point cloud: density splat + blur +
    marching tetrahedra (the Poisson-reconstruction stand-in for
    ``surf_recon.pivot_ball_mesh`` / ``mesh_processing.map_density``; scipy
    Delaunay paths in ``ops.mesh`` remain the small-N oracle)."""
    pts = np.asarray(points)
    m = np.ones(len(pts), bool) if mask is None else np.asarray(mask)
    live = pts[m]
    if len(live) < 4:
        return TriMesh(jnp.zeros((3, 3), jnp.float32),
                       jnp.full((1, 3), -1, jnp.int32))
    lo = live.min(0)
    hi = live.max(0)
    span = np.maximum(hi - lo, 1e-6)
    voxel = max(voxel, float(span.max()) / max_cells_per_axis)
    pad = (blur_iters + 2) * voxel
    lo = lo - pad
    dims = np.ceil((span + 2 * pad) / voxel).astype(int) + 1
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])
    field = density_grid(
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(np.ones(len(pts), bool) if mask is None else mask),
        jnp.asarray(lo, jnp.float32), float(voxel), nx, ny, nz,
        blur_iters=blur_iters,
    )
    fnp = np.asarray(field)
    positive = fnp[fnp > 1e-6]
    if len(positive) == 0:
        return TriMesh(jnp.zeros((3, 3), jnp.float32),
                       jnp.full((1, 3), -1, jnp.int32))
    iso = float(np.percentile(positive, iso_pctile))
    return marching_tetrahedra(field, lo, voxel, iso)


def simplify_mesh(
    mesh: TriMesh,
    target_triangles: int,
    max_rounds: int = 6,
) -> TriMesh:
    """Vertex-clustering decimation: snap vertices to the centroid of their
    grid cell, drop degenerate/duplicate triangles, grow the cell until the
    count lands at ``target_triangles``.

    The marching-tet isosurface emits ~13 unwelded triangles per input point
    at canopy density — far denser than the casting workload needs (Open3D's
    ``simplify_vertex_clustering`` plays this role behind the reference's
    Embree scenes). Triangle count on a surface scales ~(1/cell)², which the
    round loop exploits for fast convergence. Output is welded (vertices are
    shared cluster centroids). Host-compacted, like ``weld_vertices``."""
    v = np.asarray(mesh.vertices)
    t = np.asarray(mesh.triangles)
    t = t[t[:, 0] >= 0]
    n0 = len(t)
    if n0 <= target_triangles:
        return mesh
    lo = v.min(0)
    # current resolution estimate: median first-edge length
    e = np.linalg.norm(v[t[:, 1]] - v[t[:, 0]], axis=1)
    r0 = float(np.median(e)) + 1e-9
    cell = r0 * float(np.sqrt(n0 / target_triangles))
    best: tuple[np.ndarray, np.ndarray] | None = None
    for _ in range(max_rounds):
        key = np.floor((v - lo) / cell).astype(np.int64)
        _, inv = np.unique(key, axis=0, return_inverse=True)
        cnt = np.bincount(inv).astype(np.float64)
        cx = np.stack(
            [np.bincount(inv, weights=v[:, i]) for i in range(3)], 1
        ) / cnt[:, None]
        t2 = inv[t]
        nondegen = ((t2[:, 0] != t2[:, 1]) & (t2[:, 1] != t2[:, 2])
                    & (t2[:, 0] != t2[:, 2]))
        t2 = t2[nondegen]
        s = np.sort(t2, 1)
        _, uidx = np.unique(s, axis=0, return_index=True)
        t2 = t2[np.sort(uidx)]
        best = (cx, t2)
        if len(t2) <= target_triangles:
            break
        cell *= float(np.sqrt(len(t2) / target_triangles)) * 1.05
    cx, t2 = best
    return TriMesh(jnp.asarray(cx.astype(np.float32)),
                   jnp.asarray(t2.astype(np.int32)))


def weld_vertices(mesh: TriMesh, tol: float = 1e-6) -> TriMesh:
    """Merge duplicated vertices (host) so topology audits see shared edges."""
    v = np.asarray(mesh.vertices)
    t = np.asarray(mesh.triangles)
    t = t[t[:, 0] >= 0]
    key = np.round(v / tol).astype(np.int64)
    _, first, inv = np.unique(key, axis=0, return_index=True,
                              return_inverse=True)
    return TriMesh(jnp.asarray(v[first].astype(np.float32)),
                   jnp.asarray(inv[t].astype(np.int32)))
