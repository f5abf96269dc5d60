"""Triangle-mesh construction & processing.

The reference leans on Open3D C++ meshing: parametric cylinders/spheres
(``point_cloud_processing.py:266-304``), ball-pivoting / Poisson / alpha
surface reconstruction (``surf_recon.py``, ``mesh_processing.py``), and mesh
property audits (``mesh_processing.py:45-119``). TPU replacements:

- parametric cylinder / sphere meshes: closed-form, device-side — these are
  what the ray engine actually consumes for QSM occupancy and exposure.
- ``canopy_surface_mesh``: 2.5D Delaunay over the xy footprint (scipy on
  host — a bounded CPU fallback, documented per SURVEY.md §7; triangle data
  then lives on device for the ray engine).
- ``alpha_complex_mesh``: 3D alpha-complex boundary (scipy Delaunay +
  circumradius filter) replacing Open3D alpha-shape meshing.
- ``mesh_properties``: edge-manifold / watertight / area audit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


class TriMesh(NamedTuple):
    vertices: Array  # [V, 3] f32
    triangles: Array  # [T, 3] i32 (-1 rows padding)

    def n_triangles(self) -> int:
        return int(jnp.sum(self.triangles[:, 0] >= 0))


def cylinder_mesh(
    center: Array, axis: Array, radius: float, height: float,
    segments: int = 16, capped: bool = True,
) -> TriMesh:
    """Parametric cylinder (replaces ``o3d.geometry.TriangleMesh.create_cylinder``
    + translate/rotate, ``point_cloud_processing.py:266-304``)."""
    center = np.asarray(center, np.float32)
    axis = np.asarray(axis, np.float32)
    axis = axis / max(np.linalg.norm(axis), 1e-12)
    ref = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0.0, 1, 0])
    u = np.cross(axis, ref); u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    theta = np.arange(segments) * (2 * np.pi / segments)
    ring = np.cos(theta)[:, None] * u + np.sin(theta)[:, None] * v
    bot = center - axis * (height / 2) + radius * ring
    top = center + axis * (height / 2) + radius * ring
    verts = [bot, top]
    tris = []
    for i in range(segments):
        j = (i + 1) % segments
        tris.append([i, j, segments + i])
        tris.append([j, segments + j, segments + i])
    nv = 2 * segments
    if capped:
        verts.append((center - axis * (height / 2))[None, :])
        verts.append((center + axis * (height / 2))[None, :])
        cb, ct = nv, nv + 1
        for i in range(segments):
            j = (i + 1) % segments
            tris.append([cb, j, i])
            tris.append([ct, segments + i, segments + j])
    vertices = np.concatenate(verts).astype(np.float32)
    triangles = np.asarray(tris, np.int32)
    return TriMesh(jnp.asarray(vertices), jnp.asarray(triangles))


def sphere_mesh(center: Array, radius: float, n_lat: int = 8, n_lon: int = 16) -> TriMesh:
    """UV sphere (replaces ``create_sphere``)."""
    center = np.asarray(center, np.float32)
    lats = np.linspace(0, np.pi, n_lat + 1)
    lons = np.arange(n_lon) * (2 * np.pi / n_lon)
    verts = [center + radius * np.array([0, 0, 1.0])]
    for la in lats[1:-1]:
        for lo in lons:
            verts.append(center + radius * np.array(
                [np.sin(la) * np.cos(lo), np.sin(la) * np.sin(lo), np.cos(la)]))
    verts.append(center + radius * np.array([0, 0, -1.0]))
    tris = []
    for j in range(n_lon):
        tris.append([0, 1 + j, 1 + (j + 1) % n_lon])
    for i in range(n_lat - 2):
        base = 1 + i * n_lon
        nxt = base + n_lon
        for j in range(n_lon):
            j2 = (j + 1) % n_lon
            tris.append([base + j, nxt + j, base + j2])
            tris.append([base + j2, nxt + j, nxt + j2])
    last = len(verts) - 1
    base = 1 + (n_lat - 2) * n_lon
    for j in range(n_lon):
        tris.append([last, base + (j + 1) % n_lon, base + j])
    return TriMesh(jnp.asarray(np.asarray(verts, np.float32)),
                   jnp.asarray(np.asarray(tris, np.int32)))


def merge_meshes(meshes: list[TriMesh]) -> TriMesh:
    """Concatenate meshes with index offsetting."""
    verts, tris = [], []
    off = 0
    for m in meshes:
        v = np.asarray(m.vertices)
        t = np.asarray(m.triangles)
        t = t[t[:, 0] >= 0]
        verts.append(v)
        tris.append(t + off)
        off += len(v)
    return TriMesh(jnp.asarray(np.concatenate(verts).astype(np.float32)),
                   jnp.asarray(np.concatenate(tris).astype(np.int32)))


def qsm_mesh(cylinders, segments: int = 12) -> TriMesh:
    """Triangle mesh of a whole QSM (one cylinder per masked row)."""
    mask = np.asarray(cylinders.mask)
    meshes = []
    centers = np.asarray(cylinders.center)
    axes = np.asarray(cylinders.axis)
    radii = np.asarray(cylinders.radius)
    heights = np.asarray(cylinders.height)
    for i in np.flatnonzero(mask):
        if radii[i] <= 0 or heights[i] <= 0:
            continue
        meshes.append(cylinder_mesh(centers[i], axes[i], float(radii[i]),
                                    float(heights[i]), segments=segments))
    if not meshes:
        return TriMesh(jnp.zeros((3, 3), jnp.float32), jnp.full((1, 3), -1, jnp.int32))
    return merge_meshes(meshes)


def canopy_surface_mesh(points: np.ndarray, mask: np.ndarray | None = None,
                        max_edge: float | None = None) -> TriMesh:
    """2.5D canopy surface: Delaunay over the xy footprint keeping the
    *highest* point per xy location, triangles filtered by edge length.
    Host-side scipy (bounded CPU fallback for Open3D BPA/Poisson,
    ``surf_recon.py:87-116``); output lives on device for the ray engine."""
    from scipy.spatial import Delaunay

    pts = np.asarray(points)
    if mask is not None:
        pts = pts[np.asarray(mask)]
    if len(pts) < 3:
        return TriMesh(jnp.zeros((3, 3), jnp.float32), jnp.full((1, 3), -1, jnp.int32))
    tri = Delaunay(pts[:, :2])
    simplices = tri.simplices
    if max_edge is not None:
        v = pts[simplices]
        e = np.stack([
            np.linalg.norm(v[:, 0] - v[:, 1], axis=1),
            np.linalg.norm(v[:, 1] - v[:, 2], axis=1),
            np.linalg.norm(v[:, 0] - v[:, 2], axis=1),
        ], axis=1).max(1)
        simplices = simplices[e <= max_edge]
    return TriMesh(jnp.asarray(pts.astype(np.float32)),
                   jnp.asarray(simplices.astype(np.int32)))


def alpha_complex_mesh(points: np.ndarray, alpha: float,
                       mask: np.ndarray | None = None) -> TriMesh:
    """Boundary of the 3D alpha complex (replaces Open3D
    ``create_from_point_cloud_alpha_shape``): Delaunay tetrahedra with
    circumradius ≤ alpha; boundary faces = faces belonging to exactly one
    kept tetrahedron. Host-side scipy, device output."""
    from scipy.spatial import Delaunay

    pts = np.asarray(points, np.float64)
    if mask is not None:
        pts = pts[np.asarray(mask)]
    if len(pts) < 4:
        return TriMesh(jnp.zeros((3, 3), jnp.float32), jnp.full((1, 3), -1, jnp.int32))
    tet = Delaunay(pts)
    simp = tet.simplices
    a, b, c, d = (pts[simp[:, i]] for i in range(4))
    # circumradius of each tetrahedron
    ba, ca, da = b - a, c - a, d - a
    det = np.einsum("ij,ij->i", ba, np.cross(ca, da))
    det = np.where(np.abs(det) < 1e-20, 1e-20, det)
    o = (
        np.einsum("ij,ij->i", ba, ba)[:, None] * np.cross(ca, da)
        + np.einsum("ij,ij->i", ca, ca)[:, None] * np.cross(da, ba)
        + np.einsum("ij,ij->i", da, da)[:, None] * np.cross(ba, ca)
    ) / (2.0 * det[:, None])
    r = np.linalg.norm(o, axis=1)
    keep = simp[r <= alpha]
    faces = np.concatenate([
        keep[:, [0, 1, 2]], keep[:, [0, 1, 3]], keep[:, [0, 2, 3]], keep[:, [1, 2, 3]],
    ])
    key = np.sort(faces, axis=1)
    _, idx, counts = np.unique(key, axis=0, return_index=True, return_counts=True)
    boundary = faces[idx[counts == 1]]
    return TriMesh(jnp.asarray(pts.astype(np.float32)),
                   jnp.asarray(boundary.astype(np.int32)))


def surface_clusters(mesh: TriMesh, min_triangles: int = 1) -> tuple[np.ndarray, TriMesh]:
    """Connected-triangle clustering + small-cluster filtering (ref
    ``get_surface_clusters``, ``mesh_processing.py:159-194``): triangles
    sharing an edge are one surface component. Returns (labels per triangle,
    filtered mesh). Host-side union-find over edge keys."""
    tris = np.asarray(mesh.triangles)
    live = tris[:, 0] >= 0
    idx = np.flatnonzero(live)
    t = tris[idx]
    parent = np.arange(len(t))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    edge_owner: dict[tuple[int, int], int] = {}
    for ti, tri in enumerate(t):
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[0], tri[2])):
            key = (int(min(a, b)), int(max(a, b)))
            if key in edge_owner:
                ra, rb = find(edge_owner[key]), find(ti)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            else:
                edge_owner[key] = ti
    roots = np.array([find(i) for i in range(len(t))])
    _, labels, counts = np.unique(roots, return_inverse=True, return_counts=True)
    keep = counts[labels] >= min_triangles
    out = np.full(len(tris), -1, np.int64)
    out[idx] = labels
    filtered = TriMesh(mesh.vertices, jnp.asarray(t[keep].astype(np.int32)))
    return out, filtered


def fill_holes(mesh: TriMesh, max_loop: int = 256) -> TriMesh:
    """Close boundary loops by centroid fans — the hole-filling half of the
    reference's pymeshfix repair (``surf_recon.meshfix``, ``surf_recon.py:
    38-85``). Host-side: boundary edges (edge count == 1) are chained into
    loops; each loop up to ``max_loop`` edges is triangulated with a fan
    from its centroid. Degenerate/unchainable boundaries are left open."""
    v = np.asarray(mesh.vertices)
    t = np.asarray(mesh.triangles)
    t = t[t[:, 0] >= 0]
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    key = np.sort(edges, axis=1)
    uniq, inv, counts = np.unique(key, axis=0, return_inverse=True,
                                  return_counts=True)
    boundary = uniq[counts == 1]
    if len(boundary) == 0:
        return mesh
    # chain boundary edges into loops
    nxt: dict[int, list[int]] = {}
    for a, b in boundary:
        nxt.setdefault(int(a), []).append(int(b))
        nxt.setdefault(int(b), []).append(int(a))
    unused = {tuple(e) for e in boundary}
    new_verts: list[np.ndarray] = []
    new_tris: list[list[int]] = []
    nv = len(v)
    while unused:
        a0, b0 = next(iter(unused))
        loop = [a0, b0]
        unused.discard((a0, b0))
        ok = True
        while loop[-1] != loop[0]:
            cur, prev = loop[-1], loop[-2]
            cands = [c for c in nxt.get(cur, [])
                     if c != prev and (tuple(sorted((cur, c))) in unused
                                       or c == loop[0])]
            if not cands or len(loop) > max_loop:
                ok = False
                break
            c = cands[0]
            unused.discard(tuple(sorted((cur, c))))
            loop.append(c)
        if not ok or len(loop) < 4:  # closed loop repeats the head
            continue
        ring = loop[:-1]
        centroid = v[ring].mean(0)
        ci = nv + len(new_verts)
        new_verts.append(centroid.astype(np.float32))
        for i in range(len(ring)):
            new_tris.append([ring[i], ring[(i + 1) % len(ring)], ci])
    if not new_tris:
        return mesh
    verts_out = np.concatenate([v, np.stack(new_verts)]).astype(np.float32)
    tris_out = np.concatenate([t, np.asarray(new_tris, np.int32)])
    return TriMesh(jnp.asarray(verts_out), jnp.asarray(tris_out.astype(np.int32)))


def map_density(
    mesh: TriMesh,
    points: Array,
    mask: Array | None = None,
    radius: float = 0.2,
    density_threshold_pctile: float = 0.0,
) -> tuple[Array, Array, TriMesh]:
    """Per-vertex point-density coloring + low-density trimming — the
    Poisson-density analog of ref ``map_density`` (``mesh_processing.py:
    196-217``: Poisson depth-10 densities → plasma colors → optional
    ``remove_vertices_by_mask`` on a density quantile).

    Density = number of cloud points within ``radius`` of each vertex
    (device-side, via the shared neighbor engine). Returns
    ``(density [V], colors [V, 3], trimmed_mesh)`` where trimmed_mesh drops
    triangles touching vertices below the ``density_threshold_pctile``
    density percentile (0 = keep everything, matching the reference's
    commented-out default)."""
    from pyqsm_tpu.ops.neighbors import radius_count
    from pyqsm_tpu.utils.viz import color_continuous_map

    if mask is None:
        mask = jnp.ones(points.shape[0], dtype=bool)
    dens = radius_count(mesh.vertices, points, radius=radius,
                        point_mask=mask).astype(jnp.float32)
    colors = jnp.asarray(color_continuous_map(np.asarray(dens)))
    if density_threshold_pctile <= 0.0:
        return dens, colors, mesh
    thr = jnp.percentile(dens, density_threshold_pctile)
    keep_v = dens >= thr
    tris = mesh.triangles
    live = tris[:, 0] >= 0
    tri_keep = live & jnp.all(keep_v[jnp.maximum(tris, 0)], axis=1)
    trimmed = jnp.where(tri_keep[:, None], tris, -1)
    return dens, colors, TriMesh(mesh.vertices, trimmed)


def mesh_properties(mesh: TriMesh) -> dict:
    """Manifold/watertight/area audit (ref ``check_properties``,
    ``mesh_processing.py:45-119``). Host-side."""
    tris = np.asarray(mesh.triangles)
    tris = tris[tris[:, 0] >= 0]
    verts = np.asarray(mesh.vertices)
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [0, 2]]])
    key = np.sort(edges, axis=1)
    _, counts = np.unique(key, axis=0, return_counts=True)
    v = verts[tris]
    areas = 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=1
    )
    return {
        "n_vertices": len(verts),
        "n_triangles": len(tris),
        "edge_manifold": bool((counts <= 2).all()),
        "watertight": bool((counts == 2).all()),
        "surface_area": float(areas.sum()),
    }
