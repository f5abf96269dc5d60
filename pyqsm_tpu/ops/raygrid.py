"""Grid-accelerated casting for structured ray bundles (sun + pinhole).

The environmental simulator's headline workloads are structured bundles:
sun/rain exposure (millions of PARALLEL rays) and camera exposure casts
(PINHOLE bundles, ref ``viz/ray_casting.py:262-313``). For both, BVH
traversal is the wrong tool on a SIMD machine — each family admits a 2D
binning in which the bundle is axis-aligned:

- parallel bundles: bin triangle AABBs on the plane ⊥ to the direction
  (``build_ray_grid``/``cell_cast_parallel``) — each grid cell's rays test
  that cell's list as one dense block;
- pinhole bundles: bin projected triangle AABBs in IMAGE space
  (``build_image_grid``/``image_cast``) — each pixel tile tests its own
  screen-space list, bucketed by occupancy so dense tiles don't set the
  Möller–Trumbore width for the whole image.

No per-ray traversal, no divergence, no per-ray gathers — fixed-shape
(rays × cap) batches that ride the VPU (measured v5e single chip:
75 Mrays/s sun, 13 Mrays/s pinhole 1280×950, on a 120k-triangle canopy).
Exact: every triangle is registered in all cells/tiles its (projected)
AABB touches; eye-straddling triangles fall back to a brute residual pass.
Arbitrary unstructured rays go through ``ops.grid3d`` instead.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.ops.raytrace import Hits, mt_components

Array = jax.Array
_INT32_MAX = np.iinfo(np.int32).max


class RayGrid(NamedTuple):
    u: Array  # [3] bundle-plane basis
    v: Array  # [3]
    origin_uv: Array  # [2] grid origin in (u,v)
    cell: float  # static cell size
    nx: int  # static grid dims
    ny: int
    tri_of_slot: Array  # [ncells, cap] i32 triangle ids (-1 padded)
    v0: Array  # [T, 3] triangle data (same order as input triangles)
    e1: Array
    e2: Array
    valid: Array  # [T]
    # lane-aligned per-cell triangle rows (v0|e1|e2|valid|tri_id_bits|pad ×
    # cap): the cell-major cast SLICES its tile's rows contiguously instead
    # of gathering cap separate [3]-wide rows that each tile-pad to 128
    # lanes; the per-ray cast gathers ONE row per ray
    cell_rows: Array | None = None  # [ncells, cap*16] f32
    packed_cells: bool = False


def build_ray_grid(
    vertices: Array,
    triangles: Array,
    direction: Array,
    cell_cap: int | None = None,
    max_cells: int = 512,
) -> RayGrid:
    """Host-orchestrated build (one sort); direction is the bundle direction.
    ``cell_cap=None`` sizes the table to the measured max occupancy."""
    d = np.asarray(direction, np.float64)
    d = d / max(np.linalg.norm(d), 1e-12)
    ref = np.array([0.0, 0, 1]) if abs(d[2]) < 0.9 else np.array([1.0, 0, 0])
    u = np.cross(d, ref); u /= np.linalg.norm(u)
    v = np.cross(d, u)

    tris = np.asarray(triangles)
    live = tris[:, 0] >= 0
    verts = np.asarray(vertices)
    t = np.maximum(tris, 0)
    p0, p1, p2 = verts[t[:, 0]], verts[t[:, 1]], verts[t[:, 2]]
    uv = np.stack([
        np.stack([p0 @ u, p0 @ v], -1),
        np.stack([p1 @ u, p1 @ v], -1),
        np.stack([p2 @ u, p2 @ v], -1),
    ], axis=1)  # [T, 3, 2]
    lo = uv.min(1)
    hi = uv.max(1)
    extent = np.where(live[:, None], hi - lo, 0.0)
    typical = float(np.percentile(extent[live], 50)) if live.any() else 1.0
    scene_lo = np.where(live[:, None], lo, np.inf).min(0)
    scene_hi = np.where(live[:, None], hi, -np.inf).max(0)
    span = np.maximum(scene_hi - scene_lo, 1e-6)
    # small cells maximise ray parallelism per triangle test; oversized
    # triangles simply register in more cells (variable span, host build)
    cell = max(typical, float(span.max()) / max_cells) + 1e-9
    nx = int(span[0] / cell) + 2
    ny = int(span[1] / cell) + 2

    c_lo = np.floor((lo - scene_lo) / cell).astype(np.int64)
    c_hi = np.floor((hi - scene_lo) / cell).astype(np.int64)
    c_lo = np.clip(c_lo, 0, [nx - 1, ny - 1])
    c_hi = np.clip(c_hi, 0, [nx - 1, ny - 1])
    span_x = int((c_hi[:, 0] - c_lo[:, 0]).max() + 1) if live.any() else 1
    span_y = int((c_hi[:, 1] - c_lo[:, 1]).max() + 1) if live.any() else 1
    entries_cell = []
    entries_tri = []
    tri_ids = np.arange(len(tris))
    for dx in range(span_x):
        for dy in range(span_y):
            cx = c_lo[:, 0] + dx
            cy = c_lo[:, 1] + dy
            touch = (cx <= c_hi[:, 0]) & (cy <= c_hi[:, 1]) & live
            entries_cell.append(np.where(touch, cx * ny + cy, np.int64(-1)))
            entries_tri.append(np.where(touch, tri_ids, -1))
    ec = np.concatenate(entries_cell)
    et = np.concatenate(entries_tri)
    keep = ec >= 0
    ec, et = ec[keep], et[keep]

    ncells = nx * ny
    order = np.argsort(ec, kind="stable")
    ec, et = ec[order], et[order]
    slot_of = np.zeros(len(ec), np.int64)
    # position within cell via run-length
    starts = np.searchsorted(ec, np.arange(ncells))
    counts = np.diff(np.append(starts, len(ec)))
    occupancy = int(counts.max()) if len(counts) else 0
    if cell_cap is not None and occupancy > cell_cap:
        raise ValueError(
            f"cell_cap {cell_cap} < max triangles per cell {occupancy}; "
            f"raise cell_cap or max_cells"
        )
    cap = occupancy if cell_cap is None else cell_cap
    cap = max(-8 * (-cap // 8), 8)  # multiple of 8
    within = np.arange(len(ec)) - starts[ec]
    table = np.full((ncells, cap), -1, np.int32)
    table[ec, within] = et.astype(np.int32)

    v0 = p0.astype(np.float32)
    e1 = (p1 - p0).astype(np.float32)
    e2 = (p2 - p0).astype(np.float32)
    rows_flat, packed_cells = _pack_cell_rows(table, v0, e1, e2, live)
    return RayGrid(
        u=jnp.asarray(u.astype(np.float32)),
        v=jnp.asarray(v.astype(np.float32)),
        origin_uv=jnp.asarray(scene_lo.astype(np.float32)),
        cell=float(cell), nx=nx, ny=ny,
        tri_of_slot=jnp.asarray(table),
        v0=jnp.asarray(v0), e1=jnp.asarray(e1), e2=jnp.asarray(e2),
        valid=jnp.asarray(live),
        cell_rows=jnp.asarray(rows_flat),
        packed_cells=packed_cells,
    )


def _packed_rows_np(v0, e1, e2, live) -> np.ndarray:
    """[T, 16] f32 rows: v0|e1|e2|valid|tri_id_bits|pad (id recovered in
    kernel with bitcast_convert_type — exact for any id)."""
    t = len(v0)
    rows = np.zeros((t, 16), np.float32)
    rows[:, 0:3] = v0
    rows[:, 3:6] = e1
    rows[:, 6:9] = e2
    rows[:, 9] = live.astype(np.float32)
    rows[:, 10] = np.arange(t, dtype=np.int32).view(np.float32)
    return rows


def _pack_cell_rows(table, v0, e1, e2, live,
                    budget: int = 1 << 30) -> tuple[np.ndarray, bool]:
    """Per-cell packed rows [ncells, cap*16]; (zeros(8,16), False) when the
    table would exceed ``budget`` bytes."""
    ncells, cap = table.shape
    if ncells * cap * 64 > budget:
        return np.zeros((8, 16), np.float32), False
    packed = _packed_rows_np(v0, e1, e2, live)
    rows = packed[np.maximum(table, 0)]
    rows[table < 0] = 0.0
    return rows.reshape(ncells, cap * 16), True


@partial(jax.jit, static_argnames=("cell", "nx", "ny", "ray_tile",
                                   "packed_cells"))
def _grid_cast(
    origins: Array, dirs: Array,
    u: Array, v: Array, origin_uv: Array,
    cell: float, nx: int, ny: int,
    tri_of_slot: Array, v0: Array, e1: Array, e2: Array, valid: Array,
    ray_tile: int = 4096,
    cell_rows: Array | None = None, packed_cells: bool = False,
) -> Hits:
    r = origins.shape[0]
    cap = tri_of_slot.shape[1]
    rem = (-r) % ray_tile
    o = jnp.pad(origins, ((0, rem), (0, 0)))
    d = jnp.pad(dirs, ((0, rem), (0, 0)))

    def tile(args):
        ot, dt = args
        uu = ot @ u
        vv = ot @ v
        cx = jnp.clip(((uu - origin_uv[0]) / cell).astype(jnp.int32), 0, nx - 1)
        cy = jnp.clip(((vv - origin_uv[1]) / cell).astype(jnp.int32), 0, ny - 1)
        if packed_cells:
            # ONE contiguous lane-aligned row gather per ray
            rows = cell_rows[cx * ny + cy].reshape(ot.shape[0], cap, 16)
            ok_tri = rows[..., 9] > 0.5
            slots = jnp.where(
                ok_tri,
                jax.lax.bitcast_convert_type(rows[..., 10], jnp.int32), -1)
            tv0 = rows[..., 0:3]
            te1 = rows[..., 3:6]
            te2 = rows[..., 6:9]
        else:
            slots = tri_of_slot[cx * ny + cy]  # [RT, cap]
            tid = jnp.maximum(slots, 0)
            ok_tri = (slots >= 0) & valid[tid]
            # per-ray private triangle set: vectorized MT on [RT, cap]
            tv0 = v0[tid]
            te1 = e1[tid]
            te2 = e2[tid]
        tt, uu_, vv_ = mt_components(
            tuple(ot[:, a][:, None] for a in range(3)),
            tuple(dt[:, a][:, None] for a in range(3)),
            tuple(tv0[..., a] for a in range(3)),
            tuple(te1[..., a] for a in range(3)),
            tuple(te2[..., a] for a in range(3)),
            ok_tri,
        )
        hit = jnp.isfinite(tt)
        cnt = jnp.sum(hit, axis=1).astype(jnp.int32)
        j = jnp.argmin(tt, axis=1)
        tmin = jnp.min(tt, axis=1)
        tri_best = jnp.where(jnp.isfinite(tmin),
                             jnp.take_along_axis(slots, j[:, None], 1)[:, 0], -1)
        ub = jnp.take_along_axis(uu_, j[:, None], 1)[:, 0]
        vb = jnp.take_along_axis(vv_, j[:, None], 1)[:, 0]
        return tmin, tri_best, jnp.stack([ub, vb], 1), cnt

    nt = o.shape[0] // ray_tile
    t_, tri_, uv_, cnt_ = jax.lax.map(
        tile, (o.reshape(nt, ray_tile, 3), d.reshape(nt, ray_tile, 3))
    )
    return Hits(
        t=t_.reshape(-1)[:r], tri=tri_.reshape(-1)[:r],
        uv=uv_.reshape(-1, 2)[:r], count=cnt_.reshape(-1)[:r],
    )


def grid_cast_parallel(grid: RayGrid, origins: Array, dirs: Array,
                       ray_tile: int = 4096) -> Hits:
    """Cast a parallel bundle against the prebuilt grid (directions must
    match the build direction)."""
    return _grid_cast(
        origins, dirs, grid.u, grid.v, grid.origin_uv,
        grid.cell, grid.nx, grid.ny,
        grid.tri_of_slot, grid.v0, grid.e1, grid.e2, grid.valid,
        ray_tile=ray_tile,
        cell_rows=grid.cell_rows, packed_cells=bool(grid.packed_cells),
    )


class ImageGrid(NamedTuple):
    """Screen-space tiled binning for PINHOLE bundles: a pinhole bundle is
    'parallel' in image space, so the 2D-grid trick applies — triangles are
    registered in every pixel tile their projected AABB touches, and each
    pixel tests only its own tile's list (dense [tile, rpc, cap] MT blocks,
    no per-ray gathers). Exact closest hits + exact crossing counts: every
    triangle covering a pixel is in that pixel's tile list exactly once.
    Triangles with any vertex at or behind the eye plane go to ``residual``
    and are brute-tested by every pixel."""

    eye: Array  # [3]
    right: Array  # [3] camera basis
    true_up: Array
    fwd: Array
    half: float  # tan(fov/2)
    aspect: float
    width: int
    height: int
    tile_px: int
    tri_of_slot: Array  # [ntiles, cap] i32
    v0: Array
    e1: Array
    e2: Array
    valid: Array
    residual: Array  # [nr] i32 behind/straddling-eye triangles (-1 pad)
    # occupancy buckets, precomputed at build: ((cap, tile_ids, rows), ...)
    # with device-resident arrays — a tile only pays a Möller–Trumbore width
    # matched to its own load, and casts never upload anything. ``rows``
    # [len(tile_ids), cap*16] packs each listed tile's triangle rows
    # (v0|e1|e2|valid|tri_id_bits|pad) aligned with ``tile_ids``, so the
    # cast SLICES its block's rows contiguously — zero triangle gathers.
    buckets: tuple = ()


def build_image_grid(
    vertices: Array,
    triangles: Array,
    eye: Array,
    center: Array,
    up: Array,
    fov_deg: float,
    width_px: int,
    height_px: int,
    tile_px: int = 8,
) -> ImageGrid:
    """Host-orchestrated screen-space build (one sort), Embree-BVH stand-in
    for the reference's pinhole casts (``viz/ray_casting.py:262-313``)."""
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    up = np.asarray(up, np.float64)
    fwd = center - eye
    fwd /= max(np.linalg.norm(fwd), 1e-12)
    right = np.cross(fwd, up)
    right /= max(np.linalg.norm(right), 1e-12)
    true_up = np.cross(right, fwd)
    half = float(np.tan(np.radians(fov_deg) / 2.0))
    aspect = width_px / height_px

    tris = np.asarray(triangles)
    live = tris[:, 0] >= 0
    verts = np.asarray(vertices, np.float64)
    t = np.maximum(tris, 0)
    p = np.stack([verts[t[:, 0]], verts[t[:, 1]], verts[t[:, 2]]], 1)  # [T,3,3]
    rel = p - eye
    x = rel @ right
    y = rel @ true_up
    w = rel @ fwd
    front = live & (w > 1e-6).all(1)
    # pixel coords of each vertex (perspective divide), matching pinhole_rays
    sx = x / np.maximum(w, 1e-12) / (half * aspect)
    sy = y / np.maximum(w, 1e-12) / half
    px = (sx + 1.0) / 2.0 * width_px
    py = (1.0 - sy) / 2.0 * height_px
    ntx = -(-width_px // tile_px)
    nty = -(-height_px // tile_px)
    tx_lo = np.clip(np.floor(px.min(1) / tile_px).astype(np.int64), 0, ntx - 1)
    tx_hi = np.clip(np.floor(px.max(1) / tile_px).astype(np.int64), 0, ntx - 1)
    ty_lo = np.clip(np.floor(py.min(1) / tile_px).astype(np.int64), 0, nty - 1)
    ty_hi = np.clip(np.floor(py.max(1) / tile_px).astype(np.int64), 0, nty - 1)
    # cull triangles fully outside the image
    visible = front & (px.max(1) >= 0) & (px.min(1) < width_px) \
        & (py.max(1) >= 0) & (py.min(1) < height_px)

    tri_ids = np.arange(len(tris), dtype=np.int64)
    sx_span = int((tx_hi - tx_lo)[visible].max() + 1) if visible.any() else 1
    sy_span = int((ty_hi - ty_lo)[visible].max() + 1) if visible.any() else 1
    entries_cell, entries_tri = [], []
    for dx in range(sx_span):
        for dy in range(sy_span):
            cx = tx_lo + dx
            cy = ty_lo + dy
            touch = (cx <= tx_hi) & (cy <= ty_hi) & visible
            if not touch.any():
                continue
            entries_cell.append(np.where(touch, cx * nty + cy, -1))
            entries_tri.append(np.where(touch, tri_ids, -1))
    if entries_cell:
        ec = np.concatenate(entries_cell)
        et = np.concatenate(entries_tri)
        keep = ec >= 0
        ec, et = ec[keep], et[keep]
    else:
        ec = np.zeros(0, np.int64)
        et = np.zeros(0, np.int64)
    ntiles = ntx * nty
    order = np.argsort(ec, kind="stable")
    ec, et = ec[order], et[order]
    starts = np.searchsorted(ec, np.arange(ntiles))
    within = np.arange(len(ec)) - starts[ec]
    cap = int(within.max() + 1) if len(within) else 1
    cap = max(-8 * (-cap // 8), 8)
    table = np.full((ntiles, cap), -1, np.int32)
    table[ec, within] = et.astype(np.int32)

    res_ids = tri_ids[live & ~front & ~(w <= 1e-6).all(1)]
    nr = max(-8 * (-len(res_ids) // 8), 8)
    residual = np.full(nr, -1, np.int32)
    residual[: len(res_ids)] = res_ids.astype(np.int32)

    v0 = p[:, 0].astype(np.float32)
    e1np = (p[:, 1] - p[:, 0]).astype(np.float32)
    e2np = (p[:, 2] - p[:, 0]).astype(np.float32)
    packed = _packed_rows_np(v0, e1np, e2np, live)
    occ = (table >= 0).sum(1)
    buckets = []
    bcap, lo_occ = 8, 0
    max_occ = int(occ.max()) if len(occ) else 0
    while lo_occ < max_occ:
        sel = np.flatnonzero((occ > lo_occ) & (occ <= bcap))
        if len(sel):
            padded = 512
            while padded < len(sel):
                padded *= 2
            ids = np.concatenate(
                [sel, np.full(padded - len(sel), -1)]).astype(np.int32)
            bc = min(bcap, cap)
            sub = table[sel, :bc]
            rows = packed[np.maximum(sub, 0)]
            rows[sub < 0] = 0.0
            rows_b = np.zeros((padded, bc * 16), np.float32)
            rows_b[: len(sel)] = rows.reshape(len(sel), bc * 16)
            buckets.append((bc, jnp.asarray(ids), jnp.asarray(rows_b)))
        lo_occ = bcap
        bcap *= 2

    return ImageGrid(
        eye=jnp.asarray(eye.astype(np.float32)),
        right=jnp.asarray(right.astype(np.float32)),
        true_up=jnp.asarray(true_up.astype(np.float32)),
        fwd=jnp.asarray(fwd.astype(np.float32)),
        half=half, aspect=aspect,
        width=width_px, height=height_px, tile_px=tile_px,
        tri_of_slot=jnp.asarray(table),
        v0=jnp.asarray(v0),
        e1=jnp.asarray(e1np),
        e2=jnp.asarray(e2np),
        valid=jnp.asarray(live),
        residual=jnp.asarray(residual),
        buckets=tuple(buckets),
    )


def _image_cast_tiles(
    tile_ids: Array,  # [M] i32 tile ids to process (-1 pad)
    eye: Array, right: Array, true_up: Array, fwd: Array,
    half: float, aspect: float, width: int, height: int, tile_px: int,
    tri_of_slot: Array, v0: Array, e1: Array, e2: Array, valid: Array,
    tiles_per_block: int = 512,
    rows_aligned: Array | None = None, packed_cells: bool = False,
):
    """Cast the pixels of the listed tiles only, at this table's cap —
    callers bucket tiles by occupancy so each tile pays a cap matched to
    its own load instead of the global max (empty tiles never dispatch).

    With ``packed_cells``, ``rows_aligned`` [M, cap*16] holds each listed
    tile's packed triangle rows in ``tile_ids`` order: the triangle fetch
    becomes one contiguous SLICE per block — zero gathers."""
    nty = -(-height // tile_px)
    cap = tri_of_slot.shape[1]
    rpc = tile_px * tile_px
    # pixel offsets within a tile
    oy, ox = jnp.meshgrid(jnp.arange(tile_px), jnp.arange(tile_px),
                          indexing="ij")
    ox = ox.ravel()
    oy = oy.ravel()

    m = tile_ids.shape[0]
    nb = -(-m // tiles_per_block)
    ids = jnp.pad(tile_ids, (0, nb * tiles_per_block - m),
                  constant_values=-1)
    rows_all = jnp.pad(rows_aligned,
                       ((0, nb * tiles_per_block - m), (0, 0))) \
        if packed_cells else None

    def block(bi):
        tids = jax.lax.dynamic_slice_in_dim(ids, bi * tiles_per_block,
                                            tiles_per_block)
        live_tile = tids >= 0
        tids = jnp.maximum(tids, 0)
        tx = tids // nty
        ty = tids % nty
        pxs = (tx[:, None] * tile_px + ox[None, :]).astype(jnp.float32) + 0.5
        pys = (ty[:, None] * tile_px + oy[None, :]).astype(jnp.float32) + 0.5
        sx = pxs / width * 2.0 - 1.0
        sy = 1.0 - pys / height * 2.0
        d = (fwd[None, None, :]
             + sx[..., None] * (half * aspect) * right[None, None, :]
             + sy[..., None] * half * true_up[None, None, :])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)  # [TB, rpc, 3]
        if packed_cells:
            rows = jax.lax.dynamic_slice_in_dim(
                rows_all, bi * tiles_per_block, tiles_per_block
            ).reshape(tiles_per_block, cap, 16)
            ok_tri = (rows[..., 9] > 0.5) & live_tile[:, None]
            slots = jnp.where(
                ok_tri,
                jax.lax.bitcast_convert_type(rows[..., 10], jnp.int32), -1)
            tv0 = rows[..., 0:3] - eye[None, None, :]  # origin at eye
            te1 = rows[..., 3:6]
            te2 = rows[..., 6:9]
        else:
            slots = tri_of_slot[tids]  # [TB, cap] — one row gather per tile
            tid = jnp.maximum(slots, 0)
            ok_tri = (slots >= 0) & valid[tid] & live_tile[:, None]
            tv0 = v0[tid] - eye[None, None, :]  # [TB, cap, 3] (origin at eye)
            te1 = e1[tid]
            te2 = e2[tid]
        # component-unrolled MT on [TB, cap, rpc]: rays ride the 128-lane
        # minor axis, triangles the sublanes — no [.., 3]-minor buffers and
        # no cap-minor padding (the small-occupancy buckets run cap 8/16)
        tt, uu, vv = mt_components(
            (0.0, 0.0, 0.0),  # origins at eye (tv0 is already v0 - eye)
            tuple(d[..., a][:, None, :] for a in range(3)),  # [TB,1,rpc]
            tuple(tv0[..., a][:, :, None] for a in range(3)),  # [TB,cap,1]
            tuple(te1[..., a][:, :, None] for a in range(3)),
            tuple(te2[..., a][:, :, None] for a in range(3)),
            ok_tri[:, :, None],
        )
        hit = jnp.isfinite(tt)
        cnt = jnp.sum(hit, 1).astype(jnp.int32)
        j = jnp.argmin(tt, 1)
        tmin = jnp.min(tt, 1)
        take = lambda a: jnp.take_along_axis(a, j[:, None, :], 1)[:, 0, :]
        tri_best = jnp.where(
            jnp.isfinite(tmin),
            take(jnp.broadcast_to(slots[:, :, None],
                                  (tiles_per_block, cap, rpc))), -1)
        return tmin, tri_best, take(uu), take(vv), cnt

    t_, tri_, u_, v_, cnt_ = jax.lax.map(block, jnp.arange(nb))
    flat = lambda x: x.reshape(-1, rpc)[:m]
    return flat(t_), flat(tri_), flat(u_), flat(v_), flat(cnt_)


@partial(jax.jit, static_argnames=("half", "aspect", "width", "height",
                                   "tile_px", "caps", "tiles_per_block",
                                   "packed_cells"))
def _image_cast_fused(
    ids_list,  # tuple of [Mb] i32 tile-id arrays, one per occupancy bucket
    eye, right, true_up, fwd,
    half: float, aspect: float, width: int, height: int, tile_px: int,
    tri_of_slot, v0, e1, e2, valid,
    caps: tuple, tiles_per_block: int,
    rows_list=(), packed_cells: bool = False,
):
    """All buckets + scatter-assembly in ONE dispatch — eager per-bucket
    calls each paid host↔device round-trip latency (dominant on
    remote-attached TPUs)."""
    ntx = -(-width // tile_px)
    nty = -(-height // tile_px)
    tp = tile_px
    rpc = tp * tp
    ntiles = ntx * nty
    t_all = jnp.full((ntiles + 1, rpc), jnp.inf, jnp.float32)
    tri_all = jnp.full((ntiles + 1, rpc), -1, jnp.int32)
    u_all = jnp.zeros((ntiles + 1, rpc), jnp.float32)
    v_all = jnp.zeros((ntiles + 1, rpc), jnp.float32)
    cnt_all = jnp.zeros((ntiles + 1, rpc), jnp.int32)
    for bi, (cap, ids) in enumerate(zip(caps, ids_list)):
        t_, tri_, u_, v_, cnt_ = _image_cast_tiles(
            ids, eye, right, true_up, fwd,
            half, aspect, width, height, tp,
            tri_of_slot[:, :cap], v0, e1, e2, valid,
            tiles_per_block=tiles_per_block,
            rows_aligned=rows_list[bi] if packed_cells else None,
            packed_cells=packed_cells,
        )
        row = jnp.where(ids >= 0, ids, ntiles)
        t_all = t_all.at[row].set(t_, mode="drop")
        tri_all = tri_all.at[row].set(tri_, mode="drop")
        u_all = u_all.at[row].set(u_, mode="drop")
        v_all = v_all.at[row].set(v_, mode="drop")
        cnt_all = cnt_all.at[row].set(cnt_, mode="drop")

    def to_image(flat):
        img = flat[:ntiles].reshape(ntx, nty, tp, tp)  # [tx, ty, oy, ox]
        img = jnp.transpose(img, (1, 2, 0, 3))  # [ty, oy, tx, ox]
        img = img.reshape(nty * tp, ntx * tp)
        return img[:height, :width].reshape(-1)

    return (to_image(t_all), to_image(tri_all), to_image(u_all),
            to_image(v_all), to_image(cnt_all))


def image_cast(grid: ImageGrid, tiles_per_block: int = 512) -> Hits:
    """Cast the full pinhole image against the prebuilt screen-space grid.
    Returns Hits in row-major pixel order (same layout as
    ``ops.raytrace.pinhole_rays``).

    Tiles are bucketed by occupancy (powers of two): a tile's pixel block
    only tests a candidate list sized to ITS occupancy — without this, one
    dense tile (a whole far canopy projecting into a few tiles) sets the
    Möller–Trumbore width for every tile in the image. Empty tiles are
    never dispatched at all."""
    caps = tuple(int(c) for c, _, _ in grid.buckets)
    ids_list = tuple(ids for _, ids, _ in grid.buckets)
    rows_list = tuple(rows for _, _, rows in grid.buckets)
    t, tri, u_, v_, cnt = _image_cast_fused(
        ids_list,
        grid.eye, grid.right, grid.true_up, grid.fwd,
        grid.half, grid.aspect, grid.width, grid.height, grid.tile_px,
        grid.tri_of_slot, grid.v0, grid.e1, grid.e2, grid.valid,
        caps=caps, tiles_per_block=tiles_per_block,
        rows_list=rows_list, packed_cells=True,
    )
    uv = jnp.stack([u_, v_], 1)

    if grid.residual.shape[0] and bool(grid.residual[0] >= 0):
        from pyqsm_tpu.ops.raytrace import cast_rays, pinhole_rays

        origins, dirs = pinhole_rays(
            grid.eye, grid.eye + grid.fwd, grid.true_up,
            float(np.degrees(2 * np.arctan(grid.half))),
            grid.width, grid.height)
        rid = np.asarray(grid.residual)
        rid = rid[rid >= 0]
        # brute MT on the few eye-straddling triangles via the generic engine
        verts_r = jnp.concatenate(
            [grid.v0[rid][:, None, :], (grid.v0 + grid.e1)[rid][:, None, :],
             (grid.v0 + grid.e2)[rid][:, None, :]], 1).reshape(-1, 3)
        tris_flat = jnp.arange(verts_r.shape[0], dtype=jnp.int32).reshape(-1, 3)
        h = cast_rays(origins, dirs, verts_r, tris_flat, backend="xla")
        better = h.t < t
        t = jnp.minimum(t, h.t)
        tri = jnp.where(better, jnp.asarray(rid, jnp.int32)[
            jnp.clip(h.tri, 0, len(rid) - 1)], tri)
        uv = jnp.where(better[:, None], h.uv, uv)
        cnt = cnt + h.count
    return Hits(t=t, tri=tri, uv=uv, count=cnt)


class CellCastResult(NamedTuple):
    t: Array  # [ncells, rpc] hit distance per ray (inf = miss)
    tri: Array  # [ncells, rpc] winning triangle id
    count: Array  # [ncells, rpc] crossings
    ray_area: float  # swept area per ray (for flux integrals)


def _cell_cast_rows(direction, u, v, origin_uv, cell, nx, ny,
                    table, cell_ids, v0, e1, e2, valid,
                    rpc_side, cell_tile, back_dist,
                    rows_strip=None, packed_cells=False):
    """Cell-aligned cast over an explicit table strip + cell-id vector —
    the SHARED body of the single-device ``_cell_cast`` and the shard-local
    kernel of ``parallel.raycast.sharded_cell_cast`` (one implementation so
    the two paths cannot diverge). Traceable; call under jit/shard_map.

    With ``packed_cells``, ``rows_strip`` [ncells_local, cap*16] replaces
    the per-slot v0/e1/e2 gathers with one contiguous SLICE per tile —
    zero gathers on the triangle fetch."""
    ncells_local = table.shape[0]
    cap = table.shape[1]
    rpc = rpc_side * rpc_side
    d = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-12)
    # sub-grid offsets within a cell (cell-centered samples)
    su = (jnp.arange(rpc_side) + 0.5) / rpc_side * cell
    gu, gv = jnp.meshgrid(su, su, indexing="xy")
    sub = jnp.stack([gu.ravel(), gv.ravel()], 1)  # [rpc, 2]
    nt = -(-ncells_local // cell_tile)

    def tile(ti):
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ti * cell_tile,
                                                    cell_tile)
        cids = sl(cell_ids)
        cx = (cids // ny).astype(jnp.float32)
        cy = (cids % ny).astype(jnp.float32)
        if packed_cells:
            rows = sl(rows_strip).reshape(cell_tile, cap, 16)
            ok_tri = rows[..., 9] > 0.5  # [CT, cap]
            slots = jnp.where(
                ok_tri,
                jax.lax.bitcast_convert_type(rows[..., 10], jnp.int32), -1)
            tv0 = rows[..., 0:3]
            te1 = rows[..., 3:6]
            te2 = rows[..., 6:9]
        else:
            # triangle block: table rows are contiguous — ONE dense slice
            slots = sl(table)
            tid = jnp.maximum(slots, 0)
            ok_tri = (slots >= 0) & valid[tid]  # [CT, cap]
            tv0 = v0[tid]  # [CT, cap, 3] — gathered once per CELL
            te1 = e1[tid]
            te2 = e2[tid]
        # ray origins for this tile: [CT, rpc, 3]
        uu = origin_uv[0] + cx[:, None] * cell + sub[None, :, 0]
        vv = origin_uv[1] + cy[:, None] * cell + sub[None, :, 1]
        o = (uu[..., None] * u[None, None, :] + vv[..., None] * v[None, None, :]
             - back_dist * d[None, None, :])
        # component-unrolled MT on [CT, cap, rpc]: rays on the lane axis,
        # triangles on sublanes — no [.., 3]-minor buffers
        tt, uu_, vv_ = mt_components(
            tuple(o[..., a][:, None, :] for a in range(3)),  # [CT,1,rpc]
            tuple(d[a] for a in range(3)),  # scalars broadcast everywhere
            tuple(tv0[..., a][:, :, None] for a in range(3)),  # [CT,cap,1]
            tuple(te1[..., a][:, :, None] for a in range(3)),
            tuple(te2[..., a][:, :, None] for a in range(3)),
            ok_tri[:, :, None],
        )
        hit = jnp.isfinite(tt)
        cnt = jnp.sum(hit, 1).astype(jnp.int32)
        j = jnp.argmin(tt, 1)
        tmin = jnp.min(tt, 1)
        tri_best = jnp.where(
            jnp.isfinite(tmin),
            jnp.take_along_axis(
                jnp.broadcast_to(slots[:, :, None],
                                 (cell_tile, slots.shape[1], rpc)),
                j[:, None, :], 1)[:, 0, :],
            -1,
        )
        return tmin, tri_best, cnt

    t_, tri_, cnt_ = jax.lax.map(tile, jnp.arange(nt))
    pad_cells = nt * cell_tile
    return (t_.reshape(pad_cells, rpc)[:ncells_local],
            tri_.reshape(pad_cells, rpc)[:ncells_local],
            cnt_.reshape(pad_cells, rpc)[:ncells_local])


@partial(jax.jit, static_argnames=("cell", "nx", "ny", "rpc_side", "cell_tile",
                                   "back_dist", "packed_cells"))
def _cell_cast(
    direction: Array,
    u: Array, v: Array, origin_uv: Array,
    cell: float, nx: int, ny: int,
    tri_of_slot: Array, v0: Array, e1: Array, e2: Array, valid: Array,
    rpc_side: int, cell_tile: int, back_dist: float,
    cell_rows: Array | None = None, packed_cells: bool = False,
):
    ncells = nx * ny
    nt = -(-ncells // cell_tile)
    pad_cells = nt * cell_tile
    table = jnp.pad(tri_of_slot, ((0, pad_cells - ncells), (0, 0)),
                    constant_values=-1)
    cell_ids = jnp.arange(pad_cells, dtype=jnp.int32)
    rows = jnp.pad(cell_rows, ((0, pad_cells - ncells), (0, 0))) \
        if packed_cells else None
    t_, tri_, cnt_ = _cell_cast_rows(
        direction, u, v, origin_uv, cell, nx, ny, table, cell_ids,
        v0, e1, e2, valid, rpc_side, cell_tile, back_dist,
        rows_strip=rows, packed_cells=packed_cells)
    return t_[:ncells], tri_[:ncells], cnt_[:ncells]


def cell_cast_parallel(grid: RayGrid, direction, rays_per_cell_side: int = 4,
                       cell_tile: int = 256, back_dist: float = 1e3) -> CellCastResult:
    """Cell-aligned parallel-bundle casting: the bundle's rays are generated
    per grid cell (``rays_per_cell_side²`` each), so each cell's triangle
    list is loaded ONCE and shared by its whole ray block — dense VMEM
    compute instead of per-ray gathers. This is the high-throughput path for
    sun/rain flux (ray density = rays_per_cell_side / cell)."""
    t, tri, cnt = _cell_cast(
        jnp.asarray(direction, jnp.float32), grid.u, grid.v, grid.origin_uv,
        grid.cell, grid.nx, grid.ny,
        grid.tri_of_slot, grid.v0, grid.e1, grid.e2, grid.valid,
        rpc_side=rays_per_cell_side, cell_tile=cell_tile, back_dist=back_dist,
        cell_rows=grid.cell_rows, packed_cells=bool(grid.packed_cells),
    )
    ray_area = (grid.cell / rays_per_cell_side) ** 2
    return CellCastResult(t=t, tri=tri, count=cnt, ray_area=ray_area)
