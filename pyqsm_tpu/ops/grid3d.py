"""3D uniform-grid acceleration structure for general ray bundles.

TPU-native replacement for Embree's BVH (the reference rides
``o3d.t.geometry.RaycastingScene`` — ``viz/ray_casting.py:65-71,279``).
A BVH's divergent, stack-based traversal maps poorly onto a SIMD machine;
a uniform grid marched with a 3-DDA keeps every ray in the tile executing
the SAME loop: per step, one dense ELL gather of the current cell's
triangle list + one [rays × cap] Möller–Trumbore batch on the VPU, then a
lockstep DDA advance. Early termination: a ray retires as soon as its best
hit lies inside the current cell interval (any farther cell can only
produce larger t).

Build is host-orchestrated (one sort, like Embree's own host-side build)
and returns static-shape device arrays; traversal is fully jitted.

Exactness: every triangle is registered in all cells its AABB touches, and
a hit is only *terminal* once t ≤ the cell-exit parameter, so the closest
hit is exact (oracle-tested against the brute Möller–Trumbore path).
Crossing counts (occupancy parity) are deduplicated by counting a hit only
in the cell interval [t_enter, t_exit) that contains it.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.ops.raytrace import Hits

Array = jax.Array

_EPS = 1e-9


class Grid3D(NamedTuple):
    lo: Array  # [3] grid origin (scene AABB min)
    cell: float  # static cell edge
    nx: int  # static dims
    ny: int
    nz: int
    tri_of_slot: Array  # [ncells, cap] i32 triangle ids, -1 padded
    v0: Array  # [T, 3] triangle origin (input order)
    e1: Array  # [T, 3]
    e2: Array  # [T, 3]
    valid: Array  # [T] bool
    residual: Array  # [nr] i32 ids tested brute-force by every ray (-1 pad)
    skip: Array  # [ncells] u8 Chebyshev distance to nearest occupied cell
    packed: Array  # [T, 16] f32 rows: v0 | e1 | e2 | valid | pad — ONE
    #   gather per candidate (TPU gather cost scales with index count, not
    #   row bytes: 64B rows ride the same DMA as 12B rows)
    n_residual: int = 0  # static count of live residual ids
    n_occupied: int = 0  # static count of occupied cells (wavefront bound)
    # lane-aligned per-cell triangle rows: traversal gathers ONE contiguous
    # [cap*16] f32 row per ray instead of cap separate [16]-wide rows that
    # each tile-pad to 128 lanes (measured 8x HBM waste). Slot layout per
    # triangle: v0|e1|e2|valid|tri_id_bits|pad.
    cell_rank: Array | None = None  # [ncells] i32 occupied-cell rank, -1 empty
    cell_rows: Array | None = None  # [n_occ_pad, cap*16] f32
    packed_cells: bool = False  # static: cell_rows is populated

    @property
    def n_cells(self) -> int:
        return self.nx * self.ny * self.nz

    @property
    def cap(self) -> int:
        return self.tri_of_slot.shape[1]


class TwoLevelGrid(NamedTuple):
    """Two-level acceleration for teapot-in-stadium scenes (Embree handles
    these by BVH subdivision, ref viz/ray_casting.py:65-71): the top grid's
    overflow-spilled triangles — which the single-level design brute-tests
    on EVERY ray — instead get their own fine grid sized to their (compact)
    hotspot AABB. ``two_level_cast`` merges both closest hits; exactness is
    preserved because the spill removes a triangle from the top grid
    entirely, so the two triangle sets are disjoint."""

    primary: Grid3D  # residual stripped (n_residual = 0)
    sub: Grid3D  # fine grid over ONLY the spilled triangles (COMPACT ids)
    sub_tri_ids: Array  # [S_pad] i32 compact→global triangle id map, -1 pad
    #   (the sub grid stores just the hotspot subset — carrying the full
    #   scene-sized v0/e1/e2/packed arrays doubled triangle HBM per mesh)


def build_grid3d(
    vertices: Array,
    triangles: Array,
    target_tris_per_cell: float = 4.0,
    max_cells_per_axis: int = 256,
    cell_cap: int | None = None,
    cap_percentile: float = 99.5,
    cell_rows_budget: int = 1 << 30,
) -> Grid3D:
    """Host-orchestrated uniform-grid build (one argsort).

    Cell size balances two costs: ~``target_tris_per_cell`` triangles tested
    per step vs DDA step count. Oversized triangles simply register in more
    cells (the host build tolerates variable spans).

    Dense hotspots (overlapping leaves at canopy cores) would otherwise set
    the ELL cap for EVERY traversal step, so the cap is bounded at the
    ``cap_percentile`` cell occupancy: triangles that overflow their cell are
    removed from the grid entirely and moved to a global ``residual`` list
    that every ray brute-tests once — exactness is preserved, and the
    per-step gather stays narrow. ``cell_cap`` (explicit) still raises if
    exceeded, for callers that require a bound with no residual pass.
    """
    verts = np.asarray(vertices, np.float64)
    tris = np.asarray(triangles)
    live = tris[:, 0] >= 0
    t = np.maximum(tris, 0)
    p0, p1, p2 = verts[t[:, 0]], verts[t[:, 1]], verts[t[:, 2]]
    tlo = np.minimum(np.minimum(p0, p1), p2)
    thi = np.maximum(np.maximum(p0, p1), p2)

    scene_lo = np.where(live[:, None], tlo, np.inf).min(0)
    scene_hi = np.where(live[:, None], thi, -np.inf).max(0)
    if not np.isfinite(scene_lo).all():
        scene_lo = np.zeros(3)
        scene_hi = np.ones(3)
    span = np.maximum(scene_hi - scene_lo, 1e-6)

    n_live = max(int(live.sum()), 1)
    # heuristic: n_cells ≈ n_live / target → cell ≈ (V·target/n)^(1/3),
    # floored so no axis exceeds max_cells_per_axis and no cell is smaller
    # than the median triangle extent (keeps per-triangle cell spans ~1-8)
    vol = float(span.prod())
    cell = (vol * target_tris_per_cell / n_live) ** (1.0 / 3.0)
    ext = np.where(live[:, None], thi - tlo, 0.0)
    if live.any():
        med_ext = float(np.percentile(ext[live].max(1), 50))
        cell = max(cell, med_ext)
    cell = max(cell, float(span.max()) / max_cells_per_axis)
    cell += 1e-9

    dims = np.maximum((span / cell).astype(np.int64) + 1, 1)
    nx, ny, nz = int(dims[0]), int(dims[1]), int(dims[2])

    c_lo = np.clip(np.floor((tlo - scene_lo) / cell).astype(np.int64), 0,
                   dims - 1)
    c_hi = np.clip(np.floor((thi - scene_lo) / cell).astype(np.int64), 0,
                   dims - 1)
    spans = np.where(live[:, None], c_hi - c_lo + 1, 0)
    sx = int(spans[:, 0].max()) if live.any() else 1
    sy = int(spans[:, 1].max()) if live.any() else 1
    sz = int(spans[:, 2].max()) if live.any() else 1

    tri_ids = np.arange(len(tris), dtype=np.int64)
    entries_cell = []
    entries_tri = []
    for dx in range(max(sx, 1)):
        for dy in range(max(sy, 1)):
            for dz in range(max(sz, 1)):
                cx = c_lo[:, 0] + dx
                cy = c_lo[:, 1] + dy
                cz = c_lo[:, 2] + dz
                touch = (
                    (cx <= c_hi[:, 0]) & (cy <= c_hi[:, 1])
                    & (cz <= c_hi[:, 2]) & live
                )
                if not touch.any():
                    continue
                cid = (cx * ny + cy) * nz + cz
                entries_cell.append(np.where(touch, cid, -1))
                entries_tri.append(np.where(touch, tri_ids, -1))
    if entries_cell:
        ec = np.concatenate(entries_cell)
        et = np.concatenate(entries_tri)
        keep = ec >= 0
        ec, et = ec[keep], et[keep]
    else:
        ec = np.zeros(0, np.int64)
        et = np.zeros(0, np.int64)

    ncells = nx * ny * nz
    order = np.argsort(ec, kind="stable")
    ec, et = ec[order], et[order]
    starts = np.searchsorted(ec, np.arange(ncells))
    counts = np.diff(np.append(starts, len(ec)))
    occupancy = int(counts.max()) if len(counts) else 0
    if cell_cap is not None:
        if occupancy > cell_cap:
            raise ValueError(
                f"cell_cap {cell_cap} < max triangles per cell {occupancy}; "
                f"raise cell_cap or lower target_tris_per_cell"
            )
        cap = cell_cap
        residual_ids = np.zeros(0, np.int64)
    else:
        nonzero = counts[counts > 0]
        cap = int(np.percentile(nonzero, cap_percentile)) if len(nonzero) else 8
        cap = min(max(cap, 8), max(occupancy, 8))
        # overflow spill: a triangle past its cell's cap leaves the grid
        # ENTIRELY (every registration) so crossings are never double-counted
        within_all = np.arange(len(ec)) - starts[ec]
        residual_ids = np.unique(et[within_all >= cap])
        if len(residual_ids):
            drop = np.isin(et, residual_ids)
            ec, et = ec[~drop], et[~drop]
            starts = np.searchsorted(ec, np.arange(ncells))
    cap = max(-8 * (-cap // 8), 8)  # pad to a lane-friendly multiple of 8
    within = np.arange(len(ec)) - starts[ec]
    table = np.full((ncells, cap), -1, np.int32)
    table[ec, within] = et.astype(np.int32)

    nr = max(-8 * (-len(residual_ids) // 8), 8)
    residual = np.full(nr, -1, np.int32)
    residual[: len(residual_ids)] = residual_ids.astype(np.int32)

    # proximity clouds: per-cell Chebyshev distance to the nearest occupied
    # cell. Traversal safely jumps (skip-1) cells through verified-empty
    # space with one u8 gather instead of a [cap]-wide triangle test.
    occ = np.zeros(ncells, bool)
    if len(ec):
        occ[np.unique(ec)] = True
    if occ.any() and not occ.all():
        try:
            from scipy.ndimage import distance_transform_cdt

            dist = distance_transform_cdt(
                ~occ.reshape(nx, ny, nz), metric="chessboard"
            ).reshape(-1)
        except ImportError:  # scipy is an optional extra ([host])
            dist = _chebyshev_dt(occ.reshape(nx, ny, nz)).reshape(-1)
    else:
        dist = np.zeros(ncells, np.int64)
    skip = np.minimum(dist, 255).astype(np.uint8)

    packed_np = np.concatenate([
        p0, p1 - p0, p2 - p0,
        live[:, None].astype(np.float64),
        np.zeros((len(tris), 6)),
    ], axis=1).astype(np.float32)
    # slot 10 carries the triangle id as raw int32 bits (exact for any id,
    # recovered in-kernel with bitcast_convert_type)
    packed_np[:, 10] = np.arange(len(tris), dtype=np.int32).view(np.float32)

    occ_ids = np.flatnonzero(occ)
    n_occ = len(occ_ids)
    packed_cells = (n_occ + 8) * cap * 64 <= cell_rows_budget
    if packed_cells:
        rank = np.full(ncells, -1, np.int32)
        rank[occ_ids] = np.arange(n_occ, dtype=np.int32)
        slot_tab = table[occ_ids] if n_occ else np.zeros((0, cap), np.int32)
        rows = packed_np[np.maximum(slot_tab, 0)]
        rows[slot_tab < 0] = 0.0
        n_occ_pad = max(-8 * (-(n_occ + 1) // 8), 8)
        rows_flat = np.zeros((n_occ_pad, cap * 16), np.float32)
        if n_occ:
            rows_flat[:n_occ] = rows.reshape(n_occ, cap * 16)
        cell_rank = jnp.asarray(rank)
        cell_rows = jnp.asarray(rows_flat)
    else:
        cell_rank = jnp.zeros(1, jnp.int32)
        cell_rows = jnp.zeros((8, 16), jnp.float32)

    return Grid3D(
        lo=jnp.asarray(scene_lo.astype(np.float32)),
        cell=float(cell), nx=nx, ny=ny, nz=nz,
        tri_of_slot=jnp.asarray(table),
        v0=jnp.asarray(p0.astype(np.float32)),
        e1=jnp.asarray((p1 - p0).astype(np.float32)),
        e2=jnp.asarray((p2 - p0).astype(np.float32)),
        valid=jnp.asarray(live),
        residual=jnp.asarray(residual),
        skip=jnp.asarray(skip),
        packed=jnp.asarray(packed_np),
        n_residual=int(len(residual_ids)),
        n_occupied=int(occ.sum()),
        cell_rank=cell_rank,
        cell_rows=cell_rows,
        packed_cells=packed_cells,
    )


def build_grid3d_two_level(
    vertices: Array,
    triangles: Array,
    min_residual: int = 256,
    **build_kw,
) -> "Grid3D | TwoLevelGrid":
    """Build a grid, escalating to :class:`TwoLevelGrid` when the overflow
    spill is large enough that the every-ray residual brute pass would
    dominate (>= ``min_residual`` spilled triangles). Below the threshold
    the plain :class:`Grid3D` is returned unchanged — ``two_level_cast``
    accepts both."""
    g = build_grid3d(vertices, triangles, **build_kw)
    if g.n_residual < min_residual:
        return g
    res_ids = np.asarray(g.residual)[: g.n_residual]
    tris = np.asarray(triangles)
    verts = np.asarray(vertices)
    # the spill mixes two populations: the dense hotspot (many SMALL
    # triangles — the sub grid's reason to exist) and any large spanning
    # triangles that happened to sort past the cap in an overflowing cell.
    # Large ones would blow the sub grid's extent back up to scene scale,
    # so they stay on the brute residual pass (they are few by nature).
    t = np.maximum(tris[res_ids], 0)
    ext = (np.max([verts[t[:, i]] for i in range(3)], axis=0)
           - np.min([verts[t[:, i]] for i in range(3)], axis=0)).max(1)
    med = max(float(np.median(ext)), 1e-9)
    small = ext <= 8.0 * med
    sub_ids = res_ids[small]
    if len(sub_ids) < min_residual:
        return g
    brute_ids = res_ids[~small]
    nr = max(-8 * (-len(brute_ids) // 8), 8)
    brute = np.full(nr, -1, np.int32)
    brute[: len(brute_ids)] = brute_ids
    # COMPACT triangle set: the sub grid stores only the spilled subset
    # (full-size masked arrays doubled per-mesh triangle HBM); hits come
    # back with compact ids and two_level_cast remaps them to global
    ns = max(-8 * (-len(sub_ids) // 8), 8)
    sub_tris = np.full((ns, 3), -1, tris.dtype)
    sub_tris[: len(sub_ids)] = tris[sub_ids]
    id_map = np.full(ns, -1, np.int32)
    id_map[: len(sub_ids)] = sub_ids
    sub = build_grid3d(vertices, jnp.asarray(sub_tris), **build_kw)
    primary = g._replace(
        residual=jnp.asarray(brute), n_residual=int(len(brute_ids)))
    return TwoLevelGrid(primary=primary, sub=sub,
                        sub_tri_ids=jnp.asarray(id_map))


@jax.jit
def merge_hits(a, b):
    """Closest-hit merge of two casts over DISJOINT triangle sets: winner by
    smaller t; crossing counts add (exact under ``count_all=True``).
    Jitted: callers invoke it as eager glue between host-stepped casts, and
    each of its 5 ops otherwise pays a separate tunnel dispatch."""
    from pyqsm_tpu.ops.raytrace import Hits

    b_wins = b.t < a.t
    return Hits(
        t=jnp.minimum(a.t, b.t),
        tri=jnp.where(b_wins, b.tri, a.tri),
        uv=jnp.where(b_wins[:, None], b.uv, a.uv),
        count=a.count + b.count,
    )


@jax.jit
def _aabb_mask(origins: Array, dirs: Array, lo: Array, hi: Array
               ) -> tuple[Array, Array]:
    """Conservative slab test. Returns (touch, t_enter): ``touch`` is True
    for rays whose forward segment touches the [lo, hi] box (epsilon-
    padded); ``t_enter`` is the forward march parameter at which the ray
    enters the box (0 when starting inside, junk where ``touch`` is
    False)."""
    eps = 1e-4 * jnp.max(hi - lo)
    lo = lo - eps
    hi = hi + eps
    inv = jnp.where(dirs != 0, 1.0 / jnp.where(dirs == 0, 1.0, dirs), jnp.inf)
    t0 = (lo[None, :] - origins) * inv
    t1 = (hi[None, :] - origins) * inv
    inside = (origins >= lo[None, :]) & (origins <= hi[None, :])
    tmin = jnp.where(dirs != 0, jnp.minimum(t0, t1),
                     jnp.where(inside, -jnp.inf, jnp.inf))
    tmax = jnp.where(dirs != 0, jnp.maximum(t0, t1),
                     jnp.where(inside, jnp.inf, -jnp.inf))
    t_enter = jnp.maximum(jnp.max(tmin, 1), 0.0)
    return t_enter <= jnp.min(tmax, 1), t_enter


def two_level_cast(grid, origins: Array, dirs: Array, wavefront: bool = False,
                   **cast_kw):
    """Cast against a :class:`Grid3D` or :class:`TwoLevelGrid` uniformly
    (``grid_cast`` semantics; ``wavefront=True`` routes both levels through
    ``grid_cast_wavefront``).

    The sub cast is CULLED to rays whose segment touches the sub grid's
    AABB: the spill region is tiny by construction, and walking the whole
    bundle through it cost ~0.9 s of the 3.4 s call at 1M rays (measured on
    the bench scene — 2586 dead blocks for 396 triangles)."""
    caster = grid_cast_wavefront if wavefront else grid_cast
    if isinstance(grid, Grid3D):
        return caster(grid, origins, dirs, **cast_kw)
    import time as _time

    t0 = _time.perf_counter()
    a = caster(grid.primary, origins, dirs, **cast_kw)
    if cast_kw.get("debug"):
        print(f"# two_level primary dt={_time.perf_counter() - t0:.3f}s",
              flush=True)
        t0 = _time.perf_counter()

    sub = grid.sub
    lo = sub.lo
    hi = lo + jnp.array([sub.nx, sub.ny, sub.nz], jnp.float32) * sub.cell
    touch, t_enter_sub = _aabb_mask(jnp.asarray(origins, jnp.float32),
                                    jnp.asarray(dirs, jnp.float32), lo, hi)
    if not cast_kw.get("count_all", False):
        # occlusion cull: with closest-hit semantics a sub-grid triangle can
        # only win for rays that ENTER the sub AABB before their primary
        # closest hit — on open scenes this retires most of the bundle
        # before the sub walk is even sized
        touch = touch & (t_enter_sub <= a.t + 1e-4)
    r = origins.shape[0]
    m = int(jnp.sum(touch))  # host sync: cull count sizes the sub bundle
    if cast_kw.get("debug"):
        print(f"# two_level sub cull m={m}/{r} "
              f"(sub {sub.nx}x{sub.ny}x{sub.nz} occ {sub.n_occupied})",
              flush=True)
    if m == 0:
        return a
    if m >= r // 2:
        b = caster(sub, origins, dirs, **cast_kw)
        b = b._replace(tri=jnp.where(
            b.tri >= 0, grid.sub_tri_ids[jnp.maximum(b.tri, 0)], b.tri))
        return merge_hits(a, b)
    from pyqsm_tpu.ops.sampling import nonzero_rows

    mc = 256
    while mc < m:
        mc *= 2  # pow2 capacity buckets: the sub-bundle walk costs linear
        # in the padded capacity, and the cull ratio on real bundles sits
        # mid-bucket (pow4 overshot up to 4x)
    sel = nonzero_rows(touch, mc)
    safe = jnp.maximum(sel, 0)
    live = sel >= 0
    # padding rows alias ray 0 but their results are dropped on scatter
    bs = caster(sub, origins[safe], dirs[safe], **cast_kw)
    return _scatter_sub_hits(a, bs.t, bs.tri, bs.uv, bs.count, safe, live,
                             grid.sub_tri_ids)


def _chebyshev_dt(occ3: np.ndarray, max_dist: int = 64) -> np.ndarray:
    """Chebyshev (chessboard) distance-to-nearest-occupied, pure numpy.

    Fallback when scipy (the ``[host]`` extra) is absent. Iterative binary
    dilation with a separable 3×3×3 chessboard element: after ``i`` rounds
    the dilated set is exactly {cells with Chebyshev distance ≤ i}. Stops at
    ``max_dist`` and SATURATES the remaining cells there — an underestimated
    skip distance is conservative-correct (the DDA just takes more jumps),
    and a 64-cell jump already crosses a quarter of the largest grid; the
    unbounded loop cost O(max_true_dist · ncells) on sparse scenes (cells
    occupied only in one corner) was minutes of host time at 256³."""
    dist = np.zeros(occ3.shape, np.int64)
    reached = occ3.copy()
    for i in range(1, max_dist + 1):
        if reached.all():
            break
        grown = reached.copy()
        for ax in range(3):
            lo = np.roll(grown, 1, axis=ax)
            hi = np.roll(grown, -1, axis=ax)
            # np.roll wraps; sever the wrap so distance never crosses edges
            idx_lo = [slice(None)] * 3
            idx_lo[ax] = 0
            lo[tuple(idx_lo)] = False
            idx_hi = [slice(None)] * 3
            idx_hi[ax] = -1
            hi[tuple(idx_hi)] = False
            grown |= lo | hi
        new = grown & ~reached
        if not new.any():
            dist[~reached] = max_dist
            break
        dist[new] = i
        reached = grown
    else:
        dist[~reached] = max_dist
    return dist


def _mt_rows(o, d, rows, ok):
    """Möller–Trumbore of o/d [RT,3] rays against ``rows`` [RT,C,16]
    packed v0|e1|e2 triangle rows with ``ok`` [RT,C] candidate validity,
    via the shared component-unrolled core (``raytrace.mt_components``) —
    every intermediate is [RT,C], no trailing length-3 buffers.
    Returns (t [RT,C] inf=miss, u, v)."""
    from pyqsm_tpu.ops.raytrace import mt_components

    return mt_components(
        tuple(o[:, a][:, None] for a in range(3)),
        tuple(d[:, a][:, None] for a in range(3)),
        tuple(rows[..., a] for a in range(3)),
        tuple(rows[..., 3 + a] for a in range(3)),
        tuple(rows[..., 6 + a] for a in range(3)),
        ok,
    )


def _mt_batch(o, d, slots, packed, alive):
    """Möller–Trumbore of each ray against its own candidate list.
    o/d [RT,3]; slots [RT,C] (-1 pad); ``packed`` [T,16] v0|e1|e2|valid rows
    (one 64B-row gather per candidate — the phase's dominant cost scales
    with gather *index count*, so the three coordinate arrays ride one
    fetch). Returns (t [RT,C], u, v) inf=miss."""
    tid = jnp.maximum(slots, 0)
    rows = packed[tid]  # [RT, C, 16]
    ok = (slots >= 0) & (rows[..., 9] > 0.5) & alive[:, None]
    return _mt_rows(o, d, rows, ok)


def _mt_batch_cells(o, d, rank, cell_rows, alive):
    """Möller–Trumbore of each ray against its CELL's packed row.
    ``rank`` [RT] occupied-cell rank (-1 = empty/dead); ``cell_rows``
    [n_occ_pad, cap*16]. One contiguous lane-aligned gather per ray —
    the index count is RT, not RT·cap, and no fetched byte is padding.
    Returns (t [RT,cap] inf=miss, u, v, slots [RT,cap] tri ids -1 pad)."""
    cap = cell_rows.shape[1] // 16
    rows = cell_rows[jnp.maximum(rank, 0)].reshape(o.shape[0], cap, 16)
    ok = (rank >= 0)[:, None] & (rows[..., 9] > 0.5) & alive[:, None]
    slots = jnp.where(
        ok, jax.lax.bitcast_convert_type(rows[..., 10], jnp.int32), -1)
    tt, u, v = _mt_rows(o, d, rows, ok)
    return tt, u, v, slots


@partial(jax.jit, static_argnames=(
    "cell", "nx", "ny", "nz", "ray_tile", "max_steps", "count_all",
    "packed_cells"))
def _grid_cast3d(
    origins: Array, dirs: Array,
    lo: Array, cell: float, nx: int, ny: int, nz: int,
    tri_of_slot: Array, packed: Array,
    residual: Array, skip_tab: Array,
    ray_tile: int, max_steps: int, count_all: bool,
    cell_rank: Array | None = None, cell_rows: Array | None = None,
    packed_cells: bool = False,
) -> Hits:
    r = origins.shape[0]
    dims = jnp.array([nx, ny, nz], jnp.int32)
    hi = lo + dims.astype(jnp.float32) * cell
    rem = (-r) % ray_tile
    o_all = jnp.pad(origins.astype(jnp.float32), ((0, rem), (0, 0)))
    d_all = jnp.pad(dirs.astype(jnp.float32), ((0, rem), (0, 0)),
                    constant_values=1.0)

    def tile(args):
        o, d = args  # [RT, 3]
        inv_d = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), jnp.inf)
        # slab test against the grid AABB
        t0 = (lo[None, :] - o) * inv_d
        t1 = (hi[None, :] - o) * inv_d
        # d == 0 axes: inside-slab → (-inf, +inf), outside → empty
        inside0 = (o >= lo[None, :]) & (o <= hi[None, :])
        tmin_ax = jnp.where(d != 0, jnp.minimum(t0, t1),
                            jnp.where(inside0, -jnp.inf, jnp.inf))
        tmax_ax = jnp.where(d != 0, jnp.maximum(t0, t1),
                            jnp.where(inside0, jnp.inf, -jnp.inf))
        t_enter = jnp.maximum(jnp.max(tmin_ax, 1), 0.0)
        t_exit_grid = jnp.min(tmax_ax, 1)
        alive0 = t_enter <= t_exit_grid

        pos = o + (t_enter[:, None] + 1e-6) * d
        c0 = jnp.clip(jnp.floor((pos - lo[None, :]) / cell).astype(jnp.int32),
                      0, dims[None, :] - 1)
        step = jnp.where(d > 0, 1, jnp.where(d < 0, -1, 0)).astype(jnp.int32)
        t_delta = jnp.where(d != 0, cell * jnp.abs(inv_d), jnp.inf)
        # safe skip distance per Chebyshev unit: moving τ along the ray moves
        # ≤ τ/t_delta_i cells on axis i, so τ = k·min(t_delta) stays within
        # k cells of the start on every axis
        min_td = jnp.min(t_delta, 1)

        def t_max_of(c):
            """Exit parameter of cell c along each axis (closed form —
            recomputed instead of carried so skip-jumps can relocate cells)."""
            nb = lo[None, :] + jnp.where(
                d >= 0, (c + 1).astype(jnp.float32), c.astype(jnp.float32)
            ) * cell
            return jnp.where(d != 0, (nb - o) * inv_d, jnp.inf)

        def cell_id(c):
            return (c[:, 0] * ny + c[:, 1]) * nz + c[:, 2]

        def skip_of(c, alive):
            return jnp.where(
                alive, skip_tab[jnp.where(alive, cell_id(c), 0)], 0
            ).astype(jnp.int32)

        def dda_step(c, move):
            """One standard DDA advance for rays in ``move``; returns
            (c', t_cur', stay_alive)."""
            tm = t_max_of(c)
            t_exit = jnp.min(tm, 1)
            ax = jnp.argmin(tm, 1)
            onehot = jax.nn.one_hot(ax, 3, dtype=jnp.int32)
            c_new = c + onehot * step
            oob = jnp.any((c_new < 0) | (c_new >= dims[None, :]), 1)
            return (
                jnp.where(move[:, None], jnp.clip(c_new, 0, dims[None, :] - 1), c),
                t_exit,
                jnp.logical_not(move & oob),
            )

        rt = o.shape[0]
        state = dict(
            c=c0, t_cur=t_enter, alive=alive0,
            k=skip_of(c0, alive0),
            best_t=jnp.full(rt, jnp.inf),
            best_tri=jnp.full(rt, -1, jnp.int32),
            best_uv=jnp.zeros((rt, 2)),
            count=jnp.zeros(rt, jnp.int32),
            it=jnp.int32(0),
        )

        def cond(s):
            return jnp.any(s["alive"]) & (s["it"] < max_steps)

        def body(s):
            # ---- SKIP PHASE: march every alive ray to its next occupied
            # cell. Work per iteration = one u8 gather + vector math — no
            # triangle data touched. Rays in verified-empty space jump
            # (k-1)·min_t_delta in one iteration (proximity clouds).
            def skip_cond(ss):
                return jnp.any(ss["alive"] & (ss["k"] > 0)) & (
                    ss["jt"] < max_steps)

            def skip_body(ss):
                c, t_cur, alive, k = ss["c"], ss["t_cur"], ss["alive"], ss["k"]
                move = alive & (k > 0)
                jump = move & (k >= 2)
                # long jump: land by parameter, relocate cell from position
                tau = (k - 1).astype(jnp.float32) * min_td
                t_jump = t_cur + tau
                pj = o + t_jump[:, None] * d
                c_jump = jnp.clip(
                    jnp.floor((pj - lo[None, :]) / cell).astype(jnp.int32),
                    0, dims[None, :] - 1)
                # single step for k == 1
                c_step, t_exit, ok_step = dda_step(c, move & ~jump)
                c_new = jnp.where(jump[:, None], c_jump, c_step)
                t_new = jnp.where(jump, t_jump,
                                  jnp.where(move, t_exit, t_cur))
                dead = (jump & (t_new >= t_exit_grid)) | ~ok_step
                alive_new = alive & ~dead
                return dict(
                    c=c_new, t_cur=t_new, alive=alive_new,
                    k=skip_of(c_new, alive_new), jt=ss["jt"] + 1,
                )

            # inner budget is per-phase: every iteration advances all k>0
            # rays ≥1 cell, so the path length bounds it independently of
            # how phases interleave across the tile
            sk = jax.lax.while_loop(
                skip_cond, skip_body,
                dict(c=s["c"], t_cur=s["t_cur"], alive=s["alive"],
                     k=s["k"], jt=jnp.int32(0)),
            )
            c, alive = sk["c"], sk["alive"]

            # ---- TEST PHASE: every alive ray sits in an occupied cell —
            # one [RT, cap] Möller–Trumbore batch
            cid = jnp.where(alive, cell_id(c), 0)
            if packed_cells:
                rnk = jnp.where(alive, cell_rank[cid], -1)
                tt, u, v, slots = _mt_batch_cells(o, d, rnk, cell_rows,
                                                  alive)
            else:
                slots = tri_of_slot[cid]  # [RT, cap]
                tt, u, v = _mt_batch(o, d, slots, packed, alive)
            hit = jnp.isfinite(tt)
            # crossings deduplicated by assigning each hit POINT to exactly
            # one cell with the same floor/clip arithmetic as the build (an
            # interval test [t_cur, t_exit) is fp-fragile at boundaries: the
            # same hit computes to slightly different t in adjacent cells).
            # Component-unrolled: [RT, cap] per axis, no trailing-3 buffers.
            in_cell = hit
            for a in range(3):
                hca = jnp.clip(
                    jnp.floor((o[:, a][:, None] + tt * d[:, a][:, None]
                               - lo[a]) / cell).astype(jnp.int32),
                    0, dims[a] - 1)
                in_cell = in_cell & (hca == c[:, a][:, None])
            count = s["count"] + jnp.sum(in_cell, 1).astype(jnp.int32)

            j = jnp.argmin(tt, 1)
            tmin = jnp.min(tt, 1)
            better = tmin < s["best_t"]
            best_tri = jnp.where(
                better, jnp.take_along_axis(slots, j[:, None], 1)[:, 0],
                s["best_tri"])
            ub = jnp.take_along_axis(u, j[:, None], 1)[:, 0]
            vb = jnp.take_along_axis(v, j[:, None], 1)[:, 0]
            best_uv = jnp.where(better[:, None], jnp.stack([ub, vb], 1),
                                s["best_uv"])
            best_t = jnp.minimum(s["best_t"], tmin)

            # advance past the tested cell
            c_new, t_exit, ok_step = dda_step(c, alive)
            done_hit = jnp.logical_not(count_all) & (best_t <= t_exit + 1e-6)
            alive = alive & ok_step & jnp.logical_not(done_hit)
            return dict(
                c=c_new, t_cur=jnp.where(alive, t_exit, sk["t_cur"]),
                alive=alive, k=skip_of(c_new, alive),
                best_t=best_t, best_tri=best_tri, best_uv=best_uv,
                count=count, it=s["it"] + 1,
            )

        s = jax.lax.while_loop(cond, body, state)
        best_t, best_tri = s["best_t"], s["best_tri"]
        best_uv, count = s["best_uv"], s["count"]

        # residual pass: overflow-spilled triangles, brute-tested once per
        # ray (they are absent from every cell, so no double counting)
        if residual.shape[0] > 0:
            r_slots = jnp.broadcast_to(residual[None, :],
                                       (rt, residual.shape[0]))
            tt, u, v = _mt_batch(o, d, r_slots, packed, alive0)
            count = count + jnp.sum(jnp.isfinite(tt), 1).astype(jnp.int32)
            j = jnp.argmin(tt, 1)
            tmin = jnp.min(tt, 1)
            better = tmin < best_t
            best_tri = jnp.where(
                better, jnp.take_along_axis(r_slots, j[:, None], 1)[:, 0],
                best_tri)
            ub = jnp.take_along_axis(u, j[:, None], 1)[:, 0]
            vb = jnp.take_along_axis(v, j[:, None], 1)[:, 0]
            best_uv = jnp.where(better[:, None], jnp.stack([ub, vb], 1),
                                best_uv)
            best_t = jnp.minimum(best_t, tmin)

        miss = jnp.isinf(best_t)
        return best_t, jnp.where(miss, -1, best_tri), best_uv, count

    nt = o_all.shape[0] // ray_tile
    t_, tri_, uv_, cnt_ = jax.lax.map(
        tile, (o_all.reshape(nt, ray_tile, 3), d_all.reshape(nt, ray_tile, 3))
    )
    return Hits(
        t=t_.reshape(-1)[:r], tri=tri_.reshape(-1)[:r],
        uv=uv_.reshape(-1, 2)[:r], count=cnt_.reshape(-1)[:r],
    )


def grid_cast(
    grid: Grid3D,
    origins: Array,
    dirs: Array,
    ray_tile: int = 8192,
    count_all: bool = False,
    rays_per_dispatch: int = 1 << 21,
) -> Hits:
    """Cast arbitrary rays against a prebuilt grid. ``count_all=True``
    marches every ray to the grid boundary so ``count`` holds the exact
    crossing total (occupancy parity); otherwise rays retire at first
    confirmed-closest hit.

    Bundles larger than ``rays_per_dispatch`` are split into equal-shape
    dispatches (compile once): a single device execution stays bounded, which
    keeps remote-attached TPUs (per-RPC deadlines) and the host scheduler
    responsive."""
    # outer iterations each advance every alive ray ≥1 cell, and each inner
    # skip phase is separately bounded, so the cell path length bounds both
    max_steps = grid.nx + grid.ny + grid.nz + 4
    residual = grid.residual if grid.n_residual > 0 \
        else grid.residual[:0]

    def one(o, d):
        return _grid_cast3d(
            o, d, grid.lo, grid.cell, grid.nx, grid.ny, grid.nz,
            grid.tri_of_slot, grid.packed,
            residual, grid.skip,
            ray_tile=ray_tile, max_steps=max_steps, count_all=count_all,
            cell_rank=grid.cell_rank, cell_rows=grid.cell_rows,
            packed_cells=bool(grid.packed_cells),
        )

    r = origins.shape[0]
    if r <= rays_per_dispatch:
        return one(origins, dirs)
    chunks = []
    for s in range(0, r, rays_per_dispatch):
        e = min(s + rays_per_dispatch, r)
        o = origins[s:e]
        d = dirs[s:e]
        if e - s < rays_per_dispatch:  # pad so every dispatch shares a compile
            pad = rays_per_dispatch - (e - s)
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
        h = one(o, d)
        chunks.append(Hits(h.t[: e - s], h.tri[: e - s],
                           h.uv[: e - s], h.count[: e - s]))
    return Hits(
        t=jnp.concatenate([h.t for h in chunks]),
        tri=jnp.concatenate([h.tri for h in chunks]),
        uv=jnp.concatenate([h.uv for h in chunks]),
        count=jnp.concatenate([h.count for h in chunks]),
    )


# ---------------------------------------------------------------------------
# wavefront (cell-major) casting: the high-throughput unstructured path
# ---------------------------------------------------------------------------
#
# The DDA path above is exact but gather-bound: every traversal step gathers
# [rays, cap] triangle rows from HBM (measured 0.12 Mrays/s at 60k tris on
# v5e). The wavefront path splits the cast:
#   pass A  enumerate, per ray, the occupied cells it crosses (u8 skip-table
#           gathers + vector math only — no triangle data touched);
#   pass B  sort the (ray, cell) pairs by cell and test CELL-MAJOR blocks:
#           each block loads ONE cell's triangle rows (a [cap, 16] gather,
#           amortised over its whole ray block) and runs a dense
#           [block, cap] Möller–Trumbore — the same dense-block shape that
#           carries the structured sun/pinhole paths (ops/raygrid.py).
# Rays that visit more than `visits` occupied cells resume in the next
# round (host loop, one compile). Exactness matches grid_cast: closest hits
# are confirmed against the covered march interval before a ray retires,
# and crossing counts deduplicate by hit-point cell assignment.


@partial(jax.jit, static_argnames=(
    "cell", "nx", "ny", "nz", "ray_tile", "visits", "max_steps",
    "first_round", "it_budget", "unroll"))
def _enumerate_visits(
    origins: Array, dirs: Array, t_start: Array, alive_in: Array,
    c_start: Array,
    lo: Array, cell: float, nx: int, ny: int, nz: int, skip_tab: Array,
    ray_tile: int, visits: int, max_steps: int, first_round: bool = True,
    it_budget: int | None = None, unroll: int = 8,
) -> tuple[Array, Array, Array, Array, Array]:
    """March each ray from ``t_start`` and record up to ``visits`` occupied
    cell ids. Returns (visit_cids [R, V] i32 (-1 pad), t_covered [R] march
    parameter at the end of the recorded segment, more [R] bool — ray still
    inside the grid with cells left to visit, c_next [R, 3] resume cell,
    t_next [R] resume march parameter).

    On resume rounds (``first_round=False``) the walk continues from the
    carried ``c_start`` cell — reconstructing the cell from the fp position
    can land back in the previous cell and double-count its crossings.
    ``t_start`` must be the carried ``t_next`` (the walk's true position),
    NOT ``t_covered``: a budget-frozen ray sits in an empty cell AHEAD of
    its last recorded one, and resuming from the covered t would jump it
    backward into already-counted cells.

    ``it_budget`` caps the fused-advance count per call: the while loop's
    sequential depth is the wall at bundle scale, and the longest ray
    otherwise forces EVERY ray's round to its worst-case march
    (max_steps+visits iterations). Budget-frozen rays resume next round via
    the carried (c, t) state — per-ray semantics identical, oracle-tested.

    Layout: the walk runs STRUCTURE-OF-ARRAYS — per-axis [rt] vectors for
    positions/cells and a [visits, rt] visit table — so every carried
    buffer and every op in the loop body tiles the full (8, 128) vector
    registers. The AoS form carried [rt, 3] / [rt, visits] state whose
    minor dims pad to 128 lanes: ~43x the HBM traffic per iteration for
    the same math. ``unroll`` fused advances run per while iteration to
    amortize per-iteration sequencing overhead; the budget check lands on
    unroll boundaries (overshoot < unroll advances, semantics unchanged)."""
    r = origins.shape[0]
    rem = (-r) % ray_tile
    o_all = jnp.pad(origins.astype(jnp.float32), ((0, rem), (0, 0)))
    d_all = jnp.pad(dirs.astype(jnp.float32), ((0, rem), (0, 0)),
                    constant_values=1.0)
    t_all = jnp.pad(t_start.astype(jnp.float32), (0, rem))
    a_all = jnp.pad(alive_in, (0, rem))
    c_all = jnp.pad(c_start.astype(jnp.int32), ((0, rem), (0, 0)))
    dims3 = (nx, ny, nz)

    def tile(args):
        o, d, ts, a_in, c_in = args
        rt = o.shape[0]
        ovec = tuple(o[:, a] for a in range(3))
        dvec = tuple(d[:, a] for a in range(3))
        lov = tuple(lo[a] for a in range(3))
        hiv = tuple(lov[a] + dims3[a] * cell for a in range(3))

        inv = tuple(
            jnp.where(dvec[a] != 0,
                      1.0 / jnp.where(dvec[a] == 0, 1.0, dvec[a]), jnp.inf)
            for a in range(3))
        tmin_ax, tmax_ax = [], []
        for a in range(3):
            t0 = (lov[a] - ovec[a]) * inv[a]
            t1 = (hiv[a] - ovec[a]) * inv[a]
            inside0 = (ovec[a] >= lov[a]) & (ovec[a] <= hiv[a])
            tmin_ax.append(jnp.where(
                dvec[a] != 0, jnp.minimum(t0, t1),
                jnp.where(inside0, -jnp.inf, jnp.inf)))
            tmax_ax.append(jnp.where(
                dvec[a] != 0, jnp.maximum(t0, t1),
                jnp.where(inside0, jnp.inf, -jnp.inf)))
        t_enter = jnp.maximum(jnp.maximum(
            jnp.maximum(tmin_ax[0], tmin_ax[1]), tmin_ax[2]), 0.0)
        t_enter = jnp.maximum(t_enter, ts)
        t_exit_grid = jnp.minimum(
            jnp.minimum(tmax_ax[0], tmax_ax[1]), tmax_ax[2])
        alive0 = a_in & (t_enter <= t_exit_grid)

        if first_round:
            c0 = tuple(jnp.clip(
                jnp.floor(
                    (ovec[a] + (t_enter + 1e-6) * dvec[a] - lov[a]) / cell
                ).astype(jnp.int32), 0, dims3[a] - 1) for a in range(3))
        else:
            c0 = tuple(jnp.clip(c_in[:, a], 0, dims3[a] - 1)
                       for a in range(3))
        step = tuple(
            jnp.where(dvec[a] > 0, 1,
                      jnp.where(dvec[a] < 0, -1, 0)).astype(jnp.int32)
            for a in range(3))
        t_delta = tuple(
            jnp.where(dvec[a] != 0, cell * jnp.abs(inv[a]), jnp.inf)
            for a in range(3))
        min_td = jnp.minimum(jnp.minimum(t_delta[0], t_delta[1]), t_delta[2])

        def t_max_of(c, a):
            nb = lov[a] + jnp.where(
                dvec[a] >= 0, (c[a] + 1).astype(jnp.float32),
                c[a].astype(jnp.float32)) * cell
            return jnp.where(dvec[a] != 0, (nb - ovec[a]) * inv[a], jnp.inf)

        def cell_id(c):
            return (c[0] * ny + c[1]) * nz + c[2]

        def skip_of(c, alive):
            return jnp.where(
                alive, skip_tab[jnp.where(alive, cell_id(c), 0)], 0
            ).astype(jnp.int32)

        def dda_step(c, move):
            tm = tuple(t_max_of(c, a) for a in range(3))
            t_exit = jnp.minimum(jnp.minimum(tm[0], tm[1]), tm[2])
            # first-minimum tie-break, identical to argmin over (x, y, z)
            mvx = (tm[0] <= tm[1]) & (tm[0] <= tm[2])
            mvy = jnp.logical_not(mvx) & (tm[1] <= tm[2])
            mvz = jnp.logical_not(mvx) & jnp.logical_not(mvy)
            mv = (mvx, mvy, mvz)
            c_new = tuple(
                c[a] + jnp.where(mv[a], step[a], 0) for a in range(3))
            oob = ((c_new[0] < 0) | (c_new[0] >= nx)
                   | (c_new[1] < 0) | (c_new[1] >= ny)
                   | (c_new[2] < 0) | (c_new[2] >= nz))
            c_out = tuple(
                jnp.where(move, jnp.clip(c_new[a], 0, dims3[a] - 1), c[a])
                for a in range(3))
            return c_out, t_exit, jnp.logical_not(move & oob)

        state = dict(
            cx=c0[0], cy=c0[1], cz=c0[2], t_cur=t_enter, alive=alive0,
            nrec=jnp.zeros(rt, jnp.int32),
            vis=jnp.full((visits, rt), -1, jnp.int32),
            t_cov=jnp.where(alive0, t_enter, ts),
            it=jnp.int32(0),
        )

        it_cap = (max_steps + visits) if it_budget is None \
            else min(it_budget, max_steps + visits)

        def cond(s):
            return jnp.any(s["alive"] & (s["nrec"] < visits)) & (
                s["it"] < it_cap)

        def advance(s):
            # ONE fused advance (record-if-occupied + step or skip-jump) —
            # the former record-loop-around-skip-loop nesting ran ~3x the
            # sequential while iterations for the same walk (per-ray
            # semantics identical). Rays with a full visit quota FREEZE
            # (their c/t_cur is the next round's resume state).
            c = (s["cx"], s["cy"], s["cz"])
            act = s["alive"] & (s["nrec"] < visits)
            k = skip_of(c, act)
            occ = act & (k == 0)

            # record the occupied cell (slot nrec) for rays sitting in one
            cid = jnp.where(occ, cell_id(c), -1)
            slot = jax.lax.broadcasted_iota(jnp.int32, (visits, rt), 0)
            vis = jnp.where(
                occ[None, :] & (slot == s["nrec"][None, :]),
                cid[None, :], s["vis"])
            nrec = s["nrec"] + occ.astype(jnp.int32)

            # advance: verified-empty cells (k>=2) jump k-1 min-cell-widths;
            # occupied and frontier (k<=1) cells take one DDA step
            jump = act & (k >= 2)
            tau = (k - 1).astype(jnp.float32) * min_td
            t_jump = s["t_cur"] + tau
            c_jump = tuple(jnp.clip(
                jnp.floor(
                    (ovec[a] + t_jump * dvec[a] - lov[a]) / cell
                ).astype(jnp.int32), 0, dims3[a] - 1) for a in range(3))
            c_step, t_exit, ok_step = dda_step(c, act & ~jump)
            c_new = tuple(
                jnp.where(act, jnp.where(jump, c_jump[a], c_step[a]), c[a])
                for a in range(3))
            t_new = jnp.where(jump, t_jump,
                              jnp.where(act, t_exit, s["t_cur"]))
            # the recorded cell's exit closes the covered march interval
            t_cov = jnp.where(occ, t_exit, s["t_cov"])
            dead = (jump & (t_jump >= t_exit_grid)) | ~ok_step
            alive = s["alive"] & ~dead
            return dict(
                cx=c_new[0], cy=c_new[1], cz=c_new[2],
                t_cur=t_new, alive=alive,
                nrec=nrec, vis=vis, t_cov=t_cov, it=s["it"] + 1,
            )

        def body(s):
            for _ in range(unroll):
                s = advance(s)
            return s

        s = jax.lax.while_loop(cond, body, state)
        # rays that exited the grid are fully covered
        t_cov = jnp.where(s["alive"], s["t_cov"], jnp.inf)
        c_out = jnp.stack([s["cx"], s["cy"], s["cz"]], 1)
        return s["vis"].T, t_cov, s["alive"], c_out, s["t_cur"]

    nt = o_all.shape[0] // ray_tile
    # ALL tiles run in one vmapped while_loop group: sequential depth —
    # groups × iterations — is what matters, so tiles share iterations and
    # unrolled advances keep per-iteration overhead amortized
    vis_t, cov_t, more_t, c_t, tn_t = jax.lax.map(
        tile, (o_all.reshape(nt, ray_tile, 3), d_all.reshape(nt, ray_tile, 3),
               t_all.reshape(nt, ray_tile), a_all.reshape(nt, ray_tile),
               c_all.reshape(nt, ray_tile, 3)),
        batch_size=min(16, nt))
    return (vis_t.reshape(-1, visits)[:r], cov_t.reshape(-1)[:r],
            more_t.reshape(-1)[:r], c_t.reshape(-1, 3)[:r],
            tn_t.reshape(-1)[:r])


@partial(jax.jit, static_argnames=("block",))
def _sort_pairs(
    visit_cids: Array, block: int, alive: Array | None = None,
) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Sort (ray, visited-cell) pairs cell-major and assign dense blocks of
    ``block`` pairs that never span two cells. Returns (skeys, srays,
    blk_id, pos_in_blk, live_pair, n_blk) where ``n_blk`` is the
    EXACT number of live blocks — the MT dispatch is sized to it per round.
    (The former single-kernel design dispatched a worst-case block capacity
    every round: ~0.03 Mrays/s measured on the 1M-ray bench bundle, >20x
    dead work.)"""
    r, v = visit_cids.shape
    p = r * v
    big = jnp.int32(np.iinfo(np.int32).max)

    if alive is not None:  # dead-ray masking folded in (was an eager op)
        visit_cids = jnp.where(alive[:, None], visit_cids, -1)
    keys = jnp.where(visit_cids >= 0, visit_cids, big).reshape(-1)
    ray_of = jnp.repeat(jnp.arange(r, dtype=jnp.int32), v)
    order = jnp.argsort(keys)
    skeys = keys[order]
    srays = ray_of[order]
    idx = jnp.arange(p, dtype=jnp.int32)

    first = jnp.concatenate([jnp.array([True]), skeys[1:] != skeys[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, idx, -1))
    pos_in_seg = idx - seg_start
    first_blk = first | (pos_in_seg % block == 0)
    blk_id = jnp.cumsum(first_blk.astype(jnp.int32)) - 1  # [p]
    blk_start = jax.lax.cummax(jnp.where(first_blk, idx, -1))
    pos_in_blk = idx - blk_start

    live_pair = skeys < big
    n_blk = jnp.max(jnp.where(live_pair, blk_id, -1)) + 1
    return skeys, srays, blk_id, pos_in_blk, live_pair, n_blk


@partial(jax.jit, static_argnames=("block", "nb_cap", "batch",
                                   "packed_cells"))
def _mt_blocks(
    origins: Array, dirs: Array,
    skeys: Array, srays: Array, blk_id: Array, pos_in_blk: Array,
    live_pair: Array,
    tri_of_slot: Array, packed: Array,
    lo: Array, cell_size: Array, dims: Array,
    block: int, nb_cap: int, batch: int = 64,
    cell_rank: Array | None = None, cell_rows: Array | None = None,
    packed_cells: bool = False,
) -> tuple[Array, Array, Array, Array, Array]:
    """Möller–Trumbore over the live blocks from :func:`_sort_pairs`.
    Returns per-ray (t, tri, u, v, count) best-of-round. One [cap, 16]
    triangle fetch serves a dense [block, cap] MT batch per block."""
    r = origins.shape[0]
    blk_safe = jnp.where(live_pair, jnp.minimum(blk_id, nb_cap - 1), nb_cap)
    block_cell = jnp.full(nb_cap + 1, -1, jnp.int32).at[blk_safe].max(
        jnp.where(live_pair, skeys, -1), mode="drop")[:nb_cap]
    # flattened destination: a 2-component scatter stacks indices into
    # s32[p, 2] and the TPU layout pads 2 -> 128 (a 4 GB copy at 8M pairs)
    pair_ray = jnp.full(nb_cap * block + 1, -1, jnp.int32).at[
        jnp.minimum(blk_safe * block + pos_in_blk, nb_cap * block)
    ].set(jnp.where(live_pair, srays, -1), mode="drop")[
        :nb_cap * block].reshape(nb_cap, block)

    nbt = nb_cap // batch

    def tile(ti):
        # Möller–Trumbore unrolled per component on [batch, cap, block]
        # arrays: block (256 = 2 full lane groups) rides the 128-lane minor
        # axis and cap the sublane axis, so every VPU op runs dense. The
        # former [batch, block, cap, 3] form both wasted lanes (cap=72 pads
        # to 128) and reduced over a minor axis of 3.
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ti * batch, batch)
        cells = sl(block_cell)  # [batch]
        rays = sl(pair_ray)  # [batch, block]
        if packed_cells:
            rnk = jnp.where(cells >= 0, cell_rank[jnp.maximum(cells, 0)], -1)
            cap = cell_rows.shape[1] // 16
            rows = cell_rows[jnp.maximum(rnk, 0)].reshape(batch, cap, 16)
            ok_tri = (rnk >= 0)[:, None] & (rows[..., 9] > 0.5)
            slots = jnp.where(
                ok_tri,
                jax.lax.bitcast_convert_type(rows[..., 10], jnp.int32), -1)
        else:
            slots = tri_of_slot[jnp.maximum(cells, 0)]  # [batch, cap] gather
            rows = packed[jnp.maximum(slots, 0)]  # [batch, cap, 16]
            ok_tri = ((slots >= 0) & (cells >= 0)[:, None]
                      & (rows[..., 9] > 0.5))
        live_ray = rays >= 0
        rid = jnp.maximum(rays, 0)
        o = origins[rid]  # [batch, block, 3]
        d = dirs[rid]
        from pyqsm_tpu.ops.raytrace import mt_components

        ov = tuple(o[..., a][:, None, :] for a in range(3))  # [batch,1,block]
        dv = tuple(d[..., a][:, None, :] for a in range(3))
        tt, u, vv = mt_components(
            ov, dv,
            tuple(rows[..., a][:, :, None] for a in range(3)),  # [b,cap,1]
            tuple(rows[..., 3 + a][:, :, None] for a in range(3)),
            tuple(rows[..., 6 + a][:, :, None] for a in range(3)),
            ok_tri[:, :, None] & live_ray[:, None, :],
        )
        hit = jnp.isfinite(tt)
        # crossing dedupe: count a hit only in the cell owning its hit point
        hcid = jnp.zeros(tt.shape, jnp.int32)
        for a in range(3):
            hca = jnp.clip(
                jnp.floor((ov[a] + tt * dv[a] - lo[a]) / cell_size)
                .astype(jnp.int32), 0, dims[a] - 1)
            hcid = hcid * dims[a] + hca if a else hca
        in_cell = hit & (hcid == cells[:, None, None])
        cnt = jnp.sum(in_cell, 1).astype(jnp.int32)  # [batch, block]
        j = jnp.argmin(tt, 1)  # over cap → [batch, block]
        tmin = jnp.min(tt, 1)
        take = lambda a: jnp.take_along_axis(a, j[:, None, :], 1)[:, 0, :]
        tri_best = jnp.where(
            jnp.isfinite(tmin),
            take(jnp.broadcast_to(slots[:, :, None], tt.shape)), -1)
        return tmin, tri_best, take(u), take(vv), cnt

    t_b, tri_b, u_b, v_b, c_b = jax.lax.map(
        tile, jnp.arange(nbt), batch_size=min(16, nbt))

    # per-ray reduction DIRECTLY from the block layout: each block slot's
    # ray id is pair_ray, so two scatter-min passes + one scatter-add
    # replace the former pair-unsort (5x [p] gathers through `flat`, then
    # 5x more through `inv_order`, then a [r, v] argmin + 3 takes — ~0.35 s
    # of the 0.62 s call at round-0 bench stats). Pad slots carry ray -1 /
    # t inf and drop at index r; overflow pairs (blk_id >= nb_cap) never
    # received a slot, which is exactly the old masking.
    np_slots = nb_cap * block
    t_flat = t_b.reshape(-1)
    ray_flat = pair_ray.reshape(-1)
    wr = jnp.where(ray_flat >= 0, ray_flat, r)
    best_t = jnp.full(r + 1, jnp.inf).at[wr].min(t_flat, mode="drop")
    count = jnp.zeros(r + 1, jnp.int32).at[wr].add(
        c_b.reshape(-1), mode="drop")[:r]
    # winner slot per ray: min flat index among t-equal best pairs (t is
    # bit-identical across duplicates of the same triangle, so ties only
    # pick between equal hits; deterministic either way)
    is_best = jnp.isfinite(t_flat) & (
        t_flat <= best_t[jnp.minimum(wr, r)])
    pidx = jnp.arange(np_slots, dtype=jnp.int32)
    win = jnp.full(r + 1, jnp.int32(np.iinfo(np.int32).max)).at[
        jnp.where(is_best, wr, r)].min(pidx, mode="drop")[:r]
    best_t = best_t[:r]
    has = jnp.isfinite(best_t)
    safe_win = jnp.where(has, jnp.minimum(win, np_slots - 1), 0)
    best_tri = jnp.where(has, tri_b.reshape(-1)[safe_win], -1)
    best_u = jnp.where(has, u_b.reshape(-1)[safe_win], 0.0)
    best_v = jnp.where(has, v_b.reshape(-1)[safe_win], 0.0)
    return best_t, best_tri, best_u, best_v, count


@partial(jax.jit, static_argnames=("count_all",))
def _merge_round(
    best_t: Array, best_tri: Array, best_u: Array, best_v: Array,
    count: Array, ridx: Array, alive: Array, more: Array,
    t: Array, tri: Array, u: Array, v: Array, cnt: Array, t_cov: Array,
    count_all: bool,
) -> tuple[Array, Array, Array, Array, Array, Array]:
    """Fold one round's per-(compacted)-ray results into the full-bundle
    best arrays and compute the surviving frontier. ``ridx`` maps compacted
    rows to original ray ids; rows with ``alive`` false (incl. compaction
    padding, whose ridx duplicates row 0) are dropped from every write."""
    n = best_t.shape[0]
    bt = best_t[ridx]
    t_eff = jnp.where(alive, t, jnp.inf)
    better = t_eff < bt
    wr = jnp.where(alive, ridx, n)
    wr_b = jnp.where(better, wr, n)
    best_t = best_t.at[wr].min(t_eff, mode="drop")
    best_tri = best_tri.at[wr_b].set(tri, mode="drop")
    best_u = best_u.at[wr_b].set(u, mode="drop")
    best_v = best_v.at[wr_b].set(v, mode="drop")
    count = count.at[wr].add(jnp.where(alive, cnt, 0), mode="drop")
    bt_after = jnp.minimum(bt, t_eff)
    # retire: closest hit confirmed inside the covered interval (unless
    # counting all crossings), or grid exhausted
    if count_all:
        alive_new = alive & more
    else:
        alive_new = alive & more & jnp.logical_not(bt_after <= t_cov + 1e-6)
    return best_t, best_tri, best_u, best_v, count, alive_new


@partial(jax.jit, static_argnames=("cap",))
def _compact_frontier(alive, o_c, d_c, t_walk, c_resume, ridx, cap: int):
    """Front-pack the surviving frontier into a ``cap``-row buffer in ONE
    program. This was ~8 eager ops (nonzero + 6 gathers), each a separate
    tunnel dispatch — measured as a visible slice of every compacted
    round's wall on axon-attached chips."""
    from pyqsm_tpu.ops.sampling import nonzero_rows

    sel = nonzero_rows(alive, cap)
    safe = jnp.maximum(sel, 0)
    return (o_c[safe], d_c[safe], t_walk[safe], c_resume[safe],
            ridx[safe], sel >= 0)


@partial(jax.jit, static_argnames=("cap",))
def _gather_tail(alive, o_c, d_c, ridx, cap: int):
    """Gather the straggler rays for the tail-fallback ``grid_cast`` in one
    program (origin/dir rows + original ray ids + liveness)."""
    from pyqsm_tpu.ops.sampling import nonzero_rows

    sel = nonzero_rows(alive, cap)
    safe = jnp.maximum(sel, 0)
    return o_c[safe], d_c[safe], ridx[safe], sel >= 0


@jax.jit
def _scatter_tail(best_t, best_tri, best_u, best_v, count,
                  rows_live, live, hf_t, hf_tri, hf_uv, hf_count):
    """Scatter the tail-fallback results back to full-bundle rows in one
    program (REPLACE semantics — grid_cast walks from the origin, so its
    results are complete on their own). Returns the updated best arrays
    plus the ``handled`` mask the residual pass uses to exclude these
    rays."""
    r = best_t.shape[0]
    rows = jnp.where(live, rows_live, r)
    best_t = best_t.at[rows].set(jnp.where(live, hf_t, jnp.inf), mode="drop")
    best_tri = best_tri.at[rows].set(jnp.where(live, hf_tri, -1), mode="drop")
    best_u = best_u.at[rows].set(
        jnp.where(live, hf_uv[:, 0], 0.0), mode="drop")
    best_v = best_v.at[rows].set(
        jnp.where(live, hf_uv[:, 1], 0.0), mode="drop")
    count = count.at[rows].set(jnp.where(live, hf_count, 0), mode="drop")
    handled = jnp.zeros(r, bool).at[rows].set(live, mode="drop")
    return best_t, best_tri, best_u, best_v, count, handled


@partial(jax.jit, static_argnames=("has_handled",))
def _residual_merge(o, d, rows_r, res, best_t, best_tri, best_u, best_v,
                    count, handled, has_handled: bool):
    """Brute-test the overflow-spilled triangles against the WHOLE bundle
    and fold the closest hit + crossing counts into the best arrays — as
    ONE cached program. The former eager form re-traced its ``lax.map``
    body on every call and issued ~30 separate tunnel dispatches: 4.4 s
    measured at [6 tris, 1M rays] on v5e-over-axon vs 0.05 s jitted.

    TRANSPOSED [nr, rays]: rays ride the 128-lane minor axis (see the
    section comment in ``grid_cast_wavefront``)."""
    r = o.shape[0]
    nr = rows_r.shape[0]
    ok_r = (res >= 0) & (rows_r[:, 9] > 0.5)
    ctile = int(max(65536, min(r, (1 << 26) // max(nr, 1))))
    remc = (-r) % ctile
    o_p = jnp.pad(o, ((0, remc), (0, 0)))
    d_p = jnp.pad(d, ((0, remc), (0, 0)), constant_values=1.0)
    v0c = tuple(rows_r[:, a][:, None] for a in range(3))
    e1c = tuple(rows_r[:, 3 + a][:, None] for a in range(3))
    e2c = tuple(rows_r[:, 6 + a][:, None] for a in range(3))
    from pyqsm_tpu.ops.raytrace import mt_components

    def rchunk(args):
        oc, dc = args  # [ctile, 3]
        tt, uu, vv = mt_components(
            tuple(oc[:, a][None, :] for a in range(3)),  # [1, ctile]
            tuple(dc[:, a][None, :] for a in range(3)),
            v0c, e1c, e2c, ok_r[:, None])
        cnt = jnp.sum(jnp.isfinite(tt), 0).astype(jnp.int32)
        jj = jnp.argmin(tt, 0)
        tmin = jnp.min(tt, 0)
        tri = jnp.where(jnp.isfinite(tmin), res[jj], -1)
        ub = jnp.take_along_axis(uu, jj[None, :], 0)[0]
        vb = jnp.take_along_axis(vv, jj[None, :], 0)[0]
        return tmin, tri, ub, vb, cnt

    nc = o_p.shape[0] // ctile
    tm, trm, um, vm, cm = jax.lax.map(
        rchunk, (o_p.reshape(nc, ctile, 3), d_p.reshape(nc, ctile, 3)),
        batch_size=min(8, nc))
    tm = tm.reshape(-1)[:r]
    trm = trm.reshape(-1)[:r]
    um = um.reshape(-1)[:r]
    vm = vm.reshape(-1)[:r]
    cm = cm.reshape(-1)[:r]
    if has_handled:  # fallback rays: residual already applied by grid_cast
        tm = jnp.where(handled, jnp.inf, tm)
        cm = jnp.where(handled, 0, cm)
    better = tm < best_t
    best_tri = jnp.where(better, trm, best_tri)
    best_u = jnp.where(better, um, best_u)
    best_v = jnp.where(better, vm, best_v)
    best_t = jnp.minimum(best_t, tm)
    return best_t, best_tri, best_u, best_v, count + cm


@jax.jit
def _scatter_sub_hits(a, bs_t, bs_tri, bs_uv, bs_count, safe, live,
                      sub_tri_ids):
    """Merge a culled sub-grid cast back into the primary hits in one
    program: scatter the compacted sub results to full-bundle rows, remap
    compact triangle ids to global, closest-hit merge (``merge_hits``
    semantics). Was ~15 eager scatter/where dispatches."""
    from pyqsm_tpu.ops.raytrace import Hits

    r = a.t.shape[0]
    row = jnp.where(live, safe, r)
    t_b = jnp.full(r + 1, jnp.inf).at[row].set(
        jnp.where(live, bs_t, jnp.inf), mode="drop")[:r]
    tri_b = jnp.full(r + 1, -1, jnp.int32).at[row].set(
        jnp.where(live, bs_tri, -1), mode="drop")[:r]
    uv_b = jnp.zeros((r + 1, 2)).at[row].set(
        jnp.where(live[:, None], bs_uv, 0.0), mode="drop")[:r]
    cnt_b = jnp.zeros(r + 1, jnp.int32).at[row].set(
        jnp.where(live, bs_count, 0), mode="drop")[:r]
    b = Hits(t=t_b,
             tri=jnp.where(tri_b >= 0,
                           sub_tri_ids[jnp.maximum(tri_b, 0)], tri_b),
             uv=uv_b, count=cnt_b)
    b_wins = b.t < a.t
    return Hits(
        t=jnp.minimum(a.t, b.t),
        tri=jnp.where(b_wins, b.tri, a.tri),
        uv=jnp.where(b_wins[:, None], b.uv, a.uv),
        count=a.count + b.count,
    )


def grid_cast_wavefront(
    grid: Grid3D,
    origins: Array,
    dirs: Array,
    visits: int = 4,
    block: int = 256,
    count_all: bool = False,
    ray_tile: int = 65536,
    max_rounds: int | None = None,
    it_budget: int = 32,
    tail_fallback: int = 2048,
    debug: bool = False,
) -> Hits:
    """High-throughput exact casting for ARBITRARY ray bundles (the
    unstructured path of Embree's ``cast_rays``/``list_intersections``, ref
    ``viz/ray_casting.py:151-192,262-313``): enumerate visited occupied
    cells, then test cell-major dense blocks (docstring at the section
    header). Semantics identical to ``grid_cast``; oracle-tested against it.

    ``visits``: occupied cells covered per round; rays needing more resume
    in later rounds (compacted rounds escalate to 8x this so the tail
    finishes in 1-2 rounds instead of paying two host syncs per tiny
    round). ``it_budget``: fused-advance cap per round — the walk's
    sequential depth is launch-overhead bound, so the longest ray must not
    set every ray's iteration count; budget-frozen rays resume exactly via
    carried (cell, t) state. Per round the MT dispatch is sized to the
    EXACT live block count, and the surviving frontier is compacted once
    it shrinks (4x size buckets bound the compile count). Once the live
    frontier drops to ``tail_fallback`` rays (after round 0), the
    stragglers finish in one compacted :func:`grid_cast` dispatch instead
    of paying several sync-bound mini-rounds (0 disables — used by the
    resume-path oracle tests). ``debug`` prints per-round frontier/block/
    phase timing stats.

    Host-sync contract: this is a HOST-STEPPED loop — every round performs
    two blocking device→host syncs (live block count, live frontier count)
    that size the next dispatch and drive early exit/compaction. Do not
    call it inside a larger traced computation (it cannot be jitted as a
    whole), and don't expect overlap across concurrently-issued bundles;
    for fully-traced composition use ``grid_cast`` (one program, no syncs).
    """
    import time as _time

    def _tick(x) -> float:
        """Debug-only phase boundary: a 4-byte device reduction (honest on
        tunnel-attached TPUs where ``block_until_ready`` returns early)."""
        if debug:
            float(jnp.sum(jnp.ravel(x)[:1]))  # forced 4-byte host transfer
        return _time.perf_counter()

    r = origins.shape[0]
    o = jnp.asarray(origins, jnp.float32)
    d = jnp.asarray(dirs, jnp.float32)
    dims = jnp.array([grid.nx, grid.ny, grid.nz], jnp.int32)
    max_steps = grid.nx + grid.ny + grid.nz + 4
    if max_rounds is None:
        # worst-case rounds under BOTH limits: each round advances a live
        # ray by >= it_budget cells of travel (a jump covers >= 1 cell) or
        # retires it; the visits quota binds only when every advance lands
        # in an occupied cell
        max_rounds = -(-max_steps // visits) + -(-max_steps // it_budget) + 2

    best_t = jnp.full(r, jnp.inf)
    best_tri = jnp.full(r, -1, jnp.int32)
    best_u = jnp.zeros(r)
    best_v = jnp.zeros(r)
    count = jnp.zeros(r, jnp.int32)
    handled = None  # rays finished by the DDA tail fallback (incl. residual)

    # compacted working set: starts as the full bundle; once the live
    # frontier drops below a quarter of the buffer the survivors are
    # front-packed into a 4x-bucketed buffer (pow4 keeps the compile count
    # bounded) — later rounds then pay for the rays that remain, not the
    # bundle (most rays retire on their first occupied cell)
    o_c, d_c = o, d
    ridx = jnp.arange(r, dtype=jnp.int32)
    t_walk = jnp.zeros(r, jnp.float32)
    alive = jnp.ones(r, bool)
    c_resume = jnp.zeros((r, 3), jnp.int32)
    rc = r

    for rnd in range(max_rounds):
        t_rnd = _time.perf_counter() if debug else 0.0
        # resume rounds escalate: survivors are the deep-traversal minority,
        # and every extra round costs two host syncs over the tunnel — the
        # compacted tail gets a quota/budget big enough to finish in ~1
        # round. Round 0 always runs the caller's schedule (most rays
        # retire on their first visits; a big round-0 quota just multiplies
        # the sort/MT pair count by dead slots).
        if rnd == 0 or rc > 131072:
            v_rnd, b_rnd = visits, it_budget
        elif rc > 32768:
            # a shallow middle tier (2x) left 7340 of 131072 alive and the
            # follow-up round cost 0.46 s of near-all-cell MT blocks — one
            # deeper round retires the mid tail outright
            v_rnd, b_rnd = 4 * visits, 4 * it_budget
        else:
            v_rnd = 8 * visits
            b_rnd = max_steps + v_rnd
        vis, t_cov, more, c_resume, t_walk = _enumerate_visits(
            o_c, d_c, t_walk, alive, c_resume,
            grid.lo, grid.cell, grid.nx, grid.ny, grid.nz, grid.skip,
            ray_tile=min(ray_tile, max(256, 1 << (rc - 1).bit_length())),
            visits=v_rnd, max_steps=max_steps, first_round=(rnd == 0),
            it_budget=b_rnd)
        t_enum = _tick(t_walk)
        skeys, srays, blk_id, pos_in_blk, live_pair, n_blk_d = \
            _sort_pairs(vis, block, alive)
        n_blk = int(n_blk_d)  # host sync: exact live block count this round
        t_sort = _time.perf_counter()
        if n_blk > 0:
            # pow2 buckets up to 4096, then 4096-steps: the dominant rounds
            # land at 10-20k live blocks where a pow2 bucket overshoots up
            # to 2x (16384-cap dispatch for 10770 live blocks on the bench
            # bundle); step buckets bound the overshoot at 4096 dead blocks
            # while keeping the variant count bench-bounded (~8 seen)
            if n_blk <= 4096:
                nb_cap = 256
                while nb_cap < n_blk:
                    nb_cap *= 2
            else:
                nb_cap = -4096 * (-n_blk // 4096)
            t, tri, u, v, cnt = _mt_blocks(
                o_c, d_c, skeys, srays, blk_id, pos_in_blk, live_pair,
                grid.tri_of_slot, grid.packed,
                grid.lo, jnp.float32(grid.cell), dims,
                block=block, nb_cap=nb_cap,
                cell_rank=grid.cell_rank, cell_rows=grid.cell_rows,
                packed_cells=bool(grid.packed_cells))
        else:
            t = jnp.full(rc, jnp.inf)
            tri = jnp.full(rc, -1, jnp.int32)
            u = v = jnp.zeros(rc)
            cnt = jnp.zeros(rc, jnp.int32)
        t_mt = _tick(t)
        best_t, best_tri, best_u, best_v, count, alive = _merge_round(
            best_t, best_tri, best_u, best_v, count, ridx, alive, more,
            t, tri, u, v, cnt, t_cov, count_all=count_all)
        n_alive = int(jnp.sum(alive))  # host sync: frontier size
        if debug:
            print(f"# wavefront rnd={rnd} rc={rc} blocks={n_blk} "
                  f"alive={n_alive} dt={_time.perf_counter() - t_rnd:.3f}s "
                  f"(enum={t_enum - t_rnd:.3f} sort={t_sort - t_enum:.3f} "
                  f"mt={t_mt - t_sort:.3f} "
                  f"merge={_time.perf_counter() - t_mt:.3f})",
                  flush=True)
        if n_alive == 0:
            break
        if rnd >= 1 and n_alive <= tail_fallback:
            # Finish the deep-traversal stragglers with ONE traced DDA
            # dispatch: at this frontier size each remaining wavefront
            # round is pure sync/launch overhead (~60-80 ms, and several
            # rounds remain), while the compacted DDA walk is a single
            # ~20 ms program — and grid_cast IS the wavefront's oracle.
            # Its results REPLACE the survivors' partial state (it walks
            # from the origin, so t/tri/uv/count are complete on their
            # own), and ``handled`` excludes them from the shared residual
            # pass below (grid_cast brute-tests the spill rows itself).
            t_fb = _time.perf_counter()
            o_t, d_t, rows_live, live = _gather_tail(
                alive, o_c, d_c, ridx, tail_fallback)
            hf = grid_cast(grid, o_t, d_t,
                           ray_tile=tail_fallback, count_all=count_all)
            best_t, best_tri, best_u, best_v, count, handled = \
                _scatter_tail(best_t, best_tri, best_u, best_v, count,
                              rows_live, live, hf.t, hf.tri, hf.uv,
                              hf.count)
            if debug:
                print(f"# wavefront tail-fallback n={n_alive} "
                      f"dt={_tick(best_t) - t_fb:.3f}s", flush=True)
            break
        if n_alive <= rc // 4 and rc > 2048:
            rc_new = 2048
            while rc_new < n_alive:
                rc_new *= 4
            o_c, d_c, t_walk, c_resume, ridx, alive = _compact_frontier(
                alive, o_c, d_c, t_walk, c_resume, ridx, rc_new)
            rc = rc_new

    # residual pass (overflow-spilled triangles) — identical to grid_cast.
    # One jitted program (_residual_merge): the eager form re-traced its
    # lax.map body every call — 4.4 s vs 0.05 s at [6, 1M] on v5e-over-axon.
    if grid.n_residual > 0:
        t_res = _time.perf_counter()
        res = grid.residual
        rows_r = grid.packed[jnp.maximum(res, 0)]  # [nr, 16]
        best_t, best_tri, best_u, best_v, count = _residual_merge(
            o, d, rows_r, res, best_t, best_tri, best_u, best_v, count,
            handled if handled is not None else jnp.zeros(r, bool),
            handled is not None)
        if debug:
            print(f"# wavefront residual n={grid.n_residual} "
                  f"dt={_tick(best_t) - t_res:.3f}s", flush=True)

    return Hits(t=best_t, tri=best_tri,
                uv=jnp.stack([best_u, best_v], 1), count=count)


def grid_occupancy(grid: Grid3D, points: Array, ray_tile: int = 4096) -> Array:
    """Inside/outside by +z crossing parity via the grid (accelerated
    ``ops.raytrace.occupancy``)."""
    dirs = jnp.broadcast_to(
        jnp.array([1.73205e-4, 2.23607e-4, 1.0], jnp.float32), points.shape
    )
    hits = grid_cast(grid, points, dirs, ray_tile=ray_tile, count_all=True)
    return (hits.count % 2) == 1
