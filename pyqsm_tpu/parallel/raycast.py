"""Multi-device ray casting.

Ray bundles are embarrassingly parallel: shard the ray axis across the
mesh (scene triangles replicated — canopy meshes are small next to HBM),
each device runs the local closest-hit kernel, no collectives needed until
the area reductions (psum). This is how the ≥100 Mrays/s target scales
across a pod slice."""

from __future__ import annotations

import jax
import numpy as np

from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyqsm_tpu.ops.raytrace import Hits, _cast_rays_xla

Array = jax.Array


def sharded_cast_rays(
    mesh: Mesh,
    origins: Array,
    dirs: Array,
    vertices: Array,
    triangles: Array,
    axis: str = "points",
) -> Hits:
    """Cast with the ray axis sharded over ``axis``. Ray count must divide
    the axis size; use ``pad_rays`` helpers upstream if needed."""

    def local(o, d, v, t):
        return _cast_rays_xla(o, d, v, t)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=Hits(t=P(axis), tri=P(axis), uv=P(axis), count=P(axis)),
        check_vma=False,
    )
    o = jax.device_put(origins, NamedSharding(mesh, P(axis)))
    d = jax.device_put(dirs, NamedSharding(mesh, P(axis)))
    return jax.jit(fn)(o, d, vertices, triangles)


def sharded_grid_cast(
    mesh: Mesh,
    grid,
    origins: Array,
    dirs: Array,
    axis: str = "points",
    ray_tile: int = 4096,
    count_all: bool = False,
) -> Hits:
    """Accelerated (uniform-grid DDA) casting with the ray axis sharded over
    ``axis`` and the grid replicated — the multi-chip path of
    ``ops.grid3d.grid_cast``. Per-device work is an independent traversal;
    no collectives. Ray count must divide the axis size."""
    from pyqsm_tpu.ops.grid3d import _grid_cast3d

    max_steps = grid.nx + grid.ny + grid.nz + 4
    residual = grid.residual if grid.n_residual > 0 else grid.residual[:0]

    def local(o, d, table, packed, res, skip, rank, rows):
        return _grid_cast3d(
            o, d, grid.lo, grid.cell, grid.nx, grid.ny, grid.nz,
            table, packed, res, skip,
            ray_tile=ray_tile, max_steps=max_steps, count_all=count_all,
            cell_rank=rank, cell_rows=rows,
            packed_cells=bool(grid.packed_cells),
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=Hits(t=P(axis), tri=P(axis), uv=P(axis), count=P(axis)),
        check_vma=False,
    )
    o = jax.device_put(origins, NamedSharding(mesh, P(axis)))
    d = jax.device_put(dirs, NamedSharding(mesh, P(axis)))
    return jax.jit(fn)(o, d, grid.tri_of_slot, grid.packed, residual,
                       grid.skip, grid.cell_rank, grid.cell_rows)


def sharded_cell_cast(
    mesh: Mesh,
    grid,
    direction,
    rays_per_cell_side: int = 4,
    cell_tile: int = 256,
    back_dist: float = 1e3,
    axis: str = "points",
):
    """Cell-aligned parallel-bundle casting with the CELL axis sharded over
    ``axis`` — the multi-chip sun/rain flux path of
    ``ops.raygrid.cell_cast_parallel``. Each device owns a contiguous strip
    of grid cells (triangle table sharded with them; triangle data
    replicated); the per-cell ray blocks never cross devices."""
    import jax.numpy as jnp

    from pyqsm_tpu.ops.raygrid import CellCastResult, _cell_cast_rows

    ncells = grid.nx * grid.ny
    n_dev = int(np.prod(mesh.devices.shape)) if hasattr(mesh, "devices") \
        else mesh.size
    # pad the cell axis so it shards evenly
    per = -(-ncells // (n_dev * cell_tile)) * cell_tile
    pad = per * n_dev - ncells
    table = jnp.pad(grid.tri_of_slot, ((0, pad), (0, 0)), constant_values=-1)
    cell_ids = jnp.arange(ncells + pad, dtype=jnp.int32)
    packed_cells = bool(grid.packed_cells)
    rows = jnp.pad(grid.cell_rows, ((0, pad), (0, 0))) if packed_cells \
        else jnp.zeros((table.shape[0], 16), jnp.float32)

    def local(tab, cids, rws):
        t, tri, cnt = _cell_cast_rows(
            jnp.asarray(direction, jnp.float32), grid.u, grid.v,
            grid.origin_uv, grid.cell, grid.nx, grid.ny,
            tab, cids, grid.v0, grid.e1, grid.e2, grid.valid,
            rays_per_cell_side, cell_tile, back_dist,
            rows_strip=rws, packed_cells=packed_cells,
        )
        return t, tri, cnt

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    tbl = jax.device_put(table, NamedSharding(mesh, P(axis)))
    cid = jax.device_put(cell_ids, NamedSharding(mesh, P(axis)))
    rws = jax.device_put(rows, NamedSharding(mesh, P(axis)))
    t, tri, cnt = jax.jit(fn)(tbl, cid, rws)
    ray_area = (grid.cell / rays_per_cell_side) ** 2
    return CellCastResult(t=t[:ncells], tri=tri[:ncells],
                          count=cnt[:ncells], ray_area=ray_area)


import functools


@functools.lru_cache(maxsize=64)
def _sharded_image_fn(mesh, axis, caps, n_ids, half, aspect,
                      width, height, tile_px, n_res):
    """Build-and-cache the fully-fused sharded pinhole program for one
    (mesh, camera-shape, bucket-shape) key. The r4 implementation re-built
    ``jax.jit(shard_map(...))`` per bucket per CALL and merged buckets with
    EAGER scatters — ~30 host↔device round trips per frame, a measured 21x
    overhead vs the single-device ``image_cast`` (one dispatch). This is
    the same one-dispatch design as ``raygrid._image_cast_fused`` with each
    bucket's tile list sharded over ``axis``; the scatter-merge and image
    assembly live INSIDE the jit and XLA propagates shardings through."""
    import jax.numpy as jnp

    from pyqsm_tpu.ops.raygrid import _image_cast_tiles

    ntx = -(-width // tile_px)
    nty = -(-height // tile_px)
    tp = tile_px
    rpc = tp * tp
    ntiles = ntx * nty
    n_dev = int(np.prod(mesh.devices.shape))

    def run(ids_list, rows_list, eye, right, true_up, fwd,
            tri_of_slot, v0, e1, e2, valid, res_slots):
        t_all = jnp.full((ntiles + 1, rpc), jnp.inf, jnp.float32)
        tri_all = jnp.full((ntiles + 1, rpc), -1, jnp.int32)
        u_all = jnp.zeros((ntiles + 1, rpc), jnp.float32)
        v_all = jnp.zeros((ntiles + 1, rpc), jnp.float32)
        cnt_all = jnp.zeros((ntiles + 1, rpc), jnp.int32)
        for cap, ids_p, rows_p in zip(caps, ids_list, rows_list):
            def local(ids_l, rows_l, tab, v0_, e1_, e2_, valid_,
                      eye_, right_, up_, fwd_):
                # one block per shard: the local tile list is bounded
                return _image_cast_tiles(
                    ids_l, eye_, right_, up_, fwd_,
                    half, aspect, width, height, tp,
                    tab, v0_, e1_, e2_, valid_,
                    tiles_per_block=max(ids_l.shape[0], 1),
                    rows_aligned=rows_l, packed_cells=True,
                )

            t_, tri_, u_, v_, cnt_ = shard_map(
                local, mesh=mesh,
                in_specs=(P(axis), P(axis), P(), P(), P(), P(), P(),
                          P(), P(), P(), P()),
                out_specs=(P(axis),) * 5,
                check_vma=False,
            )(ids_p, rows_p, tri_of_slot[:, :cap], v0, e1, e2, valid,
              eye, right, true_up, fwd)
            row = jnp.where(ids_p >= 0, ids_p, ntiles)
            t_all = t_all.at[row].set(t_, mode="drop")
            tri_all = tri_all.at[row].set(tri_, mode="drop")
            u_all = u_all.at[row].set(u_, mode="drop")
            v_all = v_all.at[row].set(v_, mode="drop")
            cnt_all = cnt_all.at[row].set(cnt_, mode="drop")

        def to_image(flat):
            img = flat[:ntiles].reshape(ntx, nty, tp, tp)
            img = jnp.transpose(img, (1, 2, 0, 3))
            img = img.reshape(nty * tp, ntx * tp)
            return img[:height, :width].reshape(-1)

        t = to_image(t_all)
        tri = to_image(tri_all)
        u_i = to_image(u_all)
        v_i = to_image(v_all)
        cnt = to_image(cnt_all)

        if n_res:
            # eye-straddling residual triangles (r4 raised here): the same
            # brute MT merge as image_cast, pixel axis sharded over the mesh
            from pyqsm_tpu.ops.raytrace import _cast_rays_xla, pinhole_rays

            fov = float(np.degrees(2 * np.arctan(half)))
            origins, dirs = pinhole_rays(eye, eye + fwd, true_up,
                                         fov, width, height)
            verts_r = jnp.concatenate(
                [v0[res_slots][:, None, :],
                 (v0 + e1)[res_slots][:, None, :],
                 (v0 + e2)[res_slots][:, None, :]], 1).reshape(-1, 3)
            tris_flat = jnp.arange(verts_r.shape[0],
                                   dtype=jnp.int32).reshape(-1, 3)
            npx = width * height
            pad_px = (-npx) % n_dev
            o_p = jnp.pad(origins, ((0, pad_px), (0, 0)))
            d_p = jnp.pad(dirs, ((0, pad_px), (0, 0)), constant_values=1.0)
            hr = shard_map(
                lambda o, d, v_, tr: _cast_rays_xla(o, d, v_, tr),
                mesh=mesh,
                in_specs=(P(axis), P(axis), P(), P()),
                out_specs=Hits(t=P(axis), tri=P(axis), uv=P(axis),
                               count=P(axis)),
                check_vma=False,
            )(o_p, d_p, verts_r, tris_flat)
            ht = hr.t[:npx]
            better = ht < t
            t = jnp.minimum(t, ht)
            tri = jnp.where(better, res_slots[
                jnp.clip(hr.tri[:npx], 0, n_res - 1)], tri)
            u_i = jnp.where(better, hr.uv[:npx, 0], u_i)
            v_i = jnp.where(better, hr.uv[:npx, 1], v_i)
            cnt = cnt + hr.count[:npx]
        return t, tri, u_i, v_i, cnt

    return jax.jit(run)


def sharded_image_cast(mesh: Mesh, grid, axis: str = "points") -> Hits:
    """Screen-space pinhole casting with each occupancy bucket's tile list
    sharded over ``axis`` (scene + table replicated; a pinhole image is
    embarrassingly parallel over pixel tiles). One fused dispatch per frame
    (program cached per mesh/camera shape); eye-straddling residual
    triangles are merged with the same brute pass as the single-device
    ``ops.raygrid.image_cast`` (asserted equal to it, residuals included)."""
    import jax.numpy as jnp

    n_dev = int(np.prod(mesh.devices.shape))
    rid = np.asarray(grid.residual)
    rid = rid[rid >= 0]
    ids_list, rows_list = [], []
    for cap, ids, rows in grid.buckets:
        pad = (-ids.shape[0]) % n_dev
        ids_list.append(jax.device_put(
            jnp.pad(ids, (0, pad), constant_values=-1),
            NamedSharding(mesh, P(axis))))
        rows_list.append(jax.device_put(
            jnp.pad(rows, ((0, pad), (0, 0))),
            NamedSharding(mesh, P(axis))))
    caps = tuple(int(c) for c, _, _ in grid.buckets)
    fn = _sharded_image_fn(
        mesh, axis, caps, tuple(a.shape[0] for a in ids_list),
        float(grid.half), float(grid.aspect), int(grid.width),
        int(grid.height), int(grid.tile_px), int(len(rid)))
    res_slots = jnp.asarray(rid.astype(np.int32)) if len(rid) else \
        jnp.zeros(0, jnp.int32)
    t, tri, u_i, v_i, cnt = fn(
        tuple(ids_list), tuple(rows_list), grid.eye, grid.right,
        grid.true_up, grid.fwd, grid.tri_of_slot, grid.v0, grid.e1,
        grid.e2, grid.valid, res_slots)
    return Hits(t=t, tri=tri, uv=jnp.stack([u_i, v_i], 1), count=cnt)
