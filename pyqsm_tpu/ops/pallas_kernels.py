"""Hand-written Pallas TPU kernels for the hot paths.

``mt_raycast`` — fused Möller–Trumbore closest-hit: triangle data stays
resident in VMEM in SoA layout ([3, T] component rows, 128-aligned), each
ray tile streams through triangle chunks with a running closest-hit
reduction — the [R, T] intersection matrix is never materialised in HBM
(the XLA scan path's main memory cost). Grid = ray tiles.

Falls back to interpret mode off-TPU so tests validate the same code path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_EPS = 1e-9


def _mt_kernel(tri_chunks: int, tc: int):
    """Kernel factory: closed over static chunk geometry."""

    def kernel(o_ref, d_ref, v0_ref, e1_ref, e2_ref, valid_ref,
               t_ref, tri_ref, u_ref, v_ref, cnt_ref):
        # o_ref/d_ref: [3, RT]; triangle SoA refs: [3, T_pad]; valid: [1, T_pad]
        rt = o_ref.shape[1]
        ox, oy, oz = o_ref[0, :], o_ref[1, :], o_ref[2, :]
        dx, dy, dz = d_ref[0, :], d_ref[1, :], d_ref[2, :]

        def chunk(ci, carry):
            best_t, best_tri, best_u, best_v, cnt = carry
            sl = pl.ds(ci * tc, tc)
            v0x, v0y, v0z = v0_ref[0, sl], v0_ref[1, sl], v0_ref[2, sl]
            e1x, e1y, e1z = e1_ref[0, sl], e1_ref[1, sl], e1_ref[2, sl]
            e2x, e2y, e2z = e2_ref[0, sl], e2_ref[1, sl], e2_ref[2, sl]
            ok_tri = valid_ref[0, sl] > 0

            # pvec = d × e2  -> [RT, TC]
            px = dy[:, None] * e2z[None, :] - dz[:, None] * e2y[None, :]
            py = dz[:, None] * e2x[None, :] - dx[:, None] * e2z[None, :]
            pz = dx[:, None] * e2y[None, :] - dy[:, None] * e2x[None, :]
            det = e1x[None, :] * px + e1y[None, :] * py + e1z[None, :] * pz
            inv = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
            tx = ox[:, None] - v0x[None, :]
            ty = oy[:, None] - v0y[None, :]
            tz = oz[:, None] - v0z[None, :]
            u = (tx * px + ty * py + tz * pz) * inv
            # qvec = tvec × e1
            qx = ty * e1z[None, :] - tz * e1y[None, :]
            qy = tz * e1x[None, :] - tx * e1z[None, :]
            qz = tx * e1y[None, :] - ty * e1x[None, :]
            v = (dx[:, None] * qx + dy[:, None] * qy + dz[:, None] * qz) * inv
            t = (e2x[None, :] * qx + e2y[None, :] * qy + e2z[None, :] * qz) * inv
            hit = (
                (jnp.abs(det) > _EPS)
                & (u >= -_EPS) & (v >= -_EPS) & (u + v <= 1.0 + _EPS)
                & (t > 1e-6) & ok_tri[None, :]
            )
            t = jnp.where(hit, t, jnp.inf)
            cnt = cnt + jnp.sum(hit.astype(jnp.int32), axis=1)

            jmin = jnp.argmin(t, axis=1)
            tmin = jnp.min(t, axis=1)
            better = tmin < best_t
            tri_ids = ci * tc + jmin
            onehot_cols = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
            pick = onehot_cols == jmin[:, None]
            u_at = jnp.sum(jnp.where(pick, u, 0.0), axis=1)
            v_at = jnp.sum(jnp.where(pick, v, 0.0), axis=1)
            best_tri = jnp.where(better, tri_ids.astype(jnp.int32), best_tri)
            best_u = jnp.where(better, u_at, best_u)
            best_v = jnp.where(better, v_at, best_v)
            best_t = jnp.minimum(best_t, tmin)
            return best_t, best_tri, best_u, best_v, cnt

        init = (
            jnp.full((rt,), jnp.inf, jnp.float32),
            jnp.full((rt,), -1, jnp.int32),
            jnp.zeros((rt,), jnp.float32),
            jnp.zeros((rt,), jnp.float32),
            jnp.zeros((rt,), jnp.int32),
        )
        best_t, best_tri, best_u, best_v, cnt = jax.lax.fori_loop(
            0, tri_chunks, chunk, init
        )
        t_ref[0, :] = best_t
        tri_ref[0, :] = best_tri
        u_ref[0, :] = best_u
        v_ref[0, :] = best_v
        cnt_ref[0, :] = cnt

    return kernel


def _pad_to(x: Array, m: int, fill) -> Array:
    rem = (-x.shape[0]) % m
    if rem:
        x = jnp.pad(x, [(0, rem)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)
    return x


@partial(jax.jit, static_argnames=("ray_tile", "tri_chunk", "interpret"))
def mt_raycast(
    origins: Array,  # [R, 3]
    dirs: Array,  # [R, 3]
    vertices: Array,
    triangles: Array,  # [T, 3] i32, -1 padded
    ray_tile: int = 512,
    tri_chunk: int = 512,
    interpret: bool = False,
):
    """Pallas fused closest-hit + any-hit-count. Returns (t, tri, uv, count)
    with the same semantics as ``ops.raytrace.cast_rays``."""
    r = origins.shape[0]
    tri_valid = triangles[:, 0] >= 0
    tri = jnp.maximum(triangles, 0)
    v0 = vertices[tri[:, 0]]
    e1 = vertices[tri[:, 1]] - v0
    e2 = vertices[tri[:, 2]] - v0

    v0p = _pad_to(v0, tri_chunk, 0.0).T.astype(jnp.float32)  # [3, T_pad]
    e1p = _pad_to(e1, tri_chunk, 0.0).T.astype(jnp.float32)
    e2p = _pad_to(e2, tri_chunk, 0.0).T.astype(jnp.float32)
    validp = _pad_to(tri_valid.astype(jnp.float32), tri_chunk, 0.0)[None, :]
    t_pad = v0p.shape[1]
    chunks = t_pad // tri_chunk

    o = _pad_to(origins, ray_tile, 0.0).astype(jnp.float32)
    d = _pad_to(dirs, ray_tile, 0.0).astype(jnp.float32)
    n_tiles = o.shape[0] // ray_tile
    o_soa = o.T  # [3, R_pad]
    d_soa = d.T

    kernel = _mt_kernel(chunks, tri_chunk)
    grid = (n_tiles,)
    out_shape = [
        jax.ShapeDtypeStruct((1, o.shape[0]), jnp.float32),  # t
        jax.ShapeDtypeStruct((1, o.shape[0]), jnp.int32),  # tri (padded ids)
        jax.ShapeDtypeStruct((1, o.shape[0]), jnp.float32),  # u
        jax.ShapeDtypeStruct((1, o.shape[0]), jnp.float32),  # v
        jax.ShapeDtypeStruct((1, o.shape[0]), jnp.int32),  # count
    ]
    ray_spec = pl.BlockSpec((3, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ray_tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    t, tri_id, u, v, cnt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, tri_spec, tri_spec, tri_spec, tri_spec],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(o_soa, d_soa, v0p, e1p, e2p, validp)

    t = t[0, :r]
    tri_id = tri_id[0, :r]
    uv = jnp.stack([u[0, :r], v[0, :r]], axis=1)
    cnt = cnt[0, :r]
    # padded triangle ids beyond T are never hit (valid=0), so ids are safe
    tri_id = jnp.where(jnp.isfinite(t), tri_id, -1)
    return t, tri_id, uv, cnt
