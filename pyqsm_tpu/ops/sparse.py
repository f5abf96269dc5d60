"""Sparse linear algebra on TPU: ELL-format graph operators + preconditioned CG.

Replaces scipy SuperLU ``spsolve`` — the hot kernel of Laplacian contraction
(3 solves per iteration, ``skeletonize.py:164-173``) — with a Jacobi-
preconditioned conjugate-gradient solve on the SPD normal equations
``AᵀA = Lᵀ·WL²·L + WH²``, entirely on device, batched over xyz.

Sparsity is the fixed-k neighbor list (ELL): ``nbr_idx [N,k]`` with -1
padding and per-edge weights ``w [N,k]``. Matvecs are gathers + segment
sums — no CSR indirection, fully static shapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class ELLLaplacian(NamedTuple):
    """Graph Laplacian L = D − W in ELL form. Row i: L_ii = deg[i],
    L_ij = −w[i, slot] for j = nbr_idx[i, slot]. Not necessarily symmetric
    (kNN is directed) — the normal equations only need L and Lᵀ matvecs.

    ``t_idx``/``t_w`` optionally carry the TRANSPOSE in ELL form (built once
    per Laplacian with ``build_transpose_ell``), turning Lᵀ matvecs from a
    per-call segment-sum scatter (the CG iteration's dominant cost on TPU)
    into a gather. ``t_overflow`` records whether any in-degree exceeded the
    ``kt`` slots — when True the gather form would silently drop in-edges
    (contracted clouds collapse onto skeleton junctions where in-degree far
    exceeds 2k), so ``laplacian_rmatvec`` falls back to the exact scatter
    path via ``lax.cond``."""

    nbr_idx: Array  # [N, k] i32, -1 padded
    w: Array  # [N, k] f32, 0 on padding
    deg: Array  # [N] f32 row sums
    mass: Array  # [N] f32 diagonal mass (area) matrix
    t_idx: Array | None = None  # [N, kt] i32 in-edge sources, -1 padded
    t_w: Array | None = None  # [N, kt] f32
    t_overflow: Array | None = None  # scalar bool: max in-degree > kt


def build_transpose_ell(
    nbr_idx: Array, w: Array, kt: int
) -> tuple[Array, Array, Array]:
    """ELL rows of Wᵀ: for each point, the sources (and weights) of its
    in-edges. One flat sort + one scatter per build. Returns
    ``(t_idx, t_w, overflow)`` — ``overflow`` is a scalar bool flagging any
    in-degree above ``kt`` (then the ELL is lossy and the caller must route
    Lᵀ matvecs through the exact scatter path instead)."""
    n, k = nbr_idx.shape
    src = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0).reshape(-1)
    dst = jnp.where(nbr_idx >= 0, nbr_idx, n).reshape(-1)
    wf = jnp.where(nbr_idx >= 0, w, 0.0).reshape(-1)
    order = jnp.argsort(dst)
    sd = dst[order]
    ss = src[order]
    sw = wf[order]
    nk = n * k
    iota = jnp.arange(nk, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]), sd[1:] != sd[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, iota, -1)
    )
    pos = iota - run_start  # position within the in-edge run of each dst
    keep = (sd < n) & (pos < kt)
    overflow = jnp.any((sd < n) & (pos >= kt))
    row = jnp.where(keep, sd, n)
    slot = jnp.where(keep, pos, 0)
    t_idx = jnp.full((n + 1, kt), -1, jnp.int32).at[row, slot].set(
        ss, mode="drop"
    )[:n]
    t_w = jnp.zeros((n + 1, kt)).at[row, slot].set(sw, mode="drop")[:n]
    return t_idx, t_w, overflow


def laplacian_matvec(L: ELLLaplacian, x: Array) -> Array:
    """L @ x for x [N, C]."""
    gidx = jnp.maximum(L.nbr_idx, 0)
    nbr_x = x[gidx]  # [N, k, C]
    acc = jnp.einsum("nk,nkc->nc", L.w, nbr_x)
    return L.deg[:, None] * x - acc


def _rmatvec_scatter(L: ELLLaplacian, x: Array) -> Array:
    """Exact Lᵀ @ x via segment-sum scatter (handles any in-degree)."""
    n, k = L.nbr_idx.shape
    gidx = jnp.maximum(L.nbr_idx, 0)
    contrib = L.w[:, :, None] * x[:, None, :]  # w_ij * x_i  at slot j
    flat_idx = jnp.where(L.nbr_idx >= 0, gidx, n).reshape(-1)
    flat = contrib.reshape(n * k, -1)
    scat = jax.ops.segment_sum(flat, flat_idx, num_segments=n + 1)[:n]
    return L.deg[:, None] * x - scat


def laplacian_rmatvec(L: ELLLaplacian, x: Array) -> Array:
    """Lᵀ @ x for x [N, C]. Gather form via the prebuilt transpose ELL when
    available AND lossless (the CG hot path); exact segment-sum scatter when
    the transpose overflowed its slots or no transpose was built."""
    if L.t_idx is None:
        return _rmatvec_scatter(L, x)

    def gather_path(x):
        tg = jnp.maximum(L.t_idx, 0)
        acc = jnp.einsum("nk,nkc->nc", L.t_w, x[tg])
        return L.deg[:, None] * x - acc

    if L.t_overflow is None:
        return gather_path(x)
    return jax.lax.cond(
        L.t_overflow, lambda x: _rmatvec_scatter(L, x), gather_path, x
    )


def normal_matvec(L: ELLLaplacian, wl: Array, wh: Array, x: Array) -> Array:
    """(Lᵀ·WL²·L + WH²) @ x — the contraction normal-equation operator.
    ``wl``/``wh`` are per-row weights (WL applied to Laplacian rows, WH to
    positional rows, as in A = [WL·L; WH])."""
    y = laplacian_matvec(L, x)
    y = (wl * wl)[:, None] * y
    y = laplacian_rmatvec(L, y)
    return y + (wh * wh)[:, None] * x


def normal_diag(L: ELLLaplacian, wl: Array, wh: Array) -> Array:
    """Exact diagonal of the normal operator, for Jacobi preconditioning:
    diag_j = WL_j²·deg_j² + Σ_{i : j∈N(i)} WL_i²·w_ij² + WH_j²."""
    n, k = L.nbr_idx.shape
    gidx = jnp.maximum(L.nbr_idx, 0)
    sq = (wl[:, None] * L.w) ** 2
    flat_idx = jnp.where(L.nbr_idx >= 0, gidx, n).reshape(-1)
    scat = jax.ops.segment_sum(sq.reshape(-1), flat_idx, num_segments=n + 1)[:n]
    return (wl * L.deg) ** 2 + scat + wh * wh


@partial(jax.jit, static_argnames=("max_iters",))
def pcg(
    matvec_operands: tuple,
    b: Array,  # [N, C]
    diag: Array,  # [N] Jacobi preconditioner diagonal
    x0: Array | None = None,
    tol: float = 1e-6,
    max_iters: int = 200,
) -> tuple[Array, Array]:
    """Jacobi-preconditioned CG for the contraction normal equations.

    ``matvec_operands = (L, wl, wh)``; solves ``normal_matvec(...) x = b``
    batched over columns of b. Returns (x, final residual norm ratio)."""
    L, wl, wh = matvec_operands
    if x0 is None:
        x0 = jnp.zeros_like(b)
    minv = 1.0 / jnp.maximum(diag, 1e-20)

    def mv(x):
        return normal_matvec(L, wl, wh, x)

    r = b - mv(x0)
    z = minv[:, None] * r
    p = z
    rz = jnp.sum(r * z)
    b_norm = jnp.maximum(jnp.sqrt(jnp.sum(b * b)), 1e-30)

    def cond(state):
        x, r, p, rz, it = state
        return (jnp.sqrt(jnp.sum(r * r)) / b_norm > tol) & (it < max_iters)

    def body(state):
        x, r, p, rz, it = state
        Ap = mv(p)
        denom = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(denom) < 1e-30, 1e-30, denom)
        x = x + alpha * p
        r = r - alpha * Ap
        z = minv[:, None] * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, _, _, _ = jax.lax.while_loop(cond, body, (x0, r, p, rz, jnp.int32(0)))
    return x, jnp.sqrt(jnp.sum(r * r)) / b_norm
