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
    path via ``lax.cond``.

    ``b_w``/``s_i``/``s_j``/``s_w``/``s_overflow`` optionally carry the
    BLOCK-BANDED form (``build_banded``): with rows in Morton order, almost
    every kNN edge lands within ±one 256-row block of the diagonal, so the
    weight matrix is stored as dense ``[n_blocks, 256, 768]`` window blocks
    and both matvecs become batched MXU matmuls instead of row gathers —
    the gathers were ~95% of contraction time (measured 0.30 s per CG
    iteration at [8, 32768] k=20 on v5e; the banded form moves the same
    math to the MXU). Out-of-window edges go to the exact spill list
    (``s_i/s_j/s_w``, segment-sum applied). If the spill capacity
    overflows, the banded form is LOSSY and ``s_overflow`` is True — the
    matvecs do NOT branch on it (under vmap a traced cond runs both
    branches); host-stepped callers must check it between dispatches and
    rebuild (re-sorted rows, or the exact ELL form) before the next
    solve."""

    nbr_idx: Array  # [N, k] i32, -1 padded
    w: Array  # [N, k] f32, 0 on padding
    deg: Array  # [N] f32 row sums
    mass: Array  # [N] f32 diagonal mass (area) matrix
    t_idx: Array | None = None  # [N, kt] i32 in-edge sources, -1 padded
    t_w: Array | None = None  # [N, kt] f32
    t_overflow: Array | None = None  # scalar bool: max in-degree > kt
    b_w: Array | None = None  # [nb, BS, 3·BS] in-window weights
    s_i: Array | None = None  # [R] i32 spill edge rows (N = dead), ASCENDING
    s_j: Array | None = None  # [R] i32 spill edge cols
    s_w: Array | None = None  # [R] f32 spill weights
    s_overflow: Array | None = None  # scalar bool: spill edges > R
    st_i: Array | None = None  # [R] spill rows re-sorted by col (for Lᵀ)
    st_j: Array | None = None  # [R] spill cols ASCENDING (Lᵀ scatter dst)
    st_w: Array | None = None  # [R]
    b_w_t: Array | None = None  # [nb, BS, 3·BS] banded form of Wᵀ


BAND_BLOCK = 256  # rows per banded block; window = 3 blocks


def morton_codes(points: Array, mask: Array) -> Array:
    """30-bit Morton (Z-order) codes over the masked bbox — sorting rows by
    code gives the spatial locality the block-banded Laplacian needs (kNN
    neighbors land near the diagonal). Dead rows get INT32_MAX."""
    finite = mask & jnp.all(jnp.isfinite(points), axis=-1)
    safe = jnp.where(finite[:, None], points, 0.0)
    lo = jnp.min(jnp.where(finite[:, None], safe, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(finite[:, None], safe, -jnp.inf), axis=0)
    lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    scale = 1024.0 / jnp.maximum(hi - lo, 1e-9)
    q = jnp.clip((safe - lo[None, :]) * scale[None, :], 0, 1023).astype(jnp.int32)

    def spread(v):  # interleave 10 bits with two zero bits
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.where(finite, code, jnp.int32(2**31 - 1))


def build_banded(
    nbr_idx: Array, w: Array, spill_cap: int
) -> tuple[Array, Array, Array, Array, Array]:
    """Block-banded form of the ELL weights (rows should be Morton-ordered
    first). Returns ``(b_w, s_i, s_j, s_w, overflow)``; exact together with
    the spill unless ``overflow``."""
    n, k = nbr_idx.shape
    bs = BAND_BLOCK
    nb = n // bs
    assert nb * bs == n, "row count must be a multiple of BAND_BLOCK"
    row = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    blk = row // bs
    cpos = nbr_idx - (blk - 1) * bs
    valid = nbr_idx >= 0
    in_win = valid & (cpos >= 0) & (cpos < 3 * bs)
    # single flattened destination index: a multi-component scatter stacks
    # its index arrays into s32[n, k, 3], and the TPU T(8,128) layout pads
    # the minor dim 3 -> 128 (a 31 GB copy at 3.8M x 16 — measured OOM)
    flat_dst = jnp.where(
        in_win,
        (jnp.minimum(blk, nb - 1) * bs + row % bs) * (3 * bs) + cpos,
        nb * bs * 3 * bs,
    )
    b_w = jnp.zeros(nb * bs * 3 * bs + 1, w.dtype).at[flat_dst].add(
        jnp.where(in_win, w, 0.0), mode="drop"
    )[:-1].reshape(nb, bs, 3 * bs)

    spill = valid & ~in_win
    flat_s = spill.reshape(-1)
    # stable front-pack via cumsum + sorted scatter (an argsort here cost
    # O(nk log² nk) bitonic passes per rebuild for what is just a partition);
    # destinations are ascending over the flat row-major order, so s_i stays
    # ASCENDING — the property the sorted spill scatters rely on
    pos = jnp.cumsum(flat_s) - 1
    dst = jnp.where(flat_s & (pos < spill_cap), pos, spill_cap)
    src_rows = (jax.lax.iota(jnp.int32, n * k) // k)
    s_i = jnp.full(spill_cap + 1, n, jnp.int32).at[dst].set(
        src_rows, mode="drop")[:spill_cap]
    s_j = jnp.zeros(spill_cap + 1, jnp.int32).at[dst].set(
        nbr_idx.reshape(-1), mode="drop")[:spill_cap]
    s_w = jnp.zeros(spill_cap + 1, w.dtype).at[dst].set(
        w.reshape(-1), mode="drop")[:spill_cap]
    overflow = jnp.sum(flat_s) > spill_cap
    return b_w, s_i, s_j, s_w, overflow


def build_banded_window(
    nbr_idx: Array, w: Array, start: Array, spill_cap: int
) -> tuple[Array, Array, Array, Array, Array]:
    """``build_banded`` for a SHARD: rows are the local slice
    ``[start, start + n_local)`` of a globally ordered array, ``nbr_idx``
    carries GLOBAL column indices. In-window edges land in the local
    ±1-block band (applied against the caller's gathered halo window);
    spill keeps global columns (``s_j``) with LOCAL rows (``s_i``).
    ``start`` may be traced (vmap over shards)."""
    n, k = nbr_idx.shape
    bs = BAND_BLOCK
    nb = n // bs
    row = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0)
    blk = row // bs
    cpos = nbr_idx - start - (blk - 1) * bs
    valid = nbr_idx >= 0
    in_win = valid & (cpos >= 0) & (cpos < 3 * bs)
    # flattened destination — see build_banded (3-component scatter indices
    # get a padded s32[n, k, 3]->[n, k, 128] copy on TPU)
    flat_dst = jnp.where(
        in_win,
        (jnp.minimum(blk, nb - 1) * bs + row % bs) * (3 * bs) + cpos,
        nb * bs * 3 * bs,
    )
    b_w = jnp.zeros(nb * bs * 3 * bs + 1, w.dtype).at[flat_dst].add(
        jnp.where(in_win, w, 0.0), mode="drop"
    )[:-1].reshape(nb, bs, 3 * bs)

    spill = valid & ~in_win
    flat_s = spill.reshape(-1)
    pos = jnp.cumsum(flat_s) - 1
    dst = jnp.where(flat_s & (pos < spill_cap), pos, spill_cap)
    src_rows = (jax.lax.iota(jnp.int32, n * k) // k)
    s_i = jnp.full(spill_cap + 1, n, jnp.int32).at[dst].set(
        src_rows, mode="drop")[:spill_cap]
    s_j = jnp.zeros(spill_cap + 1, jnp.int32).at[dst].set(
        nbr_idx.reshape(-1), mode="drop")[:spill_cap]
    s_w = jnp.zeros(spill_cap + 1, w.dtype).at[dst].set(
        w.reshape(-1), mode="drop")[:spill_cap]
    overflow = jnp.sum(flat_s) > spill_cap
    return b_w, s_i, s_j, s_w, overflow


def band_transpose(b_w: Array) -> Array:
    """Banded form of Wᵀ from the banded form of W. The ±1-block window is
    symmetric (j in i's window ⇔ i in j's), so Wᵀ is banded with the same
    shape: ``b_w_t[c, q, u·bs+v] = b_w[c-1+u, v, (2-u)·bs+q]`` — three
    per-block transposes with a block shift, built ONCE per Laplacian.
    Transpose applies then reuse the forward kernel (one weight-tile read
    per output block; the in-kernel transpose path read three)."""
    nb, bs, _ = b_w.shape
    s0 = jnp.swapaxes(b_w[:, :, 2 * bs:], 1, 2)  # upper third → u=0 slot
    s1 = jnp.swapaxes(b_w[:, :, bs:2 * bs], 1, 2)
    s2 = jnp.swapaxes(b_w[:, :, :bs], 1, 2)  # lower third → u=2 slot
    zero = jnp.zeros_like(s1[:1])
    t0 = jnp.concatenate([zero, s0[:-1]], axis=0)  # source block c-1
    t2 = jnp.concatenate([s2[1:], zero], axis=0)  # source block c+1
    return jnp.concatenate([t0, s1, t2], axis=2)


def _use_pallas_band() -> bool:
    import os

    if os.environ.get("PYQSM_NO_PALLAS_BAND"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # noqa: BLE001
        return False


def _band_apply(b_w: Array, x: Array, prepadded: bool = False) -> Array:
    """Σ_j W_ij x_j with W in block-banded form — batched MXU matmul.

    On TPU this routes through the Pallas kernel (XLA's lowering of the
    d=3 einsum ran at ~23 GB/s effective — 30 ms per apply at [8, 32768];
    the kernel streams each tile once); the einsum stays as the portable
    fallback. ``prepadded``: x carries one halo block each side
    ([n + 2·BS, C]) instead of implicit zeros (sharded claim window)."""
    if _use_pallas_band():
        from pyqsm_tpu.ops.pallas_kernels import band_matvec_pallas

        return band_matvec_pallas(b_w, x, prepadded=prepadded)
    n = b_w.shape[0] * BAND_BLOCK
    xb = x.reshape(-1, BAND_BLOCK, x.shape[-1])
    if prepadded:
        prev, cur, nxt = xb[:-2], xb[1:-1], xb[2:]
    else:
        zero = jnp.zeros_like(xb[:1])
        prev = jnp.concatenate([zero, xb[:-1]], axis=0)
        cur = xb
        nxt = jnp.concatenate([xb[1:], zero], axis=0)
    xw = jnp.concatenate([prev, cur, nxt], axis=1)  # [nb, 3·BS, C]
    y = jnp.einsum("brc,bcd->brd", b_w, xw,
                   preferred_element_type=jnp.float32)
    return y.reshape(n, x.shape[-1])


def _band_apply_t(b_w: Array, x: Array) -> Array:
    """Σ_i W_ij x_i (transpose apply) in block-banded form."""
    if _use_pallas_band():
        from pyqsm_tpu.ops.pallas_kernels import band_matvec_t_pallas

        return band_matvec_t_pallas(b_w, x)
    n = b_w.shape[0] * BAND_BLOCK
    xb = x.reshape(-1, BAND_BLOCK, x.shape[-1])
    contrib = jnp.einsum("brc,brd->bcd", b_w, xb,
                         preferred_element_type=jnp.float32)  # [nb, 3·BS, C]
    t0, t1, t2 = jnp.split(contrib, 3, axis=1)
    zero = jnp.zeros_like(t1[:1])
    # block b's first third lands on block b-1's rows, last third on b+1's
    acc = t1 + jnp.concatenate([t0[1:], zero], axis=0) + jnp.concatenate(
        [zero, t2[:-1]], axis=0)
    return acc.reshape(n, x.shape[-1])


def _spill_apply(s_i, s_j, s_w, x, n, transpose=False, sorted_dst=False):
    """Apply the exact spill list. ``sorted_dst`` asserts the destination
    indices are ascending — the TPU scatter then lowers to a segmented sum
    instead of a random scatter (``build_banded`` emits ``s_i`` ascending;
    ``sort_spill_transpose`` re-sorts by column for the Lᵀ direction)."""
    src = s_i if transpose else s_j
    dst = s_j if transpose else s_i
    contrib = s_w[:, None] * x[jnp.clip(src, 0, n - 1)]
    return jax.ops.segment_sum(
        contrib, jnp.minimum(dst, n), num_segments=n + 1,
        indices_are_sorted=sorted_dst)[:n]


def sort_spill_transpose(s_i: Array, s_j: Array, s_w: Array, n: int):
    """Spill list re-sorted by COLUMN, for sorted-scatter Lᵀ applies. Dead
    entries (s_i == n, zero weight) sort to the tail via column key n."""
    key = jnp.where(s_i >= n, n, s_j)
    order = jnp.argsort(key)
    return s_i[order], key[order], s_w[order]


@partial(jax.jit, static_argnames=("kt",))
def build_transpose_ell(
    nbr_idx: Array, w: Array, kt: int
) -> tuple[Array, Array, Array]:
    """ELL rows of Wᵀ: for each point, the sources (and weights) of its
    in-edges. One flat sort + one scatter per build. Returns
    ``(t_idx, t_w, overflow)`` — ``overflow`` is a scalar bool flagging any
    in-degree above ``kt`` (then the ELL is lossy and the caller must route
    Lᵀ matvecs through the exact scatter path instead).

    Jitted with static ``kt`` (pass it BY KEYWORD): called eagerly at the
    10M-pt plot scale (the push path's [1.53M, 16] transpose) every op in
    the body became its own remote-compiled program on axon TPUs — ~180
    tunnel round trips that wedged the r5 bench cold pass for 45+ minutes.
    One fused program compiles in seconds."""
    n, k = nbr_idx.shape
    src = jax.lax.broadcasted_iota(jnp.int32, (n, k), 0).reshape(-1)
    dst = jnp.where(nbr_idx >= 0, nbr_idx, n).reshape(-1)
    wf = jnp.where(nbr_idx >= 0, w, 0.0).reshape(-1)
    order = jnp.argsort(dst)
    sd = dst[order]
    ss = src[order]
    sw = wf[order]
    # Gather-based assembly: each destination row's in-edges are the
    # contiguous run [starts[i], ends[i]) of the dst-sorted edge list, so
    # the [n, kt] ELL is a plain gather at starts[i] + j. The previous
    # scatter form (24.5M random-ish .at[].set at the 10M-plot scale) plus
    # a 24.5M associative_scan compiled/ran for many minutes on TPU —
    # searchsorted lowers to ~log2(nk) rounds of gather/compare and the
    # gather vectorizes.
    rows = jnp.arange(n, dtype=sd.dtype)
    starts = jnp.searchsorted(sd, rows, side="left")
    ends = jnp.searchsorted(sd, rows, side="right")
    overflow = jnp.any(ends - starts > kt)
    take = starts[:, None] + jnp.arange(kt, dtype=starts.dtype)[None, :]
    valid = take < ends[:, None]
    safe = jnp.minimum(take, sd.shape[0] - 1)
    t_idx = jnp.where(valid, ss[safe], -1)
    t_w = jnp.where(valid, sw[safe], 0.0)
    return t_idx, t_w, overflow


def _matvec_ell(L: ELLLaplacian, x: Array) -> Array:
    gidx = jnp.maximum(L.nbr_idx, 0)
    nbr_x = x[gidx]  # [N, k, C]
    acc = jnp.einsum("nk,nkc->nc", L.w, nbr_x)
    return L.deg[:, None] * x - acc


def laplacian_matvec(L: ELLLaplacian, x: Array) -> Array:
    """L @ x for x [N, C]. Block-banded MXU path when built.

    The banded path applies banded + spill UNCONDITIONALLY — no traced
    ``lax.cond`` on ``s_overflow``: under ``vmap`` (the batched contraction)
    cond lowers to select and BOTH branches execute, which made every CG
    iteration pay the banded matmuls AND the full ELL gathers (measured:
    only 1.35x over ELL instead of the expected gap). Callers that
    host-step the outer loop must check ``s_overflow`` between dispatches
    and rebuild (re-sorted or ELL) when it fires — see
    ``models/skeleton.extract_skeleton_batch``."""
    if L.b_w is None:
        return _matvec_ell(L, x)
    n = x.shape[0]
    acc = _band_apply(L.b_w, x) + _spill_apply(
        L.s_i, L.s_j, L.s_w, x, n, sorted_dst=True)
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
    """Lᵀ @ x for x [N, C]. Preference order: block-banded MXU form (exact
    spill, overflow-guarded) → prebuilt transpose ELL gather (lossless
    only) → exact segment-sum scatter."""
    if L.b_w is not None:
        # unconditional banded + spill — see laplacian_matvec for why no
        # traced overflow cond (vmap lowers cond to both-branches select)
        n = x.shape[0]
        if L.st_j is not None:
            acc_s = _spill_apply(L.st_i, L.st_j, L.st_w, x, n,
                                 transpose=True, sorted_dst=True)
        else:
            acc_s = _spill_apply(L.s_i, L.s_j, L.s_w, x, n, transpose=True)
        if L.b_w_t is not None:  # precomputed Wᵀ band: forward-kernel cost
            acc_b = _band_apply(L.b_w_t, x)
        else:
            acc_b = _band_apply_t(L.b_w, x)
        return L.deg[:, None] * x - (acc_b + acc_s)

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
    batched over columns of b. Returns (x, final residual norm ratio).

    Point-Jacobi from ``diag``. (A Morton-block block-Jacobi variant was
    measured strictly worse on the real operator — at contraction wl the
    inter-block coupling of Lᵀ·WL²·L dominates the diagonal blocks, and
    block solves mislead the search directions.)"""
    L, wl, wh = matvec_operands
    if x0 is None:
        x0 = jnp.zeros_like(b)
    minv = 1.0 / jnp.maximum(diag, 1e-20)

    def prec(r):
        return minv[:, None] * r

    def mv(x):
        return normal_matvec(L, wl, wh, x)

    r = b - mv(x0)
    z = prec(r)
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
        z = prec(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return x, r, p, rz_new, it + 1

    x, r, _, _, _ = jax.lax.while_loop(cond, body, (x0, r, p, rz, jnp.int32(0)))
    return x, jnp.sqrt(jnp.sum(r * r)) / b_norm
