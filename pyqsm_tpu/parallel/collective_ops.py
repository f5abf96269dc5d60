"""Collective kernels used inside ``shard_map`` blocks.

These are the ICI-native replacements for the reference's tile-and-rescan
patterns: the point axis is sharded, and instead of 1/7-overlap grid cells
(``math_utils/general.py:198``) neighbor information moves over the
interconnect — a bidirectional-able ring for kNN (each step intersects the
local query block with a circulating point shard), ``all_gather`` for the
small per-iteration solution vectors of the contraction CG, and ``psum``
for global reductions (inlier counts, mass means, dot products).

All functions assume they run *inside* ``shard_map`` with a named ``axis``.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

Array = jax.Array


def ring_knn(
    queries: Array,  # [Q_local, 3]
    points: Array,  # [P_local, 3] this shard's points
    point_mask: Array,  # [P_local]
    k: int,
    axis: str,
) -> tuple[Array, Array]:
    """Exact kNN of local queries against the *globally sharded* point set.

    The point shard circulates around the ring via ``ppermute``; each step
    merges the local (query × shard) distances into a running top-k. Returns
    global point indices. Communication: (n_dev − 1) shard-sized hops over
    ICI, compute fully overlapped by XLA's latency hiding.
    """
    n_dev = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    p_local = points.shape[0]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def local_d2(q, pts, mask, owner):
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
        p_sq = jnp.sum(pts * pts, axis=-1)
        cross = jnp.dot(q, pts.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = q_sq + p_sq[None, :] - 2.0 * cross
        d2 = jnp.where(mask[None, :], d2, jnp.inf)
        gidx = owner * p_local + jnp.arange(p_local, dtype=jnp.int32)
        return d2, jnp.broadcast_to(gidx[None, :], d2.shape)

    def merge(best_d, best_i, d2, gi):
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, gi], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        return -neg_top, jnp.take_along_axis(cat_i, arg, axis=1)

    best_d = jnp.full((queries.shape[0], k), jnp.inf)
    best_i = jnp.full((queries.shape[0], k), -1, jnp.int32)

    pts, mask, owner = points, point_mask, me
    for step in range(n_dev):
        d2, gi = local_d2(queries, pts, mask, owner)
        best_d, best_i = merge(best_d, best_i, d2, gi)
        if step < n_dev - 1:
            pts = jax.lax.ppermute(pts, axis, perm)
            mask = jax.lax.ppermute(mask, axis, perm)
            owner = jax.lax.ppermute(owner, axis, perm)
    best_i = jnp.where(jnp.isfinite(best_d), best_i, -1)
    return jnp.sqrt(jnp.maximum(best_d, 0.0)), best_i


def sharded_laplacian_matvec(
    x_local: Array,  # [P_local, C] this shard's solution rows
    nbr_idx: Array,  # [P_local, k] GLOBAL neighbor indices
    w: Array,  # [P_local, k]
    deg: Array,  # [P_local]
    axis: str,
) -> Array:
    """L @ x with x sharded over the point axis: all_gather the (small)
    solution vector, gather neighbor rows, compute local rows. This is the
    TP pattern for a skinny activation (C=3)."""
    x_full = jax.lax.all_gather(x_local, axis, tiled=True)  # [P_global, C]
    gidx = jnp.maximum(nbr_idx, 0)
    nbr_x = x_full[gidx]
    acc = jnp.einsum("nk,nkc->nc", jnp.where(nbr_idx >= 0, w, 0.0), nbr_x)
    return deg[:, None] * x_local - acc


def sharded_laplacian_rmatvec(
    y_local: Array,  # [P_local, C]
    nbr_idx: Array,  # [P_local, k] GLOBAL neighbor indices
    w: Array,  # [P_local, k]
    deg: Array,  # [P_local]
    axis: str,
) -> Array:
    """Exact Lᵀ @ y with rows sharded over the point axis. Each shard owns
    the out-edges of its local rows; their contributions w_ij·y_i scatter to
    *global* destination rows, so the partial [P_global, C] accumulations are
    psum'd and each shard slices back its block. This keeps the directed kNN
    weights exact (no symmetric-Laplacian assumption — kNN membership and the
    per-row σ_i heat weights are NOT symmetric)."""
    n_local, k = nbr_idx.shape
    n_dev = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    n_global = n_local * n_dev
    wv = jnp.where(nbr_idx >= 0, w, 0.0)
    contrib = wv[:, :, None] * y_local[:, None, :]  # [P_local, k, C]
    dst = jnp.where(nbr_idx >= 0, nbr_idx, n_global).reshape(-1)
    part = jax.ops.segment_sum(
        contrib.reshape(n_local * k, -1), dst, num_segments=n_global + 1
    )[:n_global]
    full = jax.lax.psum(part, axis)  # [P_global, C]
    acc = jax.lax.dynamic_slice_in_dim(full, me * n_local, n_local, 0)
    return deg[:, None] * y_local - acc


def sharded_cg(
    nbr_idx: Array, w: Array, deg: Array,
    wl: Array, wh: Array,  # [P_local]
    b_local: Array,  # [P_local, C]
    axis: str,
    iters: int = 30,
) -> Array:
    """Jacobi-PCG on the contraction normal equations with the point axis
    sharded: L matvecs all_gather x; Lᵀ matvecs scatter local out-edge
    contributions and psum; inner products psum. The normal operator is the
    exact Lᵀ·WL²·L + WH² of the directed kNN weights (matching the
    single-chip path), not a symmetrized approximation."""

    def matvec(x_local):
        y = sharded_laplacian_matvec(x_local, nbr_idx, w, deg, axis)
        y = (wl * wl)[:, None] * y
        y = sharded_laplacian_rmatvec(y, nbr_idx, w, deg, axis)
        return y + (wh * wh)[:, None] * x_local

    # Jacobi diagonal incl. the in-edge term Σ_i (wl_i·w_ij)², gathered the
    # same way as the rmatvec (one-time cost before the iteration loop)
    n_local, k = nbr_idx.shape
    n_dev = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    n_global = n_local * n_dev
    sq = (wl[:, None] * jnp.where(nbr_idx >= 0, w, 0.0)) ** 2
    dst = jnp.where(nbr_idx >= 0, nbr_idx, n_global).reshape(-1)
    part = jax.ops.segment_sum(sq.reshape(-1), dst, num_segments=n_global + 1)[:n_global]
    in_sq = jax.lax.dynamic_slice_in_dim(jax.lax.psum(part, axis), me * n_local, n_local, 0)
    diag = (wl * deg) ** 2 + in_sq + wh * wh
    minv = 1.0 / jnp.maximum(diag, 1e-20)[:, None]

    def psum_dot(a, b):
        return jax.lax.psum(jnp.sum(a * b), axis)

    x = jnp.zeros_like(b_local)
    r = b_local - matvec(x)
    z = minv * r
    p = z
    rz = psum_dot(r, z)

    def body(i, state):
        x, r, p, rz = state
        ap = matvec(p)
        alpha = rz / jnp.maximum(psum_dot(p, ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * ap
        z = minv * r
        rz_new = psum_dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        p = z + beta * p
        return x, r, p, rz_new

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
    return x


def psum_inlier_count(resid_local: Array, mask_local: Array, threshold: float,
                      axis: str) -> Array:
    """Global RANSAC inlier count per hypothesis: local count + psum."""
    inl = (resid_local <= threshold) & mask_local[None, :]
    return jax.lax.psum(jnp.sum(inl, axis=1), axis)


def label_prop_round(
    labels_local: Array,  # [P_local] i32
    nbr_idx: Array,  # [P_local, k] global indices
    edge_valid: Array,
    axis: str,
) -> Array:
    """One min-label propagation round with globally sharded labels
    (the sharded DBSCAN/region-growing primitive): all_gather labels,
    local min over neighbor lists."""
    big = jnp.int32(2**30)
    full = jax.lax.all_gather(labels_local, axis, tiled=True)
    gidx = jnp.maximum(nbr_idx, 0)
    nbr_lab = jnp.where(edge_valid, full[gidx], big)
    cand = jnp.min(nbr_lab, axis=1)
    return jnp.minimum(labels_local, cand)
