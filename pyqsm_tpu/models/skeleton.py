"""Laplacian-contraction skeletonization → topology → QSM.

TPU-native rebuild of ``pyQSM/geometry/skeletonize.py``:

- ``extract_skeleton`` (ref :226-373): the contraction loop becomes a single
  ``lax.while_loop`` — per iteration one Laplacian rebuild (kNN + heat
  weights) and one Jacobi-PCG solve of the SPD normal equations batched over
  xyz (replacing three SuperLU ``spsolve`` calls, ref :169-173), OBB
  clamping, WL/WH amplification with the reference's clip caps, and
  mass-ratio termination.
- ``extract_topology`` (ref :113-146): FPS to 10% (≥15) → kNN graph →
  Borůvka MST (replacing mistree) → degree-2 chain contraction (replacing
  the python ``simplify_graph``).
- ``skeleton_to_qsm`` (ref :375-448): per simplified edge, cylinder radius =
  mean total contraction distance of the chain's member vertices.

Deviation from the reference (documented): the reference appends the *stale*
mass diagonal before rebuilding (``skeletonize.py:329-343``), so its
volume-ratio termination lags one iteration; we use the freshly rebuilt mass.
Weight-update formulas and clip caps are otherwise identical.
"""

from __future__ import annotations



import os
import sys
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.config import SkeletonizeConfig
from pyqsm_tpu.ops.geometry import clamp_to_obb, obb_axes
from pyqsm_tpu.ops.graph import SimplifiedGraph, boruvka_mst, simplify_degree2
from pyqsm_tpu.ops.laplacian import point_cloud_laplacian
from pyqsm_tpu.ops.neighbors import knn
from pyqsm_tpu.ops.sampling import farthest_point_sampling
from pyqsm_tpu.ops.sparse import normal_diag, pcg
from pyqsm_tpu.state import Cylinders, Topology

Array = jax.Array

# Contraction stall cutoff: a tree whose mass ratio improves by less than
# this fraction in one iteration has reached its fixed point — the ratio can
# plateau marginally ABOVE the termination threshold and otherwise burns
# every remaining max_iter on solves that move nothing (documented deviation
# from the reference's ratio-only termination, skeletonize.py:345-350).
_STALL_FRAC = 0.05


class SkeletonResult(NamedTuple):
    contracted: Array  # [N, 3]
    total_shift: Array  # [N, 3] — c_mag = ||total_shift|| drives epiphyte ID
    first_shift: Array  # [N, 3] single-iteration shift (canopy_metrics.get_shift)
    iterations: Array  # scalar i32
    volume_ratio: Array  # scalar


def set_amplification(n_points: int, termination_ratio: float) -> tuple[float, float]:
    """Point-count tiers for contraction amplification
    (``skeletonize.py:182-223`` 'auto' policy)."""
    if n_points < 1_000:
        return 0.01, 1.0
    if n_points < 10_000:
        return 0.007, 2.0
    if n_points < 100_000:
        return 0.003, 5.0
    if n_points < 500_000:
        return 0.004, 5.0
    return 0.003, 5.0


@partial(
    jax.jit,
    static_argnames=(
        "n_neighbors", "max_iter", "cg_iters", "cg_iters_first",
    ),
)
def _contract(
    points: Array,
    mask: Array,
    n_neighbors: int,
    max_iter: int,
    moll: float,
    contraction_factor: float,
    attraction_factor: float,
    max_contraction: float,
    max_attraction: float,
    termination_ratio: float,
    cg_iters: int = 80,
    cg_tol: float = 3e-4,
    semantic_scale: Array | None = None,
    cg_iters_first: int | None = None,
) -> SkeletonResult:
    n = points.shape[0]
    center, axes, half = obb_axes(points, mask)
    L0 = point_cloud_laplacian(points, mask, n_neighbors, moll)
    m0 = L0.mass
    m0_mean = jnp.sum(jnp.where(mask, m0, 0.0)) / jnp.maximum(jnp.sum(mask), 1)

    wl0 = jnp.full(n, contraction_factor * 1e3 * jnp.sqrt(m0_mean))
    if semantic_scale is not None:
        # semantic-weighted contraction (ref semantic_weighting,
        # scripts/downgraded_from_src/local_skeletonize_copy_test.py:49-76;
        # config [skeletonize].semantic_weight): per-point multiplier on the
        # Laplacian rows, e.g. weight trunk points harder than branches
        wl0 = wl0 * semantic_scale
    wh0 = jnp.full(n, attraction_factor)
    live = mask.astype(points.dtype)

    def solve(L, wl, wh, pts, budget):
        b = (wh * wh)[:, None] * pts  # Aᵀb with b = [0; WH·p]
        diag = normal_diag(L, wl, wh)
        x, _ = pcg((L, wl, wh), b, diag, x0=pts, tol=cg_tol, max_iters=budget)
        return x

    def cond(state):
        pts, L, wl, wh, shift, first, ratio, prev, it = state
        not_stalled = (it == 0) | (prev - ratio >= _STALL_FRAC * prev)
        return (ratio > termination_ratio) & (it < max_iter) & not_stalled

    def make_body(budget):
        def body(state):
            pts, L, wl, wh, shift, first, ratio, prev, it = state
            prev = ratio
            new = solve(L, wl, wh, pts, budget)
            new = clamp_to_obb(new, center, axes, half)
            new = jnp.where(mask[:, None], new, pts)
            step_shift = (pts - new) * live[:, None]
            shift = shift + step_shift
            first = jnp.where(it == 0, step_shift, first)
            L_new = point_cloud_laplacian(new, mask, n_neighbors, moll)
            m = L_new.mass
            m_mean = jnp.sum(jnp.where(mask, m, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
            ratio = m_mean / jnp.maximum(m0_mean, 1e-30)
            wl = jnp.clip(wl * contraction_factor, 0.1, max_contraction)
            wh = jnp.clip(wh * jnp.sqrt(m0 / jnp.maximum(m, 1e-30)), 0.1, max_attraction)
            return new, L_new, wl, wh, shift, first, ratio, prev, it + 1
        return body

    zero = jnp.zeros_like(points)
    one_r = jnp.array(1.0, points.dtype)
    state = (points, L0, wl0, wh0, zero, zero, one_r, one_r, jnp.int32(0))
    # front-loaded CG budget: the FIRST solve does the bulk radial motion
    # (WL dominates WH before the mass-ratio reweighting); truncating it at
    # cg_iters leaves a residual wall that later iterations anchor in place
    # (measured on the r=0.3 m oracle branch: p50 0.10 m at 80/80 vs
    # 0.018 m at 240-then-80, tests/test_laplacian_oracle.py). Budget-0
    # iterations after it cost nothing extra: the schedule typically
    # CONVERGES in fewer outer iterations from the better start.
    first_budget = 3 * cg_iters if cg_iters_first is None else cg_iters_first
    state = make_body(first_budget)(state)
    pts, _, _, _, shift, first, ratio, _, it = jax.lax.while_loop(
        cond, make_body(cg_iters), state)
    return SkeletonResult(pts, shift, first, it, ratio)


def extract_skeleton(
    points: Array,
    mask: Array,
    cfg: SkeletonizeConfig | None = None,
    amplify_auto: bool = True,
    cg_iters: int = 80,
    trunk_mask: Array | None = None,
    cg_iters_first: int | None = None,
) -> SkeletonResult:
    """Contract the cloud onto its skeleton (ref ``extract_skeleton``).

    ``trunk_mask``: optional semantic labels — trunk points get their
    Laplacian rows scaled by ``cfg.semantic_weight`` (the reference's
    semantic-weighted contraction variant)."""
    if cfg is None:
        cfg = SkeletonizeConfig()
    termination = cfg.termination_ratio
    contraction = cfg.init_contraction
    if amplify_auto and cfg.step_wise_contraction_amplification == "auto":
        n_live = int(jnp.sum(mask))
        termination, contraction = set_amplification(n_live, termination)
    semantic_scale = None
    if trunk_mask is not None:
        semantic_scale = jnp.where(trunk_mask, cfg.semantic_weight, 1.0)
    return _contract(
        points, mask,
        n_neighbors=cfg.n_neighbors,
        max_iter=cfg.max_iter,
        moll=cfg.moll,
        contraction_factor=contraction,
        attraction_factor=cfg.init_attraction,
        max_contraction=cfg.max_contraction,
        max_attraction=cfg.max_attraction,
        termination_ratio=termination,
        cg_iters=cg_iters,
        semantic_scale=semantic_scale,
        cg_iters_first=cg_iters_first,
    )


@partial(jax.jit, static_argnames=("n_neighbors", "banded"))
def _contract_init_batch(pts, msk, n_neighbors, moll, c_factor, a_factor,
                         banded=False):
    """One dispatch: per-tree OBB frames, initial Laplacians, weights."""

    def one(p, m):
        center, axes_, half = obb_axes(p, m)
        L0 = point_cloud_laplacian(p, m, n_neighbors, moll, banded=banded)
        m0 = L0.mass
        m0_mean = jnp.sum(jnp.where(m, m0, 0.0)) / jnp.maximum(jnp.sum(m), 1)
        wl0 = jnp.full(p.shape[0], c_factor * 1e3 * jnp.sqrt(m0_mean))
        wh0 = jnp.full(p.shape[0], a_factor)
        return center, axes_, half, L0, m0, m0_mean, wl0, wh0

    return jax.vmap(one)(pts, msk)


@partial(jax.jit, static_argnames=("n_neighbors", "cg_iters", "banded"))
def _contract_step_batch(
    pts: Array,  # [T, P, 3]
    masks: Array,  # [T, P]
    L,  # vmapped ELLLaplacian
    wl: Array, wh: Array,  # [T, P]
    shift: Array, first: Array, ratio: Array, it: Array,
    m0_mean: Array, m0: Array, center: Array, axes: Array, half: Array,
    n_neighbors: int,
    moll: float, contraction_factor: float,
    max_contraction: float, max_attraction: float,
    termination_ratio: float, cg_iters: int, cg_tol: float = 3e-4,
    banded: bool = False,
    active: Array | None = None,
):
    """ONE contraction iteration for a batch of trees (vmapped solve +
    rebuild), gated per tree on its own termination. Host-stepping the
    outer loop keeps every device execution bounded — the single-dispatch
    20-iteration while_loop exceeded remote-attached TPUs' per-execution
    deadline at [8, 33k] scale.

    ``active``: optional per-tree gate overriding the internal
    ``ratio > termination`` test — the host loop folds in its stall
    detector (trees whose mass ratio has plateaued stop iterating)."""

    def one(pts, mask, L, wl, wh, m0_mean, m0, center, axes, half, active):
        b = (wh * wh)[:, None] * pts
        diag = normal_diag(L, wl, wh)
        new, _ = pcg((L, wl, wh), b, diag, x0=pts, tol=cg_tol,
                     max_iters=cg_iters)
        new = clamp_to_obb(new, center, axes, half)
        new = jnp.where((mask & active)[:, None], new, pts)
        step_shift = (pts - new) * mask[:, None].astype(pts.dtype)
        L_new = point_cloud_laplacian(new, mask, n_neighbors, moll,
                                      banded=banded)
        m = L_new.mass
        m_mean = jnp.sum(jnp.where(mask, m, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1)
        new_ratio = m_mean / jnp.maximum(m0_mean, 1e-30)
        wl_n = jnp.clip(wl * contraction_factor, 0.1, max_contraction)
        wh_n = jnp.clip(wh * jnp.sqrt(m0 / jnp.maximum(m, 1e-30)), 0.1,
                        max_attraction)
        return new, step_shift, L_new, wl_n, wh_n, new_ratio

    if active is None:
        active = ratio > termination_ratio
    new, step_shift, L_new, wl_n, wh_n, new_ratio = jax.vmap(one)(
        pts, masks, L, wl, wh, m0_mean, m0, center, axes, half, active)
    a1 = active[:, None]
    a2 = active[:, None, None]
    pts_out = jnp.where(a2, new, pts)
    step_shift = jnp.where(a2, step_shift, 0.0)
    shift = shift + step_shift
    first = jnp.where(a2 & (it[:, None, None] == 0), step_shift, first)
    L_out = jax.tree.map(
        lambda n_, o_: jnp.where(
            a1.reshape((-1,) + (1,) * (n_.ndim - 1)), n_, o_),
        L_new, L)
    wl_out = jnp.where(a1, wl_n, wl)
    wh_out = jnp.where(a1, wh_n, wh)
    ratio_out = jnp.where(active, new_ratio, ratio)
    it_out = it + active.astype(jnp.int32)
    return pts_out, shift, first, L_out, wl_out, wh_out, ratio_out, it_out


@jax.jit
def _morton_perm_batch(points, masks):
    from pyqsm_tpu.ops.sparse import morton_codes

    return jax.vmap(lambda p, m: jnp.argsort(morton_codes(p, m)))(points, masks)


@partial(jax.jit, static_argnames=("n_neighbors",))
def _reorder_rebuild_batch(pts, masks, shift, first, wl, wh, m0,
                           n_neighbors, moll):
    """Re-Morton every tree's rows on its CURRENT (contracted) positions and
    rebuild the banded Laplacians — one dispatch. Contraction collapses
    far-apart rows onto the same skeleton line, so spill vs the ORIGINAL
    Morton order grows over iterations; re-sorting on current geometry
    restores the banded window's locality."""
    perm = _morton_perm_batch(pts, masks)

    def take2(a):
        return jnp.take_along_axis(a, perm, axis=1)

    def take3(a):
        return jnp.take_along_axis(a, perm[..., None], axis=1)

    pts, masks = take3(pts), take2(masks)
    shift, first = take3(shift), take3(first)
    wl, wh, m0 = take2(wl), take2(wh), take2(m0)
    L = jax.vmap(
        lambda p, m: point_cloud_laplacian(p, m, n_neighbors, moll,
                                           banded=True)
    )(pts, masks)
    return perm, pts, masks, shift, first, wl, wh, m0, L


def _banded_guard(pts, masks, shift, first, wl, wh, m0, L, cum, banded_now,
                  active, n_neighbors, moll):
    """Host-stepped spill-overflow rescue. The banded matvecs apply their
    spill list unconditionally (a traced overflow cond under vmap runs BOTH
    branches — the original sin that made banded only 1.35x ELL), so a
    lossy L must never reach a solve: between dispatches, if any LIVE
    tree's spill overflowed, re-Morton the batch on current positions and
    rebuild; if an overflow survives the re-sort, drop the whole batch to
    the exact ELL path. ``cum`` tracks the composed permutation (None until
    a re-sort happens) so callers can restore their input row order."""
    if not banded_now or not bool(jnp.any(L.s_overflow & active)):
        return pts, masks, shift, first, wl, wh, m0, L, cum, banded_now
    if cum is None:
        cum = jnp.broadcast_to(
            jnp.arange(pts.shape[1], dtype=jnp.int32), masks.shape)
    perm, pts, masks, shift, first, wl, wh, m0, L = _reorder_rebuild_batch(
        pts, masks, shift, first, wl, wh, m0, n_neighbors, moll)
    cum = jnp.take_along_axis(cum, perm, axis=1)
    if bool(jnp.any(L.s_overflow & active)):
        L = _laplacian_batch(pts, masks, n_neighbors, moll, banded=False)
        banded_now = False
    return pts, masks, shift, first, wl, wh, m0, L, cum, banded_now


def _unpermute_result(res: SkeletonResult, cum) -> SkeletonResult:
    """Map a (possibly re-sorted) batch result back to the caller's rows."""
    if cum is None:
        return res
    inv = jnp.argsort(cum, axis=1)
    return SkeletonResult(
        jnp.take_along_axis(res.contracted, inv[..., None], axis=1),
        jnp.take_along_axis(res.total_shift, inv[..., None], axis=1),
        jnp.take_along_axis(res.first_shift, inv[..., None], axis=1),
        res.iterations, res.volume_ratio)


def extract_skeleton_batch(
    points: Array,  # [T, P, 3] — trees padded to one capacity bucket
    masks: Array,  # [T, P]
    cfg: SkeletonizeConfig | None = None,
    cg_iters: int = 80,
    mesh=None,
    two_level: bool = True,
    coarse_stride: int = 4,
    _morton: bool = True,
    cg_iters_first: int | None = None,
    cg_iters_polish: int | None = None,
) -> SkeletonResult:
    """Contract a BATCH of trees, HOST-STEPPED: one contraction iteration
    (vmapped solve + Laplacian rebuild) per device dispatch, with the
    ratio-vs-termination loop on the host. A single-dispatch 20-iteration
    while_loop ran minutes of device time at [8, 33k] and tripped
    remote-attached TPUs' per-execution deadline; per-iteration dispatches
    are bounded and the converged-tree gating is identical to the vmapped
    while_loop (frozen trees pass through).

    With ``mesh`` given, the trees axis is placed over ALL mesh devices
    (``NamedSharding``) and XLA partitions every step data-parallel across
    chips — the replacement for the reference's joblib pool over per-tree
    files (``pipeline.py:113-116``). Amplification tiers are chosen from
    the largest tree.

    ``two_level``: coarse→fine multigrid-style contraction — the bulk of
    the motion happens on a 1/``coarse_stride`` subsample (CG matvec cost,
    the stage's gather-bound wall, scales with point count), then the full
    cloud is initialised from the coarse displacement field (nearest-coarse
    transfer) and polished until the mass-ratio termination. ~3x the
    throughput of the single-level loop at equal topology quality (tested);
    ``first_shift`` is computed EXACTLY by running the first full-res
    iteration from the original positions (it feeds the epiphyte split,
    ref canopy_metrics.get_shift).

    Rows are internally permuted into Morton order (outputs are returned in
    the caller's row order): spatial locality in the row index is what lets
    the Laplacian store its weights block-banded and run the CG matvecs on
    the MXU (``ops/sparse.build_banded``) instead of through row gathers."""
    if cfg is None:
        cfg = SkeletonizeConfig()
    if _morton:
        perm = _morton_perm_batch(points, masks)
        pts_m = jnp.take_along_axis(points, perm[..., None], axis=1)
        msk_m = jnp.take_along_axis(masks, perm, axis=1)
        res = extract_skeleton_batch(
            pts_m, msk_m, cfg, cg_iters=cg_iters, mesh=mesh,
            two_level=two_level, coarse_stride=coarse_stride, _morton=False,
            cg_iters_first=cg_iters_first, cg_iters_polish=cg_iters_polish)
        inv = jnp.argsort(perm, axis=1)
        return SkeletonResult(
            jnp.take_along_axis(res.contracted, inv[..., None], axis=1),
            jnp.take_along_axis(res.total_shift, inv[..., None], axis=1),
            jnp.take_along_axis(res.first_shift, inv[..., None], axis=1),
            res.iterations, res.volume_ratio)
    termination = cfg.termination_ratio
    contraction = cfg.init_contraction
    if cfg.step_wise_contraction_amplification == "auto":
        n_max = int(jnp.max(jnp.sum(masks, axis=1)))
        termination, contraction = set_amplification(n_max, termination)

    if two_level and points.shape[1] >= 8192 * coarse_stride // 2:
        return _extract_skeleton_two_level(
            points, masks, cfg, termination, contraction, cg_iters,
            mesh=mesh, stride=coarse_stride, cg_iters_first=cg_iters_first,
            cg_iters_polish=cg_iters_polish)
    if cg_iters_first is None:
        cg_iters_first = 3 * cg_iters

    banded = points.shape[1] % 256 == 0
    t = points.shape[0]
    pad = 0
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes_names = tuple(mesh.axis_names)
        n_dev = int(np.prod(mesh.devices.shape))
        pad = (-t) % n_dev
        if pad:
            # empty padding trees: all-False masks terminate on iteration 0
            points = jnp.pad(points, ((0, pad), (0, 0), (0, 0)))
            masks = jnp.pad(masks, ((0, pad), (0, 0)), constant_values=False)
        points = jax.device_put(
            points, NamedSharding(mesh, P(axes_names, None, None)))
        masks = jax.device_put(masks, NamedSharding(mesh, P(axes_names, None)))

    center, obb_ax, half, L, m0, m0_mean, wl, wh = _contract_init_batch(
        points, masks, cfg.n_neighbors, cfg.moll, contraction,
        cfg.init_attraction, banded=banded)
    tb = points.shape[0]
    shift = jnp.zeros_like(points)
    first = jnp.zeros_like(points)
    ratio = jnp.ones(tb, points.dtype)
    # padding/empty trees start converged
    live_tree = jnp.any(masks, axis=1)
    ratio = jnp.where(live_tree, ratio, 0.0)
    it = jnp.zeros(tb, jnp.int32)
    pts = points
    cum = None
    banded_now = banded
    prev_ratio = None
    stalled = np.zeros(tb, bool)
    for outer in range(cfg.max_iter):
        # stall detector: a tree whose mass ratio improved < _STALL_FRAC in
        # one iteration has reached the contraction fixed point — near the
        # termination threshold the ratio can plateau marginally ABOVE it
        # and burn every remaining max_iter doing nothing (measured: 40 vs
        # 9 iterations on a 10M-pt plot; deviation from the reference's
        # ratio-only test, which shares the same plateau pathology)
        r_np = np.asarray(ratio)
        if prev_ratio is not None:
            stalled |= (prev_ratio - r_np) < _STALL_FRAC * np.abs(prev_ratio)
        prev_ratio = r_np
        active = (ratio > termination) & jnp.asarray(~stalled)
        if not bool(jnp.any(active)):
            break
        pts, masks, shift, first, wl, wh, m0, L, cum, banded_now = \
            _banded_guard(pts, masks, shift, first, wl, wh, m0, L, cum,
                          banded_now, active, cfg.n_neighbors, cfg.moll)
        pts, shift, first, L, wl, wh, ratio, it = _contract_step_batch(
            pts, masks, L, wl, wh, shift, first, ratio, it,
            m0_mean, m0, center, obb_ax, half,
            n_neighbors=cfg.n_neighbors, moll=cfg.moll,
            contraction_factor=contraction,
            max_contraction=cfg.max_contraction,
            max_attraction=cfg.max_attraction,
            termination_ratio=termination,
            # front-loaded CG budget — see _contract: the first solve does
            # the bulk radial motion and its truncation error is locked in
            # by the subsequent attraction reweighting
            cg_iters=cg_iters_first if outer == 0 else cg_iters,
            banded=banded_now, active=active,
        )
    out = _unpermute_result(SkeletonResult(pts, shift, first, it, ratio), cum)
    if pad:
        out = jax.tree.map(lambda x: x[:t], out)
    return out


@partial(jax.jit, static_argnames=("n_neighbors", "banded"))
def _laplacian_batch(pts, masks, n_neighbors, moll, banded=False):
    return jax.vmap(
        lambda p, m: point_cloud_laplacian(p, m, n_neighbors, moll,
                                           banded=banded)
    )(pts, masks)


@jax.jit
def _coarse_transfer(fine_p, fine_m, coarse_p, coarse_m, coarse_shift):
    """Initialise each fine point at its nearest coarse point's contracted
    displacement (nearest measured in ORIGINAL coordinates)."""

    def one(fp, fm, cp, cm, cs):
        _, idx = knn(fp, cp, 1, query_mask=fm, point_mask=cm)
        disp = cs[jnp.maximum(idx[:, 0], 0)]
        return jnp.where(fm[:, None], fp - disp, fp)

    return jax.vmap(one)(fine_p, fine_m, coarse_p, coarse_m, coarse_shift)


def _extract_skeleton_two_level(
    points: Array, masks: Array, cfg: SkeletonizeConfig,
    termination: float, contraction: float, cg_iters: int,
    mesh=None, stride: int = 4, cg_iters_first: int | None = None,
    cg_iters_polish: int | None = None,
) -> SkeletonResult:
    """Coarse→fine contraction (see ``extract_skeleton_batch`` docstring).

    ``cg_iters_polish`` (default ``max(cg_iters // 2, 20)``) caps the PCG
    budget of the full-resolution POLISH solves and the first_shift step.
    The radial-accuracy budget is carried by the coarse pass's front-loaded
    first solve (``cg_iters_first``); polish solves start from the
    transferred coarse field and refine it, so their truncation error is
    second-order — the Laplacian-oracle radial bound is the regression
    gate (``tests/test_laplacian_oracle.py``). At the bench shape the tol
    exit (3e-4) never fires inside 80 iterations, so the polish wall is
    linear in this cap (measured 4x ~8 s of the 49 s contraction stage)."""
    import dataclasses

    if cg_iters_polish is None:
        cg_iters_polish = max(cg_iters // 2, 20)

    # PYQSM_PROF_CONTRACT=1: per-phase wall timing on stderr. Each probe
    # forces a host transfer (block_until_ready returns early on tunneled
    # devices), so leave it off in production — the syncs serialize phases.
    _prof_on = bool(os.environ.get("PYQSM_PROF_CONTRACT"))
    _prof_t = [time.perf_counter()] if _prof_on else None

    def _prof(tag: str, *sync) -> None:
        if not _prof_on:
            return
        for s in sync:
            jax.block_until_ready(s)
        now = time.perf_counter()
        print(f"# contract2 {tag:18s} {now - _prof_t[0]:7.2f}s",
              file=sys.stderr, flush=True)
        _prof_t[0] = now

    t = points.shape[0]
    pad = 0
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes_names = tuple(mesh.axis_names)
        n_dev = int(np.prod(mesh.devices.shape))
        pad = (-t) % n_dev
        if pad:
            points = jnp.pad(points, ((0, pad), (0, 0), (0, 0)))
            masks = jnp.pad(masks, ((0, pad), (0, 0)), constant_values=False)
        points = jax.device_put(
            points, NamedSharding(mesh, P(axes_names, None, None)))
        masks = jax.device_put(masks, NamedSharding(mesh, P(axes_names, None)))

    cfg_fixed = dataclasses.replace(
        cfg, termination_ratio=termination, init_contraction=contraction,
        step_wise_contraction_amplification="fixed")

    banded = points.shape[1] % 256 == 0

    # 1. coarse pass: the bulk of the motion at 1/stride the matvec cost
    # (strided rows of the caller-Morton-ordered buffers stay spatially
    # uniform — a stride of a space-filling order is a uniform subsample)
    # the coarse first solve carries the radial-accuracy budget (its cost
    # is 1/stride of a full-res solve; the fine polish inherits the coarse
    # field's accuracy through the displacement transfer)
    coarse = extract_skeleton_batch(
        points[:, ::stride], masks[:, ::stride], cfg_fixed,
        cg_iters=cg_iters, mesh=None, two_level=False, _morton=False,
        cg_iters_first=cg_iters_first)
    _prof("coarse", coarse.contracted)

    # 2. init at ORIGINAL fine resolution (masses anchor the termination)
    center, obb_ax, half, L0, m0, m0_mean, wl0, wh0 = _contract_init_batch(
        points, masks, cfg.n_neighbors, cfg.moll, contraction,
        cfg.init_attraction, banded=banded)
    _prof("fine_init", L0.nbr_idx)
    tb = points.shape[0]
    live_tree = jnp.any(masks, axis=1)
    ratio0 = jnp.where(live_tree, jnp.ones(tb, points.dtype), 0.0)
    it0 = jnp.zeros(tb, jnp.int32)
    zero = jnp.zeros_like(points)

    # 3. EXACT first_shift: one full-res iteration from original positions
    # (feeds the epiphyte split, ref canopy_metrics.get_shift :114-140)
    # L0's rows are already Morton-ordered on THESE positions, so a spill
    # overflow here can't be fixed by re-sorting — go straight to exact ELL
    first_banded = banded
    if banded and bool(jnp.any(L0.s_overflow & live_tree)):
        L0 = _laplacian_batch(points, masks, cfg.n_neighbors, cfg.moll,
                              banded=False)
        first_banded = False
    _, _, first, _, _, _, _, _ = _contract_step_batch(
        points, masks, L0, wl0, wh0, zero, zero, ratio0, it0,
        m0_mean, m0, center, obb_ax, half,
        n_neighbors=cfg.n_neighbors, moll=cfg.moll,
        contraction_factor=contraction,
        max_contraction=cfg.max_contraction,
        max_attraction=cfg.max_attraction,
        termination_ratio=termination, cg_iters=cg_iters_polish,
        banded=first_banded)
    _prof("first_step", first)

    # 4. transfer the coarse displacement field to the full cloud
    fine_init = _coarse_transfer(points, masks, points[:, ::stride],
                                 masks[:, ::stride], coarse.total_shift)
    _prof("transfer", fine_init)

    # 5. polish at full resolution, continuing the coarse weight schedule
    k = coarse.iterations.astype(points.dtype)
    wl = jnp.clip(wl0 * contraction ** k[:, None], 0.1, cfg.max_contraction)
    L = _laplacian_batch(fine_init, masks, cfg.n_neighbors, cfg.moll,
                         banded=banded)
    m_cur = L.mass
    wh = jnp.clip(wh0 * jnp.sqrt(m0 / jnp.maximum(m_cur, 1e-30)), 0.1,
                  cfg.max_attraction)
    m_mean = jnp.sum(jnp.where(masks, m_cur, 0.0), axis=1) / jnp.maximum(
        jnp.sum(masks, axis=1), 1)
    ratio = jnp.where(live_tree, m_mean / jnp.maximum(m0_mean, 1e-30), 0.0)
    _prof("polish_init", ratio)
    pts = fine_init
    shift = jnp.where(masks[..., None], points - fine_init, 0.0)
    it = jnp.maximum(coarse.iterations, 1)  # >0: first_shift stays frozen
    cum = None
    banded_now = banded
    prev_ratio = None
    stalled = np.zeros(tb, bool)
    for _ in range(cfg.max_iter):
        # stall detector — see the single-level loop
        r_np = np.asarray(ratio)
        if prev_ratio is not None:
            stalled |= (prev_ratio - r_np) < _STALL_FRAC * np.abs(prev_ratio)
        prev_ratio = r_np
        active = (ratio > termination) & jnp.asarray(~stalled)
        if not bool(jnp.any(active)):
            break
        pts, masks, shift, first, wl, wh, m0, L, cum, banded_now = \
            _banded_guard(pts, masks, shift, first, wl, wh, m0, L, cum,
                          banded_now, active, cfg.n_neighbors, cfg.moll)
        pts, shift, _, L, wl, wh, ratio, it = _contract_step_batch(
            pts, masks, L, wl, wh, shift, zero, ratio, it,
            m0_mean, m0, center, obb_ax, half,
            n_neighbors=cfg.n_neighbors, moll=cfg.moll,
            contraction_factor=contraction,
            max_contraction=cfg.max_contraction,
            max_attraction=cfg.max_attraction,
            termination_ratio=termination, cg_iters=cg_iters_polish,
            banded=banded_now, active=active,
        )
        _prof(f"polish[{int(np.sum(np.asarray(active)))}on]", ratio)
    out = _unpermute_result(SkeletonResult(pts, shift, first, it, ratio), cum)
    if pad:
        out = jax.tree.map(lambda x: x[:t], out)
    return out


class TopologyResult(NamedTuple):
    topology: Topology
    graph: SimplifiedGraph
    fps_idx: Array  # [S] rows of the contracted cloud chosen as vertices
    vertex_cmag: Array  # [S] total contraction magnitude per vertex


def extract_topology(
    contracted: Array,
    mask: Array,
    total_shift: Array,
    graph_k_n: int = 15,
    fps_fraction: float = 0.1,
    min_fps: int = 15,
    dedupe_voxel: float = 0.02,
) -> TopologyResult:
    """FPS → MST → degree-2 contraction (ref ``extract_topology``).

    Host-orchestrated (the FPS sample count depends on the live count, a
    data value) but every kernel is jitted.

    ``dedupe_voxel``: the contracted cloud collapses many points onto nearly
    identical skeleton positions; deduping at this voxel before FPS spends
    the sample budget on distinct skeleton geometry instead of collapsed
    blobs (reduces the near-zero-length topology edges the raw FPS
    produces).
    """
    # near-origin artifact removal (ref :117-122)
    norms = jnp.linalg.norm(contracted, axis=-1)
    mask = mask & (norms > 0.01)
    sample_mask = mask  # FPS candidates; the point->vertex map keeps `mask`
    if dedupe_voxel and dedupe_voxel > 0:
        from pyqsm_tpu.ops.sampling import voxel_downsample

        _, rep_mask, _ = voxel_downsample(contracted, dedupe_voxel, mask)
        sample_mask = mask & rep_mask
    n_live = int(jnp.sum(sample_mask))
    s_real = max(int(n_live * fps_fraction), min_fps)
    s_real = min(s_real, max(n_live, 1))
    # pow2-bucketed compute width: the exact data-dependent sample count
    # compiled every topology kernel (FPS, vertex kNN, Borůvka, degree-2
    # simplify, skeleton_to_qsm) once PER TREE — 7 compiled variants each in
    # a single 8-tree plot run, at axon's minutes-per-compile. FPS is a
    # prefix-stable scan, so the first ``s_real`` picks of a padded run are
    # bit-identical; the pad tail is masked out of every downstream op.
    s = 16
    while s < s_real:
        s *= 2

    fps_idx = farthest_point_sampling(contracted, s, sample_mask)
    verts = contracted[fps_idx]
    vmask = jnp.arange(s) < s_real

    d, idx = knn(verts, verts, min(graph_k_n + 1, s), query_mask=vmask, point_mask=vmask)
    d, idx = d[:, 1:], idx[:, 1:]
    eu, ev, sel, _ = boruvka_mst(idx, d, vmask)
    graph = simplify_degree2(eu, ev, sel, vmask)

    cmag = jnp.linalg.norm(total_shift, axis=-1)[fps_idx]

    # map original points to their nearest skeleton vertex
    _, nearest = knn(contracted, verts, 1, query_mask=mask, point_mask=vmask)
    point_to_vertex = jnp.where(mask, nearest[:, 0], -1)

    topo = Topology(
        vertices=verts,
        vertex_mask=vmask,
        edges=jnp.stack([graph.edge_u, graph.edge_v], axis=1),
        edge_mask=graph.edge_mask,
        point_to_vertex=point_to_vertex,
    )
    return TopologyResult(topo, graph, fps_idx, cmag)


@jax.jit
def skeleton_to_qsm(topo: TopologyResult) -> Cylinders:
    """Cylinders from the simplified skeleton: radius = mean contraction
    magnitude of each edge's member vertices (ref ``skeleton_to_QSM``,
    ``skeletonize.py:402-407``)."""
    g = topo.graph
    verts = topo.topology.vertices
    s = verts.shape[0]
    cmag = topo.vertex_cmag

    # mean contraction per chain (segment mean over chain members)
    key = jnp.where(g.chain_id >= 0, g.chain_id, s)
    csum = jax.ops.segment_sum(jnp.where(g.chain_id >= 0, cmag, 0.0), key, num_segments=s + 1)[:s]
    ccnt = jax.ops.segment_sum((g.chain_id >= 0).astype(jnp.float32), key, num_segments=s + 1)[:s]
    chain_mean = csum / jnp.maximum(ccnt, 1.0)

    u = jnp.clip(g.edge_u, 0, s - 1)
    v = jnp.clip(g.edge_v, 0, s - 1)
    endpoint_mean = 0.5 * (cmag[u] + cmag[v])
    has_chain = g.edge_chain >= 0
    radius = jnp.where(
        has_chain, chain_mean[jnp.clip(g.edge_chain, 0, s - 1)], endpoint_mean
    )

    a = verts[u]
    b = verts[v]
    height = jnp.linalg.norm(b - a, axis=-1)
    axis = (b - a) / jnp.maximum(height, 1e-12)[:, None]
    center = 0.5 * (a + b)
    # prune degenerate edges: shorter than a tenth of the median edge (the
    # FPS/MST junction clutter the reference also produces but never filters)
    med = jnp.median(jnp.where(g.edge_mask, height, jnp.nan))
    med = jnp.nan_to_num(med, nan=0.0)
    m = g.edge_mask & (height > jnp.maximum(0.1 * med, 1e-6))
    return Cylinders(
        center=center,
        axis=axis,
        height=height,
        radius=jnp.where(m, radius, 0.0),
        branch_order=jnp.zeros(center.shape[0], jnp.int32),
        parent=jnp.full(center.shape[0], -1, jnp.int32),
        mask=m,
    )


def skeletonize(
    points: Array,
    mask: Array,
    cfg: SkeletonizeConfig | None = None,
) -> tuple[SkeletonResult, TopologyResult, Cylinders]:
    """Full pipeline: contract → topology → QSM (the route of
    ``find_low_order_branches`` stage 'skeleton')."""
    if cfg is None:
        cfg = SkeletonizeConfig()
    skel = extract_skeleton(points, mask, cfg)
    topo = extract_topology(skel.contracted, mask, skel.total_shift, cfg.graph_k_n)
    cyls = skeleton_to_qsm(topo)
    return skel, topo, cyls
