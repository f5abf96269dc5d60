"""Sphere-following QSM generation.

TPU-native rebuild of ``pyQSM/qsm_generation.py``: the reference's unbounded
python recursion (``sphere_step``, ref :182-316) becomes an explicit
**worklist of branch fronts** — each front is a fixed-capacity index block,
every kernel (RANSAC fit, ball query, branch-split clustering) is jitted with
static shapes, and the host only orchestrates the queue and scalar policy.

Policy parity with the reference:
- circle RANSAC on the current front, threshold 0.04, hypothesis radius gate
  ``last_radius × radius_multiplier`` (ref ``fit_cyl_to_cluster`` :138-179);
  a fit is *good* when radius < ``bad_fit_radius_factor × last_radius``.
- ball search from the front centroid, radius = mean-dist × multiplier,
  clamped to [min_radius, max_radius] (ref ``find_neighbors_in_ball``,
  ``lib_integration.py:81-137``); already-claimed points excluded.
- branch split: DBSCAN after a good fit, k-means sweep after a bad one
  (ref ``choose_and_cluster``, ``fit.py:58-85``); branch ends when fewer
  than ``min_contained_points`` new points are found.
- child radius = mean XY radius of the cluster, clamped to
  [min_radius, max_radius] and to ≥ last_radius/2 (ref :267-272).

``get_stem_pcd`` (ref :71-120) → ``stem_mask``: crop ground +0.5 m, normals,
keep near-vertical-surface points.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.config import Config, DBSCANConfig, SphereConfig, StemConfig
from pyqsm_tpu.ops.cluster import dbscan_from_neighbors, kmeans, silhouette_score
from pyqsm_tpu.ops.geometry import crop_mask

from pyqsm_tpu.ops.normals import estimate_normals, filter_by_norm
from pyqsm_tpu.ops.ransac import CylinderFit, fit_cylinder
from pyqsm_tpu.state import Cylinders

Array = jax.Array


def stem_mask(
    points: Array,
    mask: Array,
    cfg: StemConfig | None = None,
) -> Array:
    """Near-vertical-surface filter (ref ``get_stem_pcd``): crop ground
    +0.5 m, estimate normals, keep points whose normals are within
    ``angle_cutoff`` degrees of horizontal."""
    if cfg is None:
        cfg = StemConfig()
    zmin = jnp.min(jnp.where(mask, points[:, 2], jnp.inf))
    m = crop_mask(points, mask, minz=zmin + 0.5)
    normals = estimate_normals(points, m, k=cfg.normals_nn)
    return filter_by_norm(normals, m, angle_cutoff=cfg.angle_cutoff)


# ---------------------------------------------------------------------------
# jitted per-front kernels (static block size P)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_hypotheses",))
def _fit_front(
    points: Array, fidx: Array, fvalid: Array, key: Array,
    threshold: float, max_radius: Array, min_radius: float,
    n_hypotheses: int = 512,
) -> CylinderFit:
    block = points[jnp.maximum(fidx, 0)]
    return fit_cylinder(
        block, fvalid, key, threshold=threshold,
        n_hypotheses=n_hypotheses, max_radius=max_radius, min_radius=min_radius,
    )


@partial(jax.jit, static_argnames=("cap",))
def _ball_new(
    points: Array, mask: Array, found: Array,
    fidx: Array, fvalid: Array,
    radius_multiplier: float, min_radius: float, max_radius: float,
    last_radius: Array,
    cap: int,
) -> tuple[Array, Array, Array, Array]:
    """Centroid-ball query excluding claimed points. Returns
    (new_idx [cap], new_valid [cap], center [3], radius)."""
    block = points[jnp.maximum(fidx, 0)]
    w = fvalid.astype(points.dtype)[:, None]
    n_f = jnp.maximum(jnp.sum(w), 1.0)
    center = jnp.sum(block * w, axis=0) / n_f
    # reference uses the mean *XY* distance from the centroid (get_radius,
    # math_utils/general.py:162-171); floored at last_radius so a degraded
    # arc-shaped front cannot shrink the search ball below branch scale
    dxy = jnp.sqrt((block[:, 0] - center[0]) ** 2 + (block[:, 1] - center[1]) ** 2)
    mean_d = jnp.sum(dxy * w[:, 0]) / n_f
    mean_d = jnp.maximum(mean_d, last_radius)
    radius = jnp.clip(mean_d * radius_multiplier, min_radius, max_radius)

    d = jnp.linalg.norm(points - center[None, :], axis=-1)
    # an empty front (wave padding) must not claim anything — its centroid
    # would sit at the origin and eat real points
    cand = mask & ~found & (d <= radius) & jnp.any(fvalid)
    score = jnp.where(cand, -d, -jnp.inf)
    top, idx = jax.lax.top_k(score, cap)
    valid = jnp.isfinite(top)
    return jnp.where(valid, idx.astype(jnp.int32), -1), valid, center, radius


@partial(jax.jit, static_argnames=("min_pts", "cap_nbrs"))
def _split_dbscan(
    points: Array, new_idx: Array, new_valid: Array,
    eps: float, min_pts: int, cap_nbrs: int = 32,
) -> Array:
    """DBSCAN within the new-points block; returns labels [cap].

    Density-adaptive, because the walk runs on resolution-laddered clouds
    the reference never sees: eps grows to 2.5× the block's mean NN distance
    (fixed eps=0.1 shatters sparse shells into arc fragments), and
    min_samples shrinks to 15% of the block when the block is small (the
    config value assumes dense full-res trunks; on a 40-point shell it marks
    EVERY point noise and starves the branch)."""
    from pyqsm_tpu.ops.neighbors import knn

    block = points[jnp.maximum(new_idx, 0)]
    nn_d, _ = knn(block, block, 2, query_mask=new_valid, point_mask=new_valid)
    nn = jnp.where(jnp.isfinite(nn_d[:, 1]), nn_d[:, 1], 0.0)
    n_live = jnp.maximum(jnp.sum(new_valid), 1)
    mean_nn = jnp.sum(jnp.where(new_valid, nn, 0.0)) / n_live
    eps_eff = jnp.maximum(eps, 2.5 * mean_nn)
    min_pts_eff = jnp.minimum(
        jnp.int32(min_pts),
        jnp.maximum(jnp.int32(3), (0.15 * n_live).astype(jnp.int32)),
    )
    d, i = knn(block, block, cap_nbrs, query_mask=new_valid, point_mask=new_valid)
    ok = d <= eps_eff
    d = jnp.where(ok, d, jnp.inf)
    i = jnp.where(ok, i, -1)
    # min_pts_eff is data-dependent -> pass an explicit core mask (the
    # min_samples parameter is static)
    n_nbrs = jnp.sum((i >= 0) & new_valid[:, None], axis=1)
    core = new_valid & (n_nbrs >= min_pts_eff)
    return dbscan_from_neighbors(i, d, new_valid, core=core)


@partial(jax.jit, static_argnames=("k", "score_cap"))
def _split_kmeans(points: Array, new_idx: Array, new_valid: Array, k: int,
                  key: Array, score_cap: int = 256):
    block = points[jnp.maximum(new_idx, 0)]
    centers, labels = kmeans(block, new_valid, k, key)
    # silhouette is O(P^2): score a fixed subsample (uniform stride over the
    # block) — the accept/reject threshold is insensitive to subsampling
    p = block.shape[0]
    if p > score_cap:
        stride = p // score_cap
        sub = jnp.arange(score_cap) * stride
        score = silhouette_score(block[sub], labels[sub], new_valid[sub])
    else:
        score = silhouette_score(block, labels, new_valid)
    return labels, score


@jax.jit
def _split_kmeans_sweep(points: Array, new_idx: Array, new_valid: Array,
                        key: Array):
    """The reference's k-means sweep (k ∈ {2,3,4}, ``fit.py:168-214``) in ONE
    dispatch: all three clusterings + silhouettes, one host readback."""
    outs = [_split_kmeans(points, new_idx, new_valid, k, key) for k in (2, 3, 4)]
    labels = jnp.stack([o[0] for o in outs])
    scores = jnp.stack([o[1] for o in outs])
    return labels, scores


@jax.jit
def _cluster_xy_radius(points: Array, idx: Array, sel: Array) -> Array:
    """Mean XY distance from centroid over selected block rows (ref
    ``get_radius`` on the cluster, ``qsm_generation.py:262-272``)."""
    block = points[jnp.maximum(idx, 0)]
    w = sel.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(block[:, 0] * w) / n
    cy = jnp.sum(block[:, 1] * w) / n
    d = jnp.sqrt((block[:, 0] - cx) ** 2 + (block[:, 1] - cy) ** 2)
    return jnp.sum(d * w) / n


@partial(jax.jit, static_argnames=("cap", "min_pts", "n_hypotheses"))
def _qsm_step_fused(
    points: Array, mask: Array, found: Array,
    fidx: Array, fvalid: Array, key: Array,
    last_radius: Array,
    threshold: float, radius_multiplier: float,
    min_radius: float, max_radius: float,
    eps: float, min_pts: int,
    cap: int, n_hypotheses: int = 512,
):
    """One sphere step fused into a single dispatch: RANSAC fit + ball query
    + DBSCAN split + per-step bookkeeping. The host reads back one small
    tuple instead of syncing 6+ kernels (each sync pays tunnel latency on
    remote TPU setups)."""
    fit = _fit_front(points, fidx, fvalid, key,
                     threshold=threshold,
                     max_radius=last_radius * radius_multiplier,
                     min_radius=min_radius,
                     n_hypotheses=n_hypotheses)
    new_idx, new_valid, center, ball_r = _ball_new(
        points, mask, found, fidx, fvalid,
        radius_multiplier, min_radius, max_radius, last_radius, cap=cap,
    )
    labels = _split_dbscan(points, new_idx, new_valid, eps=eps, min_pts=min_pts)
    found = found.at[jnp.maximum(new_idx, 0)].set(
        new_valid | found[jnp.maximum(new_idx, 0)]
    )
    n_front = jnp.sum(fvalid)
    return (
        found,
        dict(radius=fit.radius, axis=fit.axis, center=fit.center,
             height=fit.height, ok=fit.ok, n_inliers=fit.n_inliers,
             n_front=n_front),
        new_idx, new_valid, labels,
    )


@partial(jax.jit, static_argnames=("cap", "min_pts", "n_hypotheses"))
def _qsm_wave_fused(
    points: Array, mask: Array, found: Array,
    fidx: Array, fvalid: Array, keys: Array,  # [W, P], [W, P], [W, 2]
    last_radius: Array,  # [W]
    threshold: float, radius_multiplier: float,
    min_radius: float, max_radius: float,
    eps: float, min_pts: int,
    cap: int, n_hypotheses: int = 512,
):
    """A whole WAVE of fronts in one dispatch: vmapped fit/ball/split with
    claim-conflict resolution (earlier fronts in the wave own contested
    points — mirroring the reference's serial visit order)."""

    def one(fi, fv, key, lr):
        fit = _fit_front(points, fi, fv, key, threshold=threshold,
                         max_radius=lr * radius_multiplier,
                         min_radius=min_radius, n_hypotheses=n_hypotheses)
        new_idx, new_valid, _, _ = _ball_new(
            points, mask, found, fi, fv,
            radius_multiplier, min_radius, max_radius, lr, cap=cap,
        )
        return fit, new_idx, new_valid

    fits, new_idx, new_valid = jax.vmap(one)(fidx, fvalid, keys, last_radius)

    # conflict resolution: the earliest wave slot that claims a point owns it
    w = fidx.shape[0]
    n = points.shape[0]
    owner = jnp.full(n + 1, w, jnp.int32)
    for wi in range(w):  # static, small
        tgt = jnp.where(new_valid[wi], new_idx[wi], n)
        owner = owner.at[tgt].min(wi, mode="drop")
    keep = new_valid & (owner[jnp.maximum(new_idx, 0)] == jnp.arange(w)[:, None])
    new_valid = keep

    # claim + split per front (split after dedup so labels reflect ownership)
    for wi in range(w):
        found = found.at[jnp.maximum(new_idx[wi], 0)].set(
            new_valid[wi] | found[jnp.maximum(new_idx[wi], 0)]
        )
    labels = jax.vmap(
        lambda ni, nv: _split_dbscan(points, ni, nv, eps=eps, min_pts=min_pts)
    )(new_idx, new_valid)
    stats = dict(
        radius=fits.radius, axis=fits.axis, center=fits.center,
        height=fits.height, ok=fits.ok, n_inliers=fits.n_inliers,
        n_front=jnp.sum(fvalid, axis=1),
    )
    # gathered blocks ride the same readback so the host never issues
    # follow-up per-front gathers (merge + child-radius run on numpy)
    blocks = points[jnp.maximum(new_idx, 0)]
    return found, stats, new_idx, new_valid, labels, blocks


@partial(jax.jit, static_argnames=("cap", "chain_steps", "min_pts",
                                   "min_contained", "n_hypotheses"))
def _qsm_chain_fused(
    points: Array, mask: Array, found: Array,
    fidx: Array, fvalid: Array, keys: Array,  # [P], [P], [S, 2]
    last_radius: Array,
    threshold: float, radius_multiplier: float,
    min_radius: float, max_radius: float,
    eps: float, min_pts: int, min_contained: int,
    bad_fit_radius_factor: float,
    cap: int, chain_steps: int = 4, n_hypotheses: int = 512,
):
    """Advance ONE front through up to ``chain_steps`` sequential sphere
    steps in a single dispatch. The walk's trunk/branch phases are chains of
    single fronts, so the per-wave host round-trip (~300 ms on a tunneled
    TPU) dominated; here the single-child advance decision (exactly one
    usable cluster after the split, noise re-attached within branch scale)
    runs device-side, and the host only sees fragmentation points.

    The chain is a ``lax.while_loop`` with early exit: ``chain_steps`` is
    only the BUFFER bound, so a tall trunk climbs in one dispatch while a
    front that fragments on step 1 stops there (the fixed 4-step unrolled
    chain still paid ~5 round-trips on tall trunks — STATUS gap 4)."""
    S = chain_steps
    per0 = dict(
        fidx=jnp.full((S, cap), -1, jnp.int32),
        fvalid=jnp.zeros((S, cap), bool),
        lr=jnp.zeros(S, jnp.float32),
        good=jnp.zeros(S, bool),
        advanced=jnp.zeros(S, bool),
        radius=jnp.zeros(S, jnp.float32),
        axis=jnp.zeros((S, 3), jnp.float32),
        center=jnp.zeros((S, 3), jnp.float32),
        height=jnp.zeros(S, jnp.float32),
        new_idx=jnp.full((S, cap), -1, jnp.int32),
        new_valid=jnp.zeros((S, cap), bool),
        labels=jnp.full((S, cap), -1, jnp.int32),
        blocks=jnp.zeros((S, cap, 3), points.dtype),
        child_r=jnp.zeros(S, jnp.float32),
    )

    def cond(st):
        return st["alive"] & (st["s"] < S)

    def body(st):
        s = st["s"]
        fidx, fvalid = st["fidx"], st["fvalid"]
        last_radius, found = st["lr"], st["found"]
        alive = st["alive"]
        per = st["per"]
        fit = _fit_front(points, fidx, fvalid, keys[s], threshold=threshold,
                         max_radius=last_radius * radius_multiplier,
                         min_radius=min_radius, n_hypotheses=n_hypotheses)
        new_idx, new_valid, _, _ = _ball_new(
            points, mask, found, fidx, fvalid,
            radius_multiplier, min_radius, max_radius, last_radius, cap=cap,
        )
        new_valid = new_valid & alive
        labels = _split_dbscan(points, new_idx, new_valid,
                               eps=eps, min_pts=min_pts)
        found = found.at[jnp.maximum(new_idx, 0)].set(
            new_valid | found[jnp.maximum(new_idx, 0)]
        )
        blocks = points[jnp.maximum(new_idx, 0)]
        n_front = jnp.sum(fvalid)
        n_new = jnp.sum(new_valid)
        good = (
            fit.ok
            & (fit.radius < bad_fit_radius_factor * last_radius)
            & (fit.n_inliers >= jnp.maximum(
                min_contained, (0.25 * n_front).astype(jnp.int32)))
        )
        # per-cluster sizes; usable = clusters big enough to walk
        lab_key = jnp.where(new_valid & (labels >= 0),
                            jnp.clip(labels, 0, cap - 1), cap)
        counts = jax.ops.segment_sum(
            jnp.ones(cap, jnp.int32), lab_key, num_segments=cap + 1)[:cap]
        usable = counts >= min_contained
        n_usable = jnp.sum(usable)
        best_lab = jnp.argmax(counts)
        sel = new_valid & (labels == best_lab)
        # re-attach noise within branch scale of the best centroid
        w = sel.astype(points.dtype)
        n_sel = jnp.maximum(jnp.sum(w), 1.0)
        cent = jnp.sum(blocks * w[:, None], axis=0) / n_sel
        dist_c = jnp.linalg.norm(blocks - cent[None, :], axis=-1)
        near = jnp.maximum(2.2 * last_radius, 0.3)
        sel = sel | (new_valid & (labels < 0) & (dist_c <= near))
        # child radius: mean XY distance from the (re-attached) centroid
        w = sel.astype(points.dtype)
        n_sel = jnp.maximum(jnp.sum(w), 1.0)
        cx = jnp.sum(blocks[:, 0] * w) / n_sel
        cy = jnp.sum(blocks[:, 1] * w) / n_sel
        dxy = jnp.sqrt((blocks[:, 0] - cx) ** 2 + (blocks[:, 1] - cy) ** 2)
        child_r = jnp.clip(jnp.sum(dxy * w) / n_sel, min_radius, max_radius)
        child_r = jnp.maximum(child_r, last_radius / 2.0)
        advanced = alive & (n_new >= min_contained) & (n_usable == 1)
        # compact the child's rows into a fresh front block
        order = jnp.argsort(jnp.where(sel, 0, 1), stable=True)
        child_idx = jnp.where(
            jnp.arange(cap) < jnp.sum(sel), new_idx[order], -1
        ).astype(jnp.int32)
        child_valid = child_idx >= 0

        per = dict(
            fidx=per["fidx"].at[s].set(fidx),
            fvalid=per["fvalid"].at[s].set(fvalid),
            lr=per["lr"].at[s].set(last_radius),
            good=per["good"].at[s].set(good & alive),
            advanced=per["advanced"].at[s].set(advanced),
            radius=per["radius"].at[s].set(fit.radius),
            axis=per["axis"].at[s].set(fit.axis),
            center=per["center"].at[s].set(fit.center),
            height=per["height"].at[s].set(fit.height),
            new_idx=per["new_idx"].at[s].set(new_idx),
            new_valid=per["new_valid"].at[s].set(new_valid),
            labels=per["labels"].at[s].set(labels),
            blocks=per["blocks"].at[s].set(blocks),
            child_r=per["child_r"].at[s].set(child_r),
        )
        return dict(
            s=s + 1, alive=advanced, found=found, per=per,
            fidx=jnp.where(advanced, child_idx, -1),
            fvalid=jnp.where(advanced, child_valid, False),
            lr=child_r,
        )

    st = jax.lax.while_loop(cond, body, dict(
        s=jnp.int32(0), alive=jnp.any(fvalid), found=found, per=per0,
        fidx=fidx, fvalid=fvalid,
        lr=jnp.asarray(last_radius, jnp.float32),
    ))
    return st["found"], st["per"], st["fidx"], st["fvalid"], st["lr"]


# ---------------------------------------------------------------------------
# worklist orchestration
# ---------------------------------------------------------------------------


class Front(NamedTuple):
    idx: Array  # [P] i32
    valid: Array  # [P] bool
    last_radius: float
    branch_order: int
    parent: int  # cylinder id of parent (-1 root)


class QSMResult(NamedTuple):
    cylinders: Cylinders
    found: Array  # [N] bool — points claimed by the QSM walk
    branch_order: Array  # [N] i32 per point (-1 unclaimed)
    n_steps: int


def sphere_following_qsm(
    points: Array,
    mask: Array,
    seed_idx: Array,  # [P] i32 initial front (e.g. trunk-base cluster rows)
    seed_valid: Array,
    initial_radius: float,
    sphere: SphereConfig | None = None,
    dbscan_cfg: DBSCANConfig | None = None,
    block_size: int = 1024,
    max_steps: int = 512,
    max_cylinders: int = 2048,
    seed: int = 0,
    wave_size: int = 4,
    chain_steps: int = 24,
    _resume: dict | None = None,
) -> QSMResult:
    """Run the sphere-following walk from a seed front until exhaustion.

    ``wave_size``: fronts processed per fused dispatch (padded with dead
    fronts so the kernel compiles once); contested claims go to the earliest
    front in the wave, mirroring the reference's serial visit order.

    ``_resume``: continuation state from ``sphere_qsm_forest``'s batched
    climb phase — dict(found, branch_order, queue, cylinders,
    order_updates, steps); seeds are ignored when given."""
    if sphere is None:
        sphere = SphereConfig()
    if dbscan_cfg is None:
        dbscan_cfg = DBSCANConfig()
    n = points.shape[0]
    p = block_size
    key = jax.random.PRNGKey(seed)

    # resolution-aware split scale: the config eps (ref pyqsm_config.toml
    # [dbscan] epsilon=0.1) assumes full-resolution trunks; on the voxel
    # ladder's coarsened clouds the point spacing can exceed it, marking
    # every new shell noise and killing the walk after one step (observed
    # at 10M-pt plots where the ladder lands at ~0.2 m voxels). Floor eps
    # at 2.5x the measured mean nearest-neighbor spacing.
    from pyqsm_tpu.ops.neighbors import knn as _knn

    n_live = int(jnp.sum(mask))
    stride = max(n_live // 2048, 1)
    sample_rows = np.flatnonzero(np.asarray(mask))[::stride][:2048]
    if len(sample_rows):
        sq = points[jnp.asarray(sample_rows)]
        d2, _ = _knn(sq, points, 2, point_mask=mask)
        nn_d = float(jnp.nanmean(jnp.where(jnp.isfinite(d2[:, 1]),
                                           d2[:, 1], jnp.nan)))
    else:
        nn_d = 0.0
    eps_eff = max(dbscan_cfg.epsilon, 2.5 * nn_d)
    if eps_eff > dbscan_cfg.epsilon:
        import dataclasses

        dbscan_cfg = dataclasses.replace(dbscan_cfg, epsilon=eps_eff)

    def pad_front(idx_arr: np.ndarray) -> tuple[Array, Array]:
        k = min(len(idx_arr), p)
        out = np.full(p, -1, np.int32)
        out[:k] = np.asarray(idx_arr[:k], np.int32)
        return jnp.asarray(out), jnp.asarray(out >= 0)

    # the chain kernel's front buffer is block_size wide — normalise the
    # caller's seed-front width to it (extra seeds beyond cap are dropped)
    if seed_idx.shape[0] != p:
        seed_idx, seed_valid = pad_front(
            np.asarray(jnp.where(seed_valid, seed_idx, -1))[
                np.asarray(seed_valid)])

    if _resume is None:
        found = jnp.zeros(n, dtype=bool)
        found = found.at[jnp.maximum(seed_idx, 0)].set(seed_valid)
        branch_order = jnp.full(n, -1, jnp.int32)
        branch_order = branch_order.at[jnp.maximum(seed_idx, 0)].set(
            jnp.where(seed_valid, 0, -1)
        )
        queue: list[Front] = [
            Front(seed_idx, seed_valid, float(initial_radius), 0, -1)]
        cyls: list[dict] = []
        order_updates: list[tuple[np.ndarray, int]] = []
        steps = 0
    else:
        found = _resume["found"]
        branch_order = _resume.get(
            "branch_order", jnp.full(n, -1, jnp.int32))
        queue = list(_resume["queue"])
        cyls = list(_resume.get("cylinders", []))
        order_updates = list(_resume.get("order_updates", []))
        steps = int(_resume.get("steps", 0))

    wave_size = max(int(wave_size), 1)

    def process_front(last_radius, branch_order, cyl_id, good_fit,
                      lab_np, idx_np, nv_np, block_np, k_km):
        _process_front_policy(
            points, sphere, pad_front, queue, order_updates,
            last_radius, branch_order, cyl_id, good_fit,
            lab_np, idx_np, nv_np, block_np, k_km)

    # chain_steps is a buffer bound, not a fixed unroll: the chain
    # while_loop exits as soon as the front fragments, so a tall trunk
    # rides one dispatch
    while queue and steps < max_steps and len(cyls) < max_cylinders:
        if len(queue) == 1 and chain_steps > 1:
            # single live front (trunk/branch climb): advance up to
            # chain_steps sphere steps in ONE dispatch + ONE readback —
            # the per-dispatch tunnel round-trip dominated this phase
            front = queue.pop(0)
            key, k_fit, k_km = jax.random.split(key, 3)
            keys_c = jax.random.split(k_fit, chain_steps)
            found, st_d, f_idx, f_valid, f_lr = _qsm_chain_fused(
                points, mask, found, front.idx, front.valid, keys_c,
                jnp.asarray(front.last_radius, jnp.float32),
                threshold=0.04,
                radius_multiplier=sphere.radius_multiplier,
                min_radius=sphere.min_radius, max_radius=sphere.max_radius,
                eps=dbscan_cfg.epsilon, min_pts=dbscan_cfg.min_neighbors,
                min_contained=sphere.min_contained_points,
                bad_fit_radius_factor=sphere.bad_fit_radius_factor,
                cap=p, chain_steps=chain_steps,
            )
            st, f_idx_np, f_valid_np, f_lr_np = jax.device_get(
                (st_d, f_idx, f_valid, f_lr))
            parent = front.parent
            order = front.branch_order
            stopped = False
            for s in range(chain_steps):
                if int(st["fvalid"][s].sum()) == 0:
                    stopped = True
                    break
                steps += 1
                good = bool(st["good"][s])
                if good:
                    cyls.append(dict(
                        center=st["center"][s], axis=st["axis"][s],
                        height=float(st["height"][s]),
                        radius=float(st["radius"][s]),
                        branch_order=order, parent=parent,
                    ))
                    parent = len(cyls) - 1
                if bool(st["advanced"][s]):
                    rows = st["new_idx"][s][st["new_valid"][s]]
                    if len(rows):
                        order_updates.append((rows.copy(), order))
                    continue
                # chain stopped: run the host fragmentation policy here
                process_front(float(st["lr"][s]), order, parent, good,
                              st["labels"][s].copy(), st["new_idx"][s],
                              st["new_valid"][s], st["blocks"][s], k_km)
                stopped = True
                break
            if not stopped and f_valid_np.any():
                # every step advanced: re-enqueue the live chain tail
                queue.append(Front(jnp.asarray(f_idx_np),
                                   jnp.asarray(f_valid_np),
                                   float(f_lr_np), order, parent))
            continue

        # one fused dispatch per WAVE of up to `wave_size` fronts: vmapped
        # fit + ball + claim (conflicts resolved by wave order) + splits;
        # a single host readback drives all policy decisions. The wave is
        # padded to exactly `wave_size` with dead fronts so the kernel
        # compiles once.
        wave = [queue.pop(0) for _ in range(min(wave_size, len(queue)))]
        steps += len(wave)
        dummy = Front(jnp.full(p, -1, jnp.int32), jnp.zeros(p, bool), 1.0, 0, -1)
        padded = wave + [dummy] * (wave_size - len(wave))
        key, k_fit, k_km = jax.random.split(key, 3)
        keys = jax.random.split(k_fit, wave_size)
        fidx_w = jnp.stack([f.idx for f in padded])
        fvalid_w = jnp.stack([f.valid for f in padded])
        lastr_w = jnp.asarray([f.last_radius for f in padded], jnp.float32)

        found, stats, new_idx_w, new_valid_w, labels_w, blocks_w = _qsm_wave_fused(
            points, mask, found, fidx_w, fvalid_w, keys, lastr_w,
            threshold=0.04,
            radius_multiplier=sphere.radius_multiplier,
            min_radius=sphere.min_radius, max_radius=sphere.max_radius,
            eps=dbscan_cfg.epsilon, min_pts=dbscan_cfg.min_neighbors,
            cap=p,
        )
        # ONE host round-trip per wave: on remote-tunnel TPUs each transfer
        # pays full link latency, so fetching stats/labels/indices separately
        # dominated the walk (~500 ms/wave measured)
        stats_host, labels_np, idx_np_w, nv_np_w, blocks_np = jax.device_get(
            (stats, labels_w, new_idx_w, new_valid_w, blocks_w)
        )

        for wi, front in enumerate(wave):
            n_front = int(stats_host["n_front"][wi])
            good_fit = (
                bool(stats_host["ok"][wi])
                and float(stats_host["radius"][wi]) < sphere.bad_fit_radius_factor * front.last_radius
                and int(stats_host["n_inliers"][wi]) >= max(
                    sphere.min_contained_points, int(0.25 * n_front))
            )
            if good_fit:
                cyls.append(
                    dict(
                        center=stats_host["center"][wi],
                        axis=stats_host["axis"][wi],
                        height=float(stats_host["height"][wi]),
                        radius=float(stats_host["radius"][wi]),
                        branch_order=front.branch_order,
                        parent=front.parent,
                    )
                )
            cyl_id = len(cyls) - 1 if good_fit else front.parent
            process_front(front.last_radius, front.branch_order, cyl_id,
                          good_fit, labels_np[wi].copy(), idx_np_w[wi],
                          nv_np_w[wi], blocks_np[wi], k_km)

    # apply branch-order writes in one batch at the end
    for rows, child_order in order_updates:
        branch_order = branch_order.at[jnp.asarray(rows)].set(child_order)
    return QSMResult(_pack_cylinders(cyls, max_cylinders), found, branch_order, steps)


def sphere_qsm_forest(
    points_t: Array,  # [T, Np, 3] padded per-tree clouds
    mask_t: Array,  # [T, Np]
    seed_idx_t: Array,  # [T, P]
    seed_valid_t: Array,  # [T, P]
    initial_radius_t,  # [T] floats
    sphere: SphereConfig | None = None,
    dbscan_cfg: DBSCANConfig | None = None,
    block_size: int = 1024,
    max_steps: int = 512,
    max_cylinders: int = 2048,
    seeds: list[int] | None = None,
    mesh=None,
    chain_steps: int = 24,
) -> list[QSMResult]:
    """Sphere-following QSM over a FOREST: the trunk/branch climb runs as a
    ``trees``-axis data-parallel batch — every tree's chain advances in ONE
    fused dispatch per round (vmapped ``_qsm_chain_fused``; with ``mesh``,
    shard_mapped over the ``trees`` axis), the same DP dimension the batched
    contraction uses. Fragmented trees fall back to the per-tree wave walk
    (``sphere_following_qsm(_resume=...)``) for their branch tails.

    Per-tree results are invariant to batching: forest([A, B]) equals
    forest([A]) + forest([B]) given the same per-tree ``seeds`` (tested).

    Ref: the per-tree outer loop of ``qsm_generation.py:182-316`` — the
    reference has no multi-tree batching at all (joblib at best,
    ``pipeline.py:113-116``)."""
    if sphere is None:
        sphere = SphereConfig()
    if dbscan_cfg is None:
        dbscan_cfg = DBSCANConfig()
    t_real = points_t.shape[0]
    p = block_size
    if seeds is None:
        seeds = [i for i in range(t_real)]

    # the chain kernel's front buffer is block_size wide — normalise the
    # caller's seed-front width to it (extra seeds beyond cap are dropped,
    # matching the single-tree walk's pad_front)
    pw = seed_idx_t.shape[1]
    if pw < p:
        seed_idx_t = jnp.pad(seed_idx_t, ((0, 0), (0, p - pw)),
                             constant_values=-1)
        seed_valid_t = jnp.pad(seed_valid_t, ((0, 0), (0, p - pw)))
    elif pw > p:
        seed_idx_t = seed_idx_t[:, :p]
        seed_valid_t = seed_valid_t[:, :p]

    # pad the tree axis so it shards evenly over the mesh
    t_pad = t_real
    if mesh is not None:
        tdev = int(mesh.shape["trees"]) if hasattr(mesh, "shape") else 1
        t_pad = -(-t_real // tdev) * tdev
    if t_pad > t_real:
        z = t_pad - t_real
        points_t = jnp.concatenate(
            [points_t, jnp.zeros((z,) + points_t.shape[1:],
                                 points_t.dtype)])
        mask_t = jnp.concatenate([mask_t, jnp.zeros((z,) + mask_t.shape[1:],
                                                    bool)])
        seed_idx_t = jnp.concatenate(
            [seed_idx_t, jnp.full((z, seed_idx_t.shape[1]), -1, jnp.int32)])
        seed_valid_t = jnp.concatenate(
            [seed_valid_t, jnp.zeros((z, seed_valid_t.shape[1]), bool)])
        initial_radius_t = list(initial_radius_t) + [1.0] * z

    T = t_pad
    n = points_t.shape[1]

    # per-tree eps floor (same rule as the single-tree walk)
    import dataclasses

    from pyqsm_tpu.ops.neighbors import knn as _knn

    eps_list = []
    for i in range(T):
        if i >= t_real:
            eps_list.append(dbscan_cfg.epsilon)
            continue
        m_np = np.asarray(mask_t[i])
        live = np.flatnonzero(m_np)
        if len(live) == 0:
            eps_list.append(dbscan_cfg.epsilon)
            continue
        stride = max(len(live) // 2048, 1)
        sq = points_t[i][jnp.asarray(live[::stride][:2048])]
        d2, _ = _knn(sq, points_t[i], 2, point_mask=mask_t[i])
        nn_d = float(jnp.nanmean(jnp.where(jnp.isfinite(d2[:, 1]),
                                           d2[:, 1], jnp.nan)))
        eps_list.append(max(dbscan_cfg.epsilon, 2.5 * nn_d))
    eps_t = jnp.asarray(eps_list, jnp.float32)

    def chain_one(pts, msk, fnd, fidx, fvalid, keys, lr, eps):
        return _qsm_chain_fused(
            pts, msk, fnd, fidx, fvalid, keys, lr,
            threshold=0.04, radius_multiplier=sphere.radius_multiplier,
            min_radius=sphere.min_radius, max_radius=sphere.max_radius,
            eps=eps, min_pts=dbscan_cfg.min_neighbors,
            min_contained=sphere.min_contained_points,
            bad_fit_radius_factor=sphere.bad_fit_radius_factor,
            cap=p, chain_steps=chain_steps,
        )

    chain_batched = jax.vmap(chain_one)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        chain_batched = jax.jit(shard_map(
            chain_batched, mesh=mesh,
            in_specs=(P("trees"),) * 8,
            out_specs=jax.tree.map(lambda _: P("trees"),
                                   jax.eval_shape(
                                       jax.vmap(chain_one), points_t, mask_t,
                                       jnp.zeros((T, n), bool),
                                       seed_idx_t, seed_valid_t,
                                       jnp.zeros((T, chain_steps, 2),
                                                 jnp.uint32),
                                       jnp.ones(T, jnp.float32), eps_t)),
            check_vma=False,
        ))

    # seed state
    found_t = jax.vmap(
        lambda f, si, sv: f.at[jnp.maximum(si, 0)].set(
            sv | f[jnp.maximum(si, 0)])
    )(jnp.zeros((T, n), bool), seed_idx_t, seed_valid_t)
    order0 = [
        np.where(
            np.asarray(
                jnp.zeros(n, jnp.int32).at[jnp.maximum(seed_idx_t[i], 0)].set(
                    seed_valid_t[i].astype(jnp.int32))) > 0, 0, -1
        ).astype(np.int32)
        for i in range(T)
    ]

    def pad_front_for(_):
        def pad_front(idx_arr: np.ndarray):
            k = min(len(idx_arr), p)
            out = np.full(p, -1, np.int32)
            out[:k] = np.asarray(idx_arr[:k], np.int32)
            return jnp.asarray(out), jnp.asarray(out >= 0)
        return pad_front

    key_state = [jax.random.PRNGKey(sd) for sd in seeds] + [
        jax.random.PRNGKey(10**6 + i) for i in range(T - t_real)]
    climbing = [bool(seed_valid_t[i].any()) and i < t_real for i in range(T)]
    queues: list[list[Front]] = [[] for _ in range(T)]
    cyls_t: list[list[dict]] = [[] for _ in range(T)]
    order_up_t: list[list] = [[] for _ in range(T)]
    parents = [-1] * T
    orders = [0] * T
    steps_t = [0] * T
    km_keys = [None] * T

    fidx_t = seed_idx_t
    fvalid_t = jnp.where(jnp.asarray(climbing)[:, None], seed_valid_t, False)
    lr_t = jnp.asarray(np.asarray(initial_radius_t, np.float32))

    max_rounds = -(-max_steps // chain_steps) + 1
    for _ in range(max_rounds):
        if not any(climbing):
            break
        keys_rows = []
        for i in range(T):
            key_state[i], k_fit, k_km = jax.random.split(key_state[i], 3)
            km_keys[i] = k_km
            keys_rows.append(jax.random.split(k_fit, chain_steps))
        keys_t = jnp.stack(keys_rows)
        found_t, st_d, f_idx_d, f_valid_d, f_lr_d = chain_batched(
            points_t, mask_t, found_t, fidx_t, fvalid_t, keys_t, lr_t, eps_t)
        st, f_idx, f_valid, f_lr = jax.device_get(
            (st_d, f_idx_d, f_valid_d, f_lr_d))

        fidx_host = np.asarray(fidx_t).copy()
        fvalid_host = np.asarray(fvalid_t).copy()
        lr_host = np.asarray(lr_t).copy()
        for i in range(T):
            if not climbing[i]:
                continue
            parent, order = parents[i], orders[i]
            stopped = False
            pad_front = pad_front_for(i)
            for s in range(chain_steps):
                if int(st["fvalid"][i, s].sum()) == 0:
                    stopped = True
                    break
                steps_t[i] += 1
                good = bool(st["good"][i, s])
                if good:
                    cyls_t[i].append(dict(
                        center=st["center"][i, s], axis=st["axis"][i, s],
                        height=float(st["height"][i, s]),
                        radius=float(st["radius"][i, s]),
                        branch_order=order, parent=parent,
                    ))
                    parent = len(cyls_t[i]) - 1
                if bool(st["advanced"][i, s]):
                    rows = st["new_idx"][i, s][st["new_valid"][i, s]]
                    if len(rows):
                        order_up_t[i].append((rows.copy(), order))
                    continue
                _process_front_policy(
                    points_t[i], sphere, pad_front, queues[i], order_up_t[i],
                    float(st["lr"][i, s]), order, parent, good,
                    st["labels"][i, s].copy(), st["new_idx"][i, s],
                    st["new_valid"][i, s], st["blocks"][i, s], km_keys[i])
                stopped = True
                break
            parents[i], orders[i] = parent, order
            if (not stopped and f_valid[i].any()
                    and steps_t[i] < max_steps
                    and len(cyls_t[i]) < max_cylinders):
                fidx_host[i] = f_idx[i]
                fvalid_host[i] = f_valid[i]
                lr_host[i] = f_lr[i]
            else:
                climbing[i] = False
                fvalid_host[i] = False
        fidx_t = jnp.asarray(fidx_host)
        fvalid_t = jnp.asarray(fvalid_host)
        lr_t = jnp.asarray(lr_host)

    # per-tree continuation for fragmented trees; direct packaging otherwise
    results: list[QSMResult] = []
    for i in range(t_real):
        bo = jnp.asarray(order0[i])
        if queues[i] and steps_t[i] < max_steps:
            res = sphere_following_qsm(
                points_t[i], mask_t[i],
                seed_idx_t[i], seed_valid_t[i], float(lr_t[i]),
                sphere=sphere, dbscan_cfg=dbscan_cfg, block_size=p,
                max_steps=max_steps, max_cylinders=max_cylinders,
                seed=seeds[i] if i < len(seeds) else i,
                chain_steps=chain_steps,
                _resume=dict(found=found_t[i], branch_order=bo,
                             queue=queues[i], cylinders=cyls_t[i],
                             order_updates=order_up_t[i], steps=steps_t[i]),
            )
            results.append(res)
        else:
            for rows, child_order in order_up_t[i]:
                bo = bo.at[jnp.asarray(rows)].set(child_order)
            results.append(QSMResult(
                _pack_cylinders(cyls_t[i], max_cylinders),
                found_t[i], bo, steps_t[i]))
    return results


def _process_front_policy(points, sphere, pad_front, queue, order_updates,
                          last_radius, branch_order, cyl_id, good_fit,
                          lab_np, idx_np, nv_np, block_np, k_km):
    """Host fragmentation policy for one front's new points: k-means sweep
    on bad fits, centroid merge, noise re-attach, children enqueued onto
    ``queue``. Shared by the wave path, the chain stop step, and the
    batched forest climb (``sphere_qsm_forest``)."""
    n_new = int(nv_np.sum())
    if n_new < sphere.min_contained_points:
        return
    if not good_fit:
        # bad fit: the reference switches to a k-means sweep
        # (branches likely split) — one fused dispatch + one readback
        sweep_lab, sweep_score = jax.device_get(_split_kmeans_sweep(
            points, jnp.asarray(idx_np), jnp.asarray(nv_np), k_km))
        bi = int(np.argmax(sweep_score))
        if float(sweep_score[bi]) > 0.4:
            lab_np = np.asarray(sweep_lab[bi])
    # merge clusters whose centroids are within branch scale of each
    # other: arc fragments of one ring are one branch, not a split
    lab_np = _merge_close_clusters(
        block_np, lab_np,
        merge_dist=max(2.2 * last_radius, 0.15),
    )
    usable = [
        lab for lab in np.unique(lab_np[lab_np >= 0])
        if (lab_np == lab).sum() >= sphere.min_contained_points
    ]
    if not usable:
        # fragmentation fallback: advance with the whole new set as
        # one front rather than stalling the branch
        lab_np = np.where(nv_np, 0, -1)
        usable = [0]
    else:
        # re-attach DBSCAN noise to the nearest usable cluster within
        # branch scale: on laddered (sparse) clouds the split marks
        # shell stragglers noise, and dropping them starves the walk
        noise = nv_np & (lab_np < 0)
        if noise.any():
            cents = np.stack([
                block_np[lab_np == lab].mean(axis=0) for lab in usable
            ])
            dd = np.linalg.norm(
                block_np[noise][:, None, :] - cents[None, :, :], axis=-1)
            nearest = np.argmin(dd, axis=1)
            close = dd[np.arange(len(nearest)), nearest] <= max(
                2.2 * last_radius, 0.3)
            tgt = np.where(close, np.asarray(usable)[nearest], -1)
            lab_np = lab_np.copy()
            lab_np[np.flatnonzero(noise)] = tgt
    for li, lab in enumerate(usable):
        sel = lab_np == lab
        rows = idx_np[sel]
        if len(rows) < sphere.min_contained_points:
            continue
        # mean XY distance from the cluster centroid (ref get_radius,
        # qsm_generation.py:262-272) — host numpy on the prefetched block
        cb = block_np[sel]
        cr = float(np.mean(np.hypot(cb[:, 0] - cb[:, 0].mean(),
                                    cb[:, 1] - cb[:, 1].mean())))
        cr = min(max(cr, sphere.min_radius), sphere.max_radius)
        cr = max(cr, last_radius / 2.0)
        child_order = branch_order + (1 if li > 0 else 0)
        order_updates.append((rows.copy(), child_order))
        fidx, fvalid = pad_front(rows)
        queue.append(Front(fidx, fvalid, cr, child_order, cyl_id))


def _merge_close_clusters(
    block: np.ndarray, labels: np.ndarray, merge_dist: float
) -> np.ndarray:
    """Union clusters whose centroids are closer than ``merge_dist`` (host
    side; cluster counts here are tiny)."""
    ids = np.unique(labels[labels >= 0])
    if len(ids) <= 1:
        return labels
    cents = np.stack([block[labels == i].mean(axis=0) for i in ids])
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if np.linalg.norm(cents[a] - cents[b]) < merge_dist:
                ra, rb = find(int(ids[a])), find(int(ids[b]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    out = labels.copy()
    for i in ids:
        out[labels == i] = find(int(i))
    return out


def _pack_cylinders(cyls: list[dict], capacity: int) -> Cylinders:
    m = len(cyls)
    cap = max(capacity, m, 1)
    center = np.zeros((cap, 3), np.float32)
    axis = np.zeros((cap, 3), np.float32)
    height = np.zeros(cap, np.float32)
    radius = np.zeros(cap, np.float32)
    order = np.zeros(cap, np.int32)
    parent = np.full(cap, -1, np.int32)
    for i, c in enumerate(cyls):
        center[i] = c["center"]
        axis[i] = c["axis"]
        height[i] = c["height"]
        radius[i] = c["radius"]
        order[i] = c["branch_order"]
        parent[i] = c["parent"]
    mask = np.arange(cap) < m
    return Cylinders(
        center=jnp.asarray(center), axis=jnp.asarray(axis),
        height=jnp.asarray(height), radius=jnp.asarray(radius),
        branch_order=jnp.asarray(order), parent=jnp.asarray(parent),
        mask=jnp.asarray(mask),
    )


def generate_qsm(
    points: Array,
    mask: Array,
    cfg: Config | None = None,
    block_size: int = 1024,
    max_steps: int = 512,
    seed: int = 0,
) -> QSMResult:
    """Staged single-tree QSM (ref ``find_low_order_branches``,
    ``qsm_generation.py:319-502``): stem filter → trunk-base percentile crop
    + largest cluster → seed front → sphere-following walk."""
    from pyqsm_tpu.ops.cluster import largest_cluster_mask
    from pyqsm_tpu.ops.geometry import percentile_mask

    if cfg is None:
        cfg = Config()
    stem = stem_mask(points, mask, cfg.stem)
    # fall back to the full cloud if the stem filter is degenerate
    if int(jnp.sum(stem)) < cfg.sphere.min_contained_points:
        stem = mask

    z = points[:, 2]
    low = percentile_mask(z, stem, cfg.trunk.lower_pctile, cfg.trunk.upper_pctile)
    _, trunk = largest_cluster_mask(
        points, low, eps=cfg.trunk.cluster_eps,
        min_samples=cfg.trunk.cluster_nn, neighbor_cap=64,
    )
    rows = np.flatnonzero(np.asarray(trunk))
    if len(rows) == 0:
        rows = np.flatnonzero(np.asarray(stem))[:block_size]
    seed_idx = np.full(block_size, -1, np.int32)
    seed_idx[: min(len(rows), block_size)] = rows[:block_size]
    seed_valid = jnp.asarray(seed_idx >= 0)
    init_r = float(_cluster_xy_radius(points, jnp.asarray(seed_idx), seed_valid))
    init_r = min(max(init_r, cfg.sphere.min_radius), cfg.sphere.max_radius)

    return sphere_following_qsm(
        points, stem, jnp.asarray(seed_idx), seed_valid, init_r,
        sphere=cfg.sphere, dbscan_cfg=cfg.dbscan,
        block_size=block_size, max_steps=max_steps, seed=seed,
    )
