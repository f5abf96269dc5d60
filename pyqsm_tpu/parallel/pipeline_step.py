"""The sharded multi-tree pipeline step — the framework's "training step".

One jitted ``shard_map`` over a ('trees', 'points') mesh running the full
per-tree inner loop on sharded point tensors:

1. ring-collective kNN over the 'points' axis (the neighbor engine),
2. heat-kernel Laplacian weights from those neighbor lists,
3. one Laplacian-contraction step via sharded Jacobi-PCG
   (all_gather matvecs + psum inner products),
4. a batched RANSAC circle fit scored with psum'd global inlier counts,
5. one DBSCAN-style min-label propagation round.

'trees' is pure data parallelism (independent trees — the joblib
replacement); 'points' carries the collectives over ICI. This is the step
``__graft_entry__.dryrun_multichip`` compiles and runs, and the building
block the plot-scale pipeline shards with.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pyqsm_tpu.parallel.collective_ops import (
    label_prop_round, psum_inlier_count, ring_knn, sharded_cg,
)

Array = jax.Array


def _tree_step_local(
    pts: Array,  # [P_local, 3] this shard of one tree's points
    mask: Array,  # [P_local]
    key: Array,  # [2] u32 (replicated)
    k: int,
    n_hyp: int,
) -> dict[str, Array]:
    axis = "points"
    # 1. neighbor search over the ring
    safe = jnp.where(mask[:, None], pts, 1e6)
    d, idx = ring_knn(safe, safe, mask, k + 1, axis)
    d, idx = d[:, 1:], idx[:, 1:]
    valid = idx >= 0

    # 2. heat-kernel Laplacian weights + mass
    dd = jnp.where(valid, d, 0.0)
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)
    mean_d = jnp.sum(dd, axis=1) / cnt
    sigma2 = jnp.maximum(mean_d * mean_d, 1e-12)
    w = jnp.where(valid, jnp.exp(-(dd * dd) / sigma2[:, None]), 0.0)
    deg = jnp.sum(w, axis=1)
    mass_mean = jax.lax.psum(jnp.sum(jnp.where(mask, mean_d**2, 0.0)), axis) / (
        jax.lax.psum(jnp.sum(mask), axis) + 1e-9
    )

    # 3. one contraction step (sharded PCG on the normal equations)
    wl = jnp.full(pts.shape[0], 3.0 * jnp.sqrt(jnp.maximum(mass_mean, 1e-12)))
    wh = jnp.full(pts.shape[0], 3.0)
    b = (wh * wh)[:, None] * jnp.where(mask[:, None], pts, 0.0)
    contracted = sharded_cg(idx, w, deg, wl, wh, b, axis, iters=15)
    shift = jnp.where(mask[:, None], pts - contracted, 0.0)

    # 4. batched RANSAC circle on the xy projection, global inlier counts.
    # Each shard draws H/n_dev local minimal samples; all_gather makes the
    # hypothesis set identical on every shard so the psum'd scores line up.
    n_local = pts.shape[0]
    probs = jnp.where(mask, 1.0, 0.0)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    n_dev = jax.lax.axis_size(axis)
    h_local = max(n_hyp // n_dev, 1)
    me_fold = jax.random.fold_in(key, jax.lax.axis_index(axis))
    samples = jax.random.choice(me_fold, n_local, shape=(h_local, 3), p=probs)
    tri_local = pts[samples][..., :2]  # [H_local, 3, 2]
    tri = jax.lax.all_gather(tri_local, axis, tiled=True)  # [H, 3, 2]
    a, bb, c = tri[:, 0], tri[:, 1], tri[:, 2]
    dmat = 2.0 * (
        a[:, 0] * (bb[:, 1] - c[:, 1]) + bb[:, 0] * (c[:, 1] - a[:, 1])
        + c[:, 0] * (a[:, 1] - bb[:, 1])
    )
    dmat = jnp.where(jnp.abs(dmat) < 1e-12, jnp.inf, dmat)
    a2 = jnp.sum(a * a, -1); b2 = jnp.sum(bb * bb, -1); c2 = jnp.sum(c * c, -1)
    ux = (a2 * (bb[:, 1] - c[:, 1]) + b2 * (c[:, 1] - a[:, 1]) + c2 * (a[:, 1] - bb[:, 1])) / dmat
    uy = (a2 * (c[:, 0] - bb[:, 0]) + b2 * (a[:, 0] - c[:, 0]) + c2 * (bb[:, 0] - a[:, 0])) / dmat
    centers = jnp.stack([ux, uy], 1)
    radii = jnp.linalg.norm(a - centers, axis=-1)
    resid = jnp.abs(
        jnp.linalg.norm(pts[None, :, :2] - centers[:, None, :], axis=-1) - radii[:, None]
    )
    scores = psum_inlier_count(resid, mask, 0.02, axis)  # [H] global
    best = jnp.argmax(jnp.where(jnp.isfinite(radii), scores, -1))
    fit_radius = radii[best]
    fit_center = centers[best]

    # 5. one label-propagation round (DBSCAN / region-growing primitive)
    me = jax.lax.axis_index(axis)
    gids = me * n_local + jnp.arange(n_local, dtype=jnp.int32)
    labels0 = jnp.where(mask, gids, jnp.int32(2**30))
    labels = label_prop_round(labels0, idx, valid & (d <= 0.5), axis)

    return dict(
        contracted=contracted,
        shift_mag=jnp.linalg.norm(shift, axis=-1),
        nbr_dist_mean=mean_d,
        fit_radius=fit_radius,
        fit_center=fit_center,
        labels=labels,
    )


def multi_tree_pipeline_step(
    mesh: Mesh,
    k: int = 8,
    n_hyp: int = 64,
):
    """Build the jitted sharded step for a [T, N, 3] tree batch.

    Returns ``step(points, mask, key) -> dict`` with inputs sharded
    (trees → 'trees', points → 'points') and per-tree scalar outputs.
    """
    local = partial(_tree_step_local, k=k, n_hyp=n_hyp)

    def per_tree(pts_block, mask_block, key):
        # pts_block: [T_local, P_local, 3] — vmap trees within the shard
        return jax.vmap(lambda p, m: local(p, m, key))(pts_block, mask_block)

    spec_in = P("trees", "points")
    sharded = shard_map(
        per_tree,
        mesh=mesh,
        in_specs=(P("trees", "points", None), spec_in, P()),
        out_specs=dict(
            contracted=P("trees", "points", None),
            shift_mag=spec_in,
            nbr_dist_mean=spec_in,
            fit_radius=P("trees"),
            fit_center=P("trees", None),
            labels=spec_in,
        ),
        check_vma=False,
    )
    return jax.jit(sharded)
