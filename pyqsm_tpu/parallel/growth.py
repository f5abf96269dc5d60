"""Sharded plot-scale region growing.

The REAL isolation kernel (``models/isolation.region_grow``) placed on the
device mesh: the radius-graph rows shard over the point axis, each growth
cycle ``all_gather``s the (small, int32) frontier-label vector over ICI, and
cluster retirement counts reduce with ``psum`` — the multi-chip replacement
for the reference's serial per-cluster KD-tree loop
(``tree_isolation.py:202-261``) and its joblib process pools
(``pipeline.py:113-116``).

Semantics are identical to the single-device ``region_grow`` (same min-id
claim tie-break, same per-cycle retirement rule), so the sharded and
single-chip paths are interchangeable and tested for equality.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyqsm_tpu.models.isolation import GrowthResult

Array = jax.Array
_BIG = jnp.int32(2**30)


def _grow_local(
    nbr_idx: Array,  # [N_local, k] GLOBAL neighbor indices (-1 padded)
    seed_labels: Array,  # [N_local]
    mask: Array,  # [N_local]
    axes: tuple,
    max_cycles: int,
    min_frontier: int,
    cluster_cap: int,
):
    n_local, k = nbr_idx.shape
    c = cluster_cap
    gidx = jnp.maximum(nbr_idx, 0)
    mask_full = jax.lax.all_gather(mask, axes, tiled=True)
    edge = (nbr_idx >= 0) & mask[:, None] & mask_full[gidx]

    labels0 = jnp.where(mask, seed_labels, -1)
    frontier0 = labels0 >= 0
    order0 = jnp.where(frontier0, 0, -1)
    active0 = jnp.ones(c, dtype=bool)  # replicated cluster-activity bits

    def cond(state):
        labels, frontier, order, active, cyc = state
        any_frontier = jax.lax.psum(jnp.sum(frontier.astype(jnp.int32)), axes)
        return (any_frontier > 0) & (cyc < max_cycles)

    def body(state):
        labels, frontier, order, active, cyc = state
        act_self = active[jnp.clip(labels, 0, c - 1)]
        code = jnp.where(frontier & act_self & (labels >= 0), labels, _BIG)
        code_full = jax.lax.all_gather(code, axes, tiled=True)  # [N] int32
        cand = jnp.min(jnp.where(edge, code_full[gidx], _BIG), axis=1)

        unclaimed = mask & (labels < 0)
        newly = unclaimed & (cand < _BIG)
        labels = jnp.where(newly, cand, labels)
        order = jnp.where(newly, cyc + 1, order)

        key = jnp.where(newly, jnp.clip(labels, 0, c - 1), c)
        new_counts = jax.ops.segment_sum(
            newly.astype(jnp.int32), key, num_segments=c + 1
        )[:c]
        new_counts = jax.lax.psum(new_counts, axes)
        active = active & (new_counts >= min_frontier)
        frontier = newly & active[jnp.clip(labels, 0, c - 1)]
        return labels, frontier, order, active, cyc + 1

    labels, _, order, active, cyc = jax.lax.while_loop(
        cond, body, (labels0, frontier0, order0, active0, jnp.int32(0))
    )
    return labels, order, cyc, active


def _grow_local_banded(
    b_w: Array,  # [nb_local, BS, 3·BS] bf16 in-window adjacency (this shard)
    s_i: Array,  # [R] LOCAL spill rows (n_local = dead)
    s_j: Array,  # [R] GLOBAL spill cols
    s_w: Array,  # [R] bf16 0/1
    seed_labels: Array,  # [N_local]
    mask: Array,  # [N_local]
    axes: tuple,
    axis_sizes: tuple,
    max_cycles: int,
    min_frontier: int,
    cluster_cap: int,
):
    """Banded claim step per shard: the min-id claim over frontier
    neighbors is a one-hot OR over the radius graph (see
    ``models/isolation._region_grow_banded``); each cycle all_gathers the
    int32 label codes as before, builds the one-hot window over this
    shard's rows ±one halo block, and rides the banded MXU matmul instead
    of the [N_local, k] gather. Claims are bit-identical to
    ``_grow_local`` (same edge set, same min-id tie-break)."""
    from pyqsm_tpu.ops.sparse import BAND_BLOCK as bs
    from pyqsm_tpu.ops.sparse import _band_apply

    n_local = seed_labels.shape[0]
    c = int(cluster_cap)
    cids = jnp.arange(c, dtype=jnp.int32)
    lin = jnp.int32(0)
    for name, size in zip(axes, axis_sizes):
        lin = lin * size + jax.lax.axis_index(name)
    start = lin * n_local

    labels0 = jnp.where(mask, seed_labels, -1)
    frontier0 = labels0 >= 0
    order0 = jnp.where(frontier0, 0, -1)
    active0 = jnp.ones(c, dtype=bool)

    def cond(state):
        labels, frontier, order, active, cyc = state
        any_frontier = jax.lax.psum(jnp.sum(frontier.astype(jnp.int32)), axes)
        return (any_frontier > 0) & (cyc < max_cycles)

    def body(state):
        labels, frontier, order, active, cyc = state
        act_self = active[jnp.clip(labels, 0, c - 1)]
        code = jnp.where(frontier & act_self & (labels >= 0), labels, _BIG)
        code_full = jax.lax.all_gather(code, axes, tiled=True)  # [N] int32
        n_pad = code_full.shape[0]
        halo = jnp.full(bs, _BIG, jnp.int32)
        padded = jnp.concatenate([halo, code_full, halo])
        win = jax.lax.dynamic_slice(padded, (start,), (n_local + 2 * bs,))
        fw = (win[:, None] == cids[None, :]).astype(jnp.bfloat16)
        y = _band_apply(b_w, fw, prepadded=True)  # [n_local, c] f32
        sj_code = code_full[jnp.clip(s_j, 0, n_pad - 1)]
        contrib = (sj_code[:, None] == cids[None, :]).astype(
            jnp.float32) * s_w.astype(jnp.float32)[:, None]
        y = y + jax.ops.segment_sum(
            contrib, jnp.minimum(s_i, n_local), num_segments=n_local + 1,
            indices_are_sorted=True)[:n_local]
        has = y > 0
        cand = jnp.where(jnp.any(has, axis=1),
                         jnp.argmax(has, axis=1).astype(jnp.int32), _BIG)

        unclaimed = mask & (labels < 0)
        newly = unclaimed & (cand < _BIG)
        labels = jnp.where(newly, cand, labels)
        order = jnp.where(newly, cyc + 1, order)

        key = jnp.where(newly, jnp.clip(labels, 0, c - 1), c)
        new_counts = jax.ops.segment_sum(
            newly.astype(jnp.int32), key, num_segments=c + 1
        )[:c]
        new_counts = jax.lax.psum(new_counts, axes)
        active = active & (new_counts >= min_frontier)
        frontier = newly & active[jnp.clip(labels, 0, c - 1)]
        return labels, frontier, order, active, cyc + 1

    labels, _, order, active, cyc = jax.lax.while_loop(
        cond, body, (labels0, frontier0, order0, active0, jnp.int32(0))
    )
    return labels, order, cyc, active


@partial(jax.jit, static_argnames=("n_dev",))
def _claim_band_shards(nbr_idx: Array, mask: Array, n_dev: int):
    """Per-shard block-banded adjacency of the masked radius graph, built
    OUTSIDE shard_map (vmap over contiguous row shards) so the spill
    overflow stays host-checkable before any lossy solve."""
    from pyqsm_tpu.ops.sparse import build_banded_window

    n, k = nbr_idx.shape
    n_local = n // n_dev
    gidx = jnp.clip(nbr_idx, 0, n - 1)
    edge = (nbr_idx >= 0) & mask[:, None] & mask[gidx]
    idx_e = jnp.where(edge, nbr_idx, -1)
    w_e = edge.astype(jnp.bfloat16)
    starts = jnp.arange(n_dev, dtype=jnp.int32) * n_local
    b_w, s_i, s_j, s_w, over = jax.vmap(
        lambda i_, w_, st: build_banded_window(i_, w_, st, 6 * n_local)
    )(idx_e.reshape(n_dev, n_local, k), w_e.reshape(n_dev, n_local, k),
      starts)
    return b_w, s_i, s_j, s_w, jnp.any(over)


def region_grow_sharded(
    nbr_idx: Array,  # [N, k]
    seed_labels: Array,  # [N]
    mask: Array,  # [N]
    mesh: Mesh,
    max_cycles: int = 200,
    min_frontier: int = 5,
    cluster_cap: int = 1024,
) -> GrowthResult:
    """``region_grow`` over the full device mesh (all axes composite).

    Pads N to a multiple of the device count, shards the graph rows, runs
    the growth loop with ICI label exchange, and returns the same
    ``GrowthResult`` as the single-chip kernel.

    Dispatch mirrors the single-device kernel: with few cluster ids,
    256-aligned shard rows, and rows spatially ordered by the caller
    (build_trees Morton-orders representatives), the per-cycle claim runs
    block-banded on each shard's MXU (`_grow_local_banded`); spill
    overflow (checked host-side — the build happens outside shard_map)
    falls back to the exact gather path."""
    axes = tuple(mesh.axis_names)
    axis_sizes = tuple(int(s) for s in mesh.devices.shape)
    n_dev = int(np.prod(mesh.devices.shape))
    n, k = nbr_idx.shape
    pad = (-n) % n_dev
    if pad:
        nbr_idx = jnp.pad(nbr_idx, ((0, pad), (0, 0)), constant_values=-1)
        seed_labels = jnp.pad(seed_labels, (0, pad), constant_values=-1)
        mask = jnp.pad(mask, (0, pad), constant_values=False)
    n_local = nbr_idx.shape[0] // n_dev

    row_spec = NamedSharding(mesh, P(axes))
    seed_labels = jax.device_put(seed_labels, row_spec)
    mask = jax.device_put(mask, row_spec)

    from pyqsm_tpu.ops.sparse import BAND_BLOCK as _bs

    from pyqsm_tpu.models.isolation import _band_bytes_budget, _band_claim_bytes

    import os

    # per-shard HBM bound: each device holds only its row slice of the band.
    # Opt-in only (PYQSM_CLAIM=band): the banded claim measured 3x slower
    # than the gather kernel on v5e (see models/isolation.region_grow).
    use_band = (os.environ.get("PYQSM_CLAIM") == "band"
                and cluster_cap <= 128 and n_local % _bs == 0
                and nbr_idx.shape[0] >= 32768
                and _band_claim_bytes(n_local, cluster_cap)
                <= _band_bytes_budget())
    if use_band:
        b_w, s_i, s_j, s_w, over = _claim_band_shards(nbr_idx, mask, n_dev)
        use_band = not bool(over)
    if use_band:
        nb_local = n_local // _bs
        r_local = s_i.shape[1]
        fn = shard_map(
            partial(
                _grow_local_banded,
                axes=axes,
                axis_sizes=axis_sizes,
                max_cycles=max_cycles,
                min_frontier=min_frontier,
                cluster_cap=cluster_cap,
            ),
            mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes), P(axes), P(axes), P(axes)),
            out_specs=(P(axes), P(axes), P(), P()),
            check_vma=False,
        )
        labels, order, cyc, active = jax.jit(fn)(
            b_w.reshape(n_dev * nb_local, _bs, 3 * _bs),
            s_i.reshape(n_dev * r_local),
            s_j.reshape(n_dev * r_local),
            s_w.reshape(n_dev * r_local),
            seed_labels, mask)
    else:
        fn = shard_map(
            partial(
                _grow_local,
                axes=axes,
                max_cycles=max_cycles,
                min_frontier=min_frontier,
                cluster_cap=cluster_cap,
            ),
            mesh=mesh,
            in_specs=(P(axes), P(axes), P(axes)),
            out_specs=(P(axes), P(axes), P(), P()),
            check_vma=False,
        )
        nbr_idx = jax.device_put(nbr_idx, NamedSharding(mesh, P(axes, None)))
        labels, order, cyc, active = jax.jit(fn)(nbr_idx, seed_labels, mask)
    if pad:
        labels, order = labels[:n], order[:n]
    return GrowthResult(labels, order, cyc, active)
