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
    ``GrowthResult`` as the single-chip kernel."""
    axes = tuple(mesh.axis_names)
    n_dev = int(np.prod(mesh.devices.shape))
    n, k = nbr_idx.shape
    pad = (-n) % n_dev
    if pad:
        nbr_idx = jnp.pad(nbr_idx, ((0, pad), (0, 0)), constant_values=-1)
        seed_labels = jnp.pad(seed_labels, (0, pad), constant_values=-1)
        mask = jnp.pad(mask, (0, pad), constant_values=False)

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
    row_spec = NamedSharding(mesh, P(axes))
    nbr_idx = jax.device_put(nbr_idx, NamedSharding(mesh, P(axes, None)))
    seed_labels = jax.device_put(seed_labels, row_spec)
    mask = jax.device_put(mask, row_spec)
    labels, order, cyc, active = jax.jit(fn)(nbr_idx, seed_labels, mask)
    if pad:
        labels, order = labels[:n], order[:n]
    return GrowthResult(labels, order, cyc, active)
