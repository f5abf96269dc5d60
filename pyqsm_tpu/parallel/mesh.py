"""Device-mesh construction.

The reference has no distributed backend (SURVEY.md §2c): its parallelism is
joblib process pools and manual 2×3 grid tiling. The TPU equivalents:

- **'trees' axis (DP analog)** — independent trees sharded across devices,
  replacing ``joblib.Parallel(n_jobs=3)`` over per-tree files
  (``pipeline.py:113-116``).
- **'points' axis (TP/SP analog)** — one tree's point tensors sharded across
  devices with ring collectives for neighbor search and psum reductions for
  solves, replacing the 20M-point file tiles and 1/7-overlap grid cells
  (``reconstruction.py:28-32``, ``math_utils/general.py:173-199``) — halo
  exchange in compute instead of overlapping storage.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: dict[str, int] | None = None) -> Mesh:
    """Mesh over all local devices. Default: 1D ('points',)."""
    devices = np.asarray(jax.devices())
    if axis_sizes is None:
        return Mesh(devices, ("points",))
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(f"mesh {axis_sizes} != {len(devices)} devices")
    return Mesh(devices.reshape(sizes), names)


def tree_points_mesh(n_trees_axis: int | None = None) -> Mesh:
    """('trees', 'points') mesh: DP over trees, TP/SP over points.
    Defaults to trees=2 when the device count allows, else trees=1."""
    n = len(jax.devices())
    if n_trees_axis is None:
        n_trees_axis = 2 if n % 2 == 0 and n >= 2 else 1
    return make_mesh({"trees": n_trees_axis, "points": n // n_trees_axis})


def shard_tree_batch(arr: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a [T, N, ...] tree-batch array: trees over 'trees', points over
    'points', feature dims replicated."""
    spec = P("trees", "points", *([None] * (arr.ndim - 2)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
