"""Statistical outlier removal + the reference's iterated "clean" policy.

Open3D ``remove_statistical_outlier(nb_neighbors, std_ratio)`` semantics
(used in ``point_cloud_processing.py:117-121``): compute each live point's
mean distance to its ``nb_neighbors`` nearest neighbors; remove points whose
mean distance exceeds ``global_mean + std_ratio * global_std``.

``clean_cloud`` mirrors the reference's escalation schedule
(``clean_cloud`` at ``point_cloud_processing.py:97-127``): voxel downsample,
then ``iters`` rounds with neighbors ×2 and ratio ÷1.5 each round.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.neighbors import knn
from pyqsm_tpu.ops.sampling import voxel_downsample

Array = jax.Array


@partial(jax.jit, static_argnames=("nb_neighbors",))
def statistical_outlier_mask(
    points: Array,
    mask: Array,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
) -> Array:
    """Refined mask with statistical outliers removed."""
    d, _ = knn(points, points, nb_neighbors + 1, query_mask=mask, point_mask=mask)
    d = d[:, 1:]  # drop self-match
    finite = jnp.isfinite(d)
    mean_d = jnp.sum(jnp.where(finite, d, 0.0), axis=1) / jnp.maximum(
        jnp.sum(finite, axis=1), 1
    )
    live = mask & (jnp.sum(finite, axis=1) > 0)
    n_live = jnp.maximum(jnp.sum(live), 1)
    mu = jnp.sum(jnp.where(live, mean_d, 0.0)) / n_live
    var = jnp.sum(jnp.where(live, (mean_d - mu) ** 2, 0.0)) / n_live
    thresh = mu + std_ratio * jnp.sqrt(var)
    return mask & jnp.where(live, mean_d <= thresh, False)


def clean_cloud(
    points: Array,
    mask: Array,
    voxel_size: float = 0.04,
    neighbors: int = 2,
    ratio: float = 4.0,
    iters: int = 3,
) -> tuple[Array, Array, Array]:
    """Reference clean policy: voxel downsample then escalating outlier
    removal (neighbors doubles, ratio shrinks /1.5 each iteration).

    Returns ``(points, mask, trace)`` — trace maps original rows to their
    voxel representative (-1 if dropped before voxelization).
    """
    if voxel_size and voxel_size > 0:
        points, mask, trace = voxel_downsample(points, voxel_size, mask)
    else:
        trace = jnp.where(mask, jnp.arange(points.shape[0], dtype=jnp.int32), -1)
    nb, rt = neighbors, ratio
    for _ in range(iters):
        nb = int(nb * 2)
        rt = rt / 1.5
        mask = statistical_outlier_mask(points, mask, nb_neighbors=nb, std_ratio=rt)
    return points, mask, trace
