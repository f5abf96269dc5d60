"""Normal estimation & orientation.

Replaces Open3D ``estimate_normals`` + ``orient_normals_consistent_tangent_plane``
(``qsm_generation.py:93-94``) with a covariance eigensolve over kNN
neighborhoods and an iterative neighbor-majority sign alignment.
Also the normal-angle stem filter (``point_cloud_processing.py:246-256``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.linalg3 import sym_eig3
from pyqsm_tpu.ops.neighbors import knn

Array = jax.Array


def _neighborhood_cov(points: Array, nbr_idx: Array) -> tuple[Array, Array]:
    """Covariance of each point's neighborhood. nbr_idx [N,k] with -1 padding.
    Returns (cov [N,3,3], n_valid [N])."""
    valid = nbr_idx >= 0
    idx = jnp.maximum(nbr_idx, 0)
    nbrs = points[idx]  # [N, k, 3]
    w = valid[..., None].astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None]
    mean = jnp.sum(nbrs * w, axis=1) / cnt
    centered = (nbrs - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / jnp.maximum(
        cnt[..., None] - 1, 1
    )
    return cov, cnt[:, 0]


@partial(jax.jit, static_argnames=("k", "orient_iters"))
def estimate_normals(
    points: Array,
    mask: Array,
    k: int = 30,
    orient_iters: int = 8,
) -> Array:
    """Per-point unit normals (smallest covariance eigenvector), sign-aligned
    by iterated neighbor-majority voting seeded with +z hemisphere."""
    _, idx = knn(points, points, k + 1, query_mask=mask, point_mask=mask)
    nbr_idx = idx[:, 1:]
    cov, _ = _neighborhood_cov(jnp.where(mask[:, None], points, 0.0), nbr_idx)
    _, vecs = sym_eig3(cov)
    normals = vecs[..., 0]  # smallest eigenvector
    # initial sign: +z hemisphere (ties broken by +x)
    sign = jnp.where(
        jnp.abs(normals[:, 2]) > 1e-6, jnp.sign(normals[:, 2]), jnp.sign(normals[:, 0] + 1e-12)
    )
    normals = normals * sign[:, None]

    valid = nbr_idx >= 0
    gidx = jnp.maximum(nbr_idx, 0)

    def align(normals, _):
        nbr_n = normals[gidx]  # [N, k, 3]
        dots = jnp.sum(nbr_n * normals[:, None, :], axis=-1)
        vote = jnp.sum(jnp.where(valid, jnp.sign(dots), 0.0), axis=1)
        flip = jnp.where(vote < 0, -1.0, 1.0)
        return normals * flip[:, None], None

    normals, _ = jax.lax.scan(align, normals, None, length=orient_iters)
    return jnp.where(mask[:, None], normals, 0.0)


@jax.jit
def angle_to_horizontal(normals: Array) -> Array:
    """Angle (degrees) between the normal and the XY plane — the quantity the
    reference's ``get_angles``/``filter_by_norm`` thresholds
    (``math_utils/general.py:102-124``). Sign-invariant."""
    nz = jnp.abs(normals[:, 2])
    nxy = jnp.sqrt(jnp.maximum(normals[:, 0] ** 2 + normals[:, 1] ** 2, 1e-30))
    return jnp.degrees(jnp.arctan2(nz, nxy))


@jax.jit
def filter_by_norm(normals: Array, mask: Array, angle_cutoff: float = 10.0) -> Array:
    """Keep points whose normals are within ``angle_cutoff`` degrees of
    horizontal — i.e. surfaces of near-vertical structure (stems).
    Matches ``filter_by_norm`` (``point_cloud_processing.py:246-256``)."""
    return mask & (angle_to_horizontal(normals) <= angle_cutoff)
