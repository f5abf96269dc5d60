"""Per-point geometric eigenfeatures + kNN feature smoothing.

Replaces jakteristics' C++ ``compute_features`` (``exploration.py:62-68``)
with one fused pass: neighborhood covariance → closed-form 3×3
eigendecomposition → the standard eigenfeature set, and sklearn-based
``smooth_feature`` (``math_utils/interpolation:6-22``, joblib over 100k
splits) with a single batched gather-mean.

Feature definitions follow the Weinmann et al. conventions jakteristics
implements; NaN backfill mirrors ``replace_nanfeatures``
(``exploration.py:50-60``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.linalg3 import sym_eig3
from pyqsm_tpu.ops.neighbors import knn

Array = jax.Array

FEATURE_NAMES = (
    "verticality",
    "linearity",
    "planarity",
    "surface_variation",
    "anisotropy",
    "sphericity",
    "PCA1",
    "PCA2",
    "omnivariance",
    "eigenentropy",
    "eigenvalue_sum",
)


@partial(jax.jit, static_argnames=("k",))
def compute_features(
    points: Array,
    mask: Array,
    k: int = 25,
) -> dict[str, Array]:
    """All eigenfeatures in one pass. Returns dict name → [N] f32; dead rows 0."""
    _, idx = knn(points, points, k + 1, query_mask=mask, point_mask=mask)
    nbr_idx = idx[:, 1:]
    valid = nbr_idx >= 0
    gidx = jnp.maximum(nbr_idx, 0)
    pts = jnp.where(mask[:, None], points, 0.0)
    nbrs = pts[gidx]
    w = valid[..., None].astype(points.dtype)
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None]
    mean = jnp.sum(nbrs * w, axis=1) / cnt
    centered = (nbrs - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / jnp.maximum(cnt[..., None], 1)
    vals, vecs = sym_eig3(cov)
    # ascending -> use descending λ1 ≥ λ2 ≥ λ3 ≥ 0
    l1, l2, l3 = vals[:, 2], vals[:, 1], vals[:, 0]
    l1 = jnp.maximum(l1, 1e-20)
    l2 = jnp.clip(l2, 0.0, None)
    l3 = jnp.clip(l3, 0.0, None)
    s = jnp.maximum(l1 + l2 + l3, 1e-20)
    e1, e2, e3 = l1 / s, l2 / s, l3 / s
    normal = vecs[..., 0]  # smallest eigenvector
    feats = {
        "verticality": 1.0 - jnp.abs(normal[:, 2]),
        "linearity": (l1 - l2) / l1,
        "planarity": (l2 - l3) / l1,
        "surface_variation": l3 / s,
        "anisotropy": (l1 - l3) / l1,
        "sphericity": l3 / l1,
        "PCA1": e1,
        "PCA2": e2,
        "omnivariance": jnp.cbrt(jnp.maximum(l1 * l2 * l3, 0.0)),
        "eigenentropy": -(
            e1 * jnp.log(jnp.maximum(e1, 1e-20))
            + e2 * jnp.log(jnp.maximum(e2, 1e-20))
            + e3 * jnp.log(jnp.maximum(e3, 1e-20))
        ),
        "eigenvalue_sum": l1 + l2 + l3,
    }
    live = mask & (cnt[:, 0] >= 3)
    return {name: jnp.where(live, v, 0.0) for name, v in feats.items()}


@jax.jit
def replace_nan_features(values: Array, mask: Array) -> Array:
    """NaN → live-mean backfill (ref ``replace_nanfeatures``)."""
    ok = mask & jnp.isfinite(values)
    mean = jnp.sum(jnp.where(ok, values, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
    return jnp.where(mask, jnp.where(jnp.isfinite(values), values, mean), 0.0)


@partial(jax.jit, static_argnames=("k",))
def smooth_feature(
    points: Array,
    values: Array,
    mask: Array,
    k: int = 25,
) -> Array:
    """kNN mean smoothing of a per-point scalar (ref ``smooth_feature``,
    n_nbrs=25; the reference shards queries over 7 processes — here it is
    one batched gather-mean)."""
    _, idx = knn(points, points, k, query_mask=mask, point_mask=mask)
    valid = idx >= 0
    vals = values[jnp.maximum(idx, 0)]
    num = jnp.sum(jnp.where(valid, vals, 0.0), axis=1)
    den = jnp.maximum(jnp.sum(valid, axis=1), 1)
    return jnp.where(mask, num / den, 0.0)


@partial(jax.jit, static_argnames=("k",))
def expand_to_original(
    coarse_points: Array,
    coarse_values: Array,
    coarse_mask: Array,
    full_points: Array,
    full_mask: Array,
    k: int = 1,
) -> Array:
    """Push per-point values from a downsampled cloud back to full
    resolution by nearest-neighbor transfer (ref ``expand_features_to_orig``,
    ``canopy_metrics.py:236-252`` / holden's k=1 matching)."""
    d, idx = knn(full_points, coarse_points, k, query_mask=full_mask,
                 point_mask=coarse_mask)
    valid = idx >= 0
    vals = coarse_values[jnp.maximum(idx, 0)]
    num = jnp.sum(jnp.where(valid, vals, 0.0), axis=1)
    den = jnp.maximum(jnp.sum(valid, axis=1), 1)
    return jnp.where(full_mask, num / den, 0.0)
