import numpy as np
import jax.numpy as jnp

from pyqsm_tpu.models.graph_features import (
    exclude_dense_areas, leaf_mask_by_degree, leaf_mask_by_order_diff,
)
from tests.conftest import synthetic_branch


def branch_plus_foliage(rng):
    # sparse branch surface vs a dense foliage clump (10x density contrast)
    branch = synthetic_branch(600, radius=0.1, length=5.0, seed=3)
    foliage = rng.normal([1.5, 0, 4.0], 0.12, (3000, 3)).astype(np.float32)
    return np.concatenate([branch, foliage])


def test_leaf_mask_by_degree(rng):
    pts = branch_plus_foliage(rng)
    mask = jnp.ones(len(pts), bool)
    leaf, deg = leaf_mask_by_degree(jnp.asarray(pts), mask, radius=0.2,
                                    degree_pctile=20.0)
    leaf = np.asarray(leaf)
    # foliage blob is much denser than the branch surface
    assert leaf[600:].mean() > 0.8
    assert leaf[:600].mean() < 0.2


def test_exclude_dense_areas(rng):
    pts = branch_plus_foliage(rng)
    mask = jnp.ones(len(pts), bool)
    kept = np.asarray(exclude_dense_areas(jnp.asarray(pts), mask, radius=0.2,
                                          degree_pctile=20.0, top_components=2))
    assert kept[:600].mean() > 0.7  # branch survives
    assert kept[600:].mean() < 0.4  # foliage mostly removed


def test_leaf_mask_by_order_diff(rng):
    pts = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    order = np.full(500, 5, np.int32)
    order[:50] = 30  # claimed much later than spatial neighbors
    mask = jnp.ones(500, bool)
    late = np.asarray(leaf_mask_by_order_diff(jnp.asarray(pts), jnp.asarray(order),
                                              mask, radius=0.3, diff_threshold=3.0))
    assert late[:50].mean() > 0.9
    assert late[50:].mean() < 0.1
