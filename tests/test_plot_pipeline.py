import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.config import IsolationConfig
from pyqsm_tpu.models.plot_pipeline import process_plot


@pytest.mark.slow
def test_process_plot_two_trees(rng):
    def tree(cx, r):
        th = rng.uniform(0, 2 * np.pi, 5000)
        z = rng.uniform(0, 5, 5000)
        return np.stack([cx + (r + rng.normal(0, .005, 5000)) * np.cos(th),
                         (r + rng.normal(0, .005, 5000)) * np.sin(th), z], 1)
    pts = np.concatenate([tree(0, 0.3), tree(7, 0.2)]).astype(np.float32)
    res = process_plot(
        jnp.asarray(pts), jnp.ones(len(pts), bool),
        iso_cfg=IsolationConfig(base_min_points=15, low_pctile=5.0,
                                max_dist=0.3, cycles=300, min_frontier=2),
        skeleton_voxel=0.05, min_tree_points=500,
    )
    assert len(res.trees) == 2
    for tr in res.trees:
        assert int(tr.cylinders.count()) >= 1
        radii = np.asarray(tr.cylinders.radius)[np.asarray(tr.cylinders.mask)]
        assert 0.05 < np.median(radii) < 0.6
    # biggest tree first
    assert res.trees[0].n_points >= res.trees[1].n_points
