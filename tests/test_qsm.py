import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.config import Config, SphereConfig, StemConfig
from pyqsm_tpu.models.qsm import generate_qsm, sphere_following_qsm, stem_mask
from tests.conftest import synthetic_branch, synthetic_tree


def test_stem_mask_drops_ground(rng):
    trunk = synthetic_branch(3000, radius=0.3, length=5.0, seed=2)
    ground = np.concatenate(
        [rng.uniform(-3, 3, (2000, 2)), rng.normal(0, 0.01, (2000, 1))], axis=1
    ).astype(np.float32)
    pts = np.concatenate([trunk, ground])
    m = np.asarray(stem_mask(jnp.asarray(pts), jnp.ones(len(pts), bool)))
    # ground is below min_z + 0.5 -> cropped; trunk above survives the angle filter
    assert m[3000:].sum() == 0
    high_trunk = trunk[:, 2] > 0.6
    assert m[:3000][high_trunk].mean() > 0.6


def test_sphere_following_walks_up_trunk():
    pts = synthetic_branch(6000, radius=0.3, length=8.0, seed=3)
    mask = jnp.ones(len(pts), bool)
    seed_rows = np.flatnonzero(pts[:, 2] < 0.5)
    seed = np.full(1024, -1, np.int32)
    seed[:len(seed_rows)] = seed_rows[:1024]
    res = sphere_following_qsm(
        jnp.asarray(pts), mask, jnp.asarray(seed), jnp.asarray(seed >= 0),
        initial_radius=0.3, block_size=1024, max_steps=64,
    )
    n_cyl = int(res.cylinders.count())
    assert n_cyl >= 3
    radii = np.asarray(res.cylinders.radius)[np.asarray(res.cylinders.mask)]
    np.testing.assert_allclose(radii, 0.3, atol=0.08)
    # the walk should claim most of the trunk
    assert float(jnp.sum(res.found)) / len(pts) > 0.5
    # cylinder centers should climb in z
    centers = np.asarray(res.cylinders.center)[np.asarray(res.cylinders.mask)]
    assert centers[:, 2].max() > 4.0


@pytest.mark.slow
def test_generate_qsm_on_tree(tree_points):
    pts = tree_points
    cfg = Config()
    res = generate_qsm(jnp.asarray(pts), jnp.ones(len(pts), bool), cfg,
                       max_steps=128)
    n_cyl = int(res.cylinders.count())
    assert n_cyl >= 2
    mask = np.asarray(res.cylinders.mask)
    radii = np.asarray(res.cylinders.radius)[mask]
    assert (radii >= cfg.sphere.min_radius).all()
    assert (radii <= cfg.sphere.max_radius).all()
    orders = np.asarray(res.cylinders.branch_order)[mask]
    assert orders.min() == 0
    # parent links point at earlier cylinders
    parents = np.asarray(res.cylinders.parent)[mask]
    assert (parents < np.arange(len(parents))).all()


def test_branch_split_creates_orders():
    # Y-shaped tree: trunk + two diverging branches
    trunk = synthetic_branch(3000, radius=0.25, length=4.0, seed=5)
    b1 = synthetic_branch(1500, radius=0.12, length=3.0, axis=[0.7, 0, 0.7],
                          base=[0, 0, 4.0], seed=6)
    b2 = synthetic_branch(1500, radius=0.12, length=3.0, axis=[-0.7, 0, 0.7],
                          base=[0, 0, 4.0], seed=7)
    pts = np.concatenate([trunk, b1, b2])
    mask = jnp.ones(len(pts), bool)
    seed_rows = np.flatnonzero(pts[:, 2] < 0.4)
    seed = np.full(1024, -1, np.int32)
    seed[:len(seed_rows)] = seed_rows[:1024]
    res = sphere_following_qsm(
        jnp.asarray(pts), mask, jnp.asarray(seed), jnp.asarray(seed >= 0),
        initial_radius=0.25, block_size=1024, max_steps=128,
    )
    bo = np.asarray(res.branch_order)
    claimed = bo >= 0
    assert claimed.mean() > 0.4
    # points on the two branches should eventually carry order >= 1
    assert (bo[3000:][claimed[3000:]] >= 1).any()


def test_wave_conflict_resolution():
    """Two fronts whose balls overlap: contested points go to the earlier
    front; no point is claimed twice."""
    from pyqsm_tpu.models.qsm import sphere_following_qsm
    pts = synthetic_branch(4000, radius=0.25, length=6.0, seed=11)
    mask = jnp.ones(len(pts), bool)
    # seed two fronts close together near the base (overlapping ball regions)
    rows_a = np.flatnonzero(pts[:, 2] < 0.4)
    rows_b = np.flatnonzero((pts[:, 2] > 0.3) & (pts[:, 2] < 0.7))
    seed = np.full(1024, -1, np.int32)
    seed[:len(rows_a)] = rows_a[:1024]
    res = sphere_following_qsm(
        jnp.asarray(pts), mask, jnp.asarray(seed), jnp.asarray(seed >= 0),
        0.25, max_steps=32, wave_size=4,
    )
    bo = np.asarray(res.branch_order)
    found = np.asarray(res.found)
    # claims are unique by construction; sanity: found implies either seed or
    # claimed with an order
    assert found.sum() > 500
    res1 = sphere_following_qsm(
        jnp.asarray(pts), mask, jnp.asarray(seed), jnp.asarray(seed >= 0),
        0.25, max_steps=32, wave_size=1,
    )
    # wave_size=1 and wave_size=4 walk the same trunk: similar coverage
    assert abs(int(res1.found.sum()) - int(res.found.sum())) < 0.3 * int(res.found.sum())
