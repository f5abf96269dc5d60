import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqsm_tpu.ops.area import rasterized_area, convex_hull_area_2d, width_p95
from pyqsm_tpu.models.canopy import (
    get_shift, identify_epiphytes, width_at_height, project_in_slices,
    project_components_in_clusters, canopy_metrics,
)
from pyqsm_tpu.models.segmentation import (
    classify_wood_leaf, train_classifier, predict, stack_features,
)
from pyqsm_tpu.ops.features import compute_features
from tests.conftest import synthetic_branch, synthetic_tree


def test_rasterized_area_square(rng):
    # unit square, dense sampling: area ~ 1
    pts = np.concatenate([rng.uniform(0, 1, (5000, 2)), np.zeros((5000, 1))], 1)
    a = float(rasterized_area(jnp.asarray(pts.astype(np.float32)),
                              jnp.ones(5000, bool), cell=0.05))
    assert a == pytest.approx(1.0, rel=0.15)


def test_rasterized_area_vs_delaunay_oracle(rng):
    # disc sampling: compare to exact area pi r^2 and to a Delaunay fan
    r = 1.5
    th = rng.uniform(0, 2 * np.pi, 4000)
    rad = r * np.sqrt(rng.uniform(0, 1, 4000))
    pts = np.stack([rad * np.cos(th), rad * np.sin(th), np.zeros(4000)], 1)
    a = float(rasterized_area(jnp.asarray(pts.astype(np.float32)),
                              jnp.ones(4000, bool), cell=0.06, close_iters=1))
    exact = np.pi * r * r
    assert a == pytest.approx(exact, rel=0.1)
    from scipy.spatial import Delaunay
    tri = Delaunay(pts[:, :2])
    v = pts[:, :2][tri.simplices]
    e1, e2 = v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]
    tri_area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]).sum()
    assert a == pytest.approx(tri_area, rel=0.1)


def test_hull_area(rng):
    pts = np.concatenate([rng.uniform(0, 2, (2000, 2)), np.zeros((2000, 1))], 1)
    a = float(convex_hull_area_2d(jnp.asarray(pts.astype(np.float32)),
                                  jnp.ones(2000, bool)))
    from scipy.spatial import ConvexHull
    ref = ConvexHull(pts[:, :2]).volume
    assert a == pytest.approx(ref, rel=0.02)


def test_width_p95(rng):
    th = rng.uniform(0, 2 * np.pi, 500)
    pts = np.stack([np.cos(th), np.sin(th), np.zeros(500)], 1).astype(np.float32)
    w = float(width_p95(jnp.asarray(pts), jnp.ones(500, bool)))
    assert 1.7 < w < 2.01  # p95 of pairwise dists on a unit circle ≈ 1.95


def test_width_at_height(rng):
    pts = synthetic_branch(5000, radius=0.3, length=4.0)
    w = width_at_height(jnp.asarray(pts), jnp.ones(len(pts), bool), height=1.37)
    assert w == pytest.approx(0.6, abs=0.05)  # diameter of the trunk


def test_identify_epiphytes_split_fractions(rng):
    n = 1000
    shift = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    shift[:350] *= 10  # high contraction part
    split = identify_epiphytes(jnp.asarray(shift), jnp.ones(n, bool))
    epis = np.asarray(split.epis); leaves = np.asarray(split.leaves)
    wood = np.asarray(split.wood)
    assert not (epis & leaves).any() and not (epis & wood).any()
    assert (epis | leaves | wood).all()
    assert abs(wood.mean() - 0.65) < 0.03
    # high-contraction part splits 60/40 into leaves(high z)/epis
    assert abs(leaves.sum() / (epis.sum() + leaves.sum()) - 0.4) < 0.05


def test_get_shift_on_branch():
    pts = synthetic_branch(1500, radius=0.3, length=4.0, seed=9)
    shift = get_shift(jnp.asarray(pts), jnp.ones(len(pts), bool))
    s = np.asarray(shift)
    assert np.isfinite(s).all()
    # one iteration contracts inward: mean magnitude modest but nonzero
    mags = np.linalg.norm(s, axis=1)
    assert 0.001 < np.median(mags) < 0.5


def test_project_in_slices(rng):
    pts = rng.uniform(0, 1, (5000, 3)).astype(np.float32) * np.array([2, 2, 10], np.float32)
    areas = project_in_slices(jnp.asarray(pts), jnp.ones(5000, bool), cell=0.1)
    assert len(areas) == 5
    for a in areas:
        assert a == pytest.approx(4.0, rel=0.3)


def test_canopy_metrics_end_to_end(tree_points):
    m = canopy_metrics(jnp.asarray(tree_points), jnp.ones(len(tree_points), bool))
    assert set(m["classes"]) == {"epis", "leaves", "wood"}
    assert m["width_at_bh"] > 0
    assert len(m["slice_areas"]) == 5
    total = sum(m["counts"].values())
    assert total == len(tree_points)


def test_classifier_separates_line_vs_ball(rng):
    n = 800
    line = np.stack([np.linspace(0, 5, n), np.zeros(n), np.zeros(n)], 1)
    line += rng.normal(0, 0.002, line.shape)
    ball = rng.normal(0, 0.3, (n, 3)) + [10, 0, 0]
    pts = np.concatenate([line, ball]).astype(np.float32)
    truth = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int32)
    # train on 25% hand labels
    rows = np.concatenate([np.arange(0, n, 4), np.arange(n, 2 * n, 4)])
    preds, clf, metrics = classify_wood_leaf(
        jnp.asarray(pts), jnp.ones(2 * n, bool),
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(truth[rows]),
        epochs=200,
    )
    acc = (np.asarray(preds) == truth).mean()
    assert acc > 0.95
    assert metrics["val_acc"] > 0.9


def test_predict_proba_consistent_with_predict(rng):
    """predict_proba: softmax class probabilities whose argmax equals
    predict() and whose rows sum to 1 (the RF predict_proba analog,
    ref exploration.py:460-538)."""
    from pyqsm_tpu.models.segmentation import predict_proba

    n = 400
    line = np.stack([np.linspace(0, 5, n), np.zeros(n), np.zeros(n)], 1)
    line += rng.normal(0, 0.002, line.shape)
    ball = rng.normal(0, 0.3, (n, 3)) + [10, 0, 0]
    pts = np.concatenate([line, ball]).astype(np.float32)
    truth = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int32)
    rows = np.arange(0, 2 * n, 4).astype(np.int32)
    preds, clf, _ = classify_wood_leaf(
        jnp.asarray(pts), jnp.ones(2 * n, bool),
        jnp.asarray(rows), jnp.asarray(truth[rows]), epochs=150,
    )
    feats = stack_features(
        __import__("pyqsm_tpu.ops.features", fromlist=["compute_features"])
        .compute_features(jnp.asarray(pts), jnp.ones(2 * n, bool), k=25))
    proba = np.asarray(predict_proba(clf, feats))
    assert proba.shape == (2 * n, 2)
    np.testing.assert_allclose(proba.sum(1), 1.0, atol=1e-5)
    assert (proba.argmax(1) == np.asarray(predict(clf, feats))).all()
