import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqsm_tpu.ops.geometry import (
    percentile_mask, crop_mask, zoom_mask, rotation_matrix_from_vectors,
    get_center, get_radius, generate_grid, obb_axes, clamp_to_obb,
)
from pyqsm_tpu.ops.ransac import (
    ransac_circle_2d, fit_cylinder, points_in_cylinder, principal_axis,
    sample_cylinder_surface,
)
from tests.conftest import synthetic_branch


def test_percentile_mask(rng):
    z = rng.uniform(0, 10, 1000).astype(np.float32)
    pts = np.stack([np.zeros(1000), np.zeros(1000), z], 1).astype(np.float32)
    m = np.asarray(percentile_mask(jnp.asarray(z), jnp.ones(1000, bool), 0.0, 3.0))
    ref_hi = np.percentile(z, 3)
    assert abs(m.mean() - 0.03) < 0.01
    assert z[m].max() <= ref_hi + 1e-5


def test_percentile_mask_ignores_dead(rng):
    z = np.concatenate([rng.uniform(0, 1, 500), np.full(500, 100.0)]).astype(np.float32)
    mask = np.arange(1000) < 500
    m = np.asarray(percentile_mask(jnp.asarray(z), jnp.asarray(mask), 0, 50))
    assert not m[500:].any()
    assert abs(m.sum() - 250) < 10


def test_crop_and_zoom(rng):
    pts = rng.uniform(0, 10, (500, 3)).astype(np.float32)
    m = np.asarray(crop_mask(jnp.asarray(pts), jnp.ones(500, bool), minz=5.0))
    assert ((pts[:, 2] >= 5) == m).all()
    region = np.array([[2.0, 2.0], [5.0, 5.0]], np.float32)
    mz = np.asarray(zoom_mask(jnp.asarray(pts), jnp.ones(500, bool), region))
    inside = (pts[:, 0] >= 2) & (pts[:, 0] <= 5) & (pts[:, 1] >= 2) & (pts[:, 1] <= 5)
    np.testing.assert_array_equal(mz, inside)
    mrev = np.asarray(zoom_mask(jnp.asarray(pts), jnp.ones(500, bool), region, reverse=True))
    np.testing.assert_array_equal(mrev, ~inside)


def test_rodrigues(rng):
    for _ in range(10):
        a = rng.normal(size=3).astype(np.float32); a /= np.linalg.norm(a)
        b = rng.normal(size=3).astype(np.float32); b /= np.linalg.norm(b)
        R = np.asarray(rotation_matrix_from_vectors(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(R @ a, b, atol=1e-5)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    # antiparallel
    a = np.array([0, 0, 1.0], np.float32)
    R = np.asarray(rotation_matrix_from_vectors(jnp.asarray(a), jnp.asarray(-a)))
    np.testing.assert_allclose(R @ a, -a, atol=1e-5)


def test_centers_and_radius(rng):
    pts = synthetic_branch(5000, radius=0.3, length=4.0)
    m = jnp.ones(len(pts), bool)
    c = np.asarray(get_center(jnp.asarray(pts), m))
    assert abs(c[0]) < 0.02 and abs(c[1]) < 0.02 and abs(c[2] - 2.0) < 0.1
    top = np.asarray(get_center(jnp.asarray(pts), m, method="top"))
    assert top[2] > 3.9
    r = float(get_radius(jnp.asarray(pts), m))
    assert abs(r - 0.3) < 0.02


def test_generate_grid():
    cells = generate_grid((0, 0), (14, 21), nx=2, ny=3, overlap=1 / 7)
    assert len(cells) == 6
    (lo, hi) = cells[0]
    assert hi[0] - lo[0] == pytest.approx(7 + 2.0)  # 7m cell + 2*1m overlap


def test_obb_clamp(rng):
    pts = rng.uniform(-1, 1, (400, 3)).astype(np.float32) * np.array([4, 1, 0.5], np.float32)
    m = jnp.ones(400, bool)
    c, axes, half = obb_axes(jnp.asarray(pts), m)
    out = np.array([[100.0, 100, 100]], np.float32)
    clamped = np.asarray(clamp_to_obb(jnp.asarray(out), c, axes, half))
    local = (clamped - np.asarray(c)) @ np.asarray(axes).T
    assert (np.abs(local) <= np.asarray(half) + 1e-4).all()


def test_ransac_circle(rng):
    theta = rng.uniform(0, 2 * np.pi, 400)
    pts = np.stack([1.5 + 0.7 * np.cos(theta), -0.5 + 0.7 * np.sin(theta)], 1)
    pts += rng.normal(0, 0.004, pts.shape)
    pts = np.concatenate([pts, rng.uniform(-3, 3, (80, 2))]).astype(np.float32)  # 20% outliers
    fit = ransac_circle_2d(jnp.asarray(pts), jnp.ones(len(pts), bool),
                           jax.random.PRNGKey(0), threshold=0.02)
    assert np.allclose(np.asarray(fit.center), [1.5, -0.5], atol=0.01)
    assert float(fit.radius) == pytest.approx(0.7, abs=0.01)
    assert int(fit.n_inliers) >= 380


def test_fit_cylinder_tilted(rng):
    axis = np.array([0.3, 0.2, 0.93])
    axis /= np.linalg.norm(axis)
    pts = synthetic_branch(3000, radius=0.25, length=3.0, axis=axis, base=[1, 2, 3], seed=4)
    fit = fit_cylinder(jnp.asarray(pts), jnp.ones(len(pts), bool),
                       jax.random.PRNGKey(1), threshold=0.02)
    got_axis = np.asarray(fit.axis)
    assert abs(np.dot(got_axis, axis)) > 0.999
    assert float(fit.radius) == pytest.approx(0.25, abs=0.01)
    assert float(fit.height) == pytest.approx(3.0, abs=0.15)
    # center lies on the true axis line
    rel = np.asarray(fit.center) - np.array([1, 2, 3.0])
    radial = rel - np.dot(rel, axis) * axis
    assert np.linalg.norm(radial) < 0.02


def test_radius_gate_rejects_oversize(rng):
    # sparse ring much larger than max_radius: gated fit must not return it
    theta = rng.uniform(0, 2 * np.pi, 200)
    pts = np.stack([3.0 * np.cos(theta), 3.0 * np.sin(theta)], 1).astype(np.float32)
    fit = ransac_circle_2d(jnp.asarray(pts), jnp.ones(200, bool),
                           jax.random.PRNGKey(0), threshold=0.02, max_radius=1.0)
    assert not bool(fit.ok)
    assert int(fit.n_inliers) == 0


def test_points_in_cylinder():
    pts = np.array([[0, 0, 0], [0.2, 0, 0], [0, 0, 0.9], [0, 0, 2.0], [1.2, 0, 0]], np.float32)
    inside = np.asarray(points_in_cylinder(
        jnp.asarray(pts), jnp.array([0., 0, 0]), jnp.array([0., 0, 1]), 0.5, 2.0))
    np.testing.assert_array_equal(inside, [True, True, True, False, False])


def test_sample_cylinder_surface():
    pts = np.asarray(sample_cylinder_surface(
        jnp.array([1.0, 0, 0]), jnp.array([0.0, 0, 1]), 0.4, 2.0, n=256))
    r = np.linalg.norm(pts[:, :2] - [1, 0], axis=1)
    np.testing.assert_allclose(r, 0.4, atol=1e-5)
    assert np.abs(pts[:, 2]).max() <= 1.0 + 1e-6
