import numpy as np
import jax.numpy as jnp
import pytest
from matplotlib.colors import rgb_to_hsv as mpl_rgb_to_hsv, hsv_to_rgb as mpl_hsv_to_rgb

from pyqsm_tpu.ops.features import (
    compute_features, smooth_feature, expand_to_original, replace_nan_features,
    FEATURE_NAMES,
)
from pyqsm_tpu.ops.color import (
    rgb_to_hsv, hsv_to_rgb, segment_hues, green_surface_mask,
    homogenize_white_bloom, split_on_percentile, saturate_colors,
)
from tests.conftest import synthetic_branch


def test_features_on_line_vs_plane_vs_ball(rng):
    n = 600
    line = np.stack([np.linspace(0, 5, n), np.zeros(n), np.zeros(n)], 1)
    line += rng.normal(0, 0.002, line.shape)
    plane = np.concatenate([rng.uniform(0, 2, (n, 2)), np.zeros((n, 1))], 1)
    plane += rng.normal(0, 0.002, plane.shape)
    ball = rng.normal(0, 0.3, (n, 3))
    pts = np.concatenate([line, plane + [10, 0, 0], ball + [20, 0, 0]]).astype(np.float32)
    mask = jnp.ones(len(pts), bool)
    f = compute_features(jnp.asarray(pts), mask, k=20)
    assert set(f) == set(FEATURE_NAMES)
    lin = np.asarray(f["linearity"])
    pla = np.asarray(f["planarity"])
    sph = np.asarray(f["sphericity"])
    assert np.median(lin[:n]) > 0.95
    # k=20 neighborhoods of a uniform patch give lambda2/lambda1 ~ 0.6, so
    # planarity ~0.6 is the true statistical value (jakteristics behaves the
    # same); the discriminative ordering is what matters
    assert np.median(pla[n:2 * n]) > 0.5
    assert np.median(pla[n:2 * n]) > np.median(pla[:n]) + 0.4
    assert np.median(sph[2 * n:]) > 0.25
    vert = np.asarray(f["verticality"])
    # plane normal = z -> verticality ~ 0; line in x has normal in yz plane
    assert np.median(vert[n:2 * n]) < 0.05


def test_smooth_feature_reduces_noise(rng):
    pts = rng.uniform(0, 2, (2000, 3)).astype(np.float32)
    base = pts[:, 0]  # smooth signal
    noisy = base + rng.normal(0, 0.5, 2000).astype(np.float32)
    sm = np.asarray(smooth_feature(jnp.asarray(pts), jnp.asarray(noisy),
                                   jnp.ones(2000, bool), k=25))
    assert np.abs(sm - base).mean() < np.abs(noisy - base).mean() * 0.5


def test_expand_to_original(rng):
    coarse = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    vals = coarse[:, 2].astype(np.float32)
    full = coarse + rng.normal(0, 0.001, coarse.shape).astype(np.float32)
    out = np.asarray(expand_to_original(jnp.asarray(coarse), jnp.asarray(vals),
                                        jnp.ones(100, bool), jnp.asarray(full),
                                        jnp.ones(100, bool), k=1))
    np.testing.assert_allclose(out, vals, atol=1e-5)


def test_replace_nan(rng):
    v = np.array([1.0, 2.0, np.nan, 3.0], np.float32)
    out = np.asarray(replace_nan_features(jnp.asarray(v), jnp.ones(4, bool)))
    assert out[2] == pytest.approx(2.0)


def test_hsv_roundtrip_matches_matplotlib(rng):
    rgb = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(jnp.asarray(rgb)))
    ref = mpl_rgb_to_hsv(rgb)
    np.testing.assert_allclose(hsv, ref, atol=1e-5)
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_segment_hues_peel_order(rng):
    # green, dark blue (v<0.5 so the earlier 'white' band doesn't absorb it —
    # matching the reference's peel order), and near-black points
    green = np.tile([[0.1, 0.8, 0.1]], (50, 1))
    blue = np.tile([[0.05, 0.1, 0.45]], (50, 1))
    gray = np.tile([[0.05, 0.05, 0.05]], (50, 1))
    colors = jnp.asarray(np.concatenate([green, blue, gray]).astype(np.float32))
    masks = segment_hues(colors, jnp.ones(150, bool), saturate=False)
    assert np.asarray(masks["greens"])[:50].all()
    assert np.asarray(masks["blues"])[50:100].all()
    assert np.asarray(masks["remainder"])[100:].all()
    # bright blue IS claimed by the white band first (reference peel order)
    bright_blue = jnp.asarray(np.tile([[0.1, 0.2, 0.9]], (10, 1)).astype(np.float32))
    m2 = segment_hues(bright_blue, jnp.ones(10, bool), saturate=False)
    assert np.asarray(m2["white"]).all()
    # peel-off: each point claimed exactly once
    total = sum(np.asarray(m).astype(int) for m in masks.values())
    assert (total == 1).all()


def test_green_surface_mask():
    colors = jnp.asarray(np.array([[0.2, 0.8, 0.3], [0.9, 0.2, 0.2], [0.1, 0.5, 0.9]],
                                  np.float32))
    m = np.asarray(green_surface_mask(colors, jnp.ones(3, bool)))
    np.testing.assert_array_equal(m, [True, False, False])


def test_homogenize_white_bloom(rng):
    pts = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    colors = np.tile([[0.2, 0.5, 0.2]], (200, 1)).astype(np.float32)
    colors[:5] = [1.0, 1.0, 1.0]  # bloomed
    fixed = np.asarray(homogenize_white_bloom(jnp.asarray(pts), jnp.asarray(colors),
                                              jnp.ones(200, bool)))
    np.testing.assert_allclose(fixed[:5], np.tile([[0.2, 0.5, 0.2]], (5, 1)), atol=1e-5)
    np.testing.assert_allclose(fixed[5:], colors[5:], atol=1e-6)


def test_split_on_percentile(rng):
    v = rng.uniform(0, 1, 1000).astype(np.float32)
    hi, lo = split_on_percentile(jnp.asarray(v), jnp.ones(1000, bool), 65.0)
    hi, lo = np.asarray(hi), np.asarray(lo)
    assert abs(hi.mean() - 0.35) < 0.02
    assert not (hi & lo).any()
    thresh = np.percentile(v, 65)
    assert v[hi].min() > thresh - 1e-6
