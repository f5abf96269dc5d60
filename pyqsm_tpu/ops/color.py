"""Color-space segmentation math.

Vectorized rebuild of ``pyQSM/viz/color.py``: RGB↔HSV, the named hue
conditions (``color.py:94,152``; ``canopy_metrics.py:51-57``), sequential
hue peel-off (``segment_hues`` :146-193), saturation correction
(``saturate_colors`` :133-144), green-surface extraction (:58-60),
white-bloom neighbor repair (``homog_colors`` :32-48), and percentile
splitting (``split_on_percentile`` :348-363) — all as mask transforms over
the columnar cloud.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.geometry import masked_percentile
from pyqsm_tpu.ops.neighbors import knn

Array = jax.Array


@jax.jit
def rgb_to_hsv(rgb: Array) -> Array:
    """Matplotlib-compatible RGB→HSV over [..., 3] in [0, 1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff > 0, diff, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(diff > 0, (h / 6.0) % 1.0, 0.0)
    s = jnp.where(mx > 0, diff / jnp.where(mx > 0, mx, 1.0), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


@jax.jit
def hsv_to_rgb(hsv: Array) -> Array:
    """HSV→RGB over [..., 3]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


# the reference's named hue conditions (h, s, v in [0,1]) — color.py:152
def _white(h, s, v):
    return (h > 0.5) & (h < 5.0 / 6.0) & (v > 0.5)


def _pink(h, s, v):
    return (h >= 0.7) & (v > 0.3)


def _blues(h, s, v):
    return (h < 0.7) & (h > 0.4) & (v > 0.4)


def _greens(h, s, v):
    return (h <= 0.5) & (h > 2.0 / 9.0) & (v > 0.2)


def _light_greens(h, s, v):
    return (h <= 0.5) & (h > 2.0 / 9.0) & (v > 0.5)


def _red_yellow(h, s, v):
    return (h <= 2.0 / 9.0) & (v > 0.3)


HUE_CONDITIONS = {
    "white": _white,
    "pink": _pink,
    "blues": _blues,
    "greens": _greens,
    "light_greens": _light_greens,
    "red_yellow": _red_yellow,
}


@jax.jit
def saturate_colors(rgb: Array) -> Array:
    """Saturation correction s ← s + (1−s)/3 (ref ``saturate_colors``)."""
    hsv = rgb_to_hsv(rgb)
    s = hsv[..., 1]
    hsv = hsv.at[..., 1].set(s + (1.0 - s) / 3.0)
    return hsv_to_rgb(hsv)


def segment_hues(
    colors: Array,
    mask: Array,
    hues: tuple[str, ...] = ("white", "blues", "pink", "red_yellow", "greens"),
    saturate: bool = True,
) -> dict[str, Array]:
    """Sequential hue peel-off (ref ``segment_hues``): each named hue claims
    the matching *remaining* points, in order. Returns dict hue → bool mask
    plus 'remainder'."""
    rgb = saturate_colors(colors) if saturate else colors
    hsv = rgb_to_hsv(rgb)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    remaining = mask
    out: dict[str, Array] = {}
    for hue in hues:
        cond = HUE_CONDITIONS[hue](h, s, v)
        claimed = remaining & cond
        out[hue] = claimed
        remaining = remaining & ~claimed
    out["remainder"] = remaining
    return out


@jax.jit
def green_surface_mask(colors: Array, mask: Array) -> Array:
    """RGB green-dominance test (ref ``get_green_surfaces``):
    g > r, g > b, 0.5 < r/b < 2."""
    r, g, b = colors[..., 0], colors[..., 1], colors[..., 2]
    ratio = r / jnp.where(b > 0, b, 1e-6)
    return mask & (g > r) & (g > b) & (ratio > 0.5) & (ratio < 2.0)


@partial(jax.jit, static_argnames=("k",))
def homogenize_white_bloom(
    points: Array, colors: Array, mask: Array,
    white_threshold: float = 2.7, k: int = 30,
) -> Array:
    """Replace over-bright (bloomed) points' colors by the mean color of
    their non-white neighbors (ref ``homog_colors``)."""
    white = mask & (jnp.sum(colors, axis=-1) > white_threshold)
    nonwhite = mask & ~white
    _, idx = knn(points, points, k, query_mask=white, point_mask=nonwhite)
    valid = idx >= 0
    nbr_col = colors[jnp.maximum(idx, 0)]
    num = jnp.sum(jnp.where(valid[..., None], nbr_col, 0.0), axis=1)
    den = jnp.maximum(jnp.sum(valid, axis=1), 1)[:, None]
    fixed = num / den
    return jnp.where((white & (den[:, 0] > 0))[:, None], fixed, colors)


@jax.jit
def split_on_percentile(
    values: Array, mask: Array, pctile: float
) -> tuple[Array, Array]:
    """(high_mask, low_mask) split of live points at the given percentile of
    the live values (ref ``split_on_percentile``, default comp ``>``)."""
    thresh = masked_percentile(values, mask, pctile)
    high = mask & (values > thresh)
    return high, mask & ~high
