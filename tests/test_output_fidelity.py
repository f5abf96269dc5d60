"""Output fidelity against the reference's PUBLISHED result numbers
(VERDICT r3 #6).

The reference ships curated per-tree projected-area results for its SKIO
live-oak scans (`/root/reference/data/notes/cluster_projection.py:2-40`):
34 trees, per-class epi/leaf/wood clump-projection totals spanning
0.78-474 m². The multi_clusters.pkl artifact carries only (file, id) pairs
(no point data), so the checkable half of the fidelity claim is: run the
SAME workflow (`identify_epiphytes` -> `project_components_in_clusters`,
ref canopy_metrics.py:60-84,370-423) on a live-oak-scale tree of KNOWN
geometry, and require the metrics to land (a) near geometric truth and
(b) inside the plausibility envelope of the published per-tree rows.

Published envelope (derived from every row of cluster_projection.py):
- per-class totals:            0.78 .. 474 m^2
- epi/leaf area ratio:         0.99 .. 2.07
- wood/leaf area ratio:        0.74 .. 2.39

Measured here (16k-pt synthetic live oak, crown r=7 m -> true projected
crown 153.9 m^2, trunk d=1.0 m): epi 199 / leaf 123 / wood 224 m^2,
epi/leaf 1.62, wood/leaf 1.83, width@BH 1.01 m — recorded in PARITY.md.
"""

import numpy as np
import jax.numpy as jnp

from pyqsm_tpu.models.canopy import canopy_metrics
from pyqsm_tpu.ops.area import rasterized_area

# envelope of the reference's published per-tree results
PUBLISHED_TOTAL_RANGE = (0.5, 500.0)  # m^2, covers 0.78..474
PUBLISHED_EPI_LEAF = (0.95, 2.10)
PUBLISHED_WOOD_LEAF = (0.70, 2.40)

CROWN_R = 7.0
TRUNK_R = 0.5
TRUE_CROWN_AREA = np.pi * CROWN_R**2  # 153.94 m^2


def _live_oak(rng, n=16000, crown_z=9.0, crown_h=4.0, trunk_h=7.0):
    """SKIO-style live oak: broad shell-biased ellipsoidal crown, thick
    trunk, six radiating limbs (the epiphyte habitat)."""
    n_crown = int(n * 0.62)
    n_trunk = int(n * 0.18)
    n_limb = n - n_crown - n_trunk
    u = rng.normal(size=(n_crown, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    rr = CROWN_R * (0.55 + 0.45 * rng.beta(4, 1.2, n_crown))[:, None]
    crown = u * rr * np.array([1, 1, crown_h / CROWN_R]) + np.array([0, 0, crown_z])
    th = rng.uniform(0, 2 * np.pi, n_trunk)
    z = rng.uniform(0, trunk_h, n_trunk)
    r = TRUNK_R + rng.normal(0, 0.02, n_trunk)
    trunk = np.stack([r * np.cos(th), r * np.sin(th), z], 1)
    limbs = []
    per = n_limb // 6
    for i in range(6):
        a = 2 * np.pi * i / 6 + rng.normal(0, 0.2)
        t = rng.uniform(0, 1, per)
        ax = np.array([np.cos(a) * 0.8, np.sin(a) * 0.8, 0.45])
        ax /= np.linalg.norm(ax)
        c = np.array([0, 0, trunk_h * 0.85]) + t[:, None] * ax * CROWN_R * 0.9
        limbs.append(c + rng.normal(0, 0.12, (per, 3)))
    return np.concatenate([crown, trunk] + limbs).astype(np.float32)


def test_canopy_metrics_within_published_envelope():
    rng = np.random.default_rng(7)
    pts = _live_oak(rng)
    m = canopy_metrics(jnp.asarray(pts), jnp.ones(len(pts), bool), cell=0.25)

    cls = m["classes"]
    e = cls["epis"]["total"]
    l = cls["leaves"]["total"]
    w = cls["wood"]["total"]

    # (b) plausibility envelope of the published SKIO rows
    for total in (e, l, w):
        assert PUBLISHED_TOTAL_RANGE[0] < total < PUBLISHED_TOTAL_RANGE[1]
    assert PUBLISHED_EPI_LEAF[0] < e / l < PUBLISHED_EPI_LEAF[1]
    assert PUBLISHED_WOOD_LEAF[0] < w / l < PUBLISHED_WOOD_LEAF[1]

    # (a) geometric truth: whole-cloud projected area == crown disc +-25%
    # (raster occupancy at cell=0.25 on a shell-sampled crown)
    whole = float(rasterized_area(jnp.asarray(pts), jnp.ones(len(pts), bool),
                                  cell=0.25, grid_n=128))
    assert 0.75 * TRUE_CROWN_AREA < whole < 1.25 * TRUE_CROWN_AREA

    # class areas live at crown scale (each class spreads over the crown,
    # same as the published rows where epi ~ leaf ~ wood ~ tree area)
    assert 0.5 * TRUE_CROWN_AREA < max(e, l, w) < 2.0 * TRUE_CROWN_AREA

    # width at breast height recovers the trunk diameter
    assert abs(m["width_at_bh"] - 2 * TRUNK_R) < 0.15

    # slice areas: the largest z-slice sees most of the crown disc
    assert 0.6 * TRUE_CROWN_AREA < max(m["slice_areas"]) < 1.1 * TRUE_CROWN_AREA
