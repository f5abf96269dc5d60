"""End-to-end on a REAL LAS byte stream (VERDICT r4 missing #2 / next #8).

The reference operates on SKIO terrestrial-lidar tiles — genuine LAS files
with ground returns, classification codes, intensity, RGB, understory
clutter, and non-grid tree spacing (ref ``reconstruction.py:28-32`` 20 M-pt
tiles; ingestion ``utils/io.py:64-110``). Every other test here feeds the
pipeline in-memory arrays; these tests go through FILE BYTES.

The LAS 1.4 / point-format-7 writer below is packed by hand in this test
(375-byte header, a VLR, extended point counts) — deliberately NOT
``pyqsm_tpu.io.write_las`` — so the reader is checked against the LAS spec,
not against its own mirror image.
"""

from __future__ import annotations

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.config import Config, IsolationConfig
from pyqsm_tpu.io import read_point_cloud
from pyqsm_tpu.models.plot_pipeline import process_plot

# classification codes per the ASPRS spec (what real SKIO-style tiles carry)
GROUND, LOW_VEG, MED_VEG, HIGH_VEG, NOISE = 2, 3, 4, 5, 7


def realistic_plot(n_total: int, seed: int = 11):
    """A survey-realistic stand: sloped rough ground, five trees at
    irregular positions/sizes, shrub understory, air noise; per-point
    classification, intensity, and RGB."""
    rng = np.random.default_rng(seed)
    n_ground = int(n_total * 0.35)
    n_noise = max(int(n_total * 0.001), 10)
    n_shrub = int(n_total * 0.06)
    n_veg = n_total - n_ground - n_noise - n_shrub

    # ground: 30x30 m, 2% slope, 3 cm roughness
    gx = rng.uniform(0, 30, n_ground)
    gy = rng.uniform(0, 30, n_ground)
    gz = 0.02 * gx + 0.01 * gy + rng.normal(0, 0.03, n_ground)
    ground = np.stack([gx, gy, gz], 1)

    # five trees, irregular spacing and size (non-grid, unlike bench's plot)
    sites = np.array([[5.1, 6.2], [13.7, 4.9], [22.4, 8.8],
                      [8.9, 19.5], [20.2, 23.1]])
    heights = np.array([9.0, 12.5, 8.2, 14.0, 10.8])
    radii = np.array([0.22, 0.33, 0.20, 0.38, 0.27])
    per = n_veg // len(sites)
    veg, veg_cls = [], []
    for (cx, cy), h, r0 in zip(sites, heights, radii):
        zb = 0.02 * cx + 0.01 * cy
        n_trunk = per // 3
        n_canopy = per - n_trunk
        th = rng.uniform(0, 2 * np.pi, n_trunk)
        z = rng.uniform(0.0, h * 0.55, n_trunk)
        taper = 1.0 - 0.4 * z / (h * 0.55)
        rr = r0 * taper + rng.normal(0, 0.01, n_trunk)
        trunk = np.stack([cx + rr * np.cos(th), cy + rr * np.sin(th),
                          zb + z], 1)
        canopy = rng.normal([cx, cy, zb + h * 0.75],
                            [h * 0.10, h * 0.10, h * 0.11], (n_canopy, 3))
        veg.append(np.concatenate([trunk, canopy]))
        veg_cls.append(np.full(per, HIGH_VEG, np.uint8))
    veg = np.concatenate(veg)
    veg_cls = np.concatenate(veg_cls)

    # shrubs: low blobs between the trees (crowns ~0.6 m above LOCAL ground)
    sc = rng.uniform(2, 28, (8, 2))
    shrub = np.concatenate([
        rng.normal([x, y, 0.02 * x + 0.01 * y + 0.6], [0.5, 0.5, 0.3],
                   (n_shrub // 8, 3))
        for x, y in sc])
    n_shrub = len(shrub)

    # isolated air noise (birds, dust, multipath)
    noise = np.stack([rng.uniform(0, 30, n_noise),
                      rng.uniform(0, 30, n_noise),
                      rng.uniform(2, 20, n_noise)], 1)

    pts = np.concatenate([ground, veg, shrub, noise]).astype(np.float64)
    cls = np.concatenate([
        np.full(n_ground, GROUND, np.uint8), veg_cls,
        np.full(n_shrub, LOW_VEG, np.uint8),
        np.full(n_noise, NOISE, np.uint8)])
    n = len(pts)
    inten = np.clip(rng.normal(
        np.where(cls == GROUND, 22000,
                 np.where(cls == HIGH_VEG, 14000, 9000)), 2500, n),
        0, 65535).astype(np.uint16)
    col = np.empty((n, 3), np.uint16)
    col[cls == GROUND] = [28000, 22000, 16000]
    col[cls != GROUND] = [12000, 26000, 9000]
    col += rng.integers(0, 3000, (n, 3), dtype=np.uint16)
    return pts, cls, inten, col


def write_las14_fmt7(path, pts, cls, inten, col):
    """Hand-packed LAS 1.4, point format 7 (the modern survey format):
    375-byte header, one VLR, extended 64-bit point counts at offset 247."""
    n = len(pts)
    lo, hi = pts.min(0), pts.max(0)
    scale = np.array([0.001, 0.001, 0.001])  # mm precision, real-survey style
    offset = np.floor(lo)
    q = np.round((pts - offset) / scale).astype(np.int64)
    assert np.abs(q).max() < 2**31

    vlr_payload = b"synthetic SKIO-style stand for pipeline testing\x00"
    vlr = (struct.pack("<H16sHH32s", 0, b"pyqsm_test\x00\x00\x00\x00\x00\x00",
                       9001, len(vlr_payload), b"description".ljust(32, b"\x00"))
           + vlr_payload)
    header_size = 375
    offset_to_points = header_size + len(vlr)
    rec_len = 36  # fmt 7: 30 core + 6 RGB

    h = bytearray(header_size)
    h[0:4] = b"LASF"
    struct.pack_into("<H", h, 4, 0)            # file source id
    struct.pack_into("<H", h, 6, 17)           # global encoding (GPS std time)
    h[24], h[25] = 1, 4                        # version 1.4
    h[26:58] = b"pyqsm synthetic scanner".ljust(32, b"\x00")
    h[58:90] = b"hand-packed test writer".ljust(32, b"\x00")
    struct.pack_into("<HH", h, 90, 230, 2026)  # day/year
    struct.pack_into("<H", h, 94, header_size)
    struct.pack_into("<I", h, 96, offset_to_points)
    struct.pack_into("<I", h, 100, 1)          # one VLR
    h[104] = 7
    struct.pack_into("<H", h, 105, rec_len)
    struct.pack_into("<I", h, 107, 0)          # legacy count = 0 (1.4 rule)
    struct.pack_into("<3d", h, 131, *scale)
    struct.pack_into("<3d", h, 155, *offset)
    struct.pack_into("<2d", h, 179, hi[0], lo[0])
    struct.pack_into("<2d", h, 195, hi[1], lo[1])
    struct.pack_into("<2d", h, 211, hi[2], lo[2])
    struct.pack_into("<Q", h, 247, n)          # extended point count
    struct.pack_into("<Q", h, 255, n)          # returns[0]

    rec = np.zeros(n, dtype=[
        ("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("intensity", "<u2"),
        ("returns", "u1"), ("flags", "u1"), ("classification", "u1"),
        ("user_data", "u1"), ("scan_angle", "<i2"), ("point_source", "<u2"),
        ("gps_time", "<f8"), ("red", "<u2"), ("green", "<u2"), ("blue", "<u2"),
    ])
    rec["x"], rec["y"], rec["z"] = q[:, 0], q[:, 1], q[:, 2]
    rec["intensity"] = inten
    rec["returns"] = 0x11  # 1 of 1
    rec["classification"] = cls
    rec["gps_time"] = np.linspace(3.02e8, 3.02e8 + 600, n)
    rec["red"], rec["green"], rec["blue"] = col[:, 0], col[:, 1], col[:, 2]
    assert rec.dtype.itemsize == rec_len

    with open(path, "wb") as f:
        f.write(bytes(h))
        f.write(vlr)
        f.write(rec.tobytes())


def _run_scan(tmp_path, n_points):
    pts, cls, inten, col = realistic_plot(n_points)
    las = tmp_path / "stand.las"
    write_las14_fmt7(las, pts, cls, inten, col)

    cloud = read_point_cloud(las)
    # byte-level parity with the spec fields
    assert len(cloud.points) == n_points
    np.testing.assert_allclose(cloud.points, pts, atol=0.002)  # mm quantized
    np.testing.assert_array_equal(cloud["classification"], cls)
    np.testing.assert_array_equal(cloud["intensity"], inten)
    assert "gps_time" in cloud
    np.testing.assert_allclose(np.asarray(cloud["colors"]) * 65280.0,
                               col.astype(np.float32), atol=1.0)

    # the reference workflow: height-normalize against a ground model
    # (standard lidar preprocessing — the percentile-band trunk seeding
    # assumes height above ground, not absolute z), drop ground + noise
    g = cloud.points[cls == GROUND]
    A = np.c_[g[:, 0], g[:, 1], np.ones(len(g))]
    coef, *_ = np.linalg.lstsq(A, g[:, 2], rcond=None)
    hag = cloud.points[:, 2] - (coef[0] * cloud.points[:, 0]
                                + coef[1] * cloud.points[:, 1] + coef[2])
    pts_n = np.c_[cloud.points[:, :2], hag]
    keep = (cls != GROUND) & (cls != NOISE)
    p = jnp.asarray(pts_n[keep].astype(np.float32))
    # base_min_points counts 0.15 m VOXEL REPRESENTATIVES (max_dist/2 —
    # build_trees docstring): a 0.2-0.4 m trunk ring has only ~30 reps in
    # the 4% band regardless of raw point density, so the threshold is
    # rep-scaled (and therefore valid at both the 120k and 2M variants)
    res = process_plot(
        p, jnp.ones(len(p), bool), Config(),
        IsolationConfig(base_min_points=15, low_pctile=4.0, max_dist=0.3,
                        cycles=400, min_frontier=2),
        skeleton_voxel=0.04, max_skeleton_points=20_000,
        min_tree_points=int(n_points * 0.02), with_metrics=True)
    lab = np.asarray(res.growth.labels)
    n_labels = len(np.unique(lab[lab >= 0]))
    # the dense shrub blobs legitimately seed small clusters of their own
    # (their bases sit in the low-z percentile band like real understory);
    # min_tree_points is the filter that separates them from trees
    assert n_labels >= 5, f"lost planted trees: {n_labels} clusters"
    assert len(res.trees) == 5, (
        f"expected the 5 planted trees after min_tree_points, "
        f"got {len(res.trees)} of {n_labels} clusters")
    for t in res.trees:
        assert int(t.cylinders.count()) > 0
        live = np.asarray(t.cylinders.mask)
        r = np.asarray(t.cylinders.radius)[live]
        cz = np.asarray(t.cylinders.center)[live, 2]
        # plausible radii: canopy-blob cylinders can reach a crown radius,
        # trunk-zone cylinders must stay woody (planted trunks 0.20-0.38)
        assert 0.005 < np.median(r) < 2.5
        if (cz < 2.0).any():
            assert np.median(r[cz < 2.0]) < 0.8
        m = t.metrics
        assert set(m) >= {"classes", "slice_areas", "width_at_bh", "counts"}
        assert m["counts"]["wood"] + m["counts"]["leaves"] + \
            m["counts"]["epis"] > 0
        assert 0.1 < float(m["width_at_bh"]) < 6.0
    return res


def test_las14_stand_end_to_end(tmp_path, rng):
    """80k-pt stand through file bytes → isolation → QSM → metrics."""
    _run_scan(tmp_path, 80_000)


@pytest.mark.slow
def test_las14_stand_2M(tmp_path, rng):
    """2M-pt stand — the at-scale variant (tile-scale ingest + pipeline)."""
    _run_scan(tmp_path, 2_000_000)
