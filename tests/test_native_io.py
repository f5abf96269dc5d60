import numpy as np
import pytest

from pyqsm_tpu.io.native import (
    StreamingVoxelizer, native_available, parse_text_points, read_xyz_stream,
)


def test_native_builds():
    assert native_available(), "g++ build of native/pointio.cpp failed"


def test_parse_text_points(rng):
    pts = rng.uniform(-100, 100, (5000, 4))
    text = "\n".join(" ".join(f"{v:.6f}" for v in row) for row in pts).encode()
    out = parse_text_points(text, 4)
    np.testing.assert_allclose(out, pts, atol=1e-5)


def test_parse_skips_bad_rows():
    text = b"# comment\n1 2 3\nnot a row\n4 5 6\n7 8\n9 10 11\n"
    out = parse_text_points(text, 3)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6], [9, 10, 11]])


def test_parse_matches_numpy_fallback(rng):
    import pyqsm_tpu.io.native as native
    pts = rng.uniform(0, 10, (200, 3))
    text = "\n".join(" ".join(f"{v:.5f}" for v in r) for r in pts).encode()
    fast = parse_text_points(text, 3)
    lib, native._lib, native._build_failed = native._lib, None, True
    try:
        slow = parse_text_points(text, 3)
    finally:
        native._lib, native._build_failed = lib, False
    np.testing.assert_allclose(fast, slow, atol=1e-9)


def test_streaming_voxelizer(rng):
    pts = rng.uniform(0, 2, (20000, 3))
    vox = StreamingVoxelizer(0.25)
    for i in range(0, len(pts), 5000):
        vox.add(pts[i:i + 5000])
    cents = vox.centroids()
    ref_cells = len(np.unique(np.floor(pts / 0.25).astype(int), axis=0))
    assert len(cents) == ref_cells
    # centroids lie inside their cells
    assert np.isfinite(cents).all()


def test_read_xyz_stream(tmp_path, rng):
    pts = rng.uniform(0, 5, (10000, 3))
    f = tmp_path / "scan.pts"
    np.savetxt(f, pts, fmt="%.5f")
    total = sum(len(b) for b in read_xyz_stream(f, batch_bytes=50_000))
    assert total == 10000
    # voxelized streaming returns centroids only
    (cents,) = list(read_xyz_stream(f, batch_bytes=50_000, voxel=0.5))
    assert 100 < len(cents) < 10000
