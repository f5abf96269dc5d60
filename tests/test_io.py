import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.io import (
    read_point_cloud, read_las, write_las, read_pcd, write_pcd,
    read_ply, write_ply, read_xyz, write_xyz, read_npz, write_npz,
    save_artifact, load_artifact, save_cylinders, load_cylinders,
    save_metrics, load_metrics, format_table,
)
from pyqsm_tpu.state import Cylinders, PointCloud


@pytest.fixture
def cloud(rng):
    pts = rng.uniform(-10, 50, (500, 3))
    colors = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    intensity = rng.uniform(0, 1000, 500).astype(np.float32)
    return pts, colors, intensity


def test_las_roundtrip(tmp_path, cloud):
    pts, colors, intensity = cloud
    f = tmp_path / "t.las"
    write_las(f, pts, colors=colors, intensity=intensity)
    back = read_las(f)
    np.testing.assert_allclose(back.points, pts, atol=1e-4)
    np.testing.assert_allclose(back["colors"], colors, atol=0.01)
    np.testing.assert_allclose(back["intensity"], intensity.astype(np.uint16), atol=1)
    # dispatch works
    assert read_point_cloud(f).points.shape == (500, 3)


def test_pcd_roundtrip(tmp_path, cloud):
    pts, colors, _ = cloud
    f = tmp_path / "t.pcd"
    write_pcd(f, pts, colors=colors)
    back = read_pcd(f)
    np.testing.assert_allclose(back.points, pts, atol=1e-3)
    np.testing.assert_allclose(back["colors"], colors, atol=1 / 255 + 1e-6)


def test_ply_roundtrip(tmp_path, cloud):
    pts, colors, _ = cloud
    f = tmp_path / "t.ply"
    write_ply(f, pts, colors=colors)
    back = read_ply(f)
    np.testing.assert_allclose(back.points, pts, atol=1e-3)
    np.testing.assert_allclose(back["colors"], colors, atol=1 / 255 + 1e-6)


def test_ply_ascii(tmp_path):
    f = tmp_path / "a.ply"
    f.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
        "0 0 0\n1 2 3\n"
    )
    back = read_ply(f)
    np.testing.assert_allclose(back.points, [[0, 0, 0], [1, 2, 3]])


def test_xyz_roundtrip(tmp_path, cloud):
    pts, _, intensity = cloud
    f = tmp_path / "t.xyz"
    write_xyz(f, pts, intensity=intensity)
    back = read_xyz(f)
    np.testing.assert_allclose(back.points, pts, atol=1e-5)
    np.testing.assert_allclose(back["intensity"], intensity, atol=1e-2)


def test_npz_roundtrip(tmp_path, cloud):
    pts, colors, intensity = cloud
    f = tmp_path / "t.npz"
    write_npz(f, pts, colors=colors, intensity=intensity)
    back = read_npz(f)
    np.testing.assert_allclose(back.points, pts)
    assert "colors" in back and "intensity" in back


def test_artifact_roundtrip(tmp_path, cloud):
    pts, colors, intensity = cloud
    pc = PointCloud.create(pts.astype(np.float32), capacity=600,
                           colors=colors, intensity=intensity)
    f = tmp_path / "state.npz"
    save_artifact(f, pc)
    back = load_artifact(f)
    assert back.capacity == 600
    assert int(back.count()) == 500
    np.testing.assert_allclose(np.asarray(back.points), np.asarray(pc.points))


def test_cylinders_roundtrip(tmp_path):
    cyl = Cylinders(
        center=jnp.zeros((4, 3)), axis=jnp.ones((4, 3)), height=jnp.ones(4),
        radius=jnp.full(4, 0.3), branch_order=jnp.zeros(4, jnp.int32),
        parent=jnp.full(4, -1, jnp.int32), mask=jnp.ones(4, bool),
    )
    f = tmp_path / "cyl.npz"
    save_cylinders(f, cyl)
    back = load_cylinders(f)
    assert float(back.volume()) == pytest.approx(float(cyl.volume()))


def test_metrics_and_table(tmp_path):
    m = {"width": np.float32(1.5), "areas": np.array([1.0, 2.0]),
         "classes": {"epi": 3}}
    f = tmp_path / "m.json"
    save_metrics(f, m)
    back = load_metrics(f)
    assert back["width"] == pytest.approx(1.5)
    assert back["areas"] == [1.0, 2.0]
    table = format_table([{"seed": "s27", "area": 474.04}, {"seed": "s32", "area": 3.1}])
    assert "s27" in table and "474.040" in table and table.count("|") > 0
