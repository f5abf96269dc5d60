"""Real TensorBoard 3D event emission (ref tree_isolation.py:81-87,163-179
streams stepwise clouds via the Open3D TB plugin; here the standard TB mesh
plugin). Verified by reading the event files back with TensorBoard's own
loader — the exact 'can a stock TensorBoard open this' contract."""

import glob

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


def _mesh_tensors(logdir):
    from tensorboard.backend.event_processing import event_file_loader

    tags, n_mesh = set(), 0
    for f in glob.glob(str(logdir) + "/events.out.tfevents.*"):
        for ev in event_file_loader.EventFileLoader(f).Load():
            if ev.HasField("summary"):
                for v in ev.summary.value:
                    tags.add(v.tag)
                    if v.metadata.plugin_data.plugin_name == "mesh":
                        n_mesh += 1
    return tags, n_mesh


def test_cloud_and_mesh_events_openable(tmp_path, rng):
    import jax.numpy as jnp

    from pyqsm_tpu.ops.mesh import sphere_mesh
    from pyqsm_tpu.utils.tbevents import TBMeshWriter

    w = TBMeshWriter(tmp_path, max_points=2000)
    pts = rng.normal(0, 1, (5000, 3)).astype(np.float32)
    lab = (pts[:, 0] > 0).astype(np.int32)
    w.log_cloud("cloud", pts, step=0, labels=lab)
    w.log_cloud("cloud", pts, step=1, values=pts[:, 2])
    m = sphere_mesh(jnp.zeros(3), 1.0, n_lat=6, n_lon=8)
    w.log_mesh("mesh", m.vertices, m.triangles, step=0)
    w.flush()
    w.close()

    tags, n_mesh = _mesh_tensors(tmp_path)
    assert "cloud_VERTEX" in tags and "cloud_COLOR" in tags
    assert "mesh_VERTEX" in tags and "mesh_FACE" in tags
    assert n_mesh >= 5


def test_steplogger_conversion_roundtrip(tmp_path, rng):
    from pyqsm_tpu.utils.tbevents import steplog_to_tb
    from pyqsm_tpu.utils.viz import StepLogger

    sl = StepLogger(tmp_path / "sl", name="run")
    pts = rng.normal(0, 1, (1000, 3)).astype(np.float32)
    lab = (pts[:, 1] > 0).astype(np.int32)
    sl.log(0, pts, mask=np.ones(1000, bool), labels=lab)
    sl.log(7, pts * 1.1, labels=lab)
    n = steplog_to_tb(tmp_path / "sl" / "run", tmp_path / "tb")
    assert n == 2
    tags, n_mesh = _mesh_tensors(tmp_path / "tb")
    assert n_mesh >= 4


def test_growth_observer_streams_from_build_trees(tmp_path, rng):
    """The observer plugs into the real region-growing loop and emits one
    cloud per observed chunk."""
    import jax.numpy as jnp

    from pyqsm_tpu.config import IsolationConfig
    from pyqsm_tpu.models.isolation import build_trees
    from pyqsm_tpu.utils.tbevents import TBMeshWriter, growth_observer

    # two synthetic trees: dense vertical trunks + canopies, 8 m apart
    def tree(cx, n_per=2000):
        z = rng.uniform(0, 6, n_per)
        th = rng.uniform(0, 2 * np.pi, n_per)
        r = 0.25 + rng.normal(0, 0.01, n_per)
        trunk = np.stack([cx + r * np.cos(th), r * np.sin(th), z], 1)
        canopy = rng.normal([cx, 0, 7.0], [1.5, 1.5, 1.0], (n_per // 2, 3))
        return np.concatenate([trunk, canopy])

    pts_np = np.concatenate([tree(0), tree(8)]).astype(np.float32)
    pts = jnp.asarray(pts_np)
    mask = jnp.ones(len(pts_np), bool)
    cfg = IsolationConfig(base_min_points=50, low_pctile=5.0, max_dist=0.35,
                          cycles=60, min_frontier=2)
    w = TBMeshWriter(tmp_path, max_points=5000)
    res = build_trees(pts, mask, cfg, observer=growth_observer(w, tag="g"),
                      observe_every=10)
    w.close()
    lab = np.asarray(res.labels)
    assert len(np.unique(lab[lab >= 0])) == 2
    tags, n_mesh = _mesh_tensors(tmp_path)
    assert "g_VERTEX" in tags and n_mesh >= 2
    assert any(t.startswith("g/assigned") for t in tags)
