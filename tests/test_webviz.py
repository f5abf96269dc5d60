"""Viewer export: file structure, data embedding, CLI round-trip."""
import base64
import json
import re

import numpy as np
import pytest

from pyqsm_tpu.utils.webviz import export_viewer


def test_export_points_labels(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    lab = rng.integers(-1, 5, 500)
    out = export_viewer(tmp_path / "v.html", points=pts, labels=lab)
    html = out.read_text()
    m = re.search(r"const LAYERS=(\[.*?\]), CENTER", html, re.S)
    layers = json.loads(m.group(1))
    assert layers[0]["kind"] == "points" and layers[0]["n"] == 500
    back = np.frombuffer(base64.b64decode(layers[0]["pos"]),
                         np.float32).reshape(-1, 3)
    np.testing.assert_allclose(back, pts)
    col = np.frombuffer(base64.b64decode(layers[0]["col"]),
                        np.uint8).reshape(-1, 3)
    # label -1 points render dim gray (90,90,90)
    assert (col[lab == -1] == 90).all()


def test_export_mesh_and_cylinders(tmp_path):
    import jax.numpy as jnp

    from pyqsm_tpu.state import Cylinders

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tris = np.array([[0, 1, 2], [0, 1, 3], [-1, -1, -1]], np.int32)
    cyl = Cylinders(
        center=jnp.zeros((2, 3)), axis=jnp.asarray([[0, 0, 1.0]] * 2),
        height=jnp.ones(2), radius=jnp.full(2, 0.1),
        branch_order=jnp.zeros(2, jnp.int32),
        parent=jnp.full(2, -1, jnp.int32),
        mask=jnp.asarray([True, False]))
    out = export_viewer(tmp_path / "m.html", mesh_vertices=verts,
                        mesh_triangles=tris, cylinders=cyl)
    html = out.read_text()
    m = re.search(r"const LAYERS=(\[.*?\]), CENTER", html, re.S)
    layers = json.loads(m.group(1))
    kinds = [(l["kind"], l["n"]) for l in layers]
    assert ("mesh", 6) in kinds  # dead triangle dropped (2 tris x 3 verts)
    assert any("qsm (1 cylinders)" == l["name"] for l in layers)


def test_subsample_note(tmp_path):
    pts = np.zeros((5000, 3), np.float32)
    pts[:, 0] = np.arange(5000)
    out = export_viewer(tmp_path / "s.html", points=pts, max_points=1000)
    html = out.read_text()
    assert "subsampled 1,000 of 5,000" in html


def test_empty_raises(tmp_path):
    with pytest.raises(ValueError):
        export_viewer(tmp_path / "e.html")
