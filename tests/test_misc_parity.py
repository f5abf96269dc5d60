import numpy as np
import jax.numpy as jnp
import pytest

from pyqsm_tpu.config import SkeletonizeConfig
from pyqsm_tpu.models.skeleton import extract_skeleton
from pyqsm_tpu.ops.mesh import TriMesh, surface_clusters, sphere_mesh, merge_meshes
from pyqsm_tpu.ops.octree import build_octree, leaves, containing_path
from tests.conftest import synthetic_branch


def test_semantic_weighted_contraction():
    pts = synthetic_branch(1500, radius=0.3, length=4.0, seed=8)
    mask = jnp.ones(len(pts), bool)
    trunk = jnp.asarray(pts[:, 2] < 2.0)
    cfg = SkeletonizeConfig(max_iter=3, semantic_weight=10.0)
    res_plain = extract_skeleton(jnp.asarray(pts), mask, cfg)
    res_sem = extract_skeleton(jnp.asarray(pts), mask, cfg, trunk_mask=trunk)
    # semantic weighting changes the contraction (trunk contracts harder)
    assert not np.allclose(np.asarray(res_plain.contracted),
                           np.asarray(res_sem.contracted))
    trunk_shift = np.linalg.norm(np.asarray(res_sem.total_shift)[np.asarray(trunk)], axis=1)
    plain_shift = np.linalg.norm(np.asarray(res_plain.total_shift)[np.asarray(trunk)], axis=1)
    assert trunk_shift.mean() > plain_shift.mean() * 0.7


def test_surface_clusters():
    m1 = sphere_mesh(jnp.array([0.0, 0, 0]), 1.0, n_lat=6, n_lon=8)
    m2 = sphere_mesh(jnp.array([5.0, 0, 0]), 0.5, n_lat=4, n_lon=6)
    mesh = merge_meshes([m1, m2])
    labels, filtered = surface_clusters(mesh)
    live = labels[labels >= 0]
    assert len(np.unique(live)) == 2
    n1 = m1.n_triangles()
    # filtering by min size keeps only the big sphere
    _, big_only = surface_clusters(mesh, min_triangles=n1)
    assert big_only.n_triangles() == n1


def test_octree(rng):
    pts = rng.uniform(0, 10, (5000, 3))
    root = build_octree(pts, max_depth=5, stop_below=250)
    ls = leaves(root)
    total = sum(len(l.indices) for l in ls)
    assert total == 5000
    assert all(len(l.indices) < 250 or l.depth == 5 for l in ls)
    # leaves partition: points inside their leaf bounds
    l0 = ls[0]
    assert np.all(np.abs(pts[l0.indices] - l0.center) <= l0.half + 1e-6)
    path = containing_path(root, pts[123])
    assert path[0] is root and path[-1].is_leaf
    assert 123 in path[-1].indices


def test_map_density(rng):
    """Poisson-density analog (ref mesh_processing.py:196-217): vertices near
    dense cloud regions score high; low-density trimming drops triangles."""
    import jax.numpy as jnp
    import numpy as np
    from pyqsm_tpu.ops.mesh import map_density, sphere_mesh

    mesh = sphere_mesh(jnp.array([0.0, 0, 0.0]), 1.0, n_lat=8, n_lon=16)
    # cloud sampled only on the +z hemisphere surface
    n = 4000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 2] = np.abs(v[:, 2])
    pts = jnp.asarray(v.astype(np.float32))
    dens, colors, trimmed = map_density(mesh, pts, radius=0.25,
                                        density_threshold_pctile=60.0)
    d = np.asarray(dens)
    vz = np.asarray(mesh.vertices)[:, 2]
    assert d[vz > 0.5].mean() > 5 * max(d[vz < -0.5].mean(), 1.0)
    assert colors.shape == (mesh.vertices.shape[0], 3)
    kept = np.asarray(trimmed.triangles)
    n_kept = (kept[:, 0] >= 0).sum()
    assert 0 < n_kept < mesh.triangles.shape[0]
    # kept triangles live on the dense hemisphere
    tri_z = np.asarray(mesh.vertices)[kept[kept[:, 0] >= 0]][:, :, 2].mean()
    assert tri_z > 0.2


def test_fill_holes_closes_sphere_cap():
    """pymeshfix analog (ref surf_recon.py:38-85): cut a cap out of a
    sphere, fill_holes closes the boundary loop and restores watertightness."""
    import jax.numpy as jnp
    import numpy as np
    from pyqsm_tpu.ops.mesh import fill_holes, mesh_properties, sphere_mesh

    mesh = sphere_mesh(jnp.array([0.0, 0, 0.0]), 1.0, n_lat=10, n_lon=16)
    v = np.asarray(mesh.vertices)
    t = np.asarray(mesh.triangles)
    # remove all triangles whose centroid is in the top cap
    keep = v[t].mean(1)[:, 2] < 0.8
    holed = mesh._replace(triangles=jnp.asarray(t[keep]))
    assert not mesh_properties(holed)["watertight"]
    fixed = fill_holes(holed)
    props = mesh_properties(fixed)
    assert props["watertight"], props
    # area close to the original sphere mesh's
    full = mesh_properties(mesh)["surface_area"]
    assert abs(props["surface_area"] - full) / full < 0.1
