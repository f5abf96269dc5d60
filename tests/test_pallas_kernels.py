"""Pallas kernels in interpret mode vs the XLA reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyqsm_tpu.ops.mesh import cylinder_mesh, sphere_mesh, merge_meshes
from pyqsm_tpu.ops.pallas_kernels import mt_raycast
from pyqsm_tpu.ops.raytrace import cast_rays, pinhole_rays


def test_mt_raycast_matches_xla(rng):
    mesh = merge_meshes([
        sphere_mesh(jnp.array([0.0, 0, 0]), 1.0, n_lat=8, n_lon=16),
        cylinder_mesh(jnp.array([2.0, 0, 0]), jnp.array([0.0, 0, 1]), 0.4, 2.0),
    ])
    origins, dirs = pinhole_rays(jnp.array([0.0, 0, 8.0]), jnp.array([1.0, 0, 0]),
                                 jnp.array([0.0, 1, 0]), 70.0, 64, 48)
    ref = cast_rays(origins, dirs, mesh.vertices, mesh.triangles)
    t, tri, uv, cnt = mt_raycast(origins, dirs, mesh.vertices, mesh.triangles,
                                 ray_tile=512, tri_chunk=256, interpret=True)
    t_np, tref = np.asarray(t), np.asarray(ref.t)
    hit = np.isfinite(tref)
    np.testing.assert_array_equal(np.isfinite(t_np), hit)
    np.testing.assert_allclose(t_np[hit], tref[hit], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref.count))
    # same winning triangle (ties at shared edges aside: compare hit distance)
    assert (np.asarray(tri)[hit] >= 0).all()


def test_mt_raycast_empty_scene():
    verts = jnp.zeros((3, 3), jnp.float32)
    tris = jnp.full((4, 3), -1, jnp.int32)
    origins = jnp.zeros((8, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0, 1.0]]), (8, 1))
    t, tri, uv, cnt = mt_raycast(origins, dirs, verts, tris, interpret=True)
    assert not np.isfinite(np.asarray(t)).any()
    assert (np.asarray(tri) == -1).all()
    assert (np.asarray(cnt) == 0).all()
