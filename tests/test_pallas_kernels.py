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


def _dense_from_band(b_w, n, bs):
    W = np.zeros((n, n), np.float32)
    for b in range(b_w.shape[0]):
        lo = (b - 1) * bs
        for t in range(3 * bs):
            j = lo + t
            if 0 <= j < n:
                W[b * bs:(b + 1) * bs, j] = b_w[b, :, t]
    return W


def test_band_matvec_pallas_matches_dense(rng):
    """Pallas banded matvecs (forward + transpose, incl. vmap over trees)
    equal the dense oracle — interpret mode runs the same kernel code."""
    from pyqsm_tpu.ops.pallas_kernels import (band_matvec_pallas,
                                              band_matvec_t_pallas)
    from pyqsm_tpu.ops.sparse import BAND_BLOCK as bs

    nb, c = 4, 3
    n = nb * bs
    b_w = rng.normal(size=(nb, bs, 3 * bs)).astype(np.float32)
    x = rng.normal(size=(n, c)).astype(np.float32)
    W = _dense_from_band(b_w, n, bs)
    y = np.asarray(band_matvec_pallas(jnp.asarray(b_w), jnp.asarray(x),
                                      interpret=True))
    np.testing.assert_allclose(y, W @ x, rtol=2e-4, atol=2e-4)
    yt = np.asarray(band_matvec_t_pallas(jnp.asarray(b_w), jnp.asarray(x),
                                         interpret=True))
    np.testing.assert_allclose(yt, W.T @ x, rtol=2e-4, atol=2e-4)
    # vmapped over a trees axis (the batched contraction's layout)
    bwb = np.stack([b_w, 2 * b_w])
    xb = np.stack([x, x + 1])
    yv = np.asarray(jax.vmap(
        lambda a, b: band_matvec_pallas(a, b, interpret=True)
    )(jnp.asarray(bwb), jnp.asarray(xb)))
    ytv = np.asarray(jax.vmap(
        lambda a, b: band_matvec_t_pallas(a, b, interpret=True)
    )(jnp.asarray(bwb), jnp.asarray(xb)))
    for t in range(2):
        Wt = _dense_from_band(bwb[t], n, bs)
        np.testing.assert_allclose(yv[t], Wt @ xb[t], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(ytv[t], Wt.T @ xb[t], rtol=2e-4, atol=2e-4)


def test_band_matvec_pallas_bf16_counts(rng):
    """The banded region-grow claim feeds bf16 one-hot counts through the
    kernel (ops/sparse._band_apply route): bf16 in, f32 out, positive
    counts never rounded to zero."""
    from pyqsm_tpu.ops.pallas_kernels import band_matvec_pallas
    from pyqsm_tpu.ops.sparse import BAND_BLOCK as bs

    nb, c = 3, 16
    n = nb * bs
    adj = (rng.uniform(size=(nb, bs, 3 * bs)) < 0.05).astype(np.float32)
    onehot = (rng.uniform(size=(n, c)) < 0.1).astype(np.float32)
    W = _dense_from_band(adj, n, bs)
    y = np.asarray(band_matvec_pallas(
        jnp.asarray(adj, jnp.bfloat16), jnp.asarray(onehot, jnp.bfloat16),
        interpret=True))
    assert y.dtype == np.float32
    exact = W @ onehot
    np.testing.assert_array_equal(y > 0, exact > 0)
