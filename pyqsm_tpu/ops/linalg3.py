"""Closed-form symmetric 3×3 eigendecomposition (batched, jit-safe).

Used by normal estimation and eigenfeatures (the jakteristics capability,
``exploration.py:62-68``). Analytic trigonometric method — no iterative
solver, so it vmaps/tiles cleanly on the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def sym_eigvals3(A: Array) -> Array:
    """Eigenvalues of symmetric [..., 3, 3], ascending. Trig closed form."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    # r = det(B) / (2 p^3), clamped into [-1, 1]
    detB = jnp.linalg.det(B)
    denom = jnp.maximum(2.0 * p**3, 1e-30)
    r = jnp.clip(detB / denom, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    return jnp.stack([e3, e2, e1], axis=-1)  # ascending


def _eigvec_for(A: Array, lam: Array) -> Array:
    """Eigenvector of symmetric 3×3 for eigenvalue lam via cross products of
    (A - lam I) rows (most robust pair chosen by norm)."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1).argmax(axis=-1)
    v = jnp.where(
        (best == 0)[..., None], c01, jnp.where((best == 1)[..., None], c02, c12)
    )
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30))
    v = v / norm
    # degenerate (repeated eigenvalue) fallback: unit z
    ok = (jnp.maximum(jnp.maximum(n01, n02), n12) > 1e-24)[..., None]
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=A.dtype), v.shape)
    return jnp.where(ok, v, fallback)


def sym_eig3(A: Array) -> tuple[Array, Array]:
    """Eigenvalues (ascending) and eigenvectors [..., 3(vec), 3(which)] of a
    symmetric [..., 3, 3] batch. ``vecs[..., :, i]`` pairs with ``vals[..., i]``."""
    vals = sym_eigvals3(A)
    v0 = _eigvec_for(A, vals[..., 0])
    v2 = _eigvec_for(A, vals[..., 2])
    # middle vector: orthogonal complement (robust to clustered eigenvalues)
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1, keepdims=True), 1e-30))
    v1 = v1 / n1
    vecs = jnp.stack([v0, v1, v2], axis=-1)
    return vals, vecs
