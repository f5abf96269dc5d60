"""Massively batched RANSAC shape fitting.

Replaces pyransac3d's serial hypothesis loop (``fit.py:277-283``) with
thousands of minimal samples scored in parallel — each hypothesis is three
gathered points, the circumcircle is closed-form, and inlier counting is one
masked reduction, so the whole fit is a couple of batched matmul-scale ops.

The QSM path mirrors the reference's ``z_align_and_fit`` (``fit.py:23-45``):
rotate the cluster so its principal axis is +z, fit a circle to the XY
projection, lift back — yielding the cylinder params dict
(center/axis/height/radius, ``qsm_generation.py:170-177``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.geometry import rotation_matrix_from_vectors
from pyqsm_tpu.ops.linalg3 import sym_eig3

Array = jax.Array


class CircleFit(NamedTuple):
    center: Array  # [2]
    radius: Array  # scalar
    inliers: Array  # [N] bool
    n_inliers: Array  # scalar i32
    ok: Array  # scalar bool — some hypothesis passed the radius gates


class CylinderFit(NamedTuple):
    center: Array  # [3] midpoint on axis
    axis: Array  # [3] unit
    radius: Array
    height: Array
    inliers: Array  # [N] bool
    n_inliers: Array
    ok: Array


def _circumcircle(p: Array) -> tuple[Array, Array]:
    """Circumcircle of three 2D points [3,2] -> (center [2], radius)."""
    a, b, c = p[0], p[1], p[2]
    d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
    d = jnp.where(jnp.abs(d) < 1e-12, jnp.inf, d)
    a2, b2, c2 = jnp.sum(a * a), jnp.sum(b * b), jnp.sum(c * c)
    ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
    uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
    center = jnp.stack([ux, uy])
    radius = jnp.linalg.norm(a - center)
    return center, radius


@partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_circle_2d(
    pts2d: Array,  # [N, 2]
    mask: Array,
    key: Array,
    threshold: float = 0.01,
    n_hypotheses: int = 1024,
    max_radius: float = jnp.inf,
    min_radius: float = 0.0,
) -> CircleFit:
    """Batched RANSAC circle fit with a Kåsa least-squares refinement on the
    winning hypothesis' inliers. Radius gates reject hypotheses outside
    [min_radius, max_radius] (the reference's sanity clamps,
    ``fit.py:286-289``)."""
    n = pts2d.shape[0]
    w = jnp.where(mask, 1.0, 0.0)
    p = w / jnp.maximum(jnp.sum(w), 1.0)
    samples = jax.random.choice(key, n, shape=(n_hypotheses, 3), p=p)
    tri = pts2d[samples]  # [H, 3, 2]
    centers, radii = jax.vmap(_circumcircle)(tri)  # [H,2], [H]

    d = jnp.linalg.norm(pts2d[None, :, :] - centers[:, None, :], axis=-1)  # [H,N]
    resid = jnp.abs(d - radii[:, None])
    inl = (resid <= threshold) & mask[None, :]
    scores = jnp.sum(inl, axis=1)
    gate = (radii >= min_radius) & (radii <= max_radius) & jnp.isfinite(radii)
    scores = jnp.where(gate, scores, -1)
    best = jnp.argmax(scores)
    any_ok = scores[best] >= 0
    best_inl = inl[best] & any_ok

    # Kåsa refinement: solve [2x 2y 1][a b c]^T = x^2+y^2 over inliers
    wts = best_inl.astype(pts2d.dtype)
    x, y = pts2d[:, 0], pts2d[:, 1]
    A = jnp.stack([2 * x, 2 * y, jnp.ones_like(x)], axis=1) * wts[:, None]
    b = (x * x + y * y) * wts
    ATA = A.T @ A + 1e-9 * jnp.eye(3, dtype=pts2d.dtype)
    sol = jnp.linalg.solve(ATA, A.T @ b)
    c_ref = sol[:2]
    r_ref = jnp.sqrt(jnp.maximum(sol[2] + jnp.sum(c_ref * c_ref), 0.0))
    use_ref = (
        (r_ref >= min_radius) & (r_ref <= max_radius) & (jnp.sum(best_inl) >= 3)
    )
    center = jnp.where(use_ref, c_ref, centers[best])
    radius = jnp.where(use_ref, r_ref, radii[best])
    d2 = jnp.abs(jnp.linalg.norm(pts2d - center[None, :], axis=-1) - radius)
    inliers = (d2 <= threshold) & mask & any_ok
    return CircleFit(center, radius, inliers, jnp.sum(inliers), any_ok)


@jax.jit
def principal_axis(points: Array, mask: Array) -> tuple[Array, Array]:
    """Largest-eigenvector direction of the cluster (sign: +z hemisphere)
    and the elongation ratio e_max / e_mid (1 = isotropic disc/ball)."""
    w = mask.astype(points.dtype)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(points * w, axis=0) / n
    centered = (points - mean) * w
    cov = centered.T @ centered / n
    vals, vecs = sym_eig3(cov)
    axis = vecs[:, 2]
    elong = vals[2] / jnp.maximum(vals[1], 1e-20)
    return axis * jnp.where(axis[2] < 0, -1.0, 1.0), elong


@partial(jax.jit, static_argnames=("n_hypotheses", "align_axis"))
def fit_cylinder(
    points: Array,  # [N, 3]
    mask: Array,
    key: Array,
    threshold: float = 0.02,
    n_hypotheses: int = 1024,
    max_radius: float = jnp.inf,
    min_radius: float = 0.0,
    align_axis: str = "auto",
) -> CylinderFit:
    """Cylinder via axis-align-then-circle (the reference's
    ``z_align_and_fit`` + ``fit_shape_RANSAC('circle')`` route,
    ``fit.py:23-45,253-339``): rotate so the estimated axis is +z, RANSAC-fit
    the projected circle, lift back to 3D.

    ``align_axis``: 'pca' rotates by the principal axis, 'z' z-flattens
    directly (the reference's circle branch, ``fit.py:274-277``), 'auto'
    uses PCA only when the cluster is clearly elongated (a short trunk slab's
    principal axis lies in the ring plane and would wreck the fit).
    """
    pax, elong = principal_axis(points, mask)
    zhat = jnp.array([0.0, 0.0, 1.0], points.dtype)
    if align_axis == "pca":
        axis = pax
    elif align_axis == "z":
        axis = zhat
    elif align_axis == "auto":
        axis = jnp.where(elong > 4.0, pax, zhat)
    else:
        raise ValueError(align_axis)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), 1e-12)
    R = rotation_matrix_from_vectors(axis, jnp.array([0.0, 0.0, 1.0], points.dtype))
    rot = points @ R.T
    fit = ransac_circle_2d(
        rot[:, :2], mask, key,
        threshold=threshold, n_hypotheses=n_hypotheses,
        max_radius=max_radius, min_radius=min_radius,
    )
    z = jnp.where(mask, rot[:, 2], jnp.nan)
    zmin, zmax = jnp.nanmin(z), jnp.nanmax(z)
    height = jnp.maximum(zmax - zmin, 1e-6)
    center_rot = jnp.concatenate([fit.center, jnp.array([(zmin + zmax) / 2.0])])
    center = center_rot @ R  # R^-1 = R^T; (R^T @ c) == c @ R
    return CylinderFit(center, axis, fit.radius, height, fit.inliers, fit.n_inliers, fit.ok)


@jax.jit
def points_in_cylinder(
    points: Array, center: Array, axis: Array, radius: float, height: float,
    radial_slack: float = 1.0,
) -> Array:
    """Occupancy test against a cylinder (reference does this with sampled
    cylinder meshes + Embree occupancy, ``ray_casting.py:53-71`` — here it is
    closed form)."""
    rel = points - center[None, :]
    t = rel @ axis
    radial = jnp.linalg.norm(rel - t[:, None] * axis[None, :], axis=-1)
    return (jnp.abs(t) <= height / 2.0) & (radial <= radius * radial_slack)


def sample_cylinder_surface(
    center: Array, axis: Array, radius: float, height: float, n: int = 512,
    key: Array | None = None,
) -> Array:
    """Closed-form cylinder surface point sampling (replaces skspatial
    ``Cylinder.to_points``, ``skeletonize.py:406-407``) — for viz/export."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (n,), minval=0, maxval=2 * jnp.pi)
    t = jax.random.uniform(k2, (n,), minval=-height / 2, maxval=height / 2)
    ref = jnp.where(jnp.abs(axis[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    u = jnp.cross(axis, ref)
    u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    v = jnp.cross(axis, u)
    return (
        center[None, :]
        + t[:, None] * axis[None, :]
        + radius * (jnp.cos(theta)[:, None] * u[None, :] + jnp.sin(theta)[:, None] * v[None, :])
    )
