"""Test configuration: force an 8-device virtual CPU platform so sharding
paths are exercised without TPU hardware (SURVEY.md §4 test strategy)."""

import os

# Must be set before jax is imported anywhere. Forced (not setdefault): the
# session env may point at a real TPU, but tests validate sharding on a
# virtual 8-device CPU mesh per SURVEY.md §4.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin ignores the env var once registered; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def synthetic_branch(n: int, radius: float = 0.3, length: float = 4.0, noise: float = 0.005,
                     axis=None, base=None, seed: int = 0) -> np.ndarray:
    """Points on a noisy cylinder surface — the canonical QSM test object."""
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, length, n)
    theta = rng.uniform(0, 2 * np.pi, n)
    if axis is None:
        axis = np.array([0.0, 0.0, 1.0])
    axis = np.asarray(axis, dtype=np.float64)
    axis /= np.linalg.norm(axis)
    # orthonormal frame
    ref = np.array([1.0, 0.0, 0.0]) if abs(axis[0]) < 0.9 else np.array([0.0, 1.0, 0.0])
    u = np.cross(axis, ref); u /= np.linalg.norm(u)
    v = np.cross(axis, u)
    r = radius + rng.normal(0, noise, n)
    pts = (t[:, None] * axis + r[:, None] * (np.cos(theta)[:, None] * u + np.sin(theta)[:, None] * v))
    if base is not None:
        pts = pts + np.asarray(base)
    return pts.astype(np.float32)


@pytest.fixture
def cylinder_points():
    return synthetic_branch(2000)


def synthetic_tree(n_per: int = 1500, seed: int = 0) -> np.ndarray:
    """Trunk + two branches — a tiny tree with known topology."""
    trunk = synthetic_branch(n_per, radius=0.25, length=5.0, seed=seed)
    b1 = synthetic_branch(n_per // 2, radius=0.12, length=2.5,
                          axis=[0.6, 0.0, 0.8], base=[0, 0, 3.0], seed=seed + 1)
    b2 = synthetic_branch(n_per // 2, radius=0.10, length=2.0,
                          axis=[-0.5, 0.5, 0.7], base=[0, 0, 4.0], seed=seed + 2)
    return np.concatenate([trunk, b1, b2]).astype(np.float32)


@pytest.fixture
def tree_points():
    return synthetic_tree()
