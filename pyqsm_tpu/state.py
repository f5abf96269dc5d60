"""Columnar scene state.

The reference passes Open3D point-cloud *objects* around, one per stage, and
keeps parent indices on the side (the pervasive ``(pcd, idxs)`` convention,
e.g. ``geometry/point_cloud_processing.py:148-158``). Here the whole scene is
a single pytree of fixed-capacity padded device arrays with a validity mask —
the representation every jitted kernel consumes and produces. Selection is a
mask update, not a copy; "recover detail" is a gather, not a file-tile scan.

Shapes are static: ``capacity`` is the allocation size; ``mask`` marks live
rows. All transforms preserve capacity, so a whole pipeline jit-compiles once
per capacity bucket.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _pad_to(x: np.ndarray | jax.Array, capacity: int, fill: float = 0.0) -> jax.Array:
    n = x.shape[0]
    if n > capacity:
        raise ValueError(f"{n} rows exceed capacity {capacity}")
    pad = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.asarray(np.pad(np.asarray(x), pad, constant_values=fill))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class PointCloud:
    """Fixed-capacity padded point cloud.

    Fields mirror what the reference threads through its pipeline: positions,
    RGB colors (``utils/io.py:95`` normalises LAS color by 65280), scalar
    intensity, per-point normals, integer labels (cluster/tree ids), and the
    contraction shift vector used for epiphyte ID (``canopy_metrics.py:60-84``).
    """

    points: Array  # [N, 3] f32
    mask: Array  # [N] bool — live rows
    colors: Array | None = None  # [N, 3] f32 in [0, 1]
    intensity: Array | None = None  # [N] f32
    normals: Array | None = None  # [N, 3] f32
    labels: Array | None = None  # [N] i32 (-1 = unassigned, matching DBSCAN noise)
    tree_id: Array | None = None  # [N] i32
    shift: Array | None = None  # [N, 3] f32 contraction displacement

    # --- construction -----------------------------------------------------
    @staticmethod
    def create(
        points: np.ndarray | jax.Array,
        capacity: int | None = None,
        colors: np.ndarray | None = None,
        intensity: np.ndarray | None = None,
        normals: np.ndarray | None = None,
        labels: np.ndarray | None = None,
    ) -> "PointCloud":
        n = points.shape[0]
        if capacity is None:
            capacity = n
        mask = jnp.arange(capacity) < n
        return PointCloud(
            points=_pad_to(points.astype(np.float32), capacity),
            mask=mask,
            colors=None if colors is None else _pad_to(colors.astype(np.float32), capacity),
            intensity=None
            if intensity is None
            else _pad_to(intensity.astype(np.float32), capacity),
            normals=None if normals is None else _pad_to(normals.astype(np.float32), capacity),
            labels=None if labels is None else _pad_to(labels.astype(np.int32), capacity, -1),
        )

    # --- basic properties ---------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.points.shape[0]

    def count(self) -> Array:
        """Number of live points (traced value)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    def select(self, keep: Array) -> "PointCloud":
        """Mask-refine: keep only live rows where ``keep`` is True.

        This replaces the reference's ``select_by_index`` + parent-idx
        bookkeeping — the rows stay in place, so indices into the parent are
        trivially preserved.
        """
        return dataclasses.replace(self, mask=self.mask & keep)

    def with_(self, **kw: Any) -> "PointCloud":
        return dataclasses.replace(self, **kw)

    def masked_points(self, fill: float = jnp.inf) -> Array:
        """Points with dead rows pushed to ``fill`` (keeps them out of
        min-distance reductions)."""
        return jnp.where(self.mask[:, None], self.points, fill)

    # --- host-side utilities (not jittable) -------------------------------
    def to_numpy(self) -> dict[str, np.ndarray]:
        """Extract live rows to host numpy arrays."""
        mask = np.asarray(self.mask)
        out: dict[str, np.ndarray] = {}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v is None or f.name == "mask":
                continue
            out[f.name] = np.asarray(v)[mask]
        return out

    def compact(self) -> "PointCloud":
        """Host-side: drop dead rows (new, smaller capacity)."""
        arrs = self.to_numpy()
        pts = arrs.pop("points")
        pc = PointCloud.create(pts)
        extra = {}
        for name, v in arrs.items():
            extra[name] = jnp.asarray(v)
        return dataclasses.replace(pc, **extra)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Cylinders:
    """Batch of fitted cylinders — the QSM output artifact.

    Field names match the reference's cylinder dict
    (``qsm_generation.py:170-177``: center, axis, height, radius) plus
    branch-order/parent bookkeeping from the sphere-following recursion.
    """

    center: Array  # [M, 3]
    axis: Array  # [M, 3] unit
    height: Array  # [M]
    radius: Array  # [M]
    branch_order: Array  # [M] i32
    parent: Array  # [M] i32 (-1 = root)
    mask: Array  # [M] bool

    @property
    def capacity(self) -> int:
        return self.center.shape[0]

    def count(self) -> Array:
        return jnp.sum(self.mask.astype(jnp.int32))

    def volume(self) -> Array:
        """Total woody volume, masked."""
        v = jnp.pi * self.radius**2 * self.height
        return jnp.sum(jnp.where(self.mask, v, 0.0))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Topology:
    """Skeleton topology: FPS'd vertices + MST edges (skeletonize.py:142-146
    returns a LineSet + nx graph; here it is two arrays + per-point mapping)."""

    vertices: Array  # [V, 3]
    vertex_mask: Array  # [V] bool
    edges: Array  # [E, 2] i32 indices into vertices
    edge_mask: Array  # [E] bool
    point_to_vertex: Array  # [N] i32 — original point -> nearest skeleton vertex


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class SceneState:
    """A full plot scene: the cloud plus derived products as they are built.

    Stages of the reference pipeline (isolate -> skeletonize -> QSM ->
    raycast) each read/extend this state; orbax checkpoints serialize it.
    """

    cloud: PointCloud
    step: Array | None = None  # scalar i32 pipeline step counter

    def with_(self, **kw: Any) -> "SceneState":
        return dataclasses.replace(self, **kw)


def concatenate(clouds: list[PointCloud]) -> PointCloud:
    """Concatenate clouds (host-side; capacities add)."""
    fields = {}
    for name in ("points", "mask", "colors", "intensity", "normals", "labels", "tree_id", "shift"):
        vals = [getattr(c, name) for c in clouds]
        if any(v is None for v in vals):
            fields[name] = None
        else:
            fields[name] = jnp.concatenate(vals, axis=0)
    return PointCloud(**fields)
