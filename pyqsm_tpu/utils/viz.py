"""Visualization & observability utilities.

The reference renders through Open3D windows, TensorBoard 3D summaries, and
rotating GIFs (``viz/viz_utils.py``, ``tree_isolation.py:156-179``). In a
headless TPU deployment the equivalents are: continuous colormaps applied to
per-point scalars (``color_continuous_map``, ref ``viz_utils.py:135-143``),
colored-cloud export to PLY for any viewer, stepwise NPZ dumps as the
TensorBoard-3D replacement, matplotlib scatter snapshots, and NN-distance
histograms (ref ``plotting.py:6-19``).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def color_continuous_map(values: np.ndarray, cmap: str = "plasma") -> np.ndarray:
    """Map a scalar per point to RGB via a matplotlib colormap."""
    import matplotlib

    v = np.asarray(values, np.float64)
    finite = np.isfinite(v)
    lo = v[finite].min() if finite.any() else 0.0
    hi = v[finite].max() if finite.any() else 1.0
    t = (v - lo) / max(hi - lo, 1e-12)
    return matplotlib.colormaps[cmap](np.clip(t, 0, 1))[:, :3].astype(np.float32)


def export_colored_cloud(path: str | Path, points, values=None, colors=None,
                         mask=None) -> None:
    """Write a PLY colored by a scalar (or given RGB) for external viewing —
    the ``draw()``-after-every-stage replacement."""
    from pyqsm_tpu.io.readers import write_ply

    pts = np.asarray(points)
    if mask is not None:
        m = np.asarray(mask)
        pts = pts[m]
        if values is not None:
            values = np.asarray(values)[m]
        if colors is not None:
            colors = np.asarray(colors)[m]
    if colors is None and values is not None:
        colors = color_continuous_map(values)
    write_ply(path, pts, colors=colors)


class StepLogger:
    """Stepwise cloud dumps (TensorBoard-3D summary replacement,
    ``tree_isolation.py:81-87,163-179``): one NPZ per logged step under
    ``logdir``, with labels/scalars attached."""

    def __init__(self, logdir: str | Path, name: str = "run") -> None:
        self.dir = Path(logdir) / name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.steps: list[int] = []

    def log(self, step: int, points, mask=None, **scalars) -> Path:
        pts = np.asarray(points)
        arrays = {"points": pts}
        if mask is not None:
            arrays["mask"] = np.asarray(mask)
        for k, v in scalars.items():
            arrays[k] = np.asarray(v)
        path = self.dir / f"step_{step:06d}.npz"
        np.savez_compressed(path, **arrays)
        self.steps.append(step)
        return path


def scatter_snapshot(path: str | Path, points, values=None, mask=None,
                     elev: float = 20.0, azim: float = -60.0, s: float = 0.5) -> None:
    """Matplotlib 3D scatter PNG — headless stand-in for ``draw()``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(points)
    if mask is not None:
        m = np.asarray(mask)
        pts = pts[m]
        if values is not None:
            values = np.asarray(values)[m]
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=values, s=s, cmap="plasma")
    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect((np.ptp(pts[:, 0]) + 1e-6, np.ptp(pts[:, 1]) + 1e-6,
                       np.ptp(pts[:, 2]) + 1e-6))
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def rotating_compare_gif(
    path: str | Path,
    points_a,
    points_b,
    values_a=None,
    values_b=None,
    steps: int = 36,
    on_frames: int = 3,
    off_frames: int = 3,
    point_size: float = 0.5,
    fps: int = 8,
    figsize: float = 6.0,
) -> Path:
    """Rotating before/after comparison GIF (ref ``rotating_compare_gif``,
    ``viz_utils.py:145-308``): the camera orbits while frames alternate
    between the two geometries every on/off cycle. Headless matplotlib +
    imageio."""
    import imageio.v2 as imageio
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = np.asarray(points_a)
    b = np.asarray(points_b)
    both = np.concatenate([a, b])
    center = both.mean(0)
    span = np.ptp(both, axis=0).max() / 2 + 1e-6
    frames = []
    cycle = on_frames + off_frames
    for i in range(steps):
        use_a = (i % cycle) < on_frames
        pts = a if use_a else b
        vals = values_a if use_a else values_b
        fig = plt.figure(figsize=(figsize, figsize))
        ax = fig.add_subplot(projection="3d")
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], c=vals, s=point_size,
                   cmap="plasma")
        ax.view_init(elev=20, azim=i * 360.0 / steps)
        for setl, c in ((ax.set_xlim, 0), (ax.set_ylim, 1), (ax.set_zlim, 2)):
            setl(center[c] - span, center[c] + span)
        ax.set_axis_off()
        fig.canvas.draw()
        w, h = fig.canvas.get_width_height()
        buf = np.frombuffer(fig.canvas.buffer_rgba(), dtype=np.uint8)
        frames.append(buf.reshape(h, w, 4)[..., :3].copy())
        plt.close(fig)
    path = Path(path)
    imageio.mimsave(path, frames, fps=fps, loop=0)
    return path


def nn_distance_histogram(points, mask=None, k: int = 2, bins: int = 50):
    """Nearest-neighbor distance histogram (ref ``plot_dist_dist``).
    Returns (counts, edges)."""
    import jax.numpy as jnp

    from pyqsm_tpu.ops.neighbors import knn

    pts = jnp.asarray(np.asarray(points, np.float32))
    m = jnp.ones(pts.shape[0], bool) if mask is None else jnp.asarray(np.asarray(mask))
    d, _ = knn(pts, pts, k, query_mask=m, point_mask=m)
    nn = np.asarray(d[:, 1])
    nn = nn[np.isfinite(nn)]
    return np.histogram(nn, bins=bins)
