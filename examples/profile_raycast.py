"""Ray-throughput profile across the three casting paths.

Builds the same device-reconstructed + decimated canopy scene the benchmark
uses, then measures pinhole (screen-space tiles), sun-grid (cell-aligned),
and unstructured-bundle (wavefront cell-major) throughput in Mrays/s with
honest host-transfer fences. Ref capability: Embree-backed
``viz/ray_casting.py:65-71`` in the reference.

Usage::

    python examples/profile_raycast.py                  # real backend
    python examples/profile_raycast.py --backend cpu --n 50000
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2_000_000,
                   help="synthetic plot points to reconstruct the scene from")
    p.add_argument("--target-triangles", type=int, default=400_000)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=950)
    p.add_argument("--bundle-rays", type=int, default=1_000_000)
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parents[1]
                          / ".jax_cache"))
    import jax.numpy as jnp

    from pyqsm_tpu.ops.grid3d import build_grid3d, grid_cast_wavefront
    from pyqsm_tpu.ops.raygrid import (build_image_grid, build_ray_grid,
                                       cell_cast_parallel, image_cast)
    from pyqsm_tpu.ops.voxelmesh import poisson_like_mesh, simplify_mesh

    print("backend:", jax.default_backend(), flush=True)
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).parents[1] / "bench.py")
    _bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_bench)  # synthetic_plot lives at the repo root

    pts = jnp.asarray(_bench.synthetic_plot(args.n, 8))
    canopy = pts[:, 2] > 6.0
    scene = poisson_like_mesh(pts, canopy, voxel=0.12, blur_iters=1)
    scene = simplify_mesh(scene, target_triangles=args.target_triangles)
    n_tri = int(scene.n_triangles())
    print(f"scene: {n_tri} triangles", flush=True)

    v = np.asarray(scene.vertices)
    center = jnp.asarray(v.mean(0))
    eye = center + jnp.asarray([0.0, -30.0, 18.0])
    W, H = args.width, args.height
    gi = build_image_grid(scene.vertices, scene.triangles, eye, center,
                          jnp.asarray([0.0, 0, 1.0]), 60.0, W, H)
    h = image_cast(gi)
    _ = int(np.isfinite(np.asarray(h.t)).sum())
    t0 = time.perf_counter()
    h = image_cast(gi)
    _ = int(np.isfinite(np.asarray(h.t)).sum())
    print(f"pinhole: {W * H / (time.perf_counter() - t0) / 1e6:.2f} Mrays/s",
          flush=True)

    d = np.array([0.3, 0.2, -0.93], np.float32)
    d /= np.linalg.norm(d)
    gs = build_ray_grid(scene.vertices, scene.triangles, d)
    rpc = 16
    n_sun = gs.nx * gs.ny * rpc * rpc
    r = cell_cast_parallel(gs, d, rays_per_cell_side=rpc)
    _ = int(np.isfinite(np.asarray(r.t)).sum())
    t0 = time.perf_counter()
    r = cell_cast_parallel(gs, d, rays_per_cell_side=rpc)
    _ = int(np.isfinite(np.asarray(r.t)).sum())
    print(f"sun-grid: {n_sun / (time.perf_counter() - t0) / 1e6:.2f} Mrays/s",
          flush=True)

    rng = np.random.default_rng(0)
    lo, hi = v.min(0), v.max(0)
    o = jnp.asarray(rng.uniform(lo - 2, hi + 2,
                                (args.bundle_rays, 3)).astype(np.float32))
    dirs = rng.normal(size=(args.bundle_rays, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    grid = build_grid3d(scene.vertices, scene.triangles)
    hits = grid_cast_wavefront(grid, o, jnp.asarray(dirs))
    _ = int(np.isfinite(np.asarray(hits.t)).sum())
    t0 = time.perf_counter()
    hits = grid_cast_wavefront(grid, o, jnp.asarray(dirs))
    nh = int(np.isfinite(np.asarray(hits.t)).sum())
    dt = time.perf_counter() - t0
    print(f"unstructured bundle: {args.bundle_rays / dt / 1e6:.2f} Mrays/s "
          f"({nh} hits)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
