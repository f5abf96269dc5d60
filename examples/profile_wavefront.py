"""Per-round TPU profile of the wavefront unstructured caster.

Reconstructs the BENCH scene (device marching-tet canopy mesh, decimated to
the bench triangle budget) and fires the bench's 1M-ray arbitrary bundle
through ``grid_cast_wavefront(debug=True)`` — per-round frontier/block/
timing stats localize where the round budget goes (the caster's target is
>=5 Mrays/s; ref capability: Embree ``cast_rays`` on arbitrary bundles,
``viz/ray_casting.py:151-192``).

Usage: python examples/profile_wavefront.py [--n-points 2000000]
       [--rays 1000000] [--visits 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-points", type=int, default=10_000_000)
    ap.add_argument("--rays", type=int, default=1_000_000)
    ap.add_argument("--visits", type=int, default=4)
    ap.add_argument("--triangles", type=int, default=220_000)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import synthetic_plot

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin ignores the env var; only the config call works
        jax.config.update("jax_platforms", "cpu")
    from pyqsm_tpu.pipeline.cli import enable_compilation_cache

    enable_compilation_cache()  # tunnel compiles are ~85 s/program otherwise
    import jax.numpy as jnp

    from pyqsm_tpu.ops.grid3d import build_grid3d_two_level, two_level_cast
    from pyqsm_tpu.ops.voxelmesh import poisson_like_mesh, simplify_mesh

    print(f"# backend {jax.default_backend()}", flush=True)
    pts = jnp.asarray(synthetic_plot(args.n_points))
    mask = jnp.ones(pts.shape[0], bool)
    canopy = mask & (pts[:, 2] > 6.0)
    raw = poisson_like_mesh(pts, canopy, voxel=0.12, blur_iters=1)
    scene = simplify_mesh(raw, target_triangles=args.triangles)
    print(f"# scene {int(scene.n_triangles())} tris "
          f"(raw {int(raw.n_triangles())})", flush=True)

    t0 = time.perf_counter()
    grid = build_grid3d_two_level(scene.vertices, scene.triangles)
    g0 = getattr(grid, "primary", grid)
    print(f"grid_build_s      {time.perf_counter() - t0:8.2f} "
          f"(dims {g0.nx}x{g0.ny}x{g0.nz}, occ {g0.n_occupied}, "
          f"two_level={hasattr(grid, 'primary')})", flush=True)

    rngr = np.random.default_rng(0)
    vtx = np.asarray(scene.vertices)
    blo, bhi = vtx.min(0), vtx.max(0)
    o_b = jnp.asarray(
        rngr.uniform(blo - 1, bhi + 1, (args.rays, 3)).astype(np.float32))
    d_b = rngr.normal(size=(args.rays, 3)).astype(np.float32)
    d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)
    d_b = jnp.asarray(d_b)

    import jax.numpy as _jnp

    for tag in ("cold", "steady", "steady2"):
        t0 = time.perf_counter()
        h = two_level_cast(grid, o_b, d_b, wavefront=True,
                           visits=args.visits, debug=(tag != "cold"))
        nhit = int(_jnp.sum(_jnp.isfinite(h.t)))  # 4-byte honest sync
        dt = time.perf_counter() - t0
        print(f"wavefront[{tag}]   {dt:8.2f}  "
              f"{args.rays / dt / 1e6:6.2f} Mrays/s  hits={nhit}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
