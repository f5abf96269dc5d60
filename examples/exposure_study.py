"""Environmental-exposure study: cloud → device surface → sun/camera casts.

Mirrors the reference's ray-casting workflow (``viz/ray_casting.py`` +
``data/notes/methods.md`` "Raycasting Projection"): reconstruct the canopy
surface, sweep sun elevations for exposed/projected areas, render one
camera exposure, and write a JSON table. Runs on CPU or TPU:

    python examples/exposure_study.py [--n 100000] [--out /tmp/pyqsm_exposure]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def synthetic_canopy(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    k = 4
    centers = np.stack([rng.uniform(0, 14, k), rng.uniform(0, 14, k),
                        rng.uniform(6, 9, k)], 1)
    which = rng.integers(0, k, n)
    return (centers[which]
            + rng.normal(0, 1.2, (n, 3)) * [1.0, 1.0, 0.6]).astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--out", default="/tmp/pyqsm_exposure")
    args = parser.parse_args()

    import os

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from pyqsm_tpu.models.raycast import cast_scene, sun_sweep
    from pyqsm_tpu.ops.mesh import map_density, mesh_properties
    from pyqsm_tpu.ops.voxelmesh import poisson_like_mesh, weld_vertices

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    pts = jnp.asarray(synthetic_canopy(args.n))
    mask = jnp.ones(args.n, bool)

    t0 = time.perf_counter()
    mesh = poisson_like_mesh(pts, mask, voxel=0.25, blur_iters=1)
    props = mesh_properties(weld_vertices(mesh))
    print(f"reconstructed {props['n_triangles']} tris "
          f"(SA {props['surface_area']:.1f} m2) in {time.perf_counter()-t0:.1f}s")

    dens, colors, _ = map_density(mesh, pts, mask, radius=0.4)
    print(f"vertex density: mean {float(jnp.mean(dens)):.1f} "
          f"p95 {float(jnp.percentile(dens, 95)):.0f}")

    t0 = time.perf_counter()
    cam = cast_scene(mesh)
    print(f"camera exposure: SA3d {cam.surface_area_3d:.1f} m2, "
          f"hit {cam.hit_fraction:.2%} ({time.perf_counter()-t0:.1f}s)")

    t0 = time.perf_counter()
    sweep = sun_sweep(mesh, elevations=(30.0, 45.0, 60.0, 75.0, 90.0))
    table = {
        str(el): {
            "surface_area_3d_m2": round(r.surface_area_3d, 2),
            "projected_area_2d_m2": round(r.surface_area_2d, 2),
            "hit_fraction": round(r.hit_fraction, 4),
        } for el, r in sweep.items()
    }
    print(f"sun sweep ({len(table)} elevations) in {time.perf_counter()-t0:.1f}s")
    (out / "exposure.json").write_text(json.dumps(table, indent=2))
    for el, row in table.items():
        print(f"  elev {el:>5}: proj 2D {row['projected_area_2d_m2']:8.2f} m2  "
              f"SA 3D {row['surface_area_3d_m2']:8.2f} m2")
    print(f"wrote {out/'exposure.json'}")


if __name__ == "__main__":
    main()
