"""End-to-end example: plot scan → trees → QSM → canopy metrics → exposure.

Mirrors the reference's workflow chain (tree_isolation → qsm_generation →
canopy_metrics → ray_casting) on a synthetic plot. Runs on CPU or TPU:

    python examples/full_pipeline.py [--n 200000] [--out /tmp/pyqsm_out]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--out", default="/tmp/pyqsm_out")
    args = parser.parse_args()

    import os

    import jax

    # the axon TPU plugin ignores JAX_PLATFORMS set via env; honor it here
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import synthetic_plot
    from pyqsm_tpu.config import Config, IsolationConfig
    from pyqsm_tpu.io.artifacts import save_cylinders, save_metrics
    from pyqsm_tpu.io.readers import write_npz
    from pyqsm_tpu.models.canopy import canopy_metrics
    from pyqsm_tpu.models.isolation import build_trees
    from pyqsm_tpu.models.raycast import sun_sweep
    from pyqsm_tpu.models.skeleton import skeletonize
    from pyqsm_tpu.ops.mesh import qsm_mesh
    from pyqsm_tpu.ops.sampling import voxel_downsample
    from pyqsm_tpu.utils.viz import export_colored_cloud

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = Config()

    print(f"generating {args.n}-pt synthetic plot...")
    pts = jnp.asarray(synthetic_plot(args.n, 8))
    mask = jnp.ones(args.n, dtype=bool)

    # 1. tree isolation
    t0 = time.perf_counter()
    iso = build_trees(pts, mask, IsolationConfig(
        base_min_points=100, low_pctile=4.0, max_dist=0.2,
        cycles=400, min_frontier=3))
    labels = np.asarray(iso.labels)
    trees = np.unique(labels[labels >= 0])
    print(f"isolated {len(trees)} trees in {time.perf_counter()-t0:.1f}s")
    write_npz(out / "trees.npz", np.asarray(pts), labels=labels)

    # 2. skeleton QSM on the biggest tree
    biggest = trees[np.argmax([(labels == t).sum() for t in trees])]
    tmask = jnp.asarray(labels == biggest)
    p2, m2, _ = voxel_downsample(pts, 0.08, tmask)
    from pyqsm_tpu.ops.sampling import compact_rows
    p2, m2, _ = compact_rows(p2, m2)
    t0 = time.perf_counter()
    skel, topo, cyls = skeletonize(p2, m2, cfg.skeletonize)
    print(f"skeleton QSM: {int(jnp.sum(cyls.mask))} cylinders "
          f"in {time.perf_counter()-t0:.1f}s")
    save_cylinders(out / "qsm.npz", cyls)
    export_colored_cloud(out / "contracted.ply", np.asarray(skel.contracted),
                         values=np.linalg.norm(np.asarray(skel.total_shift), axis=1),
                         mask=np.asarray(m2))

    # 3. canopy metrics on that tree
    t0 = time.perf_counter()
    metrics = canopy_metrics(p2, m2, shift=skel.first_shift, cell=0.1)
    print(f"canopy metrics in {time.perf_counter()-t0:.1f}s: "
          f"counts={metrics['counts']} width@bh={metrics['width_at_bh']:.2f}m")
    save_metrics(out / "metrics.json", metrics)

    # 4. environmental exposure: swept sun angles against the QSM mesh
    scene = qsm_mesh(cyls, segments=8)
    t0 = time.perf_counter()
    sweep = sun_sweep(scene, elevations=(30.0, 60.0, 90.0), nx=128, ny=128)
    for el, res in sweep.items():
        print(f"  sun {el:4.0f}°: exposed 3D {res.surface_area_3d:6.2f} m², "
              f"2D {res.surface_area_2d:6.2f} m²")
    print(f"exposure sweep in {time.perf_counter()-t0:.1f}s")
    print(f"artifacts in {out}")


if __name__ == "__main__":
    main()
