"""Stage-level profiler for plot isolation (`models/isolation.build_trees`).

Splits the bench headline's `isolation_s` into its real sub-stages with
forced host syncs after each (axon's block_until_ready returns early, so a
4-byte scalar pull is the honest fence), and A/Bs the two bit-identical
per-cycle claim kernels (banded MXU vs [N,k] gather — `PYQSM_CLAIM` env)
on the same graph.

Reference scope being profiled: `pyQSM/tree_isolation.py:63-283`
(extend_seed_clusters) + `:285-326` (id_trunk_bases) + `:400-423`
(build_trees_nogrid).

Usage:
    python examples/profile_isolation.py --n 10000000 [--claim gather|band|both]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _sync(x) -> None:
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(x)
    _ = float(jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--trees", type=int, default=8)
    ap.add_argument("--claim", choices=["gather", "band", "push", "both"],
                    default="both",
                    help="claim kernel(s) to A/B; 'push' is the at-scale "
                         "default in build_trees (frontier-compacted, "
                         "O(N*kt) total)")
    ap.add_argument("--repeat", type=int, default=2,
                    help="passes per claim path (first is compile-inclusive)")
    ap.add_argument("--headline", action="store_true",
                    help="use the bench headline iso config (max_dist=0.2 "
                         "etc.) instead of the reference defaults")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin ignores the env var; only the config call works
        jax.config.update("jax_platforms", "cpu")
    from pyqsm_tpu.pipeline.cli import enable_compilation_cache

    enable_compilation_cache()  # tunnel compiles are ~85 s/program otherwise
    import jax.numpy as jnp

    from pyqsm_tpu.config import IsolationConfig
    from pyqsm_tpu.models import isolation
    from pyqsm_tpu.ops.neighbors import grid_self_radius_knn
    from pyqsm_tpu.ops.sampling import compact_rows, label_segments, voxel_downsample
    from pyqsm_tpu.ops.sparse import morton_codes

    print(f"# backend {jax.default_backend()}", flush=True)
    if args.headline:  # mirrors bench.py's headline iso_cfg
        cfg = IsolationConfig(base_min_points=200, low_pctile=4.0,
                              max_dist=0.2, cycles=400, min_frontier=3)
    else:
        cfg = IsolationConfig()
    t0 = time.perf_counter()
    from bench import synthetic_plot_device

    points = synthetic_plot_device(args.n, n_trees=args.trees)
    mask = jnp.ones(points.shape[0], bool)
    _sync(points)
    print(f"generate_s        {time.perf_counter() - t0:8.2f} (on device — "
          f"host upload variance was 20-757 s)", flush=True)

    pre_voxel = cfg.max_dist / 2.0

    def make_stage(tag):
        def stage(name, fn):
            t = time.perf_counter()
            out = fn()
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "dtype")]
            if leaves:
                _sync(leaves[0])
            print(f"{name:<18}[{tag}]{time.perf_counter() - t:8.2f}",
                  flush=True)
            return out
        return stage

    # ---- shared prefix (matches build_trees line for line), run twice:
    # pass 0 pays compiles, pass 1 is the steady split ----
    for tag in ("cold", "steady"):
        stage = make_stage(tag)
        rep_pts, rep_mask, trace = stage(
            "voxel_downsample",
            lambda: voxel_downsample(points, pre_voxel, mask))
        rep_pts, rep_mask, rep_rows = stage(
            "compact_rows", lambda: compact_rows(rep_pts, rep_mask))
        print(f"# reps rows={rep_pts.shape[0]} live={int(jnp.sum(rep_mask))}",
              flush=True)

        def _morton():
            mperm = jnp.argsort(morton_codes(rep_pts, rep_mask))
            return rep_pts[mperm], rep_mask[mperm], rep_rows[mperm]

        rep_pts, rep_mask, rep_rows = stage("morton_sort", _morton)
        seed_labels, low, high = stage(
            "id_trunk_bases",
            lambda: isolation.id_trunk_bases(rep_pts, rep_mask, cfg))
        search = low | high
        _, nbr_idx = stage(
            "radius_knn",
            lambda: grid_self_radius_knn(rep_pts, radius=cfg.max_dist, k=16,
                                         mask=search, sort=False,
                                         need_dists=False))

    _, _, seg_vals, _, seg_n = label_segments(seed_labels, u_cap=4096)
    n_seed = int(seg_n)
    ccap = 16
    while ccap < max(n_seed, 1):
        ccap *= 2
    vals_n = seg_vals[: max(n_seed, 1)]
    pos = jnp.searchsorted(vals_n, seed_labels).astype(jnp.int32)
    compact = jnp.where(seed_labels >= 0, pos, -1)
    print(f"# seeds={n_seed} ccap={ccap}", flush=True)

    # ---- claim-path A/B ----
    paths = ["gather", "band"] if args.claim == "both" else [args.claim]
    results = {}
    prior_claim = os.environ.get("PYQSM_CLAIM")  # restored after the A/B
    for path in paths:
        os.environ["PYQSM_CLAIM"] = path
        if path == "band":
            t = time.perf_counter()
            b_adj, s_i, s_j, s_w, over = isolation._claim_band(nbr_idx, search)
            _sync(b_adj)
            print(f"band_build_s      {time.perf_counter() - t:8.2f} "
                  f"(spill_overflow={bool(over)})", flush=True)
        for r in range(args.repeat):
            t = time.perf_counter()
            res = isolation.region_grow(
                nbr_idx, compact, search, max_cycles=cfg.cycles,
                min_frontier=cfg.min_frontier, cluster_cap=ccap)
            _sync(res.labels)
            dt = time.perf_counter() - t
            tag = "cold" if r == 0 else "steady"
            print(f"grow[{path}:{tag}]  {dt:8.2f}  "
                  f"cycles={int(res.cycles_run)} "
                  f"kernel={isolation.LAST_CLAIM_KERNEL}",
                  flush=True)
            results[(path, tag)] = (dt, np.asarray(res.labels))
    if prior_claim is None:
        os.environ.pop("PYQSM_CLAIM", None)
    else:
        os.environ["PYQSM_CLAIM"] = prior_claim

    if len(paths) == 2:
        a = results[("gather", "steady" if args.repeat > 1 else "cold")][1]
        b = results[("band", "steady" if args.repeat > 1 else "cold")][1]
        print(f"# labels identical: {bool(np.array_equal(a, b))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
