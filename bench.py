"""Benchmark: Mpts/sec through the isolate → skeletonize → QSM pipeline.

Matches BASELINE.json's metric at the NORTH-STAR workload: a 10M-point
multi-tree plot (trunk rings + canopy blobs, the geometry of the
reference's SKIO scans), isolated into trees and EVERY tree voxel-cleaned,
contraction-skeletonized, and QSM-fit (``process_plot`` — the composition
the reference spreads across tree_isolation → pipeline → qsm_generation).
Baseline for ``vs_baseline``: 10M points in 60 s on v5e-8 = 0.1667 Mpts/s
(BASELINE.md); this bench runs single-chip.

Deadline-hardened: the measurement runs on a worker thread while the main
thread services signals. A full-schema JSON line is (re)emitted after
EVERY completed section — cold pass, steady pass, raycast, sphere-QSM,
ref-params, approx-top-k — so a ``timeout``/SIGTERM kill still leaves the
best-available artifact on stdout (``"partial": true``; the last line is
the most complete one). An optional self-deadline (``--deadline`` /
``BENCH_DEADLINE_S``) emits-and-exits even if the driver only SIGKILLs.

Sections are ordered by evidential value: headline pipeline first, the
raycast secondary next, then sphere-QSM, ref-params isolation, and the
approx-top-k recall check last.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time

import numpy as np

NORTH_STAR_MPTS_S = 10e6 / 60.0 / 1e6  # 0.1667 Mpts/s


def synthetic_plot(n_total: int, n_trees: int = 8, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    per = n_total // n_trees
    trees = []
    grid = int(np.ceil(np.sqrt(n_trees)))
    for i in range(n_trees):
        cx, cy = (i % grid) * 8.0, (i // grid) * 8.0
        n_trunk = per // 2
        n_canopy = per - n_trunk
        th = rng.uniform(0, 2 * np.pi, n_trunk)
        z = rng.uniform(0, 6.0, n_trunk)
        r = 0.3 + rng.normal(0, 0.01, n_trunk)
        trunk = np.stack([cx + r * np.cos(th), cy + r * np.sin(th), z], 1)
        canopy = rng.normal([cx, cy, 7.5], [1.6, 1.6, 1.0], (n_canopy, 3))
        trees.append(np.concatenate([trunk, canopy]))
    return np.concatenate(trees).astype(np.float32)


def synthetic_plot_device(n_total: int, n_trees: int = 8, seed: int = 0):
    """``synthetic_plot`` generated ON DEVICE (same tree layout and
    distributions, JAX PRNG): generating on host cost a 120 MB
    host→device upload whose tunnel variance (20–757 s measured across
    round-5 runs) dominated the cold pass — the single biggest threat to
    a deadline-bounded driver run reaching the steady measurement. One
    small cached program materializes the plot directly in HBM."""
    import jax
    import jax.numpy as jnp

    per = n_total // n_trees
    grid = int(np.ceil(np.sqrt(n_trees)))
    n_trunk = per // 2
    n_canopy = per - n_trunk

    @jax.jit
    def gen():
        ks = jax.random.split(jax.random.PRNGKey(seed), 4)
        i = jnp.arange(n_trees)
        cx = (i % grid) * 8.0
        cy = (i // grid) * 8.0
        th = jax.random.uniform(ks[0], (n_trees, n_trunk), minval=0.0,
                                maxval=2.0 * jnp.pi)
        z = jax.random.uniform(ks[1], (n_trees, n_trunk), minval=0.0,
                               maxval=6.0)
        r = 0.3 + 0.01 * jax.random.normal(ks[2], (n_trees, n_trunk))
        trunk = jnp.stack([cx[:, None] + r * jnp.cos(th),
                           cy[:, None] + r * jnp.sin(th), z], -1)
        center = jnp.stack([cx, cy, jnp.full(n_trees, 7.5)], -1)[:, None, :]
        canopy = center + jax.random.normal(
            ks[3], (n_trees, n_canopy, 3)) * jnp.array([1.6, 1.6, 1.0])
        return jnp.concatenate([trunk, canopy], 1).reshape(-1, 3).astype(
            jnp.float32)

    return gen()


def _progress(msg: str) -> None:
    print(f"# {msg}", file=sys.stderr, flush=True)


class _HeadlineUnavailable(Exception):
    """Raised by a dependent bench section when the section it builds on
    failed — recorded as the section's *_error so the artifact shows the
    skip (not a misleading NameError on an unbound intermediate)."""


class _Artifact:
    """Best-available bench result; every update re-emits one full JSON line
    to stdout (the driver parses the LAST parsable line)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.value = 0.0
        self.detail: dict = {}
        self.partial_note = "no section completed"

    def update(self, *, value: float | None = None, partial: bool = True,
               note: str | None = None, **detail_updates) -> None:
        with self._lock:
            if value is not None:
                self.value = value
            self.detail.update(detail_updates)
            if note is not None:
                self.partial_note = note
            self._emit(partial)

    def emit_signal(self, reason: str) -> None:
        with self._lock:
            self.detail["killed_by"] = reason
            self._emit(True)

    def _emit(self, partial: bool) -> None:
        detail = dict(self.detail)
        if partial:
            detail["partial"] = True
            detail["partial_note"] = self.partial_note
        print(json.dumps({
            "metric": "Mpts/sec isolate->skeleton->QSM pipeline (10M-pt plot)",
            "value": round(self.value, 4),
            "unit": "Mpts/s",
            "vs_baseline": round(self.value / NORTH_STAR_MPTS_S, 3),
            "detail": detail,
        }), flush=True)


ARTIFACT = _Artifact()


def _await_backend(window_s: float, probe_timeout_s: float = 120.0) -> str | None:
    """Probe the accelerator in a SUBPROCESS until it answers or the window
    expires. A dead tunnel has two failure modes — fast UNAVAILABLE errors
    and indefinite hangs — and both must stay out of this process: an
    in-process ``jax.default_backend()`` either raises (killing the bench,
    the r03 artifact loss) or hangs with no way to retry (xla_bridge caches
    the failed init). Subprocess probes are killable and retryable; the
    probe exits before this process connects, so the single-client rule
    holds. Returns the probe's backend name, or None if the window expired.
    """
    import subprocess

    probe = ("import jax\n"
             "x = jax.numpy.ones((128, 128))\n"
             "(x @ x).block_until_ready()\n"
             "print(jax.default_backend())\n")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        # a hung probe must not overshoot the caller's window: each probe is
        # bounded by the remaining window (min one real attempt of 30 s)
        this_timeout = min(probe_timeout_s,
                           max(deadline - time.monotonic(), 30.0))
        try:
            out = subprocess.run(
                [sys.executable, "-c", probe], env=env, timeout=this_timeout,
                capture_output=True, text=True)
            if out.returncode == 0 and out.stdout.strip():
                return out.stdout.strip().splitlines()[-1]
            err = (out.stderr or "").strip().splitlines()
            reason = err[-1][:200] if err else f"rc={out.returncode}"
        except subprocess.TimeoutExpired:
            reason = f"probe hang >{this_timeout:.0f}s"
        remaining = deadline - time.monotonic()
        _progress(f"backend probe {attempt} failed ({reason}); "
                  f"{remaining:.0f}s of retry window left")
        ARTIFACT.update(backend_probe_attempts=attempt,
                        backend_probe_last_error=reason,
                        note="waiting for accelerator backend")
        if remaining <= 0:
            return None
        time.sleep(min(60.0, max(remaining, 1.0)))


def _bench_body(args) -> None:
    # first emission before jax even imports: if the device tunnel is down
    # (uploads hang indefinitely) any kill still finds a parsable line
    ARTIFACT.update(note="started; device not yet contacted")

    if args.backend != "cpu":
        probed = _await_backend(args.backend_retry)
        if probed is None:
            # r03 lost its round number to exactly this: a dead tunnel made
            # backend init raise, rc=1, and the driver parsed nothing. Emit
            # the full-schema line and return cleanly instead.
            ARTIFACT.update(backend_error="accelerator unavailable after "
                            f"{args.backend_retry:.0f}s retry window",
                            note="backend unavailable; no measurement")
            return
        _progress(f"backend probe ok: {probed}")

    import jax

    # persistent compilation cache: axon compiles cost minutes; the cache
    # lives in-repo so later bench runs (and rounds) skip them. Threshold 0:
    # one pipeline run compiles ~335 programs and most are sub-second eager
    # ops that a 1 s threshold would re-pay (as tunnel round trips) on
    # every single run
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # backend guard: the axon plugin ignores JAX_PLATFORMS=cpu env, so an
    # intended CPU smoke run silently lands on the chip (single-client lock,
    # ~300 ms dispatches). --backend cpu forces it properly; the default
    # asserts an accelerator is actually present.
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    try:
        backend = jax.default_backend()
    except Exception as e:  # noqa: BLE001 — probe passed but init still died
        ARTIFACT.update(backend_error=f"{type(e).__name__}: {e}"[:300],
                        note="backend init failed; no measurement")
        return
    if args.backend == "tpu" and backend == "cpu":
        _progress("WARNING: no TPU backend found; running on CPU "
                  "(pass --backend cpu to silence)")

    import jax.numpy as jnp

    def _sync_hits(x) -> int:
        """Honest timing sync for remote-attached TPUs: a device-side scalar
        reduction forces the queue to drain but transfers 4 bytes — both
        ``block_until_ready`` (returns early on axon) and ``np.asarray`` of
        the full hit buffer (a multi-MB download whose tunnel variance lands
        inside the timed region) distort raycast numbers."""
        return int(jnp.sum(jnp.isfinite(x)))

    # Pallas self-test: the banded CG routes through Mosaic kernels on TPU;
    # if this hardware/toolchain rejects them, flip the escape hatch so the
    # bench measures the XLA einsum fallback instead of dying at compile
    if backend == "tpu" and not os.environ.get("PYQSM_NO_PALLAS_BAND"):
        try:
            from pyqsm_tpu.ops.pallas_kernels import band_matvec_pallas
            from pyqsm_tpu.ops.sparse import BAND_BLOCK as _bs

            _y = band_matvec_pallas(jnp.zeros((2, _bs, 3 * _bs)),
                                    jnp.zeros((2 * _bs, 3)))
            jax.block_until_ready(_y)
        except Exception as e:  # noqa: BLE001
            os.environ["PYQSM_NO_PALLAS_BAND"] = "1"
            _progress(f"pallas band kernel unavailable ({type(e).__name__}); "
                      "using XLA fallback")
            ARTIFACT.update(pallas_band="fallback")

    from pyqsm_tpu.config import Config, IsolationConfig
    from pyqsm_tpu.models.isolation import build_trees
    from pyqsm_tpu.models.plot_pipeline import process_plot
    from pyqsm_tpu.models.qsm import sphere_following_qsm
    from pyqsm_tpu.ops.sampling import compact_rows, voxel_downsample

    n = args.n
    _progress(f"generating {n} points on device")
    pts = synthetic_plot_device(n, args.trees)
    _ = float(jnp.sum(pts[0]))  # 4-byte honest materialization sync
    _progress("generation done")
    ARTIFACT.update(n_points=n, backend=backend,
                    scope="process_plot: isolation + skeleton QSM on EVERY "
                          "tree; single chip",
                    note="device generation done; cold pass did not "
                         "complete")
    mask = jnp.ones(n, dtype=bool)
    cfg = Config()

    iso_cfg = IsolationConfig(base_min_points=200, low_pctile=4.0,
                              max_dist=0.2, cycles=400, min_frontier=3)

    # steady-state pipeline fraction completed after each stage (r04 TPU
    # shares: isolation 39%, ladder 4%, contraction 56%, topology <1%) —
    # used to publish an honest points-processed-so-far partial value from
    # INSIDE the cold pass, so a driver kill mid-pipeline still leaves a
    # non-zero artifact (r04's official number was 0.0 for exactly this)
    _STAGE_FRAC = {"isolation": 0.39, "ladder": 0.44,
                   "contraction": 0.99, "topology": 1.0}

    def run_pipeline(partial_basis: str | None = None):
        """One full isolate -> per-tree skeletonize+QSM pass (every tree)."""
        timings = {}
        t0 = time.perf_counter()

        def _stage_done(stage: str, stage_s: float) -> None:
            _progress(f"stage {stage} done in {stage_s:.1f}s")
            if partial_basis is None:
                return
            frac = _STAGE_FRAC.get(stage, 0.0)
            elapsed = time.perf_counter() - t0
            ARTIFACT.update(
                value=n * frac / elapsed / 1e6,
                value_basis=partial_basis,
                partial_stage=stage,
                partial_elapsed_s=round(elapsed, 2),
                note=f"{partial_basis}: pipeline through {stage} "
                     f"({frac:.0%}) in {elapsed:.0f}s",
            )

        _progress("process_plot start")
        res = process_plot(
            pts, mask, cfg, iso_cfg,
            skeleton_voxel=0.03,
            max_skeleton_points=args.skeleton_points,
            min_tree_points=2000,
            progress=_stage_done,
        )
        _progress("process_plot done")
        n_cyl = sum(int(t.cylinders.count()) for t in res.trees)
        timings["total_s"] = time.perf_counter() - t0
        timings.update(res.timings or {})
        return timings, res, n_cyl

    # pass 1: cold process — pays per-kernel executable load (and compiles on
    # a cold cache); pass 2: the steady-state number a resident service sees
    _progress("cold pass")
    cold, res_c, n_cyl_c = run_pipeline(partial_basis="cold_partial")
    lab_c = np.asarray(res_c.growth.labels)
    ARTIFACT.update(
        value=n / cold["total_s"] / 1e6,  # cold throughput = valid lower bound
        cold_total_s=round(cold["total_s"], 2),
        trees_found=int(len(np.unique(lab_c[lab_c >= 0]))),
        trees_skeletonized=len(res_c.trees),
        skeleton_cylinders=int(n_cyl_c),
        value_basis="cold",
        note="cold pass done; steady pass did not complete",
    )
    _progress(f"cold done {cold['total_s']:.1f}s; steady pass")
    steady, res, n_cyl_skel = run_pipeline()

    lab_np = np.asarray(res.growth.labels)
    uniq, counts = np.unique(lab_np[lab_np >= 0], return_counts=True)

    total = steady["total_s"]
    ARTIFACT.update(
        value=n / total / 1e6,
        total_s=round(total, 2),
        stages={k: round(v, 2) if isinstance(v, float) else v
                for k, v in steady.items() if k != "total_s"},
        trees_found=int(len(uniq)),
        trees_skeletonized=len(res.trees),
        skeleton_cylinders=int(n_cyl_skel),
        value_basis="steady",
        note="headline (steady) done; secondary sections pending",
    )
    _progress("steady done; raycast secondary")

    # secondary headline: ray throughput against a device-reconstructed
    # canopy mesh (>=100k triangles — the north-star raycast workload)
    scene = raw_scene = grid_i = None  # tail sections skip on headline failure
    W, H = 1280, 950
    try:
        from pyqsm_tpu.ops.raygrid import (
            build_image_grid, build_ray_grid, cell_cast_parallel, image_cast,
        )
        from pyqsm_tpu.ops.voxelmesh import poisson_like_mesh, simplify_mesh

        canopy_mask = mask & (pts[:, 2] > 6.0)
        raw_scene = poisson_like_mesh(pts, canopy_mask, voxel=0.12,
                                      blur_iters=1)
        n_tri_raw = int(raw_scene.n_triangles())
        scene = simplify_mesh(raw_scene, target_triangles=args.raycast_triangles)
        n_tri = int(scene.n_triangles())

        v = np.asarray(scene.vertices)
        center = jnp.asarray(v.mean(0))
        eye = center + jnp.asarray([0.0, -30.0, 18.0])
        grid_i = build_image_grid(scene.vertices, scene.triangles, eye,
                                  center, jnp.asarray([0.0, 0, 1.0]),
                                  60.0, W, H)
        h = image_cast(grid_i)
        _sync_hits(h.t)
        t0r = time.perf_counter()
        h = image_cast(grid_i)
        _sync_hits(h.t)
        pinhole = W * H / (time.perf_counter() - t0r) / 1e6
        ARTIFACT.update(scene_triangles=n_tri, scene_triangles_raw=n_tri_raw,
                        raycast_Mrays_s=round(pinhole, 2),
                        note="pinhole raycast done")

        direction = np.array([0.3, 0.2, -0.93], np.float32)
        direction /= np.linalg.norm(direction)
        grid_s = build_ray_grid(scene.vertices, scene.triangles, direction)
        rpc = 16
        n_sun = grid_s.nx * grid_s.ny * rpc * rpc
        r = cell_cast_parallel(grid_s, direction, rays_per_cell_side=rpc)
        _sync_hits(r.t)
        t0r = time.perf_counter()
        r = cell_cast_parallel(grid_s, direction, rays_per_cell_side=rpc)
        _sync_hits(r.t)
        ARTIFACT.update(
            sun_grid_Mrays_s=round(n_sun / (time.perf_counter() - t0r) / 1e6, 2),
            note="raycast done; raycast tail pending")
    except Exception as e:  # noqa: BLE001 — secondary metric must not kill bench
        ARTIFACT.update(raycast_error=type(e).__name__)
    _progress("raycast tail: undecimated pinhole")

    # raycast tail (VERDICT r3 #3): the three previously-unmeasured paths.
    # (1) pinhole on the UNdecimated marching-tet scene (kept from the
    # headline section pre-simplify) — the honest no-quality-tradeoff number
    try:
        if raw_scene is None or grid_i is None:
            raise _HeadlineUnavailable
        grid_raw = build_image_grid(raw_scene.vertices, raw_scene.triangles,
                                    eye, center, jnp.asarray([0.0, 0, 1.0]),
                                    60.0, W, H)
        h = image_cast(grid_raw)
        _sync_hits(h.t)
        t0r = time.perf_counter()
        h = image_cast(grid_raw)
        _sync_hits(h.t)
        ARTIFACT.update(
            raycast_undecimated_Mrays_s=round(
                W * H / (time.perf_counter() - t0r) / 1e6, 2),
            note="undecimated pinhole done; wavefront pending")
        del raw_scene, grid_raw
    except Exception as e:  # noqa: BLE001
        ARTIFACT.update(raycast_undecimated_error=type(e).__name__)
    _progress("raycast tail: wavefront unstructured bundle")

    # (2) wavefront cell-major caster on an ARBITRARY bundle (the Embree
    # cast_rays capability for unstructured rays, ref ray_casting.py:151-192;
    # STATUS gap 4 target >=5 Mrays/s)
    try:
        if scene is None:
            raise _HeadlineUnavailable
        from pyqsm_tpu.ops.grid3d import build_grid3d_two_level, two_level_cast

        rngr = np.random.default_rng(0)
        n_bundle = 1_000_000
        vtx = np.asarray(scene.vertices)
        blo, bhi = vtx.min(0), vtx.max(0)
        o_b = jnp.asarray(rngr.uniform(blo - 2, bhi + 2,
                                       (n_bundle, 3)).astype(np.float32))
        d_b = rngr.normal(size=(n_bundle, 3)).astype(np.float32)
        d_b /= np.linalg.norm(d_b, axis=1, keepdims=True)
        t0r = time.perf_counter()
        # two-level: the overflow spill gets its own fine grid instead of a
        # brute every-ray residual pass (0.74 s of the 4.4 s call measured)
        grid3 = build_grid3d_two_level(scene.vertices, scene.triangles)
        # host-side build step (Embree builds its BVH on CPU too) — reported
        # so the amortization claim is checkable at bench scale
        ARTIFACT.update(grid3d_build_s=round(time.perf_counter() - t0r, 2))
        hb = two_level_cast(grid3, o_b, jnp.asarray(d_b), wavefront=True)
        _sync_hits(hb.t)
        t0r = time.perf_counter()
        hb = two_level_cast(grid3, o_b, jnp.asarray(d_b), wavefront=True)
        _sync_hits(hb.t)
        ARTIFACT.update(
            wavefront_Mrays_s=round(
                n_bundle / (time.perf_counter() - t0r) / 1e6, 2),
            note="wavefront done; sharded pinhole pending")
        del grid3
    except Exception as e:  # noqa: BLE001
        ARTIFACT.update(wavefront_error=type(e).__name__)
    _progress("raycast tail: sharded pinhole")

    # (3) the sharded pinhole path (parallel/raycast.py) over every local
    # device — on the single bench chip this measures the sharding overhead
    # directly; on a pod slice it is the scaled number
    try:
        if grid_i is None:
            raise _HeadlineUnavailable
        from pyqsm_tpu.parallel import make_mesh
        from pyqsm_tpu.parallel.raycast import sharded_image_cast

        pmesh = make_mesh()
        h = sharded_image_cast(pmesh, grid_i)
        _sync_hits(h.t)
        t0r = time.perf_counter()
        h = sharded_image_cast(pmesh, grid_i)
        _sync_hits(h.t)
        ARTIFACT.update(
            raycast_sharded_Mrays_s=round(
                W * H / (time.perf_counter() - t0r) / 1e6, 2),
            raycast_sharded_devices=int(np.prod(pmesh.devices.shape)),
            note="raycast tail done; sphere QSM pending")
    except Exception as e:  # noqa: BLE001
        ARTIFACT.update(raycast_sharded_error=type(e).__name__)
    _progress("sphere QSM")

    # sphere-following QSM on the largest tree (the reference's other QSM
    # route, qsm_generation.py:182-316)
    try:
        best = uniq[np.argmax(counts)]
        tree_pts, tree_mask_c, _ = compact_rows(pts, jnp.asarray(lab_np == best))
        voxel = 0.03
        p2, m2, _ = voxel_downsample(tree_pts, voxel, tree_mask_c)
        while int(jnp.sum(m2)) > args.walk_points and voxel < 0.5:
            voxel *= 1.3
            p2, m2, _ = voxel_downsample(tree_pts, voxel, tree_mask_c)
        p2, m2, _ = compact_rows(p2, m2)
        z = np.asarray(p2[:, 2])
        m2_np = np.asarray(m2)
        zmin = float(np.min(np.where(m2_np, z, np.inf)))
        rows = np.flatnonzero(m2_np & (z < zmin + 0.5))
        seed = np.full(1024, -1, np.int32)
        seed[: min(len(rows), 1024)] = rows[:1024]
        t0 = time.perf_counter()
        qsm = sphere_following_qsm(
            p2, m2, jnp.asarray(seed), jnp.asarray(seed >= 0), 0.3,
            sphere=cfg.sphere, dbscan_cfg=cfg.dbscan, max_steps=48,
        )
        cold_s = time.perf_counter() - t0
        ARTIFACT.update(sphere_qsm_cold_s=round(cold_s, 2),
                        sphere_qsm_cylinders=int(qsm.cylinders.count()),
                        note="sphere QSM cold done; steady pending")
        # steady pass: the walk a resident service sees (chain kernels
        # compiled/uploaded; the cold number is dominated by those)
        t0 = time.perf_counter()
        qsm = sphere_following_qsm(
            p2, m2, jnp.asarray(seed), jnp.asarray(seed >= 0), 0.3,
            sphere=cfg.sphere, dbscan_cfg=cfg.dbscan, max_steps=48,
        )
        ARTIFACT.update(sphere_qsm_s=round(time.perf_counter() - t0, 2),
                        note="sphere QSM done; ref-params pending")
    except Exception as e:  # noqa: BLE001
        ARTIFACT.update(sphere_qsm_error=type(e).__name__)
    _progress("ref-params isolation")

    # reference-default isolation parameters (tree_isolation.py:67-70,316)
    # alongside the tuned ones — recorded, not part of the headline metric
    if not args.skip_ref_params:
        try:
            from pyqsm_tpu.ops.sampling import label_segments as _lseg

            ref_iso = IsolationConfig()  # defaults mirror the reference
            t0 = time.perf_counter()
            g = build_trees(pts, mask, ref_iso)
            # tree count via the device-side segment scan: the full 40 MB
            # label download belongs OUTSIDE the timed region (tunnel
            # transfer variance was most of r05's 82.66 s reading)
            ref_trees = int(_lseg(g.labels, u_cap=4096)[4])
            ARTIFACT.update(
                ref_params_isolation_s=round(time.perf_counter() - t0, 2),
                ref_params_trees_found=ref_trees,
                note="ref-params cold done; steady pending")
            # steady pass: the ref-params rep count (~3.8M at 10M pts) has
            # its own shape bucket, so a cold-only number conflates tunnel
            # compile/cache-load time with compute (r05 mid-round: 320.7 s
            # cold on a fresh data draw vs 93.0 s warm)
            t0 = time.perf_counter()
            g = build_trees(pts, mask, ref_iso)
            ref_trees = int(_lseg(g.labels, u_cap=4096)[4])
            ARTIFACT.update(
                ref_params_isolation_steady_s=round(
                    time.perf_counter() - t0, 2),
                ref_params_trees_found=ref_trees,
                note="ref-params done; approx-topk pending")
        except Exception as e:  # noqa: BLE001
            ARTIFACT.update(ref_params_isolation_error=type(e).__name__)
    _progress("approx-topk check")

    # approx-top-k validation ON DEVICE (VERDICT r1 #8): the Laplacian kNN
    # routes through the TPU hardware approx_max_k, which lowers to EXACT
    # top-k on CPU — so CI never exercises the approximate path the TPU
    # actually runs. Recall vs exact at skeleton scale guards against a
    # silent contraction-quality regression.
    try:
        from pyqsm_tpu.ops.neighbors import knn as _knn

        best0 = uniq[np.argmax(counts)]
        tp_, tm_, _ = compact_rows(pts, jnp.asarray(lab_np == best0))
        vx = 0.03
        sp_, sm_, _ = voxel_downsample(tp_, vx, tm_)
        while int(jnp.sum(sm_)) > args.skeleton_points and vx < 0.5:
            vx *= 1.3
            sp_, sm_, _ = voxel_downsample(tp_, vx, tm_)
        sp_, sm_, _ = compact_rows(sp_, sm_)
        _, ia = _knn(sp_, sp_, 21, query_mask=sm_, point_mask=sm_, approx=True)
        _, ie = _knn(sp_, sp_, 21, query_mask=sm_, point_mask=sm_, approx=False)
        live_rows = np.asarray(sm_)
        a = np.asarray(ia)[live_rows]
        e = np.asarray(ie)[live_rows]
        recall = np.mean([
            len(np.intersect1d(a[i][a[i] >= 0], e[i][e[i] >= 0]))
            / max((e[i] >= 0).sum(), 1)
            for i in range(0, len(a), max(len(a) // 2048, 1))
        ])
        ARTIFACT.update(approx_topk_recall=round(float(recall), 4))
    except Exception as e:  # noqa: BLE001
        ARTIFACT.update(approx_topk_error=type(e).__name__)

    # final, complete emission (partial flags are only ever added to the
    # emitted copy, so this line carries none)
    ARTIFACT.update(partial=False, note="complete")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=10_000_000)
    parser.add_argument("--trees", type=int, default=8)
    parser.add_argument("--skeleton-points", type=int, default=40_000)
    parser.add_argument("--walk-points", type=int, default=300_000,
                        help="resolution cap for the sphere walk (the walk "
                        "needs trunk SURFACE density; the contraction cap "
                        "would dissolve the trunk at 10M-pt plots)")
    parser.add_argument("--raycast-triangles", type=int, default=400_000,
                        help="decimation target for the canopy scene (the "
                        "raw marching-tet isosurface is ~1.6M tris at 10M "
                        "pts; vertex-clustering simplification keeps the "
                        "scene at production scale)")
    parser.add_argument("--skip-ref-params", action="store_true")
    parser.add_argument("--backend", default="tpu", choices=["tpu", "cpu"],
                        help="'tpu' (default; warns if absent) or 'cpu' "
                        "(forced via jax.config — the axon plugin ignores "
                        "JAX_PLATFORMS=cpu)")
    parser.add_argument("--backend-retry", type=float,
                        default=float(os.environ.get("BENCH_BACKEND_RETRY_S",
                                                     600)),
                        help="seconds to keep re-probing a dead accelerator "
                        "tunnel before emitting a backend_error artifact "
                        "(subprocess probes; exits 0 either way)")
    parser.add_argument("--deadline", type=float,
                        default=float(os.environ.get("BENCH_DEADLINE_S", 0)),
                        help="self-deadline in seconds (0 = none): emit the "
                        "best-available artifact and exit before an external "
                        "SIGKILL can produce an empty one")
    args = parser.parse_args()

    worker_error: list[BaseException] = []

    def work():
        try:
            _bench_body(args)
        except BaseException as e:  # noqa: BLE001
            worker_error.append(e)

    t = threading.Thread(target=work, daemon=True)

    def on_signal(signum, frame):  # noqa: ARG001
        ARTIFACT.emit_signal(signal.Signals(signum).name)
        os._exit(0)  # worker may be blocked in a device call — exit hard

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGHUP):
        signal.signal(sig, on_signal)
    if args.deadline > 0:
        signal.signal(signal.SIGALRM, on_signal)
        signal.alarm(int(args.deadline))

    t.start()
    while t.is_alive():  # main thread stays signal-responsive
        time.sleep(0.2)
    if worker_error:
        # never re-raise: rc!=0 plus a traceback as the last stdout line is
        # how r03's number was lost. Traceback goes to stderr; the last
        # stdout line stays the parsable artifact; rc stays 0.
        import traceback

        traceback.print_exception(worker_error[0], file=sys.stderr)
        ARTIFACT.emit_signal(f"worker_error:{type(worker_error[0]).__name__}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
