"""Compile-count regression guard (VERDICT r4 #10).

On a remote-attached TPU every distinct compiled program is a server round
trip (seconds for eager ops, minutes for big kernels), so the
distinct-program count of a pipeline run is a first-class budget
(docs/DESIGN.md "Compile-count discipline"). This test enforces the two
census invariants mechanically so future commits can't silently re-inflate
the cold pass:

- an IDENTICAL re-run adds ZERO programs (rule (d): no data-dependent
  shapes leak into traces — live counts are pow2-bucketed, floats that
  never shape a buffer are traced, never static);
- the tiny-pipeline program count stays under a fixed ceiling (the r4
  census measured ~335 programs for a full plot run; the tiny pipeline
  compiles a subset — a ceiling catches per-item recompile regressions
  like the per-value voxel_downsample and per-tree topology compiles
  fixed in r4, commits c99f51d / 1c0ce81).

Runs the pipeline in SUBPROCESSES with a fresh persistent-cache dir: the
parent process has already traced programs, so only a clean process gives
an honest census. CPU-forced (the axon plugin ignores JAX_PLATFORMS, and
two processes must never share the TPU — see .claude verify notes).
"""

from __future__ import annotations

import os
import subprocess
import sys

_RUNNER = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache_dir!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
import jax.numpy as jnp
from pyqsm_tpu.config import IsolationConfig
from pyqsm_tpu.models.plot_pipeline import process_plot

rng = np.random.default_rng(0)

def tree(cx, r, n=3000):
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.uniform(0, 5, n)
    return np.stack([cx + (r + rng.normal(0, .005, n)) * np.cos(th),
                     (r + rng.normal(0, .005, n)) * np.sin(th), z], 1)

pts = np.concatenate([tree(0, 0.3), tree(6, 0.2)]).astype(np.float32)
res = process_plot(
    jnp.asarray(pts), jnp.ones(len(pts), bool),
    iso_cfg=IsolationConfig(base_min_points=15, low_pctile=5.0,
                            max_dist=0.35, cycles=200, min_frontier=2),
    skeleton_voxel=0.08, max_skeleton_points=2048, min_tree_points=300,
)
assert len(res.trees) == 2
"""

# ceiling for the tiny two-tree pipeline's distinct-program count; the r4
# full-plot census was ~335 — a regression that recompiles per tree/value
# shows up as hundreds of extra entries, well above the slack left here
_PROGRAM_CEILING = 400


def _run_once(cache_dir: str) -> int:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)  # no virtual mesh: census the 1-device path
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER.format(cache_dir=cache_dir)],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, f"pipeline run failed:\n{out.stderr[-3000:]}"
    return len([f for f in os.listdir(cache_dir)
                if os.path.isfile(os.path.join(cache_dir, f))])


def test_identical_rerun_adds_zero_programs(tmp_path):
    cache = str(tmp_path / "census_cache")
    os.makedirs(cache)
    n1 = _run_once(cache)
    assert n1 > 0, "persistent cache recorded nothing — census is vacuous"
    assert n1 <= _PROGRAM_CEILING, (
        f"tiny pipeline compiled {n1} programs (> {_PROGRAM_CEILING}): "
        "a shape/static leak is re-inflating the cold pass")
    n2 = _run_once(cache)
    assert n2 == n1, (
        f"identical re-run added {n2 - n1} programs: some trace depends on "
        "run-to-run state (data-dependent shape or unstable static arg)")
