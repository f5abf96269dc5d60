"""Batch pipeline driver.

TPU-native rebuild of ``pyQSM/pipeline.py``: seed-keyed file discovery
(regex per folder, ref :14-36), declarative per-file-type loading
(ref :55-65), a batch runner with per-seed error capture (ref :67-131),
and stage-level checkpoint/resume replacing both the reference's ``start=``
stage parameters (``qsm_generation.py:319-341``) and its in-loop pickles
(``tree_isolation.py:181-194``) — artifacts are NPZ, full pytree snapshots
go through orbax.
"""

from __future__ import annotations

import logging
import re
import traceback
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Callable

import jax
import numpy as np

from pyqsm_tpu.io.readers import read_point_cloud

log = logging.getLogger("pyqsm_tpu.pipeline")


def get_files_by_seed(
    folders: list[str | Path],
    seed_pattern: str = r"(\d+)",
    extensions: tuple[str, ...] = (".las", ".pcd", ".ply", ".npz", ".xyz", ".pts"),
) -> dict[str, list[Path]]:
    """Group files by the seed id captured by ``seed_pattern`` in the
    filename (ref ``get_files_by_seed``)."""
    out: dict[str, list[Path]] = {}
    pat = re.compile(seed_pattern)
    for folder in folders:
        folder = Path(folder)
        if not folder.exists():
            continue
        for f in sorted(folder.iterdir()):
            if f.suffix.lower() not in extensions:
                continue
            m = pat.search(f.name)
            if m:
                out.setdefault(m.group(1), []).append(f)
    return out


def load_seed_data(
    files: list[Path],
    loaders: dict[str, Callable[[Path], Any]] | None = None,
) -> dict[str, Any]:
    """Declarative per-file-type loading (ref ``get_data_from_config``):
    keys are filename-substring matchers, values are loader callables;
    unmatched files fall back to ``read_point_cloud``."""
    out: dict[str, Any] = {}
    for f in files:
        loaded = None
        name = None
        if loaders:
            for key, fn in loaders.items():
                if key in f.name:
                    loaded = fn(f)
                    name = key
                    break
        if loaded is None:
            loaded = read_point_cloud(f)
            name = f.stem
        out[name] = loaded
    return out


def loop_over_files(
    func: Callable[[str, dict], Any],
    folders: list[str | Path],
    seed_pattern: str = r"(\d+)",
    loaders: dict[str, Callable] | None = None,
    skip_seeds: tuple[str, ...] = (),
    n_workers: int = 1,
) -> tuple[dict[str, Any], dict[str, str]]:
    """Run ``func(seed, data)`` for every discovered seed, collecting
    per-seed errors instead of aborting (ref ``loop_over_files`` :118-129).
    IO-bound loading can be threaded; compute stays sequential because each
    seed's kernels already saturate the device."""
    by_seed = get_files_by_seed(folders, seed_pattern)
    results: dict[str, Any] = {}
    errors: dict[str, str] = {}

    def run(seed: str) -> None:
        if seed in skip_seeds:
            return
        try:
            data = load_seed_data(by_seed[seed], loaders)
            results[seed] = func(seed, data)
        except Exception as e:  # noqa: BLE001 — per-seed isolation is the point
            errors[seed] = f"{type(e).__name__}: {e}\n{traceback.format_exc()}"
            log.error("seed %s failed: %s", seed, e)

    if n_workers > 1:
        with ThreadPoolExecutor(n_workers) as pool:
            list(pool.map(run, by_seed))
    else:
        for seed in by_seed:
            run(seed)
    return results, errors


# ---------------------------------------------------------------------------
# staged pipeline with resume
# ---------------------------------------------------------------------------


class StagedPipeline:
    """Named stages with NPZ-array checkpoints and ``start=`` resume
    (the reference's stage pattern, ``qsm_generation.py:319-502``).

    Each stage is ``fn(state: dict[str, np.ndarray]) -> dict`` over plain
    array dicts; after each stage the state is saved to
    ``<workdir>/<seed>_<stage>.npz``. ``run(start=...)`` loads the artifact
    of the stage *before* ``start`` and continues from there.
    """

    def __init__(self, workdir: str | Path, seed: str = "default") -> None:
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.seed = seed
        self.stages: list[tuple[str, Callable[[dict], dict]]] = []

    def add_stage(self, name: str, fn: Callable[[dict], dict]) -> "StagedPipeline":
        self.stages.append((name, fn))
        return self

    def _path(self, stage: str) -> Path:
        return self.workdir / f"{self.seed}_{stage}.npz"

    def run(self, state: dict | None = None, start: str | None = None) -> dict:
        names = [n for n, _ in self.stages]
        begin = 0
        if start is not None:
            if start not in names:
                raise ValueError(f"unknown stage {start!r}; have {names}")
            begin = names.index(start)
            if begin > 0:
                prev = self._path(names[begin - 1])
                if not prev.exists():
                    raise FileNotFoundError(
                        f"cannot resume at {start!r}: missing checkpoint {prev}"
                    )
                state = dict(np.load(prev))
                log.info("resumed from %s", prev)
        if state is None:
            state = {}
        for name, fn in self.stages[begin:]:
            log.info("stage %s", name)
            state = fn(state)
            arrays = {k: np.asarray(v) for k, v in state.items()
                      if isinstance(v, (np.ndarray, jax.Array))}
            np.savez_compressed(self._path(name), **arrays)
        return state


def save_checkpoint(path: str | Path, pytree: Any) -> None:
    """Orbax checkpoint of an arbitrary pytree (scene state snapshots —
    the replacement for the growth loop's periodic pickles)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(Path(path).absolute(), pytree, force=True)


def load_checkpoint(path: str | Path, template: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(Path(path).absolute(), item=template)
        return ckptr.restore(Path(path).absolute())
