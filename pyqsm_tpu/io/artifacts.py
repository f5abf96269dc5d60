"""Artifact serialization — no pickles.

The reference pickles everything (``utils/io.py:44-60``); here artifacts are
typed NPZ/JSON files: scene state, cylinder lists (field names matching the
reference's cylinder dicts, ``qsm_generation.py:170-177``), metric dicts
(``canopy_metrics.py:349-368``), plus a plain-text table formatter standing
in for PrettyTable (``utils/io.py:136-178``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from pyqsm_tpu.state import Cylinders, PointCloud


def save_artifact(path: str | Path, cloud: PointCloud) -> None:
    arrs = {"points": np.asarray(cloud.points), "mask": np.asarray(cloud.mask)}
    for name in ("colors", "intensity", "normals", "labels", "tree_id", "shift"):
        v = getattr(cloud, name)
        if v is not None:
            arrs[name] = np.asarray(v)
    np.savez_compressed(path, **arrs)


def load_artifact(path: str | Path) -> PointCloud:
    data = np.load(path)
    kw = {k: jnp.asarray(data[k]) for k in data.keys()}
    return PointCloud(**kw)


def save_cylinders(path: str | Path, cyls: Cylinders) -> None:
    np.savez_compressed(
        path,
        center=np.asarray(cyls.center), axis=np.asarray(cyls.axis),
        height=np.asarray(cyls.height), radius=np.asarray(cyls.radius),
        branch_order=np.asarray(cyls.branch_order),
        parent=np.asarray(cyls.parent), mask=np.asarray(cyls.mask),
    )


def load_cylinders(path: str | Path) -> Cylinders:
    d = np.load(path)
    return Cylinders(**{k: jnp.asarray(d[k]) for k in d.keys()})


def save_metrics(path: str | Path, metrics: dict) -> None:
    Path(path).write_text(json.dumps(_jsonify(metrics), indent=2))


def load_metrics(path: str | Path) -> dict:
    return json.loads(Path(path).read_text())


def _jsonify(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        return np.asarray(obj).tolist()
    return obj


def format_table(rows: list[dict], columns: list[str] | None = None) -> str:
    """Aligned plain-text table (PrettyTable stand-in for results reporting,
    ``scripts/result_related/get_projection_results.py:63-90``)."""
    if not rows:
        return "(empty)"
    if columns is None:
        columns = list(rows[0].keys())
    cells = [[_fmt(r.get(c, "")) for c in columns] for r in rows]
    widths = [max(len(c), max(len(row[i]) for row in cells)) for i, c in enumerate(columns)]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "| " + " | ".join(c.ljust(w) for c, w in zip(columns, widths)) + " |", sep]
    for row in cells:
        out.append("| " + " | ".join(v.ljust(w) for v, w in zip(row, widths)) + " |")
    out.append(sep)
    return "\n".join(out)


def _fmt(v: Any) -> str:
    if isinstance(v, float):
        return f"{v:.3f}"
    return str(v)
