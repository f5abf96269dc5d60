"""ctypes bindings to the native C++ ingestion library (``native/pointio.cpp``).

Builds the shared library on first use (g++ is in the image); every entry
point has a numpy fallback so the package works without a toolchain. The
native path exists because the reference's scan ingestion is the one place
where raw CPU throughput gates the pipeline (800M-point text scans,
``scripts/read_in_by_parts.py``).
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("pyqsm_tpu.io")

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libpointio.so"
_lib: ctypes.CDLL | None = None
_build_failed = False


def _get_lib() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    src = _NATIVE_DIR / "pointio.cpp"
    if not src.exists():
        _build_failed = True
        return None
    try:
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO_PATH), str(src)],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.parse_xyz.restype = ctypes.c_int64
        lib.parse_xyz.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.count_rows.restype = ctypes.c_int64
        lib.count_rows.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.voxel_accumulate.restype = ctypes.c_int64
        lib.voxel_accumulate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        _lib = lib
        return lib
    except Exception as e:  # noqa: BLE001 — fall back to numpy on any build issue
        log.warning("native pointio unavailable (%s); using numpy fallback", e)
        _build_failed = True
        return None


def native_available() -> bool:
    return _get_lib() is not None


def parse_text_points(data: bytes, n_cols: int) -> np.ndarray:
    """Parse whitespace text into [rows, n_cols] float64 — native fast path,
    numpy fallback."""
    lib = _get_lib()
    if lib is None:
        rows = [l.split()[:n_cols] for l in data.decode("ascii", "replace").splitlines()
                if l.strip() and not l.lstrip().startswith("#")]
        rows = [r for r in rows if len(r) == n_cols]
        return np.asarray(rows, dtype=np.float64)
    max_rows = lib.count_rows(data, len(data))
    out = np.empty((max(max_rows, 1), n_cols), np.float64)
    n = lib.parse_xyz(
        data, len(data), n_cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows,
    )
    return out[:n]


class StreamingVoxelizer:
    """Streaming voxel accumulator for out-of-core ingestion: feed point
    batches, get voxel centroids at the end — the raw scan never lives in
    RAM (replaces the reference's write-tiles-then-rescan workflow,
    ``read_in_by_parts.py`` + ``reconstruction.py``)."""

    def __init__(self, voxel: float, origin=(0.0, 0.0, 0.0), table_size: int = 1 << 22):
        self.voxel = voxel
        self.origin = origin
        self.table_size = table_size
        self.keys = np.full(table_size, np.iinfo(np.int64).min, np.int64)
        self.sums = np.zeros((table_size, 3), np.float64)
        self.counts = np.zeros(table_size, np.int64)
        self._lib = _get_lib()

    def add(self, points: np.ndarray) -> None:
        pts = np.ascontiguousarray(points, np.float64)
        if self._lib is not None:
            self._lib.voxel_accumulate(
                pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
                self.voxel, *self.origin,
                self.keys.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self.sums.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                self.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self.table_size,
            )
            return
        # numpy fallback
        c = np.floor((pts - np.asarray(self.origin)) / self.voxel).astype(np.int64)
        key = ((c[:, 0] & 0x1FFFFF) << 42) | ((c[:, 1] & 0x1FFFFF) << 21) | (c[:, 2] & 0x1FFFFF)
        order = np.argsort(key)
        key_s = key[order]
        pts_s = pts[order]
        uniq, start = np.unique(key_s, return_index=True)
        sums = np.add.reduceat(pts_s, start, axis=0)
        cnts = np.diff(np.append(start, len(pts_s)))
        h = (uniq.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(self.table_size)
        for k, s, n, slot0 in zip(uniq, sums, cnts, h.astype(np.int64)):
            slot = int(slot0)
            while True:
                if self.keys[slot] == np.iinfo(np.int64).min:
                    self.keys[slot] = k
                    break
                if self.keys[slot] == k:
                    break
                slot = (slot + 1) % self.table_size
            self.sums[slot] += s
            self.counts[slot] += n

    def centroids(self) -> np.ndarray:
        occ = self.counts > 0
        return (self.sums[occ] / self.counts[occ][:, None]).astype(np.float32)


def read_xyz_stream(
    path: str | Path,
    batch_bytes: int = 64 << 20,
    n_cols: int = 3,
    voxel: float | None = None,
):
    """Stream a huge text scan in byte batches (the 10M-line batching of
    ``read_in_by_parts.py:184`` without the line loop). Yields [B, n_cols]
    arrays; with ``voxel`` set, returns voxel centroids instead."""
    vox = StreamingVoxelizer(voxel) if voxel else None
    with open(path, "rb") as f:
        carry = b""
        while True:
            chunk = f.read(batch_bytes)
            if not chunk:
                break
            chunk = carry + chunk
            last_nl = chunk.rfind(b"\n")
            if last_nl < 0:
                carry = chunk
                continue
            carry, body = chunk[last_nl + 1:], chunk[: last_nl + 1]
            arr = parse_text_points(body, n_cols)
            if vox is not None:
                vox.add(arr[:, :3])
            else:
                yield arr
        if carry.strip():
            arr = parse_text_points(carry, n_cols)
            if vox is not None:
                vox.add(arr[:, :3])
            else:
                yield arr
    if vox is not None:
        yield vox.centroids()
