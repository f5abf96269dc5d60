"""Point-cloud Laplacian + mass matrix for contraction.

Replaces ``robust_laplacian.point_cloud_laplacian`` (tufted intrinsic DEC,
C++ — ``skeletonize.py:253-255``) with a kNN-graph heat-kernel Laplacian and
a kNN-ball area mass matrix, built from the shared neighbor engine. The
mollification parameter maps to a weight floor. Accuracy note (SURVEY.md §7
hard parts): this is a documented approximation of the tufted Laplacian —
its null space and smoothing behavior match (validated in tests by
contraction dynamics), not its spectrum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pyqsm_tpu.ops.neighbors import knn
from pyqsm_tpu.ops.sparse import ELLLaplacian, build_transpose_ell

Array = jax.Array


@partial(jax.jit, static_argnames=("n_neighbors", "banded"))
def point_cloud_laplacian(
    points: Array,
    mask: Array,
    n_neighbors: int = 20,
    mollify_factor: float = 1e-6,
    banded: bool = False,
) -> ELLLaplacian:
    """Build the ELL Laplacian + mass diagonal.

    - edges: kNN (self-match dropped)
    - weights: Gaussian heat kernel w_ij = exp(-d²/σ_i²), σ_i = mean kNN
      distance of i, floored at ``mollify_factor`` (mollification analog)
    - mass: m_i = π·r̄_i² / k — the per-point share of the local ball area,
      shrinking as the cloud contracts (drives the reference's volume-ratio
      termination, ``skeletonize.py:349``)
    """
    # approx top-k (recall ~0.95): a rare swapped far neighbor perturbs the
    # heat-kernel weights by O(exp(-d²/σ²)) noise — invisible next to the
    # tufted-Laplacian approximation itself, and ~10x faster per rebuild
    d, idx = knn(points, points, n_neighbors + 1, query_mask=mask,
                 point_mask=mask, approx=True)
    d, idx = d[:, 1:], idx[:, 1:]
    valid = idx >= 0
    dd = jnp.where(valid, d, 0.0)
    cnt = jnp.maximum(jnp.sum(valid, axis=1), 1)
    mean_d = jnp.sum(dd, axis=1) / cnt
    sigma2 = jnp.maximum(mean_d * mean_d, 1e-12)
    w = jnp.exp(-(dd * dd) / sigma2[:, None])
    w = jnp.maximum(w, mollify_factor)
    w = jnp.where(valid, w, 0.0)
    deg = jnp.sum(w, axis=1)
    mass = jnp.where(mask, jnp.pi * mean_d * mean_d, 1e-12)
    if banded:
        # block-banded weights (callers Morton-order the rows first): both
        # CG matvecs become batched MXU matmuls — the ELL row gathers were
        # ~95% of contraction wall time (0.30 s per CG iteration at
        # [8, 32768] k=20 measured on v5e). Spill list keeps exactness;
        # overflow lax.cond's back to the exact gather/scatter path.
        from pyqsm_tpu.ops.sparse import (band_transpose, build_banded,
                                          sort_spill_transpose)

        # spill cap 6·N: measured Morton-order spill on plot-scale trees is
        # ~15-21% of N·k edges (Hilbert measured no better — the spill is
        # branch-crossing structure, not curve discontinuity), and it can
        # grow as contraction collapses far-apart rows onto the same
        # skeleton line. 6·N (30% of N·k at k=20) keeps overflow rare; the
        # spill gather is still ~3x smaller than full ELL
        b_w, s_i, s_j, s_w, s_over = build_banded(
            idx, w, spill_cap=6 * points.shape[0])
        # column-sorted copy: both spill scatters (L and Lᵀ) then lower to
        # sorted segmented sums instead of random scatters
        st_i, st_j, st_w = sort_spill_transpose(s_i, s_j, s_w,
                                                points.shape[0])
        return ELLLaplacian(nbr_idx=idx, w=w, deg=deg, mass=mass,
                            b_w=b_w, s_i=s_i, s_j=s_j, s_w=s_w,
                            s_overflow=s_over,
                            st_i=st_i, st_j=st_j, st_w=st_w,
                            # Wᵀ band once per rebuild: CG's Lᵀ applies run
                            # the forward kernel (1 tile read/block, not 3)
                            b_w_t=band_transpose(b_w))
    # transpose ELL once per rebuild: Lᵀ matvecs inside CG become gathers
    # instead of a 0.8M-entry scatter per iteration (the solve's hot op).
    # overflow flags in-degrees beyond the slots (contracted clouds collapse
    # onto junctions) — rmatvec then lax.cond's into the exact scatter path
    t_idx, t_w, t_overflow = build_transpose_ell(idx, w, kt=2 * n_neighbors)
    return ELLLaplacian(nbr_idx=idx, w=w, deg=deg, mass=mass,
                        t_idx=t_idx, t_w=t_w, t_overflow=t_overflow)
