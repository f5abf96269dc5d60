"""Stage-level profile of the batched contraction at bench shape.

Times the pieces that make up one contraction iteration — band applies
(forward, transpose-via-``b_w_t``, spill), one full 80-iteration PCG solve,
one banded Laplacian rebuild — the decomposition used to drive the round-3
optimization work (see docs/STATUS.md). Timing is honest for remote-attached
TPUs: every measurement ends with a host transfer (``block_until_ready``
returns early on tunneled devices).

Usage::

    python examples/profile_contraction.py            # real backend
    python examples/profile_contraction.py --backend cpu --trees 2 --n 4096
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def synthetic_tree_batch(trees: int, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(trees):
        nt = n // 2
        th = rng.uniform(0, 2 * np.pi, nt)
        z = rng.uniform(0, 6, nt)
        r = 0.3 + rng.normal(0, 0.01, nt)
        trunk = np.stack([r * np.cos(th), r * np.sin(th), z], 1)
        canopy = rng.normal([0, 0, 7.5], [1.6, 1.6, 1.0], (n - nt, 3))
        out.append(np.concatenate([trunk, canopy]))
    return np.stack(out).astype(np.float32)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--trees", type=int, default=8)
    p.add_argument("--n", type=int, default=32768,
                   help="points per tree (multiple of 256 for the band)")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--cg-iters", type=int, default=80)
    p.add_argument("--iters", type=int, default=10,
                   help="timing repetitions per op")
    p.add_argument("--backend", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args()

    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      str(__import__("pathlib").Path(__file__).parents[1]
                          / ".jax_cache"))
    import jax.numpy as jnp

    from pyqsm_tpu.ops.laplacian import point_cloud_laplacian
    from pyqsm_tpu.ops.sparse import (morton_codes, normal_diag, pcg,
                                      _band_apply, _spill_apply)

    print("backend:", jax.default_backend(), flush=True)
    T, n = args.trees, args.n
    pts = jnp.asarray(synthetic_tree_batch(T, n))
    mask = jnp.ones((T, n), bool)
    perm = jax.jit(jax.vmap(
        lambda p_, m_: jnp.argsort(morton_codes(p_, m_))))(pts, mask)
    pts = jnp.take_along_axis(pts, perm[..., None], axis=1)

    build = jax.jit(jax.vmap(
        lambda p_, m_: point_cloud_laplacian(p_, m_, args.k, 1e-6,
                                             banded=True)))
    L = build(pts, mask)
    jax.block_until_ready(L.deg)
    _ = float(jnp.sum(L.deg))  # host fence

    def timeit(name, f, *a, reps=args.iters):
        y = f(*a)
        jax.block_until_ready(y)
        _ = np.asarray(jax.tree.leaves(y)[0]).ravel()[0]
        t0 = time.perf_counter()
        for _i in range(reps):
            y = f(*a)
        jax.block_until_ready(y)
        _ = np.asarray(jax.tree.leaves(y)[0]).ravel()[0]
        print(f"{name}: {(time.perf_counter() - t0) / reps * 1e3:.2f} ms",
              flush=True)

    fwd = jax.jit(jax.vmap(lambda L_, x: _band_apply(L_.b_w, x)))
    fwd_t = jax.jit(jax.vmap(lambda L_, x: _band_apply(L_.b_w_t, x)))
    sp = jax.jit(jax.vmap(lambda L_, x: _spill_apply(
        L_.s_i, L_.s_j, L_.s_w, x, x.shape[0], sorted_dst=True)))
    timeit("band fwd", fwd, L, pts)
    timeit("band T (b_w_t)", fwd_t, L, pts)
    timeit("spill apply", sp, L, pts)

    wl = jnp.full((T, n), 50.0)
    wh = jnp.ones((T, n))
    solve = jax.jit(jax.vmap(
        lambda L_, wl_, wh_, p_: pcg(
            (L_, wl_, wh_), (wh_ * wh_)[:, None] * p_,
            normal_diag(L_, wl_, wh_), x0=p_, tol=3e-4,
            max_iters=args.cg_iters)[0]))
    timeit(f"pcg {args.cg_iters} iters", solve, L, wl, wh, pts,
           reps=max(args.iters // 3, 1))
    timeit("laplacian rebuild (banded)", build, pts, mask,
           reps=max(args.iters // 3, 1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
