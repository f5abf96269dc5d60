import numpy as np, jax, time, sys
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import synthetic_plot
from pyqsm_tpu.config import Config, IsolationConfig
from pyqsm_tpu.models.isolation import build_trees
from pyqsm_tpu.ops.sampling import compact_rows, voxel_downsample
from pyqsm_tpu.models.skeleton import extract_skeleton_batch
print("backend:", jax.default_backend(), flush=True)
pts_np = synthetic_plot(10_000_000, 8)
pts = jnp.asarray(pts_np); mask = jnp.ones(len(pts_np), bool)
cfg = Config()
iso_cfg = IsolationConfig(base_min_points=200, low_pctile=4.0, max_dist=0.2, cycles=400, min_frontier=3)

# isolation alone, warm
t0=time.perf_counter()
g = build_trees(pts, mask, iso_cfg)
lab = np.asarray(g.labels)
print(f"isolation warm: {time.perf_counter()-t0:.1f}s", flush=True)

# ladder for all trees (as process_plot does)
uniq, counts = np.unique(lab[lab>=0], return_counts=True)
t0=time.perf_counter()
arrays = []
for tid in uniq:
    tp_, tm_, _ = compact_rows(pts, jnp.asarray(lab == tid))
    vx = 0.03
    p2, m2, _ = voxel_downsample(tp_, vx, tm_)
    while int(jnp.sum(m2)) > 40_000 and vx < 0.5:
        vx *= 1.3
        p2, m2, _ = voxel_downsample(tp_, vx, tm_)
    p2, m2, _ = compact_rows(p2, m2)
    arrays.append((p2, m2))
print(f"ladder warm: {time.perf_counter()-t0:.1f}s sizes={[int(jnp.sum(m)) for _,m in arrays]}", flush=True)

cap = max(p.shape[0] for p,_ in arrays)
bp = jnp.stack([jnp.pad(p, ((0, cap-p.shape[0]), (0,0))) for p,_ in arrays])
bm = jnp.stack([jnp.pad(m, (0, cap-m.shape[0])) for _,m in arrays])
t0=time.perf_counter()
sk = extract_skeleton_batch(bp, bm, cfg.skeletonize)
jax.block_until_ready(sk.contracted); _ = float(jnp.sum(sk.total_shift))
print(f"contraction warm: {time.perf_counter()-t0:.1f}s iters={np.asarray(sk.iterations).tolist()} cap={cap}", flush=True)
