import time, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from bench import synthetic_plot
def P(m): print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)
P("gen 1M")
pts_np = synthetic_plot(1_000_000, 8)
pts = jnp.asarray(pts_np); pts.block_until_ready()
mask = jnp.ones(len(pts_np), bool)
P("uploaded")
from pyqsm_tpu.ops.sampling import voxel_downsample, compact_rows
rep_pts, rep_mask, trace = voxel_downsample(pts, 0.1, mask)
int(jnp.sum(rep_mask))
P(f"voxel reps={int(jnp.sum(rep_mask))}")
rep_pts, rep_mask, rep_rows = compact_rows(rep_pts, rep_mask)
P(f"compacted cap={rep_pts.shape[0]}")
from pyqsm_tpu.config import IsolationConfig
from pyqsm_tpu.models.isolation import id_trunk_bases
cfg = IsolationConfig(base_min_points=200, low_pctile=4.0, max_dist=0.2, cycles=400, min_frontier=3)
seed_labels, low, high = id_trunk_bases(rep_pts, rep_mask, cfg, None)
int(jnp.sum(low))
P(f"trunk bases done, low={int(jnp.sum(low))}")
from pyqsm_tpu.ops.neighbors import grid_self_radius_knn
search = low | high
t0=time.perf_counter()
_, nbr_idx = grid_self_radius_knn(rep_pts, radius=cfg.max_dist, k=12, mask=search, sort=False, need_dists=False)
nok = int(jnp.sum(nbr_idx >= 0))
P(f"radius graph done {time.perf_counter()-t0:.1f}s edges={nok}")
t0=time.perf_counter()
_, nbr_idx = grid_self_radius_knn(rep_pts, radius=cfg.max_dist, k=12, mask=search, sort=False, need_dists=False)
nok = int(jnp.sum(nbr_idx >= 0))
P(f"radius graph warm {time.perf_counter()-t0:.1f}s")
from pyqsm_tpu.models.isolation import region_grow
lab_host = np.asarray(seed_labels)
uniq_ids = np.unique(lab_host[lab_host >= 0])
ccap = 16
while ccap < max(len(uniq_ids),1): ccap *= 2
compact = np.where(lab_host >= 0, np.searchsorted(uniq_ids, lab_host), -1).astype(np.int32)
t0=time.perf_counter()
res = region_grow(nbr_idx, jnp.asarray(compact), search, max_cycles=400, min_frontier=3, cluster_cap=ccap)
int(res.cycles_run)
P(f"growth done {time.perf_counter()-t0:.1f}s cycles={int(res.cycles_run)}")
P("ALL OK")
