import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import sys, time; sys.path.insert(0, "/root/repo")
from bench import synthetic_plot
from pyqsm_tpu.config import Config
from pyqsm_tpu.models.qsm import sphere_following_qsm
from pyqsm_tpu.ops.sampling import compact_rows, voxel_downsample
print("backend:", jax.default_backend(), flush=True)
pts_np = synthetic_plot(10_000_000, 8)
tree = jnp.asarray(pts_np[:1_250_000])
tmask = jnp.ones(1_250_000, bool)
voxel = 0.03
p2, m2, _ = voxel_downsample(tree, voxel, tmask)
while int(jnp.sum(m2)) > 40_000 and voxel < 0.5:
    voxel *= 1.6
    p2, m2, _ = voxel_downsample(tree, voxel, tmask)
p2, m2, _ = compact_rows(p2, m2)
print(f"skeleton pts {int(jnp.sum(m2))} voxel {voxel:.3f}", flush=True)
z = np.asarray(p2[:, 2]); m2_np = np.asarray(m2)
zmin = float(np.min(np.where(m2_np, z, np.inf)))
rows = np.flatnonzero(m2_np & (z < zmin + 0.5))
seed = np.full(1024, -1, np.int32); seed[:min(len(rows),1024)] = rows[:1024]
cfg = Config()
for trial in range(2):
    t0=time.perf_counter()
    q = sphere_following_qsm(p2, m2, jnp.asarray(seed), jnp.asarray(seed >= 0), 0.3,
                             sphere=cfg.sphere, dbscan_cfg=cfg.dbscan, max_steps=48)
    print(f"trial{trial}: cylinders {int(q.cylinders.count())} steps {q.n_steps} {time.perf_counter()-t0:.1f}s", flush=True)
