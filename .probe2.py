import time, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
def P(m): print(f"# {time.strftime('%H:%M:%S')} {m}", flush=True)
for n in (100_000, 1_000_000, 4_000_000):
    t0=time.perf_counter()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n,3)).astype(np.float32))
    x.block_until_ready()
    P(f"upload {n}: {time.perf_counter()-t0:.1f}s")
    t0=time.perf_counter()
    s = float(jnp.sum(x))
    P(f"sum {n}: {time.perf_counter()-t0:.1f}s")
    from pyqsm_tpu.ops.sampling import voxel_downsample
    t0=time.perf_counter()
    p, m, tr = voxel_downsample(x, 0.1, jnp.ones(n, bool))
    k = int(jnp.sum(m))
    P(f"voxel {n}: {time.perf_counter()-t0:.1f}s reps={k}")
P("PROBE2 OK")
