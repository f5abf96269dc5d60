import time, jax
t0=time.time()
print("devices:", jax.devices(), f"{time.time()-t0:.1f}s", flush=True)
import jax.numpy as jnp
x = jnp.ones((256,256))
y = (x@x).block_until_ready()
print("matmul ok", f"{time.time()-t0:.1f}s", flush=True)
