"""Multi-device ray casting.

Ray bundles are embarrassingly parallel: shard the ray axis across the
mesh (scene triangles replicated — canopy meshes are small next to HBM),
each device runs the local closest-hit kernel, no collectives needed until
the area reductions (psum). This is how the ≥100 Mrays/s target scales
across a pod slice."""

from __future__ import annotations

import jax

from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyqsm_tpu.ops.raytrace import Hits, _cast_rays_xla

Array = jax.Array


def sharded_cast_rays(
    mesh: Mesh,
    origins: Array,
    dirs: Array,
    vertices: Array,
    triangles: Array,
    axis: str = "points",
) -> Hits:
    """Cast with the ray axis sharded over ``axis``. Ray count must divide
    the axis size; use ``pad_rays`` helpers upstream if needed."""

    def local(o, d, v, t):
        return _cast_rays_xla(o, d, v, t)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=Hits(t=P(axis), tri=P(axis), uv=P(axis), count=P(axis)),
        check_vma=False,
    )
    o = jax.device_put(origins, NamedSharding(mesh, P(axis)))
    d = jax.device_put(dirs, NamedSharding(mesh, P(axis)))
    return jax.jit(fn)(o, d, vertices, triangles)
