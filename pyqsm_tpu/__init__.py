"""pyqsm_tpu — TPU-native framework for TLS LiDAR tree QSM extraction.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of wischmcj/pyQSM
(see SURVEY.md): tree isolation, Laplacian-contraction skeletonization, QSM
cylinder fitting, leaf/wood/epiphyte segmentation, canopy metrics, and an
environmental ray-casting simulator — all expressed as pure jitted functions
over columnar scene state resident in device HBM, sharded across a device mesh
with `jax.sharding` / `shard_map`.

The reference delegates every hot kernel to CPU C++ libraries (Open3D KD-trees,
SciPy SuperLU, Embree); here those capabilities are native TPU kernels:
tiled MXU pairwise-distance kNN, batched RANSAC hypothesis scoring, jitted
preconditioned-CG contraction solves, label-propagation DBSCAN/MST, and a
Pallas ray-triangle engine.
"""

from pyqsm_tpu.config import Config, load_config
from pyqsm_tpu.state import PointCloud, SceneState

__version__ = "0.1.0"

__all__ = ["Config", "load_config", "PointCloud", "SceneState", "__version__"]
