from pyqsm_tpu.parallel.mesh import make_mesh, tree_points_mesh
from pyqsm_tpu.parallel.pipeline_step import multi_tree_pipeline_step
from pyqsm_tpu.parallel.raycast import sharded_cast_rays

__all__ = [
    "make_mesh", "tree_points_mesh", "multi_tree_pipeline_step",
    "sharded_cast_rays",
]
