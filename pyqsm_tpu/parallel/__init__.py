from pyqsm_tpu.parallel.mesh import make_mesh, tree_points_mesh
from pyqsm_tpu.parallel.pipeline_step import multi_tree_pipeline_step

__all__ = ["make_mesh", "tree_points_mesh", "multi_tree_pipeline_step"]
