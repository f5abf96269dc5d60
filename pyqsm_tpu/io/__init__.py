from pyqsm_tpu.io.readers import (
    read_point_cloud, read_las, read_pcd, read_ply, read_xyz, read_npz,
    write_npz, write_pcd, write_ply, write_las, write_xyz,
)
from pyqsm_tpu.io.artifacts import (
    save_artifact, load_artifact, save_cylinders, load_cylinders,
    save_metrics, load_metrics, format_table,
)

__all__ = [
    "read_point_cloud", "read_las", "read_pcd", "read_ply", "read_xyz",
    "read_npz", "write_npz", "write_pcd", "write_ply", "write_las",
    "write_xyz", "save_artifact", "load_artifact", "save_cylinders",
    "load_cylinders", "save_metrics", "load_metrics", "format_table",
]
