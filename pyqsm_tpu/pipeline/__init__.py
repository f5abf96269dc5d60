from pyqsm_tpu.pipeline.driver import (
    StagedPipeline, get_files_by_seed, loop_over_files,
    save_checkpoint, load_checkpoint,
)

__all__ = [
    "StagedPipeline", "get_files_by_seed", "loop_over_files",
    "save_checkpoint", "load_checkpoint",
]
