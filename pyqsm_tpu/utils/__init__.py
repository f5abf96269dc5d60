from pyqsm_tpu.utils.logging import get_logger, setup_logging
from pyqsm_tpu.utils.timing import Timer, stage_timer

__all__ = ["get_logger", "setup_logging", "Timer", "stage_timer"]
