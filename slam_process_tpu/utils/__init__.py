from slam_process_tpu.utils.cache import enable_persistent_cache  # noqa: F401
from slam_process_tpu.utils.logging import get_logger, StageCounters  # noqa: F401
from slam_process_tpu.utils.timestamps import extract_timestamp  # noqa: F401
