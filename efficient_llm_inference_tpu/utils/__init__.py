from .checkpoint import convert_and_cache_hf, load_params, save_params  # noqa: F401
from .profiling import StepTimer, memory_snapshot, trace  # noqa: F401
