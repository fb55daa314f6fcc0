from .config import BenchmarkConfig, CacheConfig, Config, MeshConfig, QuantizationConfig  # noqa: F401
from .utils import (  # noqa: F401
    DeviceTimer,
    get_cpu_mem_mb,
    get_device_mem_mb,
    get_device_peak_mb,
    get_gpu_peak_mb,
    kv_bytes_fp,
    mb,
    reset_device_peak,
    reset_gpu_peak,
    tensor_bytes,
)
