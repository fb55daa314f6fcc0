from .eviction import (  # noqa: F401
    TRIM_FNS,
    capacity_bound,
    chunk_summarize,
    trim_block_old,
    trim_budget_old,
    trim_prefix_window,
    trim_sliding_window,
    trim_strided,
)
from .kvcache import DenseKV, NoCacheKV, PagedKV, QuantizedKV  # noqa: F401
