from .engine import VALID_METHODS, InferenceEngine, KVCacheBenchmarker  # noqa: F401
from .generate import bucket_for, make_decode, make_no_cache_loop, make_prefill  # noqa: F401
