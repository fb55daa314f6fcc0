from .engine import VALID_METHODS, InferenceEngine, KVCacheBenchmarker  # noqa: F401
from .generate import (  # noqa: F401
    bucket_for,
    make_decode,
    make_generate,
    make_no_cache_loop,
    make_prefill,
)
from .generate import SamplingParams, sample_token  # noqa: F401
from .speculative import (  # noqa: F401
    make_ngram_speculative_generate,
    make_speculative_generate,
)
