"""efficient_llm_inference_tpu — TPU-native quantized KV-cache inference engine.

A brand-new JAX/XLA/Pallas framework with the full capability surface of the
reference library AramBughdaryan/Efficient-LLM-Inference (see SURVEY.md),
re-designed TPU-first. Re-exports mirror the reference package root
(/root/reference/src/__init__.py:14-33).
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    BenchmarkConfig,
    CacheConfig,
    Config,
    MeshConfig,
    QuantizationConfig,
)
from .engine.engine import InferenceEngine, KVCacheBenchmarker  # noqa: F401


def __getattr__(name):
    # Lazy imports keep `import efficient_llm_inference_tpu` light.
    if name in ("ContinuousBatchingEngine", "PoolConfig", "Request"):
        from .engine import batching

        return getattr(batching, name)
    if name in ("MegaBatchServer", "MegaPoolConfig"):
        from .engine import megaserver

        return getattr(megaserver, name)
    if name in ("SummarizationBenchmark", "MMLUBenchmark"):
        from .benchmarking import MMLUBenchmark, SummarizationBenchmark

        return {"SummarizationBenchmark": SummarizationBenchmark,
                "MMLUBenchmark": MMLUBenchmark}[name]
    if name in ("SummarizationDataset", "MMLUDataset", "load_cnn_dailymail",
                "load_xsum", "load_samsum", "load_mmlu"):
        from .data import loaders

        return getattr(loaders, name)
    raise AttributeError(name)
