from ..engine.engine import KVCacheBenchmarker  # noqa: F401
from .mmlu import MMLUBenchmark  # noqa: F401
from .summarization import SummarizationBenchmark  # noqa: F401
