from .tokenizer import ByteTokenizer, load_tokenizer  # noqa: F401
from .loaders import (  # noqa: F401
    MMLUDataset,
    SummarizationDataset,
    load_cnn_dailymail,
    load_mmlu,
    load_samsum,
    load_xsum,
)
