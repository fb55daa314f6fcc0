from .accuracy import AccuracyEvaluator  # noqa: F401
from .quality import (  # noqa: F401
    compute_perplexity,
    compute_sliding_window_nll,
    text_similarity,
    token_agreement_rate,
)
from .rouge import RougeEvaluator, porter_stem, rouge_tokenize, score_pair  # noqa: F401
