"""Summarization benchmark harness.

Behavioral re-implementation of /root/reference/src/benchmarking/
summarization.py:15-305: composes the engine, a SummarizationDataset and the
RougeEvaluator; same method dispatch (the 7 methods of :87-113), the same
"Summary:"-split answer extraction, and the same result-dict / DataFrame
schemas. The engine handles device timing via block_until_ready (the TPU
analog of the reference's CUDA events).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax

from ..data.loaders import SummarizationDataset
from ..engine.engine import InferenceEngine
from ..evaluation.rouge import RougeEvaluator
from .dispatch import generate_with_method


class SummarizationBenchmark:
    """Unified interface for benchmarking summarization configurations."""

    def __init__(
        self,
        engine: InferenceEngine,
        dataset: SummarizationDataset,
        rouge_evaluator: Optional[RougeEvaluator] = None,
    ):
        self.engine = engine
        self.benchmarker = engine  # reference-compatible attribute name
        self.dataset = dataset
        self.rouge_evaluator = rouge_evaluator or RougeEvaluator()

    def generate_summaries(
        self,
        articles: List[str],
        method: str = "full_cache",
        max_new_tokens: int = 128,
        instruction: str = "Summarize the following article:\n\n",
        **method_kwargs,
    ) -> Tuple[List[str], float, Dict]:
        """Generate summaries (reference summarization.py:49-139)."""
        prompts = self.dataset.create_prompts(
            articles,
            instruction=instruction,
            max_article_length=method_kwargs.get("max_article_length", None),
        )

        t0 = time.perf_counter()
        summaries = []
        for prompt in prompts:
            # reference restricts this harness to 7 methods
            # (summarization.py:87-113); the full registry lives in mmlu
            if not method.startswith("quant_") and method not in (
                "no_cache", "full_cache", "sliding_window",
                "paged_attention", "chunked_cache",
            ):
                raise ValueError(f"Unknown method: {method}")
            text = generate_with_method(
                self.engine, prompt, method, max_new_tokens, **method_kwargs
            )

            # Extract generated summary (reference summarization.py:116-119)
            if "Summary:" in text:
                summary = text.split("Summary:")[-1].strip()
            else:
                summary = text[len(prompt):].strip()
            summaries.append(summary)

        elapsed = time.perf_counter() - t0
        metrics = {
            "method": method,
            "num_samples": len(articles),
            "elapsed_sec": elapsed,
            "avg_time_per_sample": elapsed / max(len(articles), 1),
        }
        return summaries, elapsed, metrics

    def evaluate_quality(
        self, predictions: List[str], references: List[str]
    ) -> Dict[str, Dict[str, float]]:
        return self.rouge_evaluator.compute_rouge(predictions, references)

    def benchmark_configuration(
        self,
        method: str,
        num_samples: int = 10,
        max_new_tokens: int = 128,
        offset: int = 0,
        **method_kwargs,
    ) -> Dict:
        """Reference summarization.py:157-208."""
        print(f"\nBenchmarking: {method}")
        print(f"Samples: {num_samples}, Max tokens: {max_new_tokens}")

        articles, references = self.dataset.get_samples(num_samples, offset)
        summaries, elapsed, metrics = self.generate_summaries(
            articles, method=method, max_new_tokens=max_new_tokens, **method_kwargs
        )
        rouge_scores = self.evaluate_quality(summaries, references)
        results = {
            **metrics,
            "rouge1_f": rouge_scores["rouge1"]["fmeasure"],
            "rouge2_f": rouge_scores["rouge2"]["fmeasure"],
            "rougeL_f": rouge_scores["rougeL"]["fmeasure"],
            "rouge_scores": rouge_scores,
        }
        print(f"  Elapsed: {elapsed:.2f}s ({metrics['avg_time_per_sample']:.2f}s/sample)")
        print(f"  ROUGE-1 F1: {rouge_scores['rouge1']['fmeasure']:.4f}")
        print(f"  ROUGE-2 F1: {rouge_scores['rouge2']['fmeasure']:.4f}")
        print(f"  ROUGE-L F1: {rouge_scores['rougeL']['fmeasure']:.4f}")
        return results

    def compare_methods(
        self,
        methods: List[str],
        num_samples: int = 10,
        max_new_tokens: int = 128,
        offset: int = 0,
        method_configs: Optional[Dict[str, Dict]] = None,
    ):
        """Reference summarization.py:210-248 → pandas DataFrame."""
        import pandas as pd

        method_configs = method_configs or {}
        results = []
        for method in methods:
            config = method_configs.get(method, {})
            result = self.benchmark_configuration(
                method=method,
                num_samples=num_samples,
                max_new_tokens=max_new_tokens,
                offset=offset,
                **config,
            )
            results.append({k: v for k, v in result.items() if k != "rouge_scores"})
        return pd.DataFrame(results)

    def benchmark_with_variants(
        self,
        base_method: str = "full_cache",
        variants: Optional[List[Dict]] = None,
        num_samples: int = 10,
        max_new_tokens: int = 128,
    ):
        """Reference summarization.py:250-305."""
        import pandas as pd

        if variants is None:
            if base_method == "sliding_window":
                variants = [{"window_size": 128}, {"window_size": 256}, {"window_size": 512}]
            elif base_method == "paged_attention":
                variants = [{"block_size": 32}, {"block_size": 64}, {"block_size": 128}]
            else:
                variants = [{}]

        results = []
        for i, config in enumerate(variants):
            print(f"\n--- Variant {i + 1}/{len(variants)}: {config} ---")
            result = self.benchmark_configuration(
                method=base_method,
                num_samples=num_samples,
                max_new_tokens=max_new_tokens,
                **config,
            )
            flat = {k: v for k, v in result.items() if k != "rouge_scores"}
            flat["variant"] = str(config)
            results.append(flat)
        return pd.DataFrame(results)
