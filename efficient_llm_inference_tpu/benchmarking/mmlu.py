"""MMLU benchmark harness.

Behavioral re-implementation of /root/reference/src/benchmarking/mmlu.py:
all 12 method dispatches (:89-144), `text[len(prompt):]` answer slicing
(:147-152), first-3-sample debug prints (:154-159), benchmark_configuration
result schema (:197-257), and compare_methods' identical-answer diagnosis
(:308-334).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

from ..data.loaders import MMLUDataset
from ..engine.engine import InferenceEngine
from ..evaluation.accuracy import AccuracyEvaluator
from .dispatch import generate_with_method


class MMLUBenchmark:
    """Benchmark multiple-choice accuracy across KV-cache methods."""

    def __init__(self, engine: InferenceEngine, dataset: MMLUDataset):
        self.engine = engine
        self.benchmarker = engine
        self.dataset = dataset
        self.accuracy_evaluator = AccuracyEvaluator()

    def generate_answers(
        self,
        questions: List[str],
        choices_list: List[List[str]],
        method: str = "full_cache",
        max_new_tokens: int = 10,
        instruction: str = "The following are multiple choice questions (with answers).\n\n",
        **method_kwargs,
    ) -> Tuple[List[str], float, Dict]:
        """Generate answers for MC questions (reference mmlu.py:44-187)."""
        prompts = self.dataset.create_prompts(
            questions, choices_list, instruction=instruction
        )

        t0 = time.perf_counter()
        answers = []
        for i, prompt in enumerate(prompts):
            # all 12 registry methods dispatch here (reference mmlu.py:89-144)
            text = generate_with_method(
                self.engine, prompt, method, max_new_tokens, **method_kwargs
            )

            # Extract generated answer after the prompt (mmlu.py:147-152).
            answer = text[len(prompt):].strip() if len(text) > len(prompt) else text.strip()

            if i < 3:  # first-3 debug prints (mmlu.py:154-159)
                print(f"    [DEBUG] Sample {i} - Method: {method}")
                print(f"      Generated text: '{answer[:100]}'")
                extracted = self.accuracy_evaluator.extract_answer(answer)
                print(f"      Extracted answer: '{extracted}'")

            answers.append(answer)

        elapsed = time.perf_counter() - t0
        metrics = {
            "method": method,
            "num_samples": len(questions),
            "elapsed_sec": elapsed,
            "avg_time_per_sample": elapsed / max(len(questions), 1),
        }
        return answers, elapsed, metrics

    def evaluate_quality(self, predictions: List[str], references: List[int]) -> dict:
        return self.accuracy_evaluator.compute_accuracy_by_choice(predictions, references)

    def benchmark_configuration(
        self,
        method: str,
        num_samples: int = 10,
        max_new_tokens: int = 10,
        offset: int = 0,
        **method_kwargs,
    ) -> Dict:
        """Reference mmlu.py:197-257."""
        print(f"\nBenchmarking: {method}")
        print(f"Samples: {num_samples}, Max tokens: {max_new_tokens}")

        questions, choices_list, answer_indices = self.dataset.get_samples(
            num_samples, offset
        )
        answers, elapsed, metrics = self.generate_answers(
            questions, choices_list, method=method, max_new_tokens=max_new_tokens,
            **method_kwargs,
        )
        acc = self.evaluate_quality(answers, answer_indices)
        results = {
            **metrics,
            "accuracy": acc["overall_accuracy"],
            "choice_accuracy": acc["choice_accuracy"],
            "choice_counts": acc["choice_counts"],
            "correctness": acc["correctness"],
            "extracted_answers": acc["extracted_answers"],
        }
        print(f"  Elapsed: {elapsed:.2f}s ({metrics['avg_time_per_sample']:.4f}s/sample)")
        print(f"  Accuracy: {acc['overall_accuracy']:.4f}")
        print(f"  Correct: {sum(acc['correctness'])}/{len(acc['correctness'])}")
        if acc["extracted_answers"]:
            sample_answers = acc["extracted_answers"][:10]
            print(f"  First 10 extracted answers: {sample_answers}")
            print(f"  Unique answers in first 10: {set(sample_answers)}")
        return results

    def compare_methods(
        self,
        methods: List[str],
        num_samples: int = 10,
        max_new_tokens: int = 10,
        offset: int = 0,
        method_configs: Optional[Dict[str, Dict]] = None,
    ):
        """Reference mmlu.py:259-339, incl. identical-answer diagnosis."""
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
            flat = {
                k: v
                for k, v in result.items()
                if k not in ("choice_accuracy", "choice_counts", "correctness", "extracted_answers")
            }
            for choice, a in result["choice_accuracy"].items():
                flat[f"accuracy_{choice}"] = a
            flat["extracted_answers"] = result["extracted_answers"]
            results.append(flat)

        df = pd.DataFrame(results)

        if len(results) > 1:
            print("\n" + "=" * 80)
            print("COMPARING EXTRACTED ANSWERS ACROSS METHODS (first 10 samples)")
            print("=" * 80)
            for result in results:
                print(f"{result.get('method', 'unknown')}: "
                      f"{result.get('extracted_answers', [])[:10]}")
            first = results[0].get("extracted_answers", [])[:10]
            all_same = all(
                r.get("extracted_answers", [])[:10] == first for r in results[1:]
            )
            if all_same:
                print("\nWARNING: All methods produced identical extracted answers "
                      "for first 10 samples!")
                print("   This is EXPECTED if prompts fit within every cache budget "
                      "and generation is deterministic (argmax).")
            else:
                print("\nMethods produced different answers "
                      "(cache differences affected generation)")

        return df.drop(columns=["extracted_answers"], errors="ignore")

    def benchmark_with_variants(
        self,
        base_method: str = "full_cache",
        variants: Optional[List[Dict]] = None,
        num_samples: int = 10,
        max_new_tokens: int = 10,
    ):
        """Reference mmlu.py:341-401."""
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
            flat = {
                k: v
                for k, v in result.items()
                if k not in ("choice_accuracy", "choice_counts", "correctness", "extracted_answers")
            }
            for choice, a in result["choice_accuracy"].items():
                flat[f"accuracy_{choice}"] = a
            flat["variant"] = str(config)
            results.append(flat)
        return pd.DataFrame(results)
