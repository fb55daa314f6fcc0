"""MMLU benchmark across cache methods.

Counterpart usage of the reference's MMLU harness (its examples only cover
summarization; the harness itself dispatches all 12 methods).
Run: python -m examples.mmlu_benchmark [model]
"""

import sys

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    eng = elit.InferenceEngine.from_model_name(model)
    dataset = elit.load_mmlu(max_samples=8)
    bench = elit.MMLUBenchmark(eng, dataset)

    df = bench.compare_methods(
        ["full_cache", "sliding_window", "quant_int8", "quant_int4"],
        num_samples=min(8, len(dataset)),
        max_new_tokens=8,
        method_configs={"sliding_window": {"window_size": 128}},
    )
    print("\n" + df.to_string())


if __name__ == "__main__":
    main()
