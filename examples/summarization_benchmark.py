"""Summarization benchmark on CNN/DailyMail with ROUGE.

Counterpart of /root/reference/examples/summarization_benchmark.py (which
uses Qwen2.5-7B from the hub; offline here we use the bundled samples and a
random-init model — swap in converted weights when available).
Run: python -m examples.summarization_benchmark [model]
"""

import sys

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    eng = elit.InferenceEngine.from_model_name(model)
    dataset = elit.load_cnn_dailymail(max_samples=5)
    bench = elit.SummarizationBenchmark(eng, dataset)

    df = bench.compare_methods(
        ["full_cache", "sliding_window", "quant_int8"],
        num_samples=min(5, len(dataset)),
        max_new_tokens=48,
        method_configs={"sliding_window": {"window_size": 256}},
    )
    df.to_csv("summarization_results.csv", index=False)
    print("\n" + df.to_string())


if __name__ == "__main__":
    main()
