"""Comprehensive benchmark: all 11 runnable methods with canonical kwargs.

Counterpart of /root/reference/examples/comprehensive_benchmark.py:48-105
(short + long prompt groups, per-method try/except, CSV out).
Run: python -m examples.comprehensive_benchmark [model] [out.csv]
"""

import sys

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.utils import enable_compilation_cache

ALL_METHODS = [
    ("full_cache", {}),
    ("sliding_window", {"window_size": 256}),
    ("prefix_window", {"window_size": 256, "prefix_len": 32}),
    ("strided_cache", {"window_size": 256, "stride": 4, "prefix_len": 32}),
    ("block_cache", {"window_size": 256, "block_size": 64, "keep_per_block": 8}),
    ("budget_cache", {"window_size": 256, "old_budget": 64, "prefix_len": 32}),
    ("quant_int8", {}),
    ("quant_int4", {}),
    ("quant_mixed", {}),
    ("paged_attention", {"block_size": 64}),
    ("chunked_cache", {"chunk_size": 64, "keep_last": 256}),
]


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "comprehensive_results.csv"
    eng = elit.InferenceEngine.from_model_name(model)

    short_prompts = ["The quick brown fox", "Machine learning is"]
    long_prompts = ["The history of computing spans many decades. " * 30]

    rows = []
    for group, prompts in (("short", short_prompts), ("long", long_prompts)):
        for method, kwargs in ALL_METHODS:
            try:
                r = eng.benchmark_method(
                    prompts, method=method, max_new_tokens=64, **kwargs
                )
                r["prompt_group"] = group
                rows.append(r)
                print(
                    f"[{group}] {method:16s} {r['tokens_per_sec']:9.1f} tok/s "
                    f"kv_mb={r['est_kv_cache_mb_avg']}"
                )
            except Exception as e:  # keep the sweep alive (reference :73-83)
                print(f"[{group}] {method:16s} FAILED: {e}")

    import pandas as pd

    df = pd.DataFrame(rows)
    df.to_csv(out_csv, index=False)
    print(f"\nwrote {out_csv}")
    print(df[["prompt_group", "method", "tokens_per_sec"]].to_string())


if __name__ == "__main__":
    main()
