"""Basic benchmark: no_cache vs full_cache vs sliding_window.

Counterpart of /root/reference/examples/basic_benchmark.py:44-72 (speedup vs
the no-cache baseline on GPT-2). Offline-safe: random-init weights, byte
tokenizer. Run: python -m examples.basic_benchmark [model]
"""

import sys

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.utils import enable_compilation_cache


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    cfg = elit.Config(model_name=model, max_new_tokens=64)
    eng = elit.InferenceEngine.from_model_name(model, config=cfg)

    prompts = [
        "The future of artificial intelligence is",
        "In a world where technology advances rapidly,",
        "The most important scientific discovery of the century",
    ]

    results = {}
    for method in ("no_cache", "full_cache", "sliding_window"):
        r = eng.benchmark_method(
            prompts, method=method, max_new_tokens=cfg.max_new_tokens, window_size=256
        )
        results[method] = r
        print(
            f"{method:16s} {r['tokens_per_sec']:10.1f} tok/s "
            f"elapsed={r['elapsed_sec']:.2f}s new_tokens={r['total_new_tokens']}"
        )

    base = results["no_cache"]["tokens_per_sec"]
    for method in ("full_cache", "sliding_window"):
        sp = results[method]["tokens_per_sec"] / base if base else float("nan")
        print(f"speedup {method} vs no_cache: {sp:.2f}x")


if __name__ == "__main__":
    main()
