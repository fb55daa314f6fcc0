"""Quantized-cache quality demo: int8/int4/mixed vs full-cache baseline.

Counterpart of /root/reference/examples/quantized_cache.py:61-81
(text_similarity of each quantized output vs the full-precision baseline).
Run: python -m examples.quantized_cache [model]
"""

import sys

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.utils import enable_compilation_cache
from efficient_llm_inference_tpu.evaluation.quality import (
    text_similarity,
    token_agreement_rate,
)


def main():
    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    eng = elit.InferenceEngine.from_model_name(model)

    prompt = (
        "The development of renewable energy sources has accelerated in recent "
        "years, with solar and wind power becoming increasingly cost-effective."
    )
    max_new = 64

    base_ids = eng.generate_ids(prompt, "full_cache", max_new)
    base_text = eng.tokenizer.decode(base_ids)
    print(f"full_cache baseline: {base_text[len(prompt):][:80]!r}")

    for mode in ("int8", "int4", "mixed"):
        text, n_new, est_mb = eng.generate_with_quantized_kv(
            prompt, max_new, mode=mode
        )
        ids = eng.last_generation_ids
        sim = text_similarity(base_text, text)
        agree = token_agreement_rate(base_ids, ids)
        print(
            f"quant_{mode:5s} similarity={sim:.4f} token_agreement={agree:.4f} "
            f"cache={est_mb:.3f} MB"
        )


if __name__ == "__main__":
    main()
