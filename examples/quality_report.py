"""Quality report: cache-method quality vs KV memory on a TRAINED model.

Produces the measurement the reference promises but never publishes
(docs/SUMMARIZATION.md's tables are illustrative placeholders; the repo has
no measured numbers anywhere — SURVEY.md §6): for every cache method,
teacher-forced NLL delta vs full_cache, estimated KV-cache MB, generation
agreement/similarity vs the full-cache stream, plus ROUGE over the bundled
summarization samples and the sliding-window NLL sweep. The model is the
in-repo-trained byte-level GPT-2 (examples/train_quality_model.py) —
loss ~0.05 vs 5.55 random, so predictions are sharp and cache degradation
is real signal, not noise.

Usage: python -m examples.quality_report [--markdown]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp


def main(markdown: bool = False):
    jax.config.update("jax_platforms", "cpu")

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.core.utils import enable_compilation_cache
    from efficient_llm_inference_tpu.data.samples import SUMMARIZATION_SAMPLES
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.evaluation.quality import (
        compute_method_nll,
        compute_perplexity,
        compute_sliding_window_nll,
        text_similarity,
        token_agreement_rate,
    )
    from efficient_llm_inference_tpu.evaluation.rouge import RougeEvaluator
    from examples.train_quality_model import load_quality_model

    enable_compilation_cache()
    spec, params = load_quality_model()
    eng = InferenceEngine(
        spec, params,
        config=Config(model_name="quality_gpt2", device="cpu",
                      dtype=jnp.float32),
    )

    texts = [art + "\n\nSummary: " + summ
             for art, summ in SUMMARIZATION_SAMPLES["cnn_dailymail"]]
    eval_texts = texts[:4]

    # baseline teacher-forcing perplexity of the trained model
    nll, ppl = compute_perplexity(spec, params, eng.tokenizer, eval_texts,
                                  max_length=256)
    print(f"trained-model teacher-forcing: NLL {nll:.4f}  PPL {ppl:.3f}\n")

    # ---- method table: NLL delta + est KV MB + generation agreement ------
    methods = [
        ("full_cache", {}),
        ("quant_int8", {}),
        ("quant_int4", {}),
        ("quant_mixed", {}),
        ("paged_attention", {"block_size": 32}),
        ("sliding_window", {"window_size": 128}),
        ("sliding_window", {"window_size": 64}),
        ("sliding_window", {"window_size": 32}),
        ("prefix_window", {"window_size": 64, "prefix_len": 16}),
        ("strided_cache", {"window_size": 64, "stride": 4, "prefix_len": 16}),
        ("block_cache", {"window_size": 64, "block_size": 16,
                         "keep_per_block": 4, "prefix_len": 16}),
        ("budget_cache", {"window_size": 64, "old_budget": 32,
                          "prefix_len": 16}),
        ("chunked_cache", {"chunk_size": 16, "keep_last": 64}),
    ]

    # full-cache generation streams for agreement/similarity
    prompts = [t[:180] for t in eval_texts]
    n_new = 48
    base_ids = [eng.generate_ids(p, "full_cache", n_new)[-n_new:]
                for p in prompts]
    base_txt = [eng.tokenizer.decode(ids) for ids in base_ids]

    base_nll = None
    rows = []
    for method, kw in methods:
        nlls = [compute_method_nll(eng, t, method, max_tokens=256, **kw)
                for t in eval_texts]
        m_nll = float(np.mean(nlls))
        if method == "full_cache":
            base_nll = m_nll

        # est KV MB after 256 tokens (uniform basis across methods): trim
        # methods hold their steady-state post-trim length, not 256
        est_mb = eng.estimate_kv_bytes(method, 256, **kw) / 2**20

        agrees, sims = [], []
        for p, bids, btxt in zip(prompts, base_ids, base_txt):
            ids = eng.generate_ids(p, method, n_new, **kw)[-n_new:]
            agrees.append(token_agreement_rate(ids, bids))
            sims.append(text_similarity(eng.tokenizer.decode(ids), btxt))
        name = method
        if kw:
            name += "(" + ",".join(f"{k}={v}" for k, v in kw.items()) + ")"
        rows.append((name, m_nll, m_nll - base_nll, est_mb,
                     float(np.mean(agrees)), float(np.mean(sims))))

    hdr = ("method", "NLL", "dNLL vs full", "KV MB@256", "tok agree", "similarity")
    if markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for r in rows:
            print(f"| {r[0]} | {r[1]:.4f} | {r[2]:+.4f} | {r[3]:.3f} | "
                  f"{r[4]:.3f} | {r[5]:.3f} |")
    else:
        print(f"{hdr[0]:55s} {hdr[1]:>8s} {hdr[2]:>13s} {hdr[3]:>10s} "
              f"{hdr[4]:>10s} {hdr[5]:>10s}")
        for r in rows:
            print(f"{r[0]:55s} {r[1]:8.4f} {r[2]:+13.4f} {r[3]:10.3f} "
                  f"{r[4]:10.3f} {r[5]:10.3f}")

    # ---- sliding-window NLL sweep (reference quality.py:60-121) ----------
    print("\nsliding-window NLL sweep (text 0):")
    for w in (32, 64, 128, 256):
        swn, sw_ppl = compute_sliding_window_nll(
            spec, params, eng.tokenizer, eval_texts[0], window_size=w,
            max_length=256,
        )
        print(f"  W={w:4d}: NLL {swn:.4f}  PPL {sw_ppl:.3f}")

    # ---- ROUGE ordering over the bundled summarization set ---------------
    print("\nROUGE-1 F1 over bundled cnn_dailymail samples (gen 48 tokens):")
    rouge = RougeEvaluator()
    refs = [summ for _, summ in SUMMARIZATION_SAMPLES["cnn_dailymail"][:4]]
    arts = [art for art, _ in SUMMARIZATION_SAMPLES["cnn_dailymail"][:4]]
    for method, kw in [("full_cache", {}), ("quant_int8", {}),
                       ("quant_int4", {}),
                       ("sliding_window", {"window_size": 64}),
                       ("chunked_cache", {"chunk_size": 16, "keep_last": 64})]:
        preds = []
        for art in arts:
            # n_positions=256: prompt with the article TAIL in the exact
            # training format so prompt + 48 generated tokens fit
            prompt = art[-180:] + "\n\nSummary: "
            text = eng.generate(prompt, method=method, max_new_tokens=48, **kw)
            preds.append(text[len(prompt):])
        scores = rouge.compute_rouge(preds, refs)
        name = method + (f"({kw})" if kw else "")
        print(f"  {name:45s} rouge1_f={scores['rouge1']['fmeasure']:.4f} "
              f"rougeL_f={scores['rougeL']['fmeasure']:.4f}")


if __name__ == "__main__":
    main(markdown="--markdown" in sys.argv)
