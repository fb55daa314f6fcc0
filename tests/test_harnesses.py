"""Benchmark harness integration: metric schema, harness DataFrames.

Validates the reference-compatible surfaces end-to-end on bundled offline
data: benchmark_method's dict schema (reference benchmarker.py:811-832),
SummarizationBenchmark / MMLUBenchmark compare flows.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

import efficient_llm_inference_tpu as elit
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import VALID_METHODS, InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


@pytest.fixture(scope="module")
def engine():
    cfg = gpt2_mod.GPT2Config(
        vocab_size=260, n_positions=512, n_embd=32, n_layer=2, n_head=2
    )
    import jax

    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return InferenceEngine(
        gpt2_spec(cfg),
        params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )


def test_long_prompt_non_truncating_method_beyond_1024():
    """Prompts >1024 tokens must not crash non-truncating methods on models
    with n_positions > 1024 (the bucket table extends past 1024)."""
    import jax

    cfg = gpt2_mod.GPT2Config(
        vocab_size=260, n_positions=2048, n_embd=32, n_layer=1, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(cfg),
        params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    prompt = "river " * 250  # 1500 bytes -> 1500 tokens (ByteTokenizer)
    assert len(eng.tokenizer.encode(prompt)) > 1024
    text = eng.generate(prompt, method="sliding_window", max_new_tokens=2,
                        window_size=64)
    assert isinstance(text, str) and len(text) > 0
    # truncating methods still clip at prompt_cap (reference parity)
    ids = eng._encode(prompt, "full_cache")
    assert len(ids) == eng.config.prompt_cap


SCHEMA_KEYS = {
    "method",
    "elapsed_sec",
    "total_new_tokens",
    "tokens_per_sec",
    "cpu_mem_used_mb",
    "gpu_peak_mb",
    "window_size",
    "block_size",
    "chunk_size",
    "est_kv_cache_mb_avg",
    "prefix_len",
    "stride",
    "keep_per_block",
    "old_budget",
}


@pytest.mark.parametrize("method", VALID_METHODS)
def test_benchmark_method_schema(engine, method):
    r = engine.benchmark_method(
        ["A short test prompt about rivers."], method=method, max_new_tokens=4
    )
    assert set(r.keys()) == SCHEMA_KEYS
    assert r["method"] == method
    assert r["total_new_tokens"] == 4
    assert r["tokens_per_sec"] > 0
    # per-method est-cache semantics (reference benchmarker.py:707-787)
    if method == "no_cache":
        assert r["est_kv_cache_mb_avg"] == 0.0
    elif method.startswith("quant_") or method in ("paged_attention", "chunked_cache"):
        assert r["est_kv_cache_mb_avg"] > 0
    else:
        assert math.isnan(r["est_kv_cache_mb_avg"])


def test_quant_est_cache_ordering(engine):
    """int4 cache must be smaller than mixed, mixed smaller than int8."""
    ests = {}
    for mode in ("int8", "int4", "mixed"):
        _, _, est = engine.generate_with_quantized_kv(
            "Another prompt about mountain weather patterns.", 8, mode=mode
        )
        ests[mode] = est
    assert ests["int4"] < ests["mixed"] < ests["int8"]


def test_summarization_benchmark_flow(engine):
    ds = elit.load_cnn_dailymail(max_samples=2)
    sb = elit.SummarizationBenchmark(engine, ds)
    df = sb.compare_methods(["full_cache", "quant_int8"], num_samples=2,
                            max_new_tokens=4)
    assert list(df["method"]) == ["full_cache", "quant_int8"]
    for col in ("rouge1_f", "rouge2_f", "rougeL_f", "elapsed_sec"):
        assert col in df.columns
    dfv = sb.benchmark_with_variants(
        "sliding_window", variants=[{"window_size": 32}], num_samples=1,
        max_new_tokens=4,
    )
    assert "variant" in dfv.columns


def test_mmlu_benchmark_flow(engine):
    ds = elit.load_mmlu(max_samples=3)
    mb = elit.MMLUBenchmark(engine, ds)
    df = mb.compare_methods(["full_cache", "quant_int4"], num_samples=3,
                            max_new_tokens=3)
    assert "accuracy" in df.columns
    assert {"accuracy_A", "accuracy_B", "accuracy_C", "accuracy_D"} <= set(df.columns)
    assert "extracted_answers" not in df.columns  # dropped (mmlu.py:338)


def test_package_root_exports():
    for name in (
        "Config", "QuantizationConfig", "CacheConfig", "BenchmarkConfig",
        "KVCacheBenchmarker", "InferenceEngine", "SummarizationBenchmark",
        "MMLUBenchmark", "SummarizationDataset", "MMLUDataset",
        "load_cnn_dailymail", "load_xsum", "load_samsum", "load_mmlu",
        "ContinuousBatchingEngine",
    ):
        assert getattr(elit, name) is not None
    assert elit.__version__


def test_dispatch_unknown_method_raises(engine):
    from efficient_llm_inference_tpu.benchmarking.dispatch import (
        generate_with_method,
    )

    with pytest.raises(ValueError, match="Unknown method"):
        generate_with_method(engine, "hi", "bogus_method", 2)


def test_summarization_harness_rejects_mmlu_only_methods(engine):
    """The reference restricts the summarization harness to 7 methods
    (summarization.py:87-113); prefix/strided/block/budget stay MMLU-only."""
    import efficient_llm_inference_tpu as elit

    ds = elit.load_cnn_dailymail(max_samples=1)
    sb = elit.SummarizationBenchmark(engine, ds)
    with pytest.raises(ValueError, match="Unknown method"):
        sb.generate_summaries(["short article"], method="prefix_window",
                              max_new_tokens=2)


def test_estimate_kv_bytes_public_helper(engine):
    """engine.estimate_kv_bytes: quantized < full < paged-with-slack;
    trim methods report the post-trim steady state (round-4 public API,
    reference benchmarker.py:707-787 accounting semantics)."""
    full = engine.estimate_kv_bytes("full_cache", 256)
    q8 = engine.estimate_kv_bytes("quant_int8", 256)
    q4 = engine.estimate_kv_bytes("quant_int4", 256)
    slide = engine.estimate_kv_bytes("sliding_window", 256, window_size=64)
    paged = engine.estimate_kv_bytes("paged_attention", 250, block_size=32)
    assert q4 < q8 < full
    assert slide == engine.estimate_kv_bytes("sliding_window", 64,
                                             window_size=64)
    # paged accounts allocated blocks incl. slack: 250 tokens -> 8 blocks
    assert paged >= engine.estimate_kv_bytes("full_cache", 250)
