"""compute_method_nll: teacher-forced NLL under each cache method.

full_cache must reproduce plain teacher-forcing exactly; every method must
run through its own cache machinery; truncating eviction must not LOWER the
NLL of a model trained to depend on context (checked on the committed
quality checkpoint when present).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.evaluation.quality import (
    _sequence_mean_nll,
    compute_method_nll,
)

TEXT = "The river flows down from the mountains to the sea. " * 4


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine.from_model_name(
        "gpt2-tiny",
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )


def test_full_cache_matches_teacher_forcing_oracle(engine):
    ids = engine.tokenizer.encode(TEXT)[:256]
    want = _sequence_mean_nll(engine.model, engine.params, ids)
    got = compute_method_nll(engine, TEXT, "full_cache", max_tokens=256)
    assert got == pytest.approx(want, abs=2e-4)


def test_no_cache_aliases_full(engine):
    a = compute_method_nll(engine, TEXT, "no_cache", max_tokens=128)
    b = compute_method_nll(engine, TEXT, "full_cache", max_tokens=128)
    assert a == pytest.approx(b, abs=1e-6)


@pytest.mark.parametrize(
    "method,kw",
    [
        ("quant_int8", {}),
        ("quant_int4", {}),
        ("quant_mixed", {}),
        ("paged_attention", {"block_size": 16}),
        ("sliding_window", {"window_size": 32}),
        ("sliding_window", {"window_size": 32, "ring": False}),
        ("prefix_window", {"window_size": 32, "prefix_len": 8}),
        ("strided_cache", {"window_size": 32, "stride": 4, "prefix_len": 8}),
        ("block_cache", {"window_size": 32, "block_size": 8,
                         "keep_per_block": 2, "prefix_len": 8}),
        ("budget_cache", {"window_size": 32, "old_budget": 16,
                          "prefix_len": 8}),
        ("chunked_cache", {"chunk_size": 8, "keep_last": 32}),
    ],
)
def test_every_method_scores(engine, method, kw):
    v = compute_method_nll(engine, TEXT, method, max_tokens=128, **kw)
    assert np.isfinite(v) and v > 0


def test_ring_and_trim_sliding_agree(engine):
    # same attention SET, different slot order (rotated ring vs compacted
    # trim) -> f32 softmax sums differ in the last bits only
    a = compute_method_nll(engine, TEXT, "sliding_window", max_tokens=128,
                           window_size=32)
    b = compute_method_nll(engine, TEXT, "sliding_window", max_tokens=128,
                           window_size=32, ring=False)
    assert a == pytest.approx(b, abs=5e-3)


def test_paged_matches_full(engine):
    a = compute_method_nll(engine, TEXT, "paged_attention", max_tokens=128,
                           block_size=16)
    b = compute_method_nll(engine, TEXT, "full_cache", max_tokens=128)
    assert a == pytest.approx(b, abs=1e-5)


def test_trained_model_quality_ordering():
    """On the committed trained checkpoint, int8 KV is ~free while window
    eviction degrades NLL by orders of magnitude more."""
    import pathlib

    ckpt = (pathlib.Path(__file__).resolve().parent.parent
            / "artifacts" / "quality_gpt2.npz")
    if not ckpt.exists():
        pytest.skip("quality checkpoint not trained")
    from examples.train_quality_model import load_quality_model

    spec, params = load_quality_model()
    eng = InferenceEngine(
        spec, params,
        config=Config(model_name="q", device="cpu", dtype=jnp.float32),
    )
    from efficient_llm_inference_tpu.data.samples import SUMMARIZATION_SAMPLES

    art, summ = SUMMARIZATION_SAMPLES["cnn_dailymail"][0]
    text = art + "\n\nSummary: " + summ
    full = compute_method_nll(eng, text, "full_cache", max_tokens=256)
    q8 = compute_method_nll(eng, text, "quant_int8", max_tokens=256)
    win = compute_method_nll(eng, text, "sliding_window", max_tokens=256,
                             window_size=64)
    assert full < 0.2, full  # trained to low loss
    assert abs(q8 - full) < 0.02, (q8, full)  # int8 KV ~ free
    assert win > full + 0.5, (win, full)  # eviction visibly degrades
