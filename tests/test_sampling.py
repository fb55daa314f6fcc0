"""Sampling: greedy equivalence at temperature 0, top-k/top-p filtering."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.engine.generate import SamplingParams, sample_token
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


def test_temperature_zero_is_greedy():
    logits = jnp.asarray([[1.0, 5.0, 2.0], [0.1, 0.0, 9.0]])
    tok = sample_token(logits, jax.random.PRNGKey(0), SamplingParams())
    assert tok.tolist() == [1, 2]


def test_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 10.0]])
    sp = SamplingParams(temperature=1.0, top_k=2, seed=0)
    seen = set()
    for i in range(50):
        tok = sample_token(logits, jax.random.PRNGKey(i), sp)
        seen.add(int(tok[0]))
    assert seen <= {3, 4}


def test_top_p_restricts_support():
    # one dominant token (p ~ 0.99) -> top_p=0.5 keeps only it
    logits = jnp.asarray([[0.0, 0.0, 10.0, 0.0]])
    sp = SamplingParams(temperature=1.0, top_p=0.5, seed=0)
    for i in range(20):
        tok = sample_token(logits, jax.random.PRNGKey(i), sp)
        assert int(tok[0]) == 2


def test_engine_sampling_end_to_end():
    cfg = gpt2_mod.GPT2Config(
        vocab_size=200, n_positions=128, n_embd=32, n_layer=2, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(cfg), params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    prompt = "Once upon a time in a village by the sea"
    greedy = eng.generate(prompt, "full_cache", 12)
    greedy2 = eng.generate(prompt, "full_cache", 12, sampling=SamplingParams())
    assert greedy == greedy2  # SamplingParams() is greedy

    s1 = eng.generate(prompt, "full_cache", 12,
                      sampling=SamplingParams(temperature=1.0, seed=1))
    s2 = eng.generate(prompt, "full_cache", 12,
                      sampling=SamplingParams(temperature=1.0, seed=1))
    s3 = eng.generate(prompt, "full_cache", 12,
                      sampling=SamplingParams(temperature=1.0, seed=2))
    assert s1 == s2  # deterministic per seed
    # different seeds usually differ (not guaranteed; sanity only)
    assert isinstance(s3, str)
