"""no_cache EOS early-stop semantics (reference benchmarker.py:94-96).

Only the no_cache path checks EOS; the break comes AFTER appending, so EOS
counts toward n_new. Cached paths never stop early.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.data.tokenizer import ByteTokenizer
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


def _engine_with_eos(eos_id):
    cfg = gpt2_mod.GPT2Config(
        vocab_size=64, n_positions=256, n_embd=16, n_layer=1, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(9), cfg, jnp.float32)
    tok = ByteTokenizer(eos_token_id=eos_id)
    return InferenceEngine(
        gpt2_spec(cfg),
        params,
        tokenizer=tok,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )


def test_eos_stops_no_cache_early():
    # With a tiny vocab and a 1-layer random model, greedy decode settles
    # into a repeated token quickly; pick that token as EOS so the stop
    # triggers.
    eng = _engine_with_eos(None)
    text, n = eng.generate_no_cache("hello", max_new_tokens=12)
    repeated = eng.last_generation_ids[-1]

    eng2 = _engine_with_eos(int(repeated))
    eng2.params = eng.params  # same weights
    text2, n2 = eng2.generate_no_cache("hello", max_new_tokens=12)
    assert n2 < 12, "EOS should stop generation early"
    assert eng2.last_generation_ids[-1] == repeated  # EOS itself is counted

    # cached path has no EOS check (reference parity)
    text3, n3 = eng2.generate_with_cache("hello", max_new_tokens=12)
    assert n3 == 12
