"""Llama + sliding-window eviction vs torch+HF oracle.

RoPE interacts with the reference's cache-length position quirk: after a
trim, HF assigns the next token position = trimmed length, which re-bases
the rotary phases. The engine must reproduce that interaction token-for-
token on a rotary/GQA model, not just on GPT-2's learned positions.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.evaluation.quality import token_agreement_rate
from efficient_llm_inference_tpu.models import llama as llama_mod


@pytest.fixture(scope="module")
def setup():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(21)
    hf_cfg = HFConfig(
        vocab_size=251,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_mod.LlamaConfig(
        vocab_size=251, hidden_size=32, intermediate_size=64, n_layer=2,
        n_head=4, n_kv_head=2, n_positions=256, rope_theta=10000.0,
        rms_eps=1e-5, tie_embeddings=False,
    )
    params = llama_mod.params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    eng = InferenceEngine(
        llama_mod.llama_spec(cfg), params,
        config=Config(model_name="lt", device="cpu", dtype=jnp.float32),
    )
    return hf, eng


def test_llama_sliding_window_matches_hf_oracle(setup):
    from transformers import DynamicCache

    hf, eng = setup
    W = 24
    prompt = (
        "Long winds crossed the valley while the caravan moved slowly "
        "between the dunes, carrying spice and copper northward."
    )
    ids = eng.tokenizer.encode(prompt)
    n_new = 12

    def trim(legacy):
        return tuple(
            (k[:, :, -W:, :], v[:, :, -W:, :]) if k.size(2) > W else (k, v)
            for k, v in legacy
        )

    out_ids = list(ids)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]), use_cache=True)
        logits = out.logits[:, -1, :]
        past = DynamicCache.from_legacy_cache(trim(out.past_key_values.to_legacy_cache()))
        for _ in range(n_new):
            nxt = torch.argmax(logits, dim=-1, keepdim=True)
            out_ids.append(int(nxt))
            out = hf(input_ids=nxt, use_cache=True, past_key_values=past)
            logits = out.logits[:, -1, :]
            past = DynamicCache.from_legacy_cache(
                trim(out.past_key_values.to_legacy_cache())
            )
    ref_new = out_ids[len(ids):]

    got = eng.generate_ids(prompt, "sliding_window", n_new, window_size=W)
    got_new = got[len(ids):]
    # rotary phases shift at every trim; fp32 drift can flip a late near-tie
    assert got_new[:6] == ref_new[:6], (got_new, ref_new)
    assert token_agreement_rate(got_new, ref_new) >= 0.75, (got_new, ref_new)


def test_per_head_granularity_through_engine(setup):
    _, eng = setup
    prompt = "Quantization granularity affects reconstruction error."
    base = eng.generate_ids(prompt, "full_cache", 10)
    per_tok = eng.generate_ids(prompt, "quant_int4", 10)
    per_head = eng.generate_ids(prompt, "quant_int4", 10, granularity="per_head")
    # per-head scales are at least as accurate; both streams must be close
    # to the full-precision stream on a short horizon
    assert token_agreement_rate(per_head, base) >= token_agreement_rate(
        per_tok, base
    ) - 0.2
    assert len(per_head) == len(base)
