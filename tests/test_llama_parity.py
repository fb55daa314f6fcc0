"""Llama parity vs HuggingFace transformers (random-init from config).

Anchors the natively-implemented Llama (RoPE rotate-half, RMSNorm, GQA,
SwiGLU) against HF LlamaForCausalLM: logits within fp32 drift, greedy decode
token-exact through the engine.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import llama as llama_mod


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import LlamaConfig as HFConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(3)
    hf_cfg = HFConfig(
        vocab_size=307,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = llama_mod.LlamaConfig(
        vocab_size=307,
        hidden_size=48,
        intermediate_size=96,
        n_layer=2,
        n_head=4,
        n_kv_head=2,
        n_positions=128,
        rope_theta=10000.0,
        rms_eps=1e-5,
        tie_embeddings=False,
    )
    params = llama_mod.params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    return hf, cfg, params


def test_llama_prefill_logits(hf_pair):
    hf, cfg, params = hf_pair
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=33).tolist()
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids])).logits.numpy()

    spec = llama_mod.llama_spec(cfg)
    strategy = DenseKV(
        n_layer=cfg.n_layer, n_head=cfg.n_kv_head, head_dim=cfg.head_dim, capacity=48
    )
    tokens = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    logits, _ = spec.forward(params, tokens, pos, strategy.init(), strategy, None)
    got = np.asarray(logits)

    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-2)
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_llama_greedy_decode_token_exact(hf_pair):
    hf, cfg, params = hf_pair
    eng = InferenceEngine(
        llama_mod.llama_spec(cfg),
        params,
        config=Config(model_name="llama-test", device="cpu", dtype=jnp.float32),
    )
    prompt = "The mountain river flows quickly toward the sea in early spring."
    ids = eng.tokenizer.encode(prompt)
    n_steps = 16

    out_ids = list(ids)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]), use_cache=True)
        past, logits = out.past_key_values, out.logits[:, -1, :]
        for _ in range(n_steps):
            nxt = torch.argmax(logits, dim=-1, keepdim=True)
            out_ids.append(int(nxt))
            out = hf(input_ids=nxt, use_cache=True, past_key_values=past)
            past, logits = out.past_key_values, out.logits[:, -1, :]

    got = eng.generate_ids(prompt, "full_cache", n_steps)
    assert got == out_ids


def test_llama_quantized_runs(hf_pair):
    _, cfg, params = hf_pair
    eng = InferenceEngine(
        llama_mod.llama_spec(cfg),
        params,
        config=Config(model_name="llama-test", device="cpu", dtype=jnp.float32),
    )
    text, n_new, est = eng.generate_with_quantized_kv("Hello world test.", 8, mode="int4")
    assert n_new == 8
    assert est > 0
