"""Qwen2 parity vs HuggingFace transformers (random-init from config).

Qwen2/Qwen2.5 is the llama architecture + q/k/v biases (the reference's
summarization example runs Qwen2.5-7B through AutoModelForCausalLM,
/root/reference/examples/summarization_benchmark.py:13). Anchors the
qkv_bias path against HF Qwen2ForCausalLM: logits within fp32 drift,
greedy decode token-exact through the engine.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import llama as llama_mod


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import Qwen2Config as HFConfig
    from transformers import Qwen2ForCausalLM

    torch.manual_seed(7)
    hf_cfg = HFConfig(
        vocab_size=307,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = llama_mod.LlamaConfig(
        vocab_size=307,
        hidden_size=48,
        intermediate_size=96,
        n_layer=2,
        n_head=4,
        n_kv_head=2,
        n_positions=128,
        rope_theta=10000.0,
        rms_eps=1e-6,
        tie_embeddings=False,
        qkv_bias=True,
    )
    params = llama_mod.params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    return hf, cfg, params


def test_qwen_prefill_logits(hf_pair):
    hf, cfg, params = hf_pair
    assert params["blocks"]["bq"].shape == (2, 48)
    rng = np.random.default_rng(11)
    ids = rng.integers(0, cfg.vocab_size, size=29).tolist()
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


def test_qwen_greedy_decode_token_exact(hf_pair):
    hf, cfg, params = hf_pair
    eng = InferenceEngine(
        llama_mod.llama_spec(cfg),
        params,
        config=Config(model_name="qwen-test", device="cpu", dtype=jnp.float32),
    )
    prompt = "The weather tomorrow morning will turn"
    ids = eng.tokenizer.encode(prompt)
    got = eng.generate_ids(prompt, "full_cache", 12)

    seq = torch.tensor([ids])
    with torch.no_grad():
        for _ in range(12):
            logits = hf(input_ids=seq).logits[:, -1, :]
            seq = torch.cat([seq, logits.argmax(-1, keepdim=True)], dim=1)
    assert got == seq[0].tolist()


def test_qwen_registry_and_engine():
    eng = InferenceEngine.from_model_name("qwen-tiny")
    text, n = eng.generate_with_cache("Hello there.", max_new_tokens=6)
    assert n == 6 and isinstance(text, str)
    # preset geometries resolve and carry biases
    cfg = llama_mod.LlamaConfig.by_name("Qwen/Qwen2.5-7B")
    assert cfg.qkv_bias and cfg.n_kv_head == 4 and cfg.hidden_size == 3584


def test_qwen_megakernel_token_exact():
    """The whole-step megakernel handles qkv biases (in-VMEM bias rows)."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        mega_supported,
        pack_llama_mega,
    )

    cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, tie_embeddings=True, qkv_bias=True,
        rope_theta=10000.0,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    assert mega_supported(cfg, 48, params)
    packed = pack_llama_mega(params, cfg)
    assert packed is not None and "qkvb" in packed

    spec = llama_mod.llama_spec(cfg)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, params,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
    assert outs[True] == outs[False]


def test_qwen_weight_quant_keeps_biases():
    cfg = llama_mod.LlamaConfig.qwen_tiny()
    params = llama_mod.init_llama_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    q = llama_mod.quantize_llama_weights(params, mode="int8")
    assert isinstance(q["blocks"]["wq"], dict)
    np.testing.assert_array_equal(
        np.asarray(q["blocks"]["bq"]), np.asarray(params["blocks"]["bq"])
    )
