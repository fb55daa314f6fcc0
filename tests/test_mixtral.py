"""Mixtral MoE parity vs HF + expert-parallel sharding.

The MoE forward (softmax-all / top-k / renormalize routing, SwiGLU experts)
must match HF MixtralForCausalLM token-for-token, and the expert-sharded
(EP) forward on the virtual mesh must match the unsharded one exactly.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import mixtral as mx


@pytest.fixture(scope="module")
def setup():
    from transformers import MixtralConfig as HFConfig
    from transformers import MixtralForCausalLM

    torch.manual_seed(31)
    hf_cfg = HFConfig(
        vocab_size=241,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        attn_implementation="eager",
    )
    hf = MixtralForCausalLM(hf_cfg).eval()
    cfg = mx.MixtralConfig(
        vocab_size=241, hidden_size=32, intermediate_size=64, n_layer=2,
        n_head=4, n_kv_head=2, n_experts=4, top_k=2, n_positions=256,
        rope_theta=10000.0, rms_eps=1e-5,
    )
    params = mx.params_from_hf_state_dict(hf.state_dict(), cfg, jnp.float32)
    return hf, cfg, params


def test_mixtral_prefill_logits(setup):
    hf, cfg, params = setup
    rng = np.random.default_rng(7)
    ids = rng.integers(0, cfg.vocab_size, 29).tolist()
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids])).logits.numpy()

    spec = mx.mixtral_spec(cfg)
    strategy = DenseKV(
        n_layer=cfg.n_layer, n_head=cfg.n_kv_head, head_dim=cfg.head_dim, capacity=48
    )
    tokens = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    logits, _ = spec.forward(params, tokens, pos, strategy.init(), strategy, None)
    got = np.asarray(logits)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-2)
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_mixtral_greedy_decode_token_exact(setup):
    hf, cfg, params = setup
    eng = InferenceEngine(
        mx.mixtral_spec(cfg), params,
        config=Config(model_name="mx", device="cpu", dtype=jnp.float32),
    )
    prompt = "Routing tokens through experts requires a stable gate."
    ids = eng.tokenizer.encode(prompt)
    n = 14

    out_ids = list(ids)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([ids]), use_cache=True)
        past, logits = out.past_key_values, out.logits[:, -1, :]
        for _ in range(n):
            nxt = torch.argmax(logits, dim=-1, keepdim=True)
            out_ids.append(int(nxt))
            out = hf(input_ids=nxt, use_cache=True, past_key_values=past)
            past, logits = out.past_key_values, out.logits[:, -1, :]

    got = eng.generate_ids(prompt, "full_cache", n)
    assert got == out_ids


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_expert_parallel_forward_exact(setup):
    _, cfg, params = setup
    from efficient_llm_inference_tpu.parallel.mesh import make_mesh, shard_params

    rng = np.random.default_rng(8)
    ids = rng.integers(0, cfg.vocab_size, 16).tolist()
    spec = mx.mixtral_spec(cfg)
    strategy = DenseKV(
        n_layer=cfg.n_layer, n_head=cfg.n_kv_head, head_dim=cfg.head_dim, capacity=32
    )
    tokens = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]

    base, _ = spec.forward(params, tokens, pos, strategy.init(), strategy, None)

    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    sharded = shard_params(params, mx.expert_parallel_specs(cfg), mesh)
    with mesh:
        got, _ = jax.jit(
            lambda p, t, q: spec.forward(p, t, q, strategy.init(), strategy, None)
        )(sharded, tokens, pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), rtol=2e-5, atol=2e-5)


def test_mixtral_continuous_batching(setup):
    """The batching engine is model-agnostic: MoE serving over the paged
    pool with an int8 quantized store."""
    _, cfg, params = setup
    from efficient_llm_inference_tpu.data.tokenizer import ByteTokenizer
    from efficient_llm_inference_tpu.engine.batching import (
        ContinuousBatchingEngine,
        PoolConfig,
        Request,
    )

    cbe = ContinuousBatchingEngine(
        mx.mixtral_spec(cfg), params,
        PoolConfig(n_slots=2, block_size=16, n_blocks=16, max_blocks_per_seq=4,
                   prompt_bucket=32, quant="int8"),
        dtype=jnp.float32,
    )
    tok = ByteTokenizer()
    reqs = [Request(i, tok.encode(f"expert request {i}"), 6) for i in range(4)]
    cbe.run(reqs)
    assert all(r.done and len(r.out_ids) == 6 for r in reqs)
