"""Whole-step decode megakernel (ops/pallas/megakernel.py) vs the XLA path.

Runs the kernel in Pallas interpret mode on CPU (fp32): one step must
reproduce the XLA step's token and cache writeback, and a forced-megakernel
engine must be token-exact against the default engine end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec
from efficient_llm_inference_tpu.ops.pallas.megakernel import (
    gpt2_megastep,
    mega_supported,
    pack_gpt2_mega,
    to_mega_layout,
)

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
)


@pytest.fixture(scope="module")
def params():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def test_megastep_matches_xla_step(params):
    packed = pack_gpt2_mega(params, CFG)
    C = 48
    strat = DenseKV(
        n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    T0 = 7
    toks = jnp.array([[3, 5, 250, 9, 1, 42, 7]], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = gpt2_mod.gpt2_forward(params, CFG, toks, pos, cache, strat)
    cache = strat.set_length(cache, T0)

    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, cache1 = gpt2_mod.gpt2_forward(
        params, CFG, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))

    x_emb = params["wte"][tok0] + params["wpe"][pos1[0]]
    tok_mega, k2, v2 = gpt2_megastep(
        packed, to_mega_layout(cache["k"]), to_mega_layout(cache["v"]),
        jnp.int32(T0), x_emb, cfg=CFG, capacity=C, interpret=True,
    )
    assert int(tok_mega) == tok_xla

    k_ref = to_mega_layout(cache1["k"])
    v_ref = to_mega_layout(cache1["v"])
    np.testing.assert_allclose(
        np.asarray(k2[:, T0]), np.asarray(k_ref[:, T0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(v2[:, T0]), np.asarray(v_ref[:, T0]), atol=1e-5
    )
    # prior rows untouched by the read-modify-write group
    np.testing.assert_array_equal(
        np.asarray(k2[:, :T0]), np.asarray(k_ref[:, :T0])
    )


def test_engine_megakernel_token_exact(params):
    """Forced-megakernel engine == default engine, end to end (greedy)."""
    spec = gpt2_spec(CFG)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, params,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
        if mega:
            # the megakernel build must actually be in use
            assert eng._mega_packed is not None
    assert outs[True] == outs[False]


def test_mega_gating(params):
    # capacity must be a multiple of 8 (aligned RMW group)
    assert not mega_supported(CFG, 47, params)
    assert mega_supported(CFG, 48, params)
    # lane-misaligned embedding width is rejected
    tiny = gpt2_mod.GPT2Config.tiny()
    tparams = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(1), tiny,
                                        jnp.float32)
    assert not mega_supported(tiny, 48, tparams)
    # engine eligibility: batch size != 1 falls back to the XLA path
    spec = gpt2_spec(CFG)
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu",
                      batch_size=2),
    )
    assert eng._mega_spec(48, None) is None


def test_engine_megakernel_int8_weights_token_exact(params):
    """int8-weight megakernel (in-kernel dequant tiles) == int8 XLA path."""
    spec = gpt2_spec(CFG)
    qparams = gpt2_mod.quantize_gpt2_weights(params)
    assert pack_gpt2_mega(qparams, CFG) is not None
    assert mega_supported(CFG, 48, qparams)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, qparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant="int8"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
    assert outs[True] == outs[False]


def test_engine_megakernel_int4_weights_token_exact():
    """Grouped-int4 megakernel (in-kernel nibble tiles) == int4 XLA path.

    Needs E >= 256 so the halves pairing doesn't split a 128-wide scale
    group; deterministic fixture — the paths differ only by f32
    reassociation, which flips no greedy argmax here.
    """
    cfg4 = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=256, n_layer=2, n_head=2
    )
    params4 = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(2), cfg4,
                                        jnp.float32)
    spec = gpt2_spec(cfg4)
    qparams = gpt2_mod.quantize_gpt2_weights(params4, mode="int4")
    packed = pack_gpt2_mega(qparams, cfg4)
    assert packed is not None and packed["wstack"].dtype == jnp.int8
    assert packed["w4scale"].shape[0] == packed["wstack"].shape[0]
    assert mega_supported(cfg4, 48, qparams)
    # E=128: halves pairing would split the 128-wide group -> XLA fallback
    q128 = gpt2_mod.quantize_gpt2_weights(
        gpt2_mod.init_gpt2_params(jax.random.PRNGKey(2), CFG, jnp.float32),
        mode="int4",
    )
    assert not mega_supported(CFG, 48, q128)
    prompt = "the quick brown fox jumps over the lazy dog"
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, qparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant="int4"),
        )
        outs[mega] = eng.generate_ids(prompt, "full_cache", max_new_tokens=9)
        if mega:
            assert eng._mega_packed is not None
    assert outs[True] == outs[False]


def test_megastep_multi_chunk_attention():
    """capacity > _ATTN_CHUNK (512): chunked cache walk == XLA step."""
    cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=2048, n_embd=128, n_layer=2, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    C = 1024  # 2 chunks of 512
    strat = DenseKV(
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    rng = np.random.default_rng(4)
    T0 = 600
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, T0)), jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = gpt2_mod.gpt2_forward(params, cfg, toks, pos, cache, strat)
    cache = strat.set_length(cache, T0)

    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, _ = gpt2_mod.gpt2_forward(
        params, cfg, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))

    packed = pack_gpt2_mega(params, cfg)
    x_emb = (params["wte"][tok0] + params["wpe"][pos1[:, 0]]).astype(
        params["wte"].dtype
    )
    tok_mega, _, _ = gpt2_megastep(
        packed, to_mega_layout(cache["k"]), to_mega_layout(cache["v"]),
        jnp.int32(T0), x_emb, cfg=cfg, capacity=C, interpret=True,
    )
    assert int(tok_mega) == tok_xla
