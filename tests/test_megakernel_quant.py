"""Quantized-KV whole-step megakernel (ops/pallas/megakernel_quant.py).

Runs the kernel in Pallas interpret mode on CPU (fp32): one step must
reproduce the XLA QuantizedKV step's token, quantized cache writeback, and
per-token scales; a forced-megakernel engine must be token-exact against the
default engine end-to-end for all three kv modes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import QuantizedKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.ops.pallas.megakernel import pack_gpt2_mega
from efficient_llm_inference_tpu.ops.pallas.megakernel_quant import (
    _kv_kinds,
    gpt2_megastep_quant,
    mega_quant_supported,
    to_mega_quant_layout,
)
from efficient_llm_inference_tpu.ops.quantization import unpack_int4

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=256, n_layer=2, n_head=2
)


@pytest.fixture(scope="module")
def params():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def _dequant_pane(pane, kind):
    """Kernel pane -> int values [L, C, E] (for comparisons)."""
    if kind == "int8":
        return np.asarray(pane, np.int32)
    b = np.asarray(pane)  # int8 = 16*q_hi + q_lo + 8
    assert b.dtype == np.int8
    hi = b.astype(np.int32) >> 4  # arithmetic shift: two's-complement hi
    lo = (b.astype(np.int32) & 0xF) - 8
    return np.concatenate([hi, lo], axis=-1).astype(np.int32)


def _xla_pane_ints(buf, kind):
    """QuantizedKV buffer [L, 1, H, C, D(/2)] -> int values [L, C, E]."""
    if kind == "int8":
        q = np.asarray(buf, np.int32)
    else:
        q = np.asarray(unpack_int4(buf), np.int32)
    L, B, H, C, D = q.shape
    return q[:, 0].transpose(0, 2, 1, 3).reshape(L, C, H * D)


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_megastep_quant_matches_xla_step(params, kv_mode):
    packed = pack_gpt2_mega(params, CFG)
    C = 48
    strat = QuantizedKV(
        n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32, mode=kv_mode, fused=False,
    )
    assert mega_quant_supported(CFG, C, params, kv_mode)
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

    k_kind, v_kind = _kv_kinds(kv_mode)
    x_emb = params["wte"][tok0] + params["wpe"][pos1[0]]
    tok_mega, k2, v2, ks2, vs2 = gpt2_megastep_quant(
        packed,
        to_mega_quant_layout(cache["k"], k_kind),
        to_mega_quant_layout(cache["v"], v_kind),
        cache["k_scale"], cache["v_scale"],
        jnp.int32(T0), x_emb,
        cfg=CFG, capacity=C, kv_mode=kv_mode, interpret=True,
    )
    assert int(tok_mega) == tok_xla

    # quantized writeback: the new row's DEQUANTIZED values must match the
    # XLA path's (the two paths' fp32 matmul chains reassociate, so the int
    # codes may differ by 1 ulp of x/scale in rare lanes — compare values)
    kq_mega = _dequant_pane(k2, k_kind)
    kq_xla = _xla_pane_ints(cache1["k"], k_kind)
    ks_xla = np.asarray(cache1["k_scale"])
    deq_mega = kq_mega[:, T0] * np.asarray(ks2)[:, T0, None]
    deq_xla = kq_xla[:, T0] * ks_xla[:, T0, None]
    np.testing.assert_allclose(deq_mega, deq_xla, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(ks2)[:, T0], ks_xla[:, T0], rtol=1e-4
    )
    vq_mega = _dequant_pane(v2, v_kind)
    vq_xla = _xla_pane_ints(cache1["v"], v_kind)
    vs_xla = np.asarray(cache1["v_scale"])
    np.testing.assert_allclose(
        vq_mega[:, T0] * np.asarray(vs2)[:, T0, None],
        vq_xla[:, T0] * vs_xla[:, T0, None],
        atol=5e-3,
    )
    # prior rows and scales untouched by the read-modify-write group
    np.testing.assert_array_equal(kq_mega[:, :T0], kq_xla[:, :T0])
    np.testing.assert_array_equal(
        np.asarray(ks2)[:, :T0], np.asarray(cache["k_scale"])[:, :T0]
    )
    np.testing.assert_array_equal(vq_mega[:, :T0], vq_xla[:, :T0])


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_engine_quant_megakernel_token_exact(params, kv_mode):
    """Forced-megakernel engine == default engine, quant methods, e2e."""
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    spec = gpt2_spec(CFG)
    eng_on = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    eng_off = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    method = f"quant_{kv_mode}"
    prompt = "the quick brown fox"
    ids_on = eng_on.generate_ids(prompt, method=method, max_new_tokens=16)
    assert eng_on._fns  # built something
    # the quant spec must actually have engaged the megakernel path
    built = [v for v in eng_on._fns.values() if v[0] == "cached"]
    assert any(
        isinstance(b[3], dict) and b[3].get("kv_mode") == kv_mode
        for b in built
    ), "quant megakernel path was not selected"
    ids_off = eng_off.generate_ids(prompt, method=method, max_new_tokens=16)
    assert ids_on == ids_off


def test_int4_layout_roundtrip(params):
    """Half-split repacking preserves every dequantized value."""
    C = 16
    strat = QuantizedKV(
        n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32, mode="int4", fused=False,
    )
    cache = strat.init()
    toks = jnp.array([[3, 5, 250, 9]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    _, cache = gpt2_mod.gpt2_forward(params, CFG, toks, pos, cache, strat)
    pane = to_mega_quant_layout(cache["k"], "int4")
    assert pane.dtype == jnp.int8
    ints = _dequant_pane(pane, "int4")
    np.testing.assert_array_equal(ints, _xla_pane_ints(cache["k"], "int4"))


# ---- Llama/Qwen family (GQA + RoPE + SwiGLU over quantized panes) --------
#
# KW = n_kv_head * head_dim = 256 so the packed-int4 pane (KW/2 = 128)
# stays 128-lane aligned and the engine-side eligibility check accepts it.
from efficient_llm_inference_tpu.models import llama as llama_mod  # noqa: E402
from efficient_llm_inference_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    llama_spec,
    rope_cos_sin,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (  # noqa: E402
    pack_llama_mega,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_quant import (  # noqa: E402
    llama_mega_quant_supported,
    llama_megastep_quant,
)

LCFG = LlamaConfig(
    vocab_size=300,
    hidden_size=512,
    intermediate_size=1024,
    n_layer=2,
    n_head=8,
    n_kv_head=4,
    n_positions=512,
    rope_theta=10000.0,
    tie_embeddings=True,
)


@pytest.fixture(scope="module")
def lparams():
    return llama_mod.init_llama_params(jax.random.PRNGKey(0), LCFG, jnp.float32)


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_llama_megastep_quant_matches_xla_step(lparams, kv_mode):
    packed = pack_llama_mega(lparams, LCFG)
    assert packed is not None
    C = 48
    assert llama_mega_quant_supported(LCFG, C, lparams, kv_mode)
    strat = QuantizedKV(
        n_layer=LCFG.n_layer, n_head=LCFG.n_kv_head, head_dim=LCFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32, mode=kv_mode, fused=False,
    )
    T0 = 7
    toks = jnp.array([[3, 5, 250, 9, 1, 42, 7]], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(
        lparams, LCFG, toks, pos, cache, strat
    )
    cache = strat.set_length(cache, T0)

    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    pos1 = jnp.full((1, 1), T0, jnp.int32)
    logits1, cache1 = llama_mod.llama_forward(
        lparams, LCFG, tok0[:, None], pos1, cache, strat
    )
    tok_xla = int(jnp.argmax(logits1[0, 0]))

    k_kind, v_kind = _kv_kinds(kv_mode)
    x_emb = lparams["embed"][tok0]
    cos, sin = rope_cos_sin(pos1, LCFG.head_dim, LCFG.rope_theta)
    cos_q = jnp.tile(cos[0], (1, LCFG.n_head))
    sin_q = jnp.tile(sin[0], (1, LCFG.n_head))
    tok_mega, k2, v2, ks2, vs2 = llama_megastep_quant(
        packed,
        to_mega_quant_layout(cache["k"], k_kind),
        to_mega_quant_layout(cache["v"], v_kind),
        cache["k_scale"], cache["v_scale"],
        jnp.int32(T0), x_emb, cos_q, sin_q,
        cfg=LCFG, capacity=C, kv_mode=kv_mode, interpret=True,
    )
    assert int(tok_mega) == tok_xla

    # quantized writeback: dequantized new-row values match the XLA path
    kq_mega = _dequant_pane(k2, k_kind)
    kq_xla = _xla_pane_ints(cache1["k"], k_kind)
    ks_xla = np.asarray(cache1["k_scale"])
    np.testing.assert_allclose(
        kq_mega[:, T0] * np.asarray(ks2)[:, T0, None],
        kq_xla[:, T0] * ks_xla[:, T0, None],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ks2)[:, T0], ks_xla[:, T0], rtol=1e-4
    )
    vq_mega = _dequant_pane(v2, v_kind)
    vq_xla = _xla_pane_ints(cache1["v"], v_kind)
    vs_xla = np.asarray(cache1["v_scale"])
    np.testing.assert_allclose(
        vq_mega[:, T0] * np.asarray(vs2)[:, T0, None],
        vq_xla[:, T0] * vs_xla[:, T0, None],
        atol=5e-3,
    )
    # prior rows and scales untouched by the read-modify-write group
    np.testing.assert_array_equal(kq_mega[:, :T0], kq_xla[:, :T0])
    np.testing.assert_array_equal(
        np.asarray(ks2)[:, :T0], np.asarray(cache["k_scale"])[:, :T0]
    )
    np.testing.assert_array_equal(vq_mega[:, :T0], vq_xla[:, :T0])


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_engine_llama_quant_megakernel_token_exact(lparams, kv_mode):
    """Forced-megakernel Llama engine == default engine, quant methods."""
    spec = llama_spec(LCFG)
    eng_on = InferenceEngine(
        spec, lparams,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    eng_off = InferenceEngine(
        spec, lparams,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    method = f"quant_{kv_mode}"
    prompt = "the quick brown fox jumps over the lazy dog"
    ids_on = eng_on.generate_ids(prompt, method=method, max_new_tokens=12)
    built = [b for b in eng_on._fns.values() if b[0] == "cached"]
    assert any(
        isinstance(b[3], dict) and b[3].get("kv_mode") == kv_mode
        for b in built
    ), "llama quant megakernel path was not selected"
    ids_off = eng_off.generate_ids(prompt, method=method, max_new_tokens=12)
    assert ids_on == ids_off


def test_engine_llama_quant_mega_int8_weights(lparams):
    """int8 weight tiles + int8 KV panes compose (the serving sweet spot)."""
    spec = llama_spec(LCFG)
    qparams = llama_mod.quantize_llama_weights(lparams)
    assert llama_mega_quant_supported(LCFG, 48, qparams, "int8")
    outs = {}
    for mega in (False, True):
        eng = InferenceEngine(
            spec, qparams,
            config=Config(dtype=jnp.float32, megakernel=mega, device="cpu",
                          weight_quant="int8"),
        )
        outs[mega] = eng.generate_ids(
            "compose int8 weights with int8 kv", method="quant_int8",
            max_new_tokens=10,
        )
    assert outs[True] == outs[False]


def test_llama_quant_gating(lparams):
    # narrow KV lane space: int4 pane drops under 128 lanes -> rejected
    narrow = LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, tie_embeddings=True,
    )
    nparams = llama_mod.init_llama_params(
        jax.random.PRNGKey(1), narrow, jnp.float32
    )
    assert not llama_mega_quant_supported(narrow, 48, nparams, "int4")
    # int8 panes at KW=128 are fine
    assert llama_mega_quant_supported(narrow, 48, nparams, "int8")
    # capacity must be 8-aligned
    assert not llama_mega_quant_supported(LCFG, 47, lparams, "int8")
