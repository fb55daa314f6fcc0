"""Batched quant-KV whole-step megakernel (ops/pallas/megakernel_batch_quant).

Interpret mode on CPU (fp32): one batched step must reproduce the
single-stream quant megakernel per row (tokens and quantized writeback
exactly; scales to 1 ulp — batched [B, E] matmuls reassociate);
`engine.generate_batch(kv_mode=...)` must be token-exact against the
engine's single-stream quant_{int8,int4,mixed} methods end-to-end; and the
MegaBatchServer with int8 panes must serve token-identical outputs to
per-prompt quant_int8 generation across admission waves.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import QuantizedKV
from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec
from efficient_llm_inference_tpu.ops.pallas.megakernel import pack_gpt2_mega
from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_quant import (
    gpt2_megabatch_quant,
    llama_mega_batch_quant_supported,
    llama_megabatch_quant,
    mega_batch_quant_supported,
    quantize_panes_batch,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_quant import (
    _kv_kinds,
    gpt2_megastep_quant,
    llama_megastep_quant,
    to_mega_quant_layout,
)

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=256, n_layer=2, n_head=2
)
C = 48
B = 3
LENS = [7, 12, 5]


@pytest.fixture(scope="module")
def params():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def _gpt2_quant_rows(params, kv_mode, lens):
    """Per-row QuantizedKV prefills -> (caches, first tokens)."""
    rng = np.random.default_rng(0)
    rows = []
    for T0 in lens:
        strat = QuantizedKV(
            n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
            capacity=C, batch=1, dtype=jnp.float32, mode=kv_mode, fused=False,
        )
        toks = jnp.asarray(rng.integers(1, 299, size=(1, T0)), jnp.int32)
        pos = jnp.arange(T0, dtype=jnp.int32)[None]
        cache = strat.init()
        logits, cache = gpt2_mod.gpt2_forward(
            params, CFG, toks, pos, cache, strat)
        cache = strat.set_length(cache, T0)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        rows.append((cache, tok0))
    return rows


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_megabatch_quant_rows_match_single_stream(params, kv_mode):
    """Batched step == per-row single-stream quant megakernel."""
    packed = pack_gpt2_mega(params, CFG)
    assert mega_batch_quant_supported(CFG, C, params, B, kv_mode)
    k_kind, v_kind = _kv_kinds(kv_mode)
    rows = _gpt2_quant_rows(params, kv_mode, LENS)

    kb = jnp.stack(
        [to_mega_quant_layout(c["k"], k_kind) for c, _ in rows], axis=1)
    vb = jnp.stack(
        [to_mega_quant_layout(c["v"], v_kind) for c, _ in rows], axis=1)
    ks = jnp.stack([c["k_scale"] for c, _ in rows], axis=1)  # [L, B, C]
    vs = jnp.stack([c["v_scale"] for c, _ in rows], axis=1)
    tok0s = jnp.concatenate([t for _, t in rows])
    x_emb = params["wte"][tok0s] + params["wpe"][jnp.asarray(LENS)]
    toks_b, k2b, v2b, ks2b, vs2b = gpt2_megabatch_quant(
        packed, kb, vb, ks, vs, jnp.asarray(LENS, jnp.int32), x_emb,
        cfg=CFG, capacity=C, kv_mode=kv_mode, interpret=True,
    )
    for b in range(B):
        cache, tok0 = rows[b]
        tok_s, k2, v2, ks2, vs2 = gpt2_megastep_quant(
            packed,
            to_mega_quant_layout(cache["k"], k_kind),
            to_mega_quant_layout(cache["v"], v_kind),
            cache["k_scale"], cache["v_scale"],
            jnp.int32(LENS[b]), x_emb[b:b + 1],
            cfg=CFG, capacity=C, kv_mode=kv_mode, interpret=True,
        )
        assert int(toks_b[b]) == int(tok_s), b
        np.testing.assert_array_equal(np.asarray(k2b[:, b]), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v2b[:, b]), np.asarray(v2))
        # batched [B, E] projections reassociate the fp32 amax by 1 ulp
        np.testing.assert_allclose(
            np.asarray(ks2b[:, b]), np.asarray(ks2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vs2b[:, b]), np.asarray(vs2), rtol=1e-6)


def test_quantize_panes_batch_matches_quantized_kv(params):
    """Prefill-pane quantization reproduces QuantizedKV's stored codes."""
    from efficient_llm_inference_tpu.cache.kvcache import DenseKV
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (
        to_mega_layout_batch,
    )

    T0 = 9
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(1, 299, size=(1, T0)), jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    dense = DenseKV(
        n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    dcache = dense.init()
    _, dcache = gpt2_mod.gpt2_forward(params, CFG, toks, pos, dcache, dense)
    for kv_mode in ("int8", "int4", "mixed"):
        k_kind, v_kind = _kv_kinds(kv_mode)
        qs = QuantizedKV(
            n_layer=CFG.n_layer, n_head=CFG.n_head, head_dim=CFG.head_dim,
            capacity=C, batch=1, dtype=jnp.float32, mode=kv_mode, fused=False,
        )
        qcache = qs.init()
        _, qcache = gpt2_mod.gpt2_forward(params, CFG, toks, pos, qcache, qs)
        k8, v8, ks, vs = quantize_panes_batch(
            to_mega_layout_batch(dcache["k"]),
            to_mega_layout_batch(dcache["v"]), kv_mode,
        )
        np.testing.assert_array_equal(
            np.asarray(k8[:, 0, :T0]),
            np.asarray(to_mega_quant_layout(qcache["k"], k_kind))[:, :T0],
        )
        np.testing.assert_array_equal(
            np.asarray(v8[:, 0, :T0]),
            np.asarray(to_mega_quant_layout(qcache["v"], v_kind))[:, :T0],
        )
        np.testing.assert_allclose(
            np.asarray(ks[:, 0, :T0]), np.asarray(qcache["k_scale"])[:, :T0],
            rtol=1e-6,
        )


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_engine_generate_batch_quant_token_exact(params, kv_mode):
    """generate_batch(kv_mode) == per-prompt quant_{mode} generation."""
    spec = gpt2_spec(CFG)
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    prompts = [
        "the quick brown fox",
        "pack my box with five dozen liquor jugs",
        "a",
    ]
    got = eng.generate_batch(prompts, max_new_tokens=7, kv_mode=kv_mode)
    assert any(
        k[0] == "batch" and k[-1] == kv_mode for k in eng._fns
    ), "quant batch megakernel path was not selected"
    want = [
        eng.generate(p, f"quant_{kv_mode}", max_new_tokens=7)
        for p in prompts
    ]
    assert got == want


def test_megabatch_quant_gating(params):
    assert not mega_batch_quant_supported(CFG, 47, params, B, "int8")
    assert mega_batch_quant_supported(CFG, 48, params, 8, "int4")
    # absurd batch x capacity cannot fit even the int8 rings
    assert not mega_batch_quant_supported(CFG, 8192, params, 512, "int8")


def test_megabatch_server_int8_matches_per_prompt(params):
    """MegaBatchServer(kv_mode=int8) == per-prompt quant_int8 generation."""
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )

    spec = gpt2_spec(CFG)
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    tok = eng.tokenizer
    prompts = [
        "the quick brown fox jumps",
        "a b c",
        "pack my box with five dozen",
        "hello world",
    ]
    budgets = [6, 9, 5, 7]
    # 2 slots, 4 requests -> at least two admission waves
    srv = MegaBatchServer(
        spec, params,
        pool=MegaPoolConfig(n_slots=2, capacity=C, max_chunk=4,
                            prompt_bucket=32),
        dtype=jnp.float32,
        kv_mode="int8",
        interpret=True,
    )
    reqs = [
        Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
        for i, (p, n) in enumerate(zip(prompts, budgets))
    ]
    srv.run(reqs)
    for req, p, n in zip(reqs, prompts, budgets):
        assert req.done and len(req.out_ids) == n
        want = eng.generate_ids(p, "quant_int8", max_new_tokens=n)
        assert req.prompt_ids + req.out_ids == want, f"request {req.rid}"


# ---------------------------------------------------------------------------
# Llama/Qwen family (GQA + RoPE + SwiGLU over batched quantized panes)
# ---------------------------------------------------------------------------

from efficient_llm_inference_tpu.models import llama as llama_mod  # noqa: E402
from efficient_llm_inference_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    llama_spec,
    rope_cos_sin,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (  # noqa: E402
    pack_llama_mega,
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
    return llama_mod.init_llama_params(jax.random.PRNGKey(0), LCFG,
                                       jnp.float32)


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_llama_megabatch_quant_rows_match_single_stream(lparams, kv_mode):
    packed = pack_llama_mega(lparams, LCFG)
    assert packed is not None
    assert llama_mega_batch_quant_supported(LCFG, C, lparams, B, kv_mode)
    k_kind, v_kind = _kv_kinds(kv_mode)
    rng = np.random.default_rng(2)
    rows = []
    for T0 in LENS:
        strat = QuantizedKV(
            n_layer=LCFG.n_layer, n_head=LCFG.n_kv_head,
            head_dim=LCFG.head_dim, capacity=C, batch=1, dtype=jnp.float32,
            mode=kv_mode, fused=False,
        )
        toks = jnp.asarray(rng.integers(1, 299, size=(1, T0)), jnp.int32)
        pos = jnp.arange(T0, dtype=jnp.int32)[None]
        cache = strat.init()
        logits, cache = llama_mod.llama_forward(
            lparams, LCFG, toks, pos, cache, strat)
        cache = strat.set_length(cache, T0)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        rows.append((cache, tok0))

    kb = jnp.stack(
        [to_mega_quant_layout(c["k"], k_kind) for c, _ in rows], axis=1)
    vb = jnp.stack(
        [to_mega_quant_layout(c["v"], v_kind) for c, _ in rows], axis=1)
    ks = jnp.stack([c["k_scale"] for c, _ in rows], axis=1)
    vs = jnp.stack([c["v_scale"] for c, _ in rows], axis=1)
    tok0s = jnp.concatenate([t for _, t in rows])
    x_emb = lparams["embed"][tok0s]
    pos_b = jnp.asarray(LENS, jnp.int32)
    cos, sin = rope_cos_sin(pos_b[:, None], LCFG.head_dim, LCFG.rope_theta)
    cos_q = jnp.tile(cos[:, 0], (1, LCFG.n_head))
    sin_q = jnp.tile(sin[:, 0], (1, LCFG.n_head))
    toks_b, k2b, v2b, ks2b, vs2b = llama_megabatch_quant(
        packed, kb, vb, ks, vs, pos_b, x_emb, cos_q, sin_q,
        cfg=LCFG, capacity=C, kv_mode=kv_mode, interpret=True,
    )
    for b in range(B):
        cache, tok0 = rows[b]
        cos1, sin1 = rope_cos_sin(
            jnp.full((1, 1), LENS[b], jnp.int32), LCFG.head_dim,
            LCFG.rope_theta,
        )
        tok_s, k2, v2, ks2, vs2 = llama_megastep_quant(
            packed,
            to_mega_quant_layout(cache["k"], k_kind),
            to_mega_quant_layout(cache["v"], v_kind),
            cache["k_scale"], cache["v_scale"],
            jnp.int32(LENS[b]), x_emb[b:b + 1],
            jnp.tile(cos1[0], (1, LCFG.n_head)),
            jnp.tile(sin1[0], (1, LCFG.n_head)),
            cfg=LCFG, capacity=C, kv_mode=kv_mode, interpret=True,
        )
        assert int(toks_b[b]) == int(tok_s), b
        np.testing.assert_array_equal(np.asarray(k2b[:, b]), np.asarray(k2))
        np.testing.assert_array_equal(np.asarray(v2b[:, b]), np.asarray(v2))
        np.testing.assert_allclose(
            np.asarray(ks2b[:, b]), np.asarray(ks2), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vs2b[:, b]), np.asarray(vs2), rtol=1e-6)


@pytest.mark.parametrize("kv_mode", ["int8", "int4"])
def test_engine_generate_batch_llama_quant_token_exact(lparams, kv_mode):
    spec = llama_spec(LCFG)
    eng = InferenceEngine(
        spec, lparams,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    prompts = ["the quick brown fox", "a"]
    got = eng.generate_batch(prompts, max_new_tokens=5, kv_mode=kv_mode)
    assert any(
        k[0] == "batch" and k[-1] == kv_mode for k in eng._fns
    ), "llama quant batch megakernel path was not selected"
    want = [
        eng.generate(p, f"quant_{kv_mode}", max_new_tokens=5)
        for p in prompts
    ]
    assert got == want


def test_engine_generate_batch_llama_quant_padded_scales(lparams):
    """Padded int4 scale stack (n_gh=3 geometry, s4g marker) through the
    BATCHED llama quant kernel: generate_batch(kv_mode) must stay
    token-exact vs the single-stream quant method — covers the
    megakernel_batch_quant llama section's _s4_geom decoding."""
    SCFG = LlamaConfig(
        vocab_size=300, hidden_size=768, intermediate_size=1536, n_layer=2,
        n_head=6, n_kv_head=1, n_positions=512, rope_theta=10000.0,
        tie_embeddings=True,
    )
    params = llama_mod.init_llama_params(
        jax.random.PRNGKey(5), SCFG, jnp.float32
    )
    qp = llama_mod.quantize_llama_weights(params, "int4")  # G=128, n_gh=3
    assert "s4g" in pack_llama_mega(qp, SCFG)
    eng = InferenceEngine(
        llama_spec(SCFG), qp,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu",
                      weight_quant="int4"),
    )
    prompts = ["the quick brown fox", "a"]
    got = eng.generate_batch(prompts, max_new_tokens=5, kv_mode="int8")
    assert any(
        k[0] == "batch" and k[-1] == "int8" for k in eng._fns
    ), "llama quant batch megakernel path was not selected"
    want = [
        eng.generate(p, "quant_int8", max_new_tokens=5) for p in prompts
    ]
    assert got == want
    # and the PLAIN batched kernel (megakernel_batch llama section)
    got_fp = eng.generate_batch(prompts, max_new_tokens=5)
    want_fp = [
        eng.generate(p, "full_cache", max_new_tokens=5) for p in prompts
    ]
    assert got_fp == want_fp
