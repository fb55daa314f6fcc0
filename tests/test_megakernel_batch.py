"""Batched whole-step megakernel (ops/pallas/megakernel_batch.py) vs XLA.

Each slot is an independent stream with its own cache, length, and position;
one batched kernel step must reproduce, per slot, the token and cache
writeback of an independent single-stream XLA step (fp32, interpret mode).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.ops.pallas.megakernel import pack_gpt2_mega
from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (
    from_mega_layout_batch,
    gpt2_megabatch,
    mega_batch_supported,
    to_mega_layout_batch,
)

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
)
C = 48
B = 3


@pytest.fixture(scope="module")
def params():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def _prefill_one(params, toks, cfg=CFG):
    """Single-stream prefill -> (cache [L,1,H,C,D] pair, next greedy token)."""
    strat = DenseKV(
        n_layer=cfg.n_layer, n_head=cfg.n_head, head_dim=cfg.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    T0 = toks.shape[1]
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = gpt2_mod.gpt2_forward(params, cfg, toks, pos, cache, strat)
    cache = strat.set_length(cache, T0)
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[0]
    return strat, cache, tok0


def _xla_step(params, strat, cache, tok, pos, cfg=CFG):
    """One single-stream XLA decode step -> (next token, new cache)."""
    logits, cache2 = gpt2_mod.gpt2_forward(
        params, cfg, tok[None, None], jnp.full((1, 1), pos, jnp.int32),
        cache, strat,
    )
    cache2 = strat.set_length(cache2, pos + 1)
    return int(jnp.argmax(logits[0, 0])), cache2


@pytest.mark.parametrize("quant", ["f", "int8", "int4"])
def test_megabatch_rows_match_independent_xla_steps(params, quant):
    cfg = CFG
    if quant == "int8":
        p = gpt2_mod.quantize_gpt2_weights(params)
    elif quant == "int4":
        # int4 halves pairing needs E >= 2 * group (group = 128)
        cfg = gpt2_mod.GPT2Config(
            vocab_size=300, n_positions=256, n_embd=256, n_layer=2, n_head=2
        )
        p4 = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(2), cfg,
                                       jnp.float32)
        p = gpt2_mod.quantize_gpt2_weights(p4, mode="int4")
    else:
        p = params
    packed = pack_gpt2_mega(p, cfg)
    assert packed is not None
    assert mega_batch_supported(cfg, C, p, B)

    rng = np.random.RandomState(7)
    lens = [7, 12, 9]
    prompts = [
        jnp.asarray(rng.randint(0, cfg.vocab_size, size=(1, t)), jnp.int32)
        for t in lens
    ]
    streams = [_prefill_one(p, tk, cfg) for tk in prompts]

    # expected: one independent XLA step per stream
    expected = [
        _xla_step(p, strat, cache, tok, t0, cfg)
        for (strat, cache, tok), t0 in zip(streams, lens)
    ]

    # batched kernel step over the stacked panes
    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for _, c, _ in streams], axis=1)
    )  # [L, B, C, E]
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for _, c, _ in streams], axis=1)
    )
    lengths = jnp.asarray(lens, jnp.int32)
    toks0 = jnp.stack([tok for _, _, tok in streams])
    x_emb = p["wte"][toks0] + p["wpe"][lengths]  # [B, E]
    toks, k2, v2 = gpt2_megabatch(
        packed, kb, vb, lengths, x_emb, cfg=cfg, capacity=C, interpret=True,
    )

    k2c = from_mega_layout_batch(k2, cfg.n_head)  # [L, B, H, C, D]
    v2c = from_mega_layout_batch(v2, cfg.n_head)
    for b, ((tok_exp, cache_exp), t0) in enumerate(zip(expected, lens)):
        assert int(toks[b]) == tok_exp, f"slot {b} token mismatch"
        np.testing.assert_allclose(
            np.asarray(k2c[:, b, :, t0]),
            np.asarray(cache_exp["k"][:, 0, :, t0]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(v2c[:, b, :, t0]),
            np.asarray(cache_exp["v"][:, 0, :, t0]), atol=1e-5,
        )
        # prior rows untouched by the slot's read-modify-write window
        np.testing.assert_array_equal(
            np.asarray(k2c[:, b, :, :t0]),
            np.asarray(cache_exp["k"][:, 0, :, :t0]),
        )


def test_megabatch_multi_step_decode_matches_xla(params):
    """Three batched steps == three independent XLA decode steps per row."""
    packed = pack_gpt2_mega(params, CFG)
    rng = np.random.RandomState(3)
    lens = [5, 11, 8]
    prompts = [
        jnp.asarray(rng.randint(0, CFG.vocab_size, size=(1, t)), jnp.int32)
        for t in lens
    ]
    streams = [_prefill_one(params, tk) for tk in prompts]

    # expected: 3 independent greedy XLA steps per stream
    exp_tokens = [[] for _ in range(B)]
    for b, ((strat, cache, tok), t0) in enumerate(zip(streams, lens)):
        pos = t0
        for _ in range(3):
            exp_tokens[b].append(int(tok))
            nxt, cache = _xla_step(params, strat, cache, tok, pos)
            tok = jnp.int32(nxt)
            pos += 1

    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for _, c, _ in streams], axis=1)
    )
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for _, c, _ in streams], axis=1)
    )
    lengths = jnp.asarray(lens, jnp.int32)
    toks = jnp.stack([tok for _, _, tok in streams])
    got = [[] for _ in range(B)]
    for _ in range(3):
        x_emb = params["wte"][toks] + params["wpe"][lengths]
        for b in range(B):
            got[b].append(int(toks[b]))
        toks, kb, vb = gpt2_megabatch(
            packed, kb, vb, lengths, x_emb, cfg=CFG, capacity=C,
            interpret=True,
        )
        lengths = lengths + 1
    assert got == exp_tokens


def test_megabatch_gating(params):
    assert not mega_batch_supported(CFG, 47, params, B)  # capacity % 8
    assert mega_batch_supported(CFG, 48, params, 8)
    # absurd batch x capacity cannot fit the VMEM rings
    assert not mega_batch_supported(CFG, 4096, params, 512)


def test_engine_generate_batch_matches_per_prompt(params):
    """generate_batch == per-prompt generate, per row (fp32 greedy)."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    spec = gpt2_spec(CFG)
    prompts = [
        "the quick brown fox",
        "pack my box with five dozen liquor jugs",
        "a",
    ]
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    got = eng.generate_batch(prompts, max_new_tokens=7)
    want = [eng.generate(p, "full_cache", max_new_tokens=7) for p in prompts]
    assert got == want

    # ineligible config (megakernel off) falls back to per-prompt generation
    eng2 = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    assert eng2.generate_batch(prompts, max_new_tokens=7) == want


# ---------------------------------------------------------------------------
# Llama batched kernel
# ---------------------------------------------------------------------------

from efficient_llm_inference_tpu.models import llama as llama_mod  # noqa: E402
from efficient_llm_inference_tpu.models.llama import (  # noqa: E402
    LlamaConfig,
    rope_cos_sin,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (  # noqa: E402
    pack_llama_mega,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (  # noqa: E402
    llama_mega_batch_supported,
    llama_megabatch,
)

LCFG = LlamaConfig(
    vocab_size=300,
    hidden_size=256,
    intermediate_size=512,
    n_layer=2,
    n_head=4,
    n_kv_head=2,
    n_positions=512,
    rope_theta=10000.0,
    tie_embeddings=True,
)


def _llama_prefill_one(params, toks):
    strat = DenseKV(
        n_layer=LCFG.n_layer, n_head=LCFG.n_kv_head, head_dim=LCFG.head_dim,
        capacity=C, batch=1, dtype=jnp.float32,
    )
    T0 = toks.shape[1]
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = llama_mod.llama_forward(
        params, LCFG, toks, pos, cache, strat
    )
    cache = strat.set_length(cache, T0)
    tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[0]
    return strat, cache, tok0


def _llama_xla_step(params, strat, cache, tok, pos):
    logits, cache2 = llama_mod.llama_forward(
        params, LCFG, tok[None, None], jnp.full((1, 1), pos, jnp.int32),
        cache, strat,
    )
    cache2 = strat.set_length(cache2, pos + 1)
    return int(jnp.argmax(logits[0, 0])), cache2


@pytest.mark.parametrize("quant", ["f", "int8"])
def test_llama_megabatch_rows_match_independent_xla_steps(quant):
    p = llama_mod.init_llama_params(jax.random.PRNGKey(0), LCFG, jnp.float32)
    if quant == "int8":
        p = llama_mod.quantize_llama_weights(p, mode="int8")
    packed = pack_llama_mega(p, LCFG)
    assert packed is not None
    assert llama_mega_batch_supported(LCFG, C, p, B)

    rng = np.random.RandomState(5)
    lens = [6, 13, 10]
    prompts = [
        jnp.asarray(rng.randint(0, LCFG.vocab_size, size=(1, t)), jnp.int32)
        for t in lens
    ]
    streams = [_llama_prefill_one(p, tk) for tk in prompts]
    expected = [
        _llama_xla_step(p, strat, cache, tok, t0)
        for (strat, cache, tok), t0 in zip(streams, lens)
    ]

    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for _, c, _ in streams], axis=1)
    )  # [L, B, C, KW]
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for _, c, _ in streams], axis=1)
    )
    lengths = jnp.asarray(lens, jnp.int32)
    toks0 = jnp.stack([tok for _, _, tok in streams])
    x_emb = p["embed"][toks0]  # [B, E]
    cos, sin = rope_cos_sin(
        lengths[:, None], LCFG.head_dim, LCFG.rope_theta
    )  # [B, 1, D]
    cos_q = jnp.tile(cos[:, 0], (1, LCFG.n_head))  # [B, Hq*D]
    sin_q = jnp.tile(sin[:, 0], (1, LCFG.n_head))
    toks, k2, v2 = llama_megabatch(
        packed, kb, vb, lengths, x_emb, cos_q, sin_q,
        cfg=LCFG, capacity=C, interpret=True,
    )

    k2c = from_mega_layout_batch(k2, LCFG.n_kv_head)
    v2c = from_mega_layout_batch(v2, LCFG.n_kv_head)
    for b, ((tok_exp, cache_exp), t0) in enumerate(zip(expected, lens)):
        assert int(toks[b]) == tok_exp, f"slot {b} token mismatch"
        np.testing.assert_allclose(
            np.asarray(k2c[:, b, :, t0]),
            np.asarray(cache_exp["k"][:, 0, :, t0]), atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(v2c[:, b, :, t0]),
            np.asarray(cache_exp["v"][:, 0, :, t0]), atol=2e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(k2c[:, b, :, :t0]),
            np.asarray(cache_exp["k"][:, 0, :, :t0]),
        )


def test_engine_generate_batch_llama_matches_per_prompt():
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models.llama import llama_spec

    p = llama_mod.init_llama_params(jax.random.PRNGKey(1), LCFG, jnp.float32)
    eng = InferenceEngine(
        llama_spec(LCFG), p,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    prompts = ["the quick brown fox", "hello"]
    got = eng.generate_batch(prompts, max_new_tokens=6)
    want = [eng.generate(p_, "full_cache", max_new_tokens=6) for p_ in prompts]
    assert got == want


def test_megabatch_server_matches_per_prompt(params):
    """MegaBatchServer == per-prompt generate, incl. admission waves."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

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
        "x",
    ]
    budgets = [6, 9, 5, 7, 8]
    # 2 slots, 5 requests -> at least three admission waves; eos_id=None
    # exercises the deterministic burst scheduler, eos_id=-1 (never
    # generated) the per-chunk harvest path
    for eos in (None, -1):
        srv = MegaBatchServer(
            spec, params,
            pool=MegaPoolConfig(n_slots=2, capacity=C, max_chunk=4,
                                prompt_bucket=32),
            dtype=jnp.float32,
            eos_id=eos,
            interpret=True,
        )
        reqs = [
            Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
            for i, (p, n) in enumerate(zip(prompts, budgets))
        ]
        srv.run(reqs)
        for req, p, n in zip(reqs, prompts, budgets):
            assert req.done and len(req.out_ids) == n
            want = eng.generate_ids(p, "full_cache", max_new_tokens=n)
            assert req.prompt_ids + req.out_ids == want, \
                f"request {req.rid} (eos={eos})"


def test_megabatch_server_eos_bursts(params):
    """EOS-aware speculative bursts: with eos_id set the server still
    dispatches budget-scheduled bursts (one fetch per retirement window),
    and a mid-stream EOS truncates exactly as per-prompt generation does."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    spec = gpt2_spec(CFG)
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    tok = eng.tokenizer
    prompts = ["the quick brown fox jumps", "a b c", "hello world"]
    budgets = [9, 7, 8]
    wants = [
        eng.generate_ids(p, "full_cache", max_new_tokens=n)[len(tok.encode(p)):]
        for p, n in zip(prompts, budgets)
    ]
    # pick an EOS that fires mid-stream for request 0 but is still exercised
    # as a no-op for the others
    eos = wants[0][len(wants[0]) // 2]

    def truncate(seq):
        out = []
        for t in seq:
            out.append(t)
            if t == eos:
                break
        return out

    def make_srv(eos_id):
        srv = MegaBatchServer(
            spec, params,
            pool=MegaPoolConfig(n_slots=2, capacity=C, max_chunk=4,
                                prompt_bucket=32),
            dtype=jnp.float32,
            eos_id=eos_id,
            interpret=True,
        )
        real = srv._make_chunk(4)
        calls = []

        def counting(*a, **kw):
            calls.append(1)
            return real(*a, **kw)

        srv._chunks[4] = counting
        return srv, calls

    srv, calls_eos = make_srv(eos)
    reqs = [
        Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
        for i, (p, n) in enumerate(zip(prompts, budgets))
    ]
    srv.run(reqs)
    for req, want in zip(reqs, wants):
        assert req.done
        assert req.out_ids == truncate(want), f"request {req.rid}"

    # burst path active with eos_id: a never-generated eos dispatches the
    # same chunk count as the deterministic (eos=None) scheduler
    srv_n, calls_none = make_srv(None)
    reqs_n = [
        Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
        for i, (p, n) in enumerate(zip(prompts, budgets))
    ]
    srv_n.run(reqs_n)
    srv_e, calls_noeos = make_srv(-1)
    reqs_e = [
        Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
        for i, (p, n) in enumerate(zip(prompts, budgets))
    ]
    srv_e.run(reqs_e)
    assert len(calls_noeos) == len(calls_none)
    for a, b in zip(reqs_n, reqs_e):
        assert a.out_ids == b.out_ids


def test_generate_batch_encode_cap_matches_quant_method(params):
    """Prompts longer than prompt_cap (but within n_positions): the batch
    path with kv_mode must encode like the quant_* methods it emulates
    (which do NOT truncate at prompt_cap — reference parity), so both
    paths see the same tokens (round-4 advice fix)."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    spec = gpt2_spec(CFG)
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu",
                      prompt_cap=16),
    )
    long_prompt = "counting words over and over " * 4  # > 16 byte tokens
    assert len(eng.tokenizer.encode(long_prompt)) > 16
    got = eng.generate_batch([long_prompt], max_new_tokens=5,
                             kv_mode="int8")
    want = [eng.generate(long_prompt, "quant_int8", max_new_tokens=5)]
    assert got == want
    # and the batch ids match the UNtruncated encode
    assert eng._encode(long_prompt, "quant_int8") == list(
        eng.tokenizer.encode(long_prompt)
    )[: spec.n_positions]


def test_generate_batch_mesh_sharded_matches_unsharded(params):
    """Mesh-sharded batched serving (rows over the data axis, batched
    megakernel per shard) == the unsharded batched path per row, incl. a
    batch that does not divide the axis (padded by repeating the last)."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models.registry import gpt2_spec
    from efficient_llm_inference_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    spec = gpt2_spec(CFG)
    eng = InferenceEngine(
        spec, params,
        config=Config(dtype=jnp.float32, megakernel=True, device="cpu"),
    )
    mesh = make_mesh((4, 2), ("data", "model"))
    prompts = [
        "the quick brown fox",
        "pack my box with five dozen liquor jugs",
        "a",
        "hello world again",
        "one more prompt",  # B=5 on a 4-way axis -> padded to 8
    ]
    want = eng.generate_batch(prompts, max_new_tokens=6)
    got = eng.generate_batch(prompts, max_new_tokens=6, mesh=mesh)
    assert got == want
