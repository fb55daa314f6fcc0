"""Batched verify megakernel (ops/pallas/megakernel_batch_verify.py) vs XLA.

Each slot carries an independent R-row verify block (current token +
proposals); the batched kernel must reproduce, per slot, the R greedy
tokens and the R-row cache writeback of an independent single-stream XLA
verify forward (fp32, interpret mode) — the same oracle the single-stream
gpt2_megaverify is tested against.
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
    to_mega_layout_batch,
)
from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_verify import (
    gpt2_megabatch_verify,
    mega_batch_verify_supported,
)

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
)
C = 48
B = 3
R = 4


@pytest.fixture(scope="module")
def params():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)


def _prefill_one(params, toks, cfg=CFG):
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


def _xla_verify(params, strat, cache, block, pos0, cfg=CFG):
    """One single-stream XLA verify forward over an R-token block."""
    Rb = block.shape[0]
    pos = (pos0 + jnp.arange(Rb, dtype=jnp.int32))[None]
    logits, cache2 = gpt2_mod.gpt2_forward(
        params, cfg, block[None], pos, cache, strat,
    )
    cache2 = strat.set_length(cache2, pos0 + Rb)
    greedy = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # [R]
    return np.asarray(greedy), cache2


@pytest.mark.parametrize("quant", ["f", "int8"])
def test_batch_verify_matches_independent_xla_verify(params, quant):
    p = gpt2_mod.quantize_gpt2_weights(params) if quant == "int8" else params
    packed = pack_gpt2_mega(p, CFG)
    assert packed is not None
    assert mega_batch_verify_supported(CFG, C, p, B, R)

    rng = np.random.RandomState(7)
    lens = [7, 12, 9]
    prompts = [
        jnp.asarray(rng.randint(0, CFG.vocab_size, size=(1, t)), jnp.int32)
        for t in lens
    ]
    streams = [_prefill_one(p, tk) for tk in prompts]
    # verify blocks: current token + R-1 arbitrary "proposals"
    blocks = [
        jnp.concatenate([
            tok[None],
            jnp.asarray(rng.randint(0, CFG.vocab_size, size=R - 1),
                        jnp.int32),
        ])
        for (_, _, tok) in streams
    ]

    expected = [
        _xla_verify(p, strat, cache, blk, t0)
        for (strat, cache, _), blk, t0 in zip(streams, blocks, lens)
    ]

    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for _, c, _ in streams], axis=1)
    )  # [L, B, C, E]
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for _, c, _ in streams], axis=1)
    )
    lengths = jnp.asarray(lens, jnp.int32)
    pos = lengths[:, None] + jnp.arange(R, dtype=jnp.int32)[None]  # [B, R]
    vin = jnp.stack(blocks)  # [B, R]
    x_emb = (p["wte"][vin] + p["wpe"][pos]).reshape(B * R, CFG.n_embd)
    toks, k2, v2 = gpt2_megabatch_verify(
        packed, kb, vb, lengths, x_emb, cfg=CFG, capacity=C, rows=R,
        interpret=True,
    )

    k2c = from_mega_layout_batch(k2, CFG.n_head)  # [L, B, H, C, D]
    v2c = from_mega_layout_batch(v2, CFG.n_head)
    for b, ((greedy_exp, cache_exp), t0) in enumerate(zip(expected, lens)):
        np.testing.assert_array_equal(
            np.asarray(toks[b]), greedy_exp, err_msg=f"slot {b} tokens"
        )
        np.testing.assert_allclose(
            np.asarray(k2c[:, b, :, t0:t0 + R]),
            np.asarray(cache_exp["k"][:, 0, :, t0:t0 + R]), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(v2c[:, b, :, t0:t0 + R]),
            np.asarray(cache_exp["v"][:, 0, :, t0:t0 + R]), atol=1e-5,
        )
        # prior rows untouched by the slot's read-modify-write window
        np.testing.assert_array_equal(
            np.asarray(k2c[:, b, :, :t0]),
            np.asarray(cache_exp["k"][:, 0, :, :t0]),
        )


def test_batch_verify_gating(params):
    assert not mega_batch_verify_supported(CFG, 47, params, B, R)  # cap % 8
    assert not mega_batch_verify_supported(CFG, C, params, B, 9)  # rows > 8
    assert not mega_batch_verify_supported(CFG, C, params, B, 0)
    assert mega_batch_verify_supported(CFG, C, params, 8, 8)
    # absurd batch x capacity cannot fit the VMEM rings
    assert not mega_batch_verify_supported(CFG, 4096, params, 512, 8)


# ---------------------------------------------------------------------------
# MegaBatchServer spec mode: per-request outputs identical to plain greedy
# ---------------------------------------------------------------------------


def _mk_engine(params):
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    return InferenceEngine(
        gpt2_spec(CFG), params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )


def _mk_spec_server(params, eos=None, spec_k=4, slots=2):
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    return MegaBatchServer(
        gpt2_spec(CFG), params,
        pool=MegaPoolConfig(n_slots=slots, capacity=C, max_chunk=3,
                            prompt_bucket=32),
        dtype=jnp.float32,
        eos_id=eos,
        interpret=True,
        spec="ngram",
        spec_k=spec_k,
    )


def test_spec_server_matches_per_prompt(params):
    """spec="ngram" server == per-prompt greedy, incl. admission waves.

    Repetitive prompts exercise real n-gram hits (acceptance > 0) while
    the 'x' prompt exercises the no-match fallback; outputs must be
    identical either way (greedy acceptance is unconditional)."""
    from efficient_llm_inference_tpu.engine.batching import Request

    eng = _mk_engine(params)
    tok = eng.tokenizer
    prompts = [
        "the cat sat on the cat sat",
        "a b a b a b a b",
        "pack my box with five",
        "x",
        "to be or not to be or not",
    ]
    budgets = [9, 12, 6, 8, 10]
    for eos in (None, -1):
        srv = _mk_spec_server(params, eos=eos)
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


def test_spec_server_eos_truncation(params):
    """A mid-stream EOS truncates exactly as per-prompt generation does,
    even when it lands inside an accepted run of a speculative round."""
    from efficient_llm_inference_tpu.engine.batching import Request

    eng = _mk_engine(params)
    tok = eng.tokenizer
    prompts = ["the cat sat on the cat sat", "a b a b a b"]
    budgets = [10, 9]
    wants = [
        eng.generate_ids(p, "full_cache", max_new_tokens=n)[
            len(tok.encode(p)):]
        for p, n in zip(prompts, budgets)
    ]
    eos = wants[0][len(wants[0]) // 2]

    def truncate(seq):
        out = []
        for t in seq:
            out.append(t)
            if t == eos:
                break
        return out

    srv = _mk_spec_server(params, eos=eos)
    reqs = [
        Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
        for i, (p, n) in enumerate(zip(prompts, budgets))
    ]
    srv.run(reqs)
    for req, want in zip(reqs, wants):
        assert req.done
        assert req.out_ids == truncate(want), f"request {req.rid}"


# ---------------------------------------------------------------------------
# Verify over QUANTIZED panes (round 5): spec serving x compressed pools
# ---------------------------------------------------------------------------

# int4 panes need (E/2) % 128 == 0: use the batch-quant tests' wider config
QCFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=256, n_layer=2, n_head=2
)


@pytest.fixture(scope="module")
def qparams():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), QCFG, jnp.float32)


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_batch_verify_quant_matches_sequential_quant_steps(qparams, kv_mode):
    """One quant-pane verify pass == R sequential gpt2_megabatch_quant
    steps fed the same row tokens: per-row greedy tokens AND the final
    quantized panes + scale tables must agree exactly (fp32 interpret).
    This is the invariant that makes spec acceptance output-identical to
    the plain quant server for any proposal source."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_quant import (
        gpt2_megabatch_quant,
        quantize_panes_batch,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_verify import (
        gpt2_megabatch_verify_quant,
        mega_batch_verify_quant_supported,
    )

    p = gpt2_mod.quantize_gpt2_weights(qparams)
    packed = pack_gpt2_mega(p, QCFG)
    assert packed is not None
    assert mega_batch_verify_quant_supported(QCFG, C, p, B, R, kv_mode)

    rng = np.random.RandomState(7)
    lens = [6, 13, 10]
    prompts = [
        jnp.asarray(rng.randint(0, QCFG.vocab_size, size=(1, t)), jnp.int32)
        for t in lens
    ]
    streams = [_prefill_one(p, tk, cfg=QCFG) for tk in prompts]
    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for _, c, _ in streams], axis=1)
    )
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for _, c, _ in streams], axis=1)
    )
    k8, v8, ks, vs = quantize_panes_batch(kb, vb, kv_mode)
    len0 = jnp.asarray(lens, jnp.int32)
    toks0 = jnp.stack([tok for _, _, tok in streams])
    props = jnp.asarray(
        rng.randint(0, QCFG.vocab_size, size=(B, R - 1)), jnp.int32
    )
    vin = jnp.concatenate([toks0[:, None], props], axis=1)  # [B, R]
    wte, wpe = p["wte"], p["wpe"]

    # oracle: R sequential batched quant steps with forced inputs
    k8s, v8s, kss, vss = k8, v8, ks, vs
    seq_toks = []
    for r in range(R):
        x = (wte[vin[:, r]] + wpe[len0 + r]).astype(wte.dtype)
        tok, k8s, v8s, kss, vss = gpt2_megabatch_quant(
            packed, k8s, v8s, kss, vss, len0 + r, x,
            cfg=QCFG, capacity=C, kv_mode=kv_mode, interpret=True,
        )
        seq_toks.append(tok)
    seq_toks = jnp.stack(seq_toks, axis=1)  # [B, R]

    # one fused quant-pane verify pass
    pos = len0[:, None] + jnp.arange(R, dtype=jnp.int32)[None]
    x_blk = (wte[vin] + wpe[pos]).astype(wte.dtype)  # [B, R, E]
    toks, k2, v2, ks2, vs2 = gpt2_megabatch_verify_quant(
        packed, k8, v8, ks, vs, len0,
        x_blk.reshape(B * R, QCFG.n_embd),
        cfg=QCFG, capacity=C, rows=R, kv_mode=kv_mode, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(seq_toks))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k8s))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v8s))
    # scales carry the raw [B*R, E]-vs-[B, E] fp32 dot reassociation
    # (~1e-7 rel, the documented class of the bf16 verify kernel); the
    # integer codes above absorb it through rounding and stay EXACT
    np.testing.assert_allclose(
        np.asarray(ks2), np.asarray(kss), rtol=3e-6
    )
    np.testing.assert_allclose(
        np.asarray(vs2), np.asarray(vss), rtol=3e-6
    )


def test_batch_verify_quant_gating(params):
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_verify import (
        mega_batch_verify_quant_supported,
    )

    p = gpt2_mod.quantize_gpt2_weights(params)
    assert not mega_batch_verify_quant_supported(CFG, 47, p, B, R, "int8")
    assert not mega_batch_verify_quant_supported(CFG, C, p, B, 9, "int8")
    assert mega_batch_verify_quant_supported(CFG, C, p, 8, 8, "int8")


def test_spec_server_quant_pool_matches_plain_quant_server(params):
    """spec="ngram" x kv_mode="int8": per-request outputs must be
    IDENTICAL to the plain quant-pool server (same pool precision), for
    both n-gram-hit and fallback prompts — the round-5 composition of the
    two largest serving wins."""
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    eng = _mk_engine(params)
    tok = eng.tokenizer
    prompts = [
        "the cat sat on the cat sat",
        "a b a b a b a b",
        "pack my box with five",
        "x",
        "to be or not to be or not",
    ]
    budgets = [9, 12, 6, 8, 10]

    def mk(spec):
        return MegaBatchServer(
            gpt2_spec(CFG), params,
            pool=MegaPoolConfig(n_slots=2, capacity=C, max_chunk=3,
                                prompt_bucket=32),
            dtype=jnp.float32,
            kv_mode="int8",
            interpret=True,
            spec=spec,
            spec_k=4,
        )

    def serve(srv):
        reqs = [
            Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
            for i, (p, n) in enumerate(zip(prompts, budgets))
        ]
        srv.run(reqs)
        return reqs

    plain = serve(mk(None))
    spec = serve(mk("ngram"))
    for a, b in zip(plain, spec):
        assert a.done and b.done and len(b.out_ids) == a.max_new_tokens
        assert a.out_ids == b.out_ids, f"request {a.rid}"
    # speculation actually advanced multiple tokens per round somewhere
    # (repetitive prompts guarantee n-gram hits)


# ---------------------------------------------------------------------------
# Llama/GQA batched verify (round 5): spec serving for the llama family
# ---------------------------------------------------------------------------

LLCFG = None  # built lazily (module import order)


def _llcfg():
    from efficient_llm_inference_tpu.models.llama import LlamaConfig

    return LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, n_positions=512, rope_theta=10000.0,
        tie_embeddings=True,
    )


@pytest.mark.parametrize("quant", ["f", "int8"])
def test_llama_batch_verify_matches_sequential_steps(quant):
    """One GQA verify pass == R sequential llama_megabatch steps fed the
    same row tokens: per-row greedy tokens exact, cache rows to fp32
    reassociation tolerance, prior rows untouched."""
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import rope_cos_sin
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch import (
        llama_megabatch,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_verify import (
        llama_megabatch_verify,
        llama_mega_batch_verify_supported,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        pack_llama_mega,
    )

    cfg = _llcfg()
    p = llama_mod.init_llama_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    if quant == "int8":
        p = llama_mod.quantize_llama_weights(p, mode="int8")
    packed = pack_llama_mega(p, cfg)
    assert packed is not None
    assert llama_mega_batch_verify_supported(cfg, C, p, B, R)

    rng = np.random.RandomState(9)
    lens = [6, 13, 10]
    streams = []
    for T0 in lens:
        strat = DenseKV(
            n_layer=cfg.n_layer, n_head=cfg.n_kv_head, head_dim=cfg.head_dim,
            capacity=C, batch=1, dtype=jnp.float32,
        )
        toks = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, T0)), jnp.int32)
        pos = jnp.arange(T0, dtype=jnp.int32)[None]
        cache = strat.init()
        logits, cache = llama_mod.llama_forward(p, cfg, toks, pos, cache,
                                                strat)
        cache = strat.set_length(cache, T0)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[0]
        streams.append((cache, tok0))

    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for c, _ in streams], axis=1)
    )  # [L, B, C, KW]
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for c, _ in streams], axis=1)
    )
    len0 = jnp.asarray(lens, jnp.int32)
    toks0 = jnp.stack([t for _, t in streams])
    props = jnp.asarray(
        rng.randint(0, cfg.vocab_size, size=(B, R - 1)), jnp.int32
    )
    vin = jnp.concatenate([toks0[:, None], props], axis=1)  # [B, R]
    Hq, D = cfg.n_head, cfg.head_dim

    # oracle: R sequential batched steps with forced inputs
    kbs, vbs = kb, vb
    seq_toks = []
    for r in range(R):
        x = p["embed"][vin[:, r]]
        cos, sin = rope_cos_sin((len0 + r)[:, None], D, cfg.rope_theta)
        cos_q = jnp.tile(cos[:, 0], (1, Hq))
        sin_q = jnp.tile(sin[:, 0], (1, Hq))
        tok, kbs, vbs = llama_megabatch(
            packed, kbs, vbs, len0 + r, x, cos_q, sin_q,
            cfg=cfg, capacity=C, interpret=True,
        )
        seq_toks.append(tok)
    seq_toks = jnp.stack(seq_toks, axis=1)  # [B, R]

    # one fused verify pass
    pos_blk = len0[:, None] + jnp.arange(R, dtype=jnp.int32)[None]  # [B, R]
    cosb, sinb = rope_cos_sin(pos_blk, D, cfg.rope_theta)  # [B, R, D]
    cos_q = jnp.tile(cosb, (1, 1, Hq)).reshape(B * R, Hq * D)
    sin_q = jnp.tile(sinb, (1, 1, Hq)).reshape(B * R, Hq * D)
    x_blk = p["embed"][vin].reshape(B * R, cfg.hidden_size)
    toks, k2, v2 = llama_megabatch_verify(
        packed, kb, vb, len0, x_blk, cos_q, sin_q,
        cfg=cfg, capacity=C, rows=R, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(seq_toks))
    for b, t0 in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(k2[:, b, t0:t0 + R]),
            np.asarray(kbs[:, b, t0:t0 + R]), atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(v2[:, b, t0:t0 + R]),
            np.asarray(vbs[:, b, t0:t0 + R]), atol=2e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(k2[:, b, :t0]), np.asarray(kb[:, b, :t0])
        )


def test_llama_spec_server_matches_per_prompt():
    """Llama-family spec="ngram" server == per-prompt greedy, incl. the
    no-match fallback prompt — the round-5 extension of spec serving to
    the GQA family."""
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import llama_spec

    cfg = _llcfg()
    p = llama_mod.init_llama_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    eng = InferenceEngine(
        llama_spec(cfg), p,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    tok = eng.tokenizer
    prompts = [
        "the cat sat on the cat sat",
        "a b a b a b a b",
        "x",
    ]
    budgets = [9, 12, 7]
    srv = MegaBatchServer(
        llama_spec(cfg), p,
        pool=MegaPoolConfig(n_slots=2, capacity=C, max_chunk=3,
                            prompt_bucket=32),
        dtype=jnp.float32,
        interpret=True,
        spec="ngram",
        spec_k=4,
    )
    reqs = [
        Request(rid=i, prompt_ids=tok.encode(pr), max_new_tokens=n)
        for i, (pr, n) in enumerate(zip(prompts, budgets))
    ]
    srv.run(reqs)
    for req, pr, n in zip(reqs, prompts, budgets):
        assert req.done and len(req.out_ids) == n
        want = eng.generate_ids(pr, "full_cache", max_new_tokens=n)
        assert req.prompt_ids + req.out_ids == want, f"request {req.rid}"
    assert srv.spec_stats["tokens"] >= srv.spec_stats["rounds"]


def test_spec_verify_width_ladder(params):
    """The adaptive verify width shrinks toward the R=2 floor on
    non-echoing streams and stays at spec_k on echoing ones — outputs
    exact either way (the ladder only changes ROUND shape, acceptance
    semantics are width-independent)."""
    from efficient_llm_inference_tpu.engine.batching import Request

    eng = _mk_engine(params)
    tok = eng.tokenizer

    def run(prompts, budgets, srv):
        reqs = [
            Request(rid=i, prompt_ids=tok.encode(p), max_new_tokens=n)
            for i, (p, n) in enumerate(zip(prompts, budgets))
        ]
        srv.run(reqs)
        for req, p, n in zip(reqs, prompts, budgets):
            want = eng.generate_ids(p, "full_cache", max_new_tokens=n)
            assert req.prompt_ids + req.out_ids == want
        return srv

    # policy unit behavior: low acceptance walks 8 -> 4 -> 2 and floors;
    # saturation climbs a rung at a time; mid-band holds
    srv = _mk_spec_server(params, spec_k=8)
    srv._acc_est = 1.0
    assert srv._ladder_next(8) == 4
    assert srv._ladder_next(4) == 2
    assert srv._ladder_next(2) == 2  # near-parity floor
    srv._acc_est = 1.9
    assert srv._ladder_next(2) == 4  # saturated rung climbs
    srv._acc_est = 3.2
    assert srv._ladder_next(4) == 8
    srv._acc_est = 2.0
    assert srv._ladder_next(4) == 4  # mid-band holds
    # integration: runs with narrowed widths stay output-exact (the
    # ladder only changes round shape, not acceptance semantics)
    srv._spec_R = 2
    srv._acc_est = 1.0
    run(["qz kw", "vb nm", "pl df"], [12, 9, 14], srv)
    # and a run that starts narrow on an echoing stream climbs
    # (prompt + 1 + budget must fit the spec pane budget C - 8)
    srv2 = _mk_spec_server(params, spec_k=8)
    srv2._spec_R = 2
    srv2._acc_est = 2.0
    run(["a b a b a b a b a b a b", "c d c d c d c d c d c d"],
        [14, 14], srv2)
    assert srv2._spec_R >= 4, srv2._spec_R


@pytest.mark.parametrize("kv_mode", ["int8", "int4", "mixed"])
def test_llama_batch_verify_quant_matches_sequential(kv_mode):
    """One quant-pane GQA verify pass == R sequential llama_megabatch_quant
    steps fed the same row tokens: tokens and quantized panes exact,
    scale tables to fp32 reassociation tolerance."""
    from efficient_llm_inference_tpu.cache.kvcache import QuantizedKV
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import rope_cos_sin
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_quant import (
        llama_megabatch_quant,
        quantize_panes_batch,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_batch_verify import (
        llama_megabatch_verify_quant,
        llama_mega_batch_verify_quant_supported,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        pack_llama_mega,
    )

    # int4 panes need KW/2 % 128 == 0 -> KW=256 geometry for int4/mixed
    from efficient_llm_inference_tpu.models.llama import LlamaConfig

    if kv_mode == "int8":
        cfg = _llcfg()
    else:
        cfg = LlamaConfig(
            vocab_size=300, hidden_size=512, intermediate_size=1024,
            n_layer=2, n_head=8, n_kv_head=4, n_positions=512,
            rope_theta=10000.0, tie_embeddings=True,
        )
    p = llama_mod.init_llama_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    p = llama_mod.quantize_llama_weights(p, mode="int8")
    packed = pack_llama_mega(p, cfg)
    assert packed is not None
    assert llama_mega_batch_verify_quant_supported(cfg, C, p, B, R, kv_mode)

    rng = np.random.RandomState(11)
    lens = [6, 13, 10]
    streams = []
    for T0 in lens:
        strat = DenseKV(
            n_layer=cfg.n_layer, n_head=cfg.n_kv_head, head_dim=cfg.head_dim,
            capacity=C, batch=1, dtype=jnp.float32,
        )
        toks = jnp.asarray(rng.randint(0, cfg.vocab_size, (1, T0)), jnp.int32)
        pos = jnp.arange(T0, dtype=jnp.int32)[None]
        cache = strat.init()
        logits, cache = llama_mod.llama_forward(p, cfg, toks, pos, cache,
                                                strat)
        cache = strat.set_length(cache, T0)
        tok0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[0]
        streams.append((cache, tok0))

    kb = to_mega_layout_batch(
        jnp.concatenate([c["k"] for c, _ in streams], axis=1)
    )
    vb = to_mega_layout_batch(
        jnp.concatenate([c["v"] for c, _ in streams], axis=1)
    )
    k8, v8, kss, vss = quantize_panes_batch(kb, vb, kv_mode)
    len0 = jnp.asarray(lens, jnp.int32)
    toks0 = jnp.stack([t for _, t in streams])
    props = jnp.asarray(
        rng.randint(0, cfg.vocab_size, size=(B, R - 1)), jnp.int32
    )
    vin = jnp.concatenate([toks0[:, None], props], axis=1)
    Hq, D = cfg.n_head, cfg.head_dim

    k8s, v8s, ks_s, vs_s = k8, v8, kss, vss
    seq_toks = []
    for r in range(R):
        x = p["embed"][vin[:, r]]
        cos, sin = rope_cos_sin((len0 + r)[:, None], D, cfg.rope_theta)
        cos_q = jnp.tile(cos[:, 0], (1, Hq))
        sin_q = jnp.tile(sin[:, 0], (1, Hq))
        tok, k8s, v8s, ks_s, vs_s = llama_megabatch_quant(
            packed, k8s, v8s, ks_s, vs_s, len0 + r, x, cos_q, sin_q,
            cfg=cfg, capacity=C, kv_mode=kv_mode, interpret=True,
        )
        seq_toks.append(tok)
    seq_toks = jnp.stack(seq_toks, axis=1)

    pos_blk = len0[:, None] + jnp.arange(R, dtype=jnp.int32)[None]
    cosb, sinb = rope_cos_sin(pos_blk, D, cfg.rope_theta)
    cos_q = jnp.tile(cosb, (1, 1, Hq)).reshape(B * R, Hq * D)
    sin_q = jnp.tile(sinb, (1, 1, Hq)).reshape(B * R, Hq * D)
    x_blk = p["embed"][vin].reshape(B * R, cfg.hidden_size)
    toks, k2, v2, ks2, vs2 = llama_megabatch_verify_quant(
        packed, k8, v8, kss, vss, len0, x_blk, cos_q, sin_q,
        cfg=cfg, capacity=C, rows=R, kv_mode=kv_mode, interpret=True,
    )

    np.testing.assert_array_equal(np.asarray(toks), np.asarray(seq_toks))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k8s))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v8s))
    np.testing.assert_allclose(np.asarray(ks2), np.asarray(ks_s), rtol=3e-6)
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_s), rtol=3e-6)


def test_llama_spec_server_quant_pool_matches_plain():
    """Llama spec="ngram" x kv_mode="int8": outputs identical to the
    plain llama quant-pool server — the full GQA composition."""
    from efficient_llm_inference_tpu.engine.batching import Request
    from efficient_llm_inference_tpu.engine.megaserver import (
        MegaBatchServer,
        MegaPoolConfig,
    )
    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import llama_spec

    cfg = _llcfg()
    p = llama_mod.init_llama_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    tok = InferenceEngine(
        llama_spec(cfg), p,
        config=Config(dtype=jnp.float32, device="cpu"),
    ).tokenizer
    prompts = ["the cat sat on the cat sat", "a b a b a b", "x"]
    budgets = [9, 11, 7]

    def serve(spec):
        srv = MegaBatchServer(
            llama_spec(cfg), p,
            pool=MegaPoolConfig(n_slots=2, capacity=C, max_chunk=3,
                                prompt_bucket=32),
            dtype=jnp.float32, kv_mode="int8", interpret=True,
            spec=spec, spec_k=4,
        )
        reqs = [
            Request(rid=i, prompt_ids=tok.encode(pr), max_new_tokens=n)
            for i, (pr, n) in enumerate(zip(prompts, budgets))
        ]
        srv.run(reqs)
        return reqs

    plain = serve(None)
    spec = serve("ngram")
    for a, b in zip(plain, spec):
        assert a.done and b.done and len(b.out_ids) == a.max_new_tokens
        assert a.out_ids == b.out_ids, f"request {a.rid}"
