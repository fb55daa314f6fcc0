"""Speculative decoding greedy-equivalence.

The defining property: greedy speculative output is IDENTICAL to plain
target greedy decoding no matter what the draft proposes — a good draft
only accelerates, a bad one only slows. Verified with (a) an unrelated
random draft (low acceptance) and (b) the target itself as draft
(100% acceptance).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.engine.speculative import make_speculative_generate
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec


@pytest.fixture(scope="module")
def setup():
    t_cfg = gpt2_mod.GPT2Config(
        vocab_size=173, n_positions=256, n_embd=32, n_layer=3, n_head=2
    )
    d_cfg = gpt2_mod.GPT2Config(
        vocab_size=173, n_positions=256, n_embd=16, n_layer=1, n_head=2
    )
    t_params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(10), t_cfg, jnp.float32)
    d_params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(11), d_cfg, jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(t_cfg), t_params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    return t_cfg, d_cfg, t_params, d_params, eng


def _run_spec(t_cfg, d_cfg, t_params, d_params, ids, n_new, k):
    gen = make_speculative_generate(
        gpt2_spec(t_cfg), gpt2_spec(d_cfg), n_new, k=k, prompt_bucket=64
    )
    buf = np.zeros((1, 64), np.int32)
    buf[0, : len(ids)] = ids
    out, n = gen(t_params, d_params, jnp.asarray(buf), jnp.int32(len(ids)))
    return np.asarray(out)[: int(n)].tolist()


@pytest.mark.parametrize("k", [2, 4])
def test_unrelated_draft_matches_target_greedy(setup, k):
    t_cfg, d_cfg, t_params, d_params, eng = setup
    prompt = "A gentle breeze moved across the field toward the old barn."
    ids = eng.tokenizer.encode(prompt)
    n_new = 14

    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    got = _run_spec(t_cfg, d_cfg, t_params, d_params, ids, n_new, k)
    assert got == ref, (got, ref)


def test_self_draft_full_acceptance(setup):
    """Target drafting for itself must accept everything and still match."""
    t_cfg, _, t_params, _, eng = setup
    prompt = "Numbers and letters filled the page from margin to margin."
    ids = eng.tokenizer.encode(prompt)
    n_new = 12

    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    got = _run_spec(t_cfg, t_cfg, t_params, t_params, ids, n_new, k=4)
    assert got == ref, (got, ref)


def test_self_draft_helper_matches_target_greedy(setup):
    """make_self_draft's truncated draft preserves the greedy stream."""
    from efficient_llm_inference_tpu.engine.speculative import make_self_draft

    t_cfg, d_cfg, t_params, d_params, eng = setup
    spec = gpt2_spec(t_cfg)
    dspec, dparams = make_self_draft(spec, t_params, 1)
    assert dspec.n_layer == 1

    prompt = "the tides turn at dawn"
    ids = eng.tokenizer.encode(prompt)
    n_new = 12
    plain = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]

    gen = make_speculative_generate(spec, dspec, n_new, k=4, prompt_bucket=32)
    buf = np.zeros((1, 32), np.int32)
    buf[0, : len(ids)] = ids
    out, n = gen(t_params, dparams, jnp.asarray(buf), jnp.int32(len(ids)))
    assert np.asarray(out)[:n_new].tolist() == plain


def test_mega_verify_spec_matches_target_greedy():
    """Megakernel k-row verify (gpt2_megaverify) inside the speculative
    loop == plain greedy, exactly (fp32, interpret mode) — for both
    full-precision and int8 weight tiles, and with an unrelated draft so
    rejected rows + rollback-by-length are exercised."""
    from efficient_llm_inference_tpu.engine.speculative import make_self_draft
    from efficient_llm_inference_tpu.ops.pallas.megakernel import (
        pack_gpt2_mega,
    )

    cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    spec = gpt2_spec(cfg)
    d_cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=16, n_layer=1, n_head=2
    )
    d_params = gpt2_mod.init_gpt2_params(
        jax.random.PRNGKey(7), d_cfg, jnp.float32
    )

    prompt = "the quick brown fox jumps over the lazy dog"
    n_new = 20
    for wq in (None, "int8"):
        tparams = (
            gpt2_mod.quantize_gpt2_weights(params) if wq else params
        )
        eng = InferenceEngine(
            spec, tparams,
            config=Config(model_name="t", device="cpu", dtype=jnp.float32,
                          weight_quant=wq),
        )
        ids = eng.tokenizer.encode(prompt)
        ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
        mega = {"packed": pack_gpt2_mega(tparams, cfg), "cfg": cfg,
                "kind": "gpt2", "interpret": True}
        assert mega["packed"] is not None
        for draft_pair in (
            make_self_draft(spec, tparams, 1),
            (gpt2_spec(d_cfg), d_params),
        ):
            dspec, dparams = draft_pair
            gen = make_speculative_generate(
                spec, dspec, n_new, k=4, prompt_bucket=64, mega=mega
            )
            buf = np.zeros((1, 64), np.int32)
            buf[0, : len(ids)] = ids
            tp = dict(tparams, __mega_packed__=mega["packed"])
            out, n = gen(tp, dparams, jnp.asarray(buf), jnp.int32(len(ids)))
            got = np.asarray(out)[: int(n)].tolist()
            assert got == ref, (wq, got, ref)


def test_llama_mega_verify_spec_matches_target_greedy():
    """Llama k-row verify megakernel inside the speculative loop == plain
    greedy (fp32, interpret) — full-precision, int8, and int4 tiles."""
    from efficient_llm_inference_tpu.engine.speculative import make_self_draft
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import LlamaConfig, llama_spec
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        pack_llama_mega,
    )

    cfg = LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, n_positions=512, rope_theta=10000.0,
        tie_embeddings=True,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(0), cfg,
                                         jnp.float32)
    spec = llama_spec(cfg)
    prompt = "the quick brown fox jumps over the lazy dog"
    n_new = 18
    for wq in (None, "int8", "int4"):
        tparams = (
            llama_mod.quantize_llama_weights(params, wq) if wq else params
        )
        eng = InferenceEngine(
            spec, tparams,
            config=Config(model_name="l", device="cpu", dtype=jnp.float32,
                          weight_quant=wq),
        )
        ids = eng.tokenizer.encode(prompt)
        ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
        mega = {"packed": pack_llama_mega(tparams, cfg), "cfg": cfg,
                "kind": "llama", "interpret": True}
        assert mega["packed"] is not None
        dspec, dparams = make_self_draft(spec, tparams, 1)
        gen = make_speculative_generate(
            spec, dspec, n_new, k=4, prompt_bucket=64, mega=mega
        )
        buf = np.zeros((1, 64), np.int32)
        buf[0, : len(ids)] = ids
        tp = dict(tparams, __mega_packed__=mega["packed"])
        out, n = gen(tp, dparams, jnp.asarray(buf), jnp.int32(len(ids)))
        got = np.asarray(out)[: int(n)].tolist()
        assert got == ref, (wq, got, ref)


def test_ngram_prompt_lookup_matches_target_greedy():
    """Prompt-lookup (draft-free) speculation == plain greedy, exactly —
    XLA verify, gpt2 mega verify, and llama mega verify."""
    from efficient_llm_inference_tpu.engine.speculative import (
        make_ngram_speculative_generate,
    )
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import (
        LlamaConfig,
        llama_spec,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel import (
        pack_gpt2_mega,
    )
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        pack_llama_mega,
    )

    prompt = "the quick brown fox jumps over the lazy dog and the quick cat"
    n_new = 20

    cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    spec = gpt2_spec(cfg)
    eng = InferenceEngine(
        spec, params, config=Config(dtype=jnp.float32, device="cpu")
    )
    ids = eng.tokenizer.encode(prompt)
    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    buf = np.zeros((1, 128), np.int32)
    buf[0, : len(ids)] = ids
    g_mega = {"packed": pack_gpt2_mega(params, cfg), "cfg": cfg,
              "kind": "gpt2", "interpret": True}
    for mega in (None, g_mega):
        gen = make_ngram_speculative_generate(spec, n_new, k=8, mega=mega)
        tp = dict(params, __mega_packed__=mega["packed"]) if mega else params
        out, n = gen(tp, jnp.asarray(buf), jnp.int32(len(ids)))
        got = np.asarray(out)[: int(n)].tolist()
        assert got == ref, (mega is not None, got, ref)

    lcfg = LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, n_positions=512, rope_theta=10000.0,
        tie_embeddings=True,
    )
    lparams = llama_mod.init_llama_params(jax.random.PRNGKey(0), lcfg,
                                          jnp.float32)
    lspec = llama_spec(lcfg)
    leng = InferenceEngine(
        lspec, lparams, config=Config(dtype=jnp.float32, device="cpu")
    )
    lref = leng.generate_ids(prompt, "full_cache", n_new)[-n_new:]
    lmega = {"packed": pack_llama_mega(lparams, lcfg), "cfg": lcfg,
             "kind": "llama", "interpret": True}
    gen = make_ngram_speculative_generate(lspec, n_new, k=8, mega=lmega)
    out, n = gen(dict(lparams, __mega_packed__=lmega["packed"]),
                 jnp.asarray(buf), jnp.int32(len(ids)))
    got = np.asarray(out)[: int(n)].tolist()
    assert got == lref, (got, lref)


@pytest.mark.parametrize("megaflag", [False, True])
def test_engine_generate_speculative_matches_full_cache(megaflag):
    """InferenceEngine.generate_speculative (ngram + self_draft, XLA and
    megakernel verify) == plain full_cache greedy, token-exact (fp32)."""
    cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(cfg), params,
        config=Config(dtype=jnp.float32, device="cpu", megakernel=megaflag),
    )
    prompt = "the quick brown fox jumps over the lazy dog"
    ref = eng.generate_ids(prompt, "full_cache", 14)
    for mode in ("ngram", "self_draft"):
        text, n = eng.generate_speculative(prompt, 14, mode=mode, k=4)
        assert n == 14 and isinstance(text, str)
        assert eng.last_generation_ids == ref, mode


def test_stats_round_counting(setup):
    """stats=True returns a verify-round count with the exact acceptance
    arithmetic: a perfect draft (the target itself) accepts all k proposals
    every round, so n_rounds == ceil((n_new - 1) / k) and the stream is
    unchanged; an unrelated draft needs at least as many rounds."""
    t_cfg, d_cfg, t_params, d_params, eng = setup
    prompt = "Numbers and letters filled the page from margin to margin."
    ids = eng.tokenizer.encode(prompt)
    n_new, k = 13, 4
    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]

    gen = make_speculative_generate(
        gpt2_spec(t_cfg), gpt2_spec(t_cfg), n_new, k=k, prompt_bucket=64,
        stats=True,
    )
    buf = np.zeros((1, 64), np.int32)
    buf[0, : len(ids)] = ids
    out, n, rounds = gen(t_params, t_params, jnp.asarray(buf),
                         jnp.int32(len(ids)))
    n, rounds = int(n), int(rounds)
    assert np.asarray(out)[:n].tolist() == ref
    assert rounds == -(-(n_new - 1) // k), rounds  # perfect acceptance

    gen_bad = make_speculative_generate(
        gpt2_spec(t_cfg), gpt2_spec(d_cfg), n_new, k=k, prompt_bucket=64,
        stats=True,
    )
    out, n, rounds_bad = gen_bad(t_params, d_params, jnp.asarray(buf),
                                 jnp.int32(len(ids)))
    assert np.asarray(out)[: int(n)].tolist() == ref
    assert int(rounds_bad) >= rounds


def test_engine_speculative_stats_and_external_draft(setup):
    """Engine-level stats dict + mode='draft' with an external (spec,
    params) draft: stream still token-exact vs full_cache, and
    tokens_per_round == (n_new - 1) / n_rounds."""
    t_cfg, d_cfg, t_params, d_params, eng = setup
    prompt = "A gentle breeze moved across the field toward the old barn."
    n_new = 12
    ref = eng.generate_ids(prompt, "full_cache", n_new)

    text, n, st = eng.generate_speculative(
        prompt, n_new, mode="draft", k=4,
        draft=(gpt2_spec(d_cfg), d_params), stats=True,
    )
    assert n == n_new and eng.last_generation_ids == ref
    assert st["n_rounds"] >= -(-(n_new - 1) // 4)
    assert st["tokens_per_round"] == pytest.approx(
        (n_new - 1) / st["n_rounds"]
    )

    # ngram mode carries stats too
    text, n, st = eng.generate_speculative(
        prompt, n_new, mode="ngram", k=4, stats=True
    )
    assert n == n_new and eng.last_generation_ids == ref
    assert st["n_rounds"] >= 1


def test_engine_speculative_vmem_fallback(setup, monkeypatch):
    """When the verify megakernel reports it does not fit VMEM at this
    capacity, generate_speculative degrades to the XLA k-row verify
    instead of raising (round 4: f32 verify on larger targets)."""
    t_cfg, _, t_params, _, eng = setup
    prompt = "the tides turn at dawn"
    n_new = 8
    ref = eng.generate_ids(prompt, "full_cache", n_new)

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise ValueError("megakernel does not fit VMEM at this capacity")

    # seed the fn cache with a fake mega gen that always raises
    ids = eng._encode(prompt, "full_cache")
    from efficient_llm_inference_tpu.engine.engine import bucket_for

    bucket = min(bucket_for(len(ids)), eng.model.n_positions)
    key = ("speculative", "ngram", bucket, n_new, 4, 1, False, None)
    eng._fns[key] = ("speculative", boom, {"packed": {}, "kind": "gpt2"})
    text, n = eng.generate_speculative(prompt, n_new, mode="ngram", k=4)
    assert calls["n"] == 1 and n == n_new
    assert eng.last_generation_ids == ref
    # the cache now holds the XLA fallback (mega=None)
    assert eng._fns[key][2] is None


def test_mega_draft_burst_matches_target_greedy():
    """Draft-side megakernel (each draft step = a gpt2_megastep program)
    composed with the mega verify == plain greedy, exactly (fp32,
    interpret) — draft must be mega-eligible (E % 128 == 0)."""
    from efficient_llm_inference_tpu.ops.pallas.megakernel import (
        mega_supported,
        pack_gpt2_mega,
    )

    cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
    )
    d_cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=128, n_layer=1, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg,
                                       jnp.float32)
    d_params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(8), d_cfg,
                                         jnp.float32)
    spec, dspec = gpt2_spec(cfg), gpt2_spec(d_cfg)
    eng = InferenceEngine(
        spec, params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    prompt = "the quick brown fox jumps over the lazy dog"
    n_new = 16
    ids = eng.tokenizer.encode(prompt)
    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]

    mega = {"packed": pack_gpt2_mega(params, cfg), "cfg": cfg,
            "kind": "gpt2", "interpret": True}
    assert mega_supported(d_cfg, 96, d_params)
    dmega = {"packed": pack_gpt2_mega(d_params, d_cfg), "cfg": d_cfg,
             "kind": "gpt2", "interpret": True}
    assert mega["packed"] is not None and dmega["packed"] is not None

    gen = make_speculative_generate(
        spec, dspec, n_new, k=4, prompt_bucket=64, mega=mega,
        draft_mega=dmega, stats=True,
    )
    buf = np.zeros((1, 64), np.int32)
    buf[0, : len(ids)] = ids
    tp = dict(params, __mega_packed__=mega["packed"])
    out, n, rounds = gen(tp, d_params, jnp.asarray(buf),
                         jnp.int32(len(ids)))
    got = np.asarray(out)[: int(n)].tolist()
    assert got == ref, (got, ref)
    assert int(rounds) >= 1


def test_llama_mega_draft_burst_matches_target_greedy():
    """Llama draft-side megastep bursts + llama verify == plain greedy."""
    from efficient_llm_inference_tpu.models import llama as llama_mod
    from efficient_llm_inference_tpu.models.llama import llama_spec
    from efficient_llm_inference_tpu.ops.pallas.megakernel_llama import (
        mega_supported,
        pack_llama_mega,
    )

    cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=2,
        n_head=4, n_kv_head=2, tie_embeddings=True, rope_theta=10000.0,
    )
    d_cfg = llama_mod.LlamaConfig(
        vocab_size=300, hidden_size=256, intermediate_size=512, n_layer=1,
        n_head=4, n_kv_head=2, tie_embeddings=True, rope_theta=10000.0,
    )
    params = llama_mod.init_llama_params(jax.random.PRNGKey(1), cfg,
                                         jnp.float32)
    d_params = llama_mod.init_llama_params(jax.random.PRNGKey(9), d_cfg,
                                           jnp.float32)
    spec, dspec = llama_spec(cfg), llama_spec(d_cfg)
    eng = InferenceEngine(
        spec, params,
        config=Config(model_name="t", device="cpu", dtype=jnp.float32),
    )
    prompt = "counting stars beyond the ridge"
    n_new = 12
    ids = eng.tokenizer.encode(prompt)
    ref = eng.generate_ids(prompt, "full_cache", n_new)[-n_new:]

    mega = {"packed": pack_llama_mega(params, cfg), "cfg": cfg,
            "kind": "llama", "interpret": True}
    assert mega_supported(d_cfg, 96, d_params)
    dmega = {"packed": pack_llama_mega(d_params, d_cfg), "cfg": d_cfg,
             "kind": "llama", "interpret": True}

    gen = make_speculative_generate(
        spec, dspec, n_new, k=4, prompt_bucket=64, mega=mega,
        draft_mega=dmega,
    )
    buf = np.zeros((1, 64), np.int32)
    buf[0, : len(ids)] = ids
    tp = dict(params, __mega_packed__=mega["packed"])
    out, n = gen(tp, d_params, jnp.asarray(buf), jnp.int32(len(ids)))
    got = np.asarray(out)[: int(n)].tolist()
    assert got == ref, (got, ref)


def test_generate_speculative_auto_matches_greedy():
    """mode-auto speculation: probes candidates, commits to the best by
    acceptance/cost, output always equals plain greedy."""
    import jax
    import jax.numpy as jnp

    from efficient_llm_inference_tpu.core.config import Config
    from efficient_llm_inference_tpu.engine.engine import InferenceEngine
    from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
    from efficient_llm_inference_tpu.models.registry import gpt2_spec

    cfg = gpt2_mod.GPT2Config(
        vocab_size=300, n_positions=256, n_embd=64, n_layer=2, n_head=2
    )
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), cfg,
                                       jnp.float32)
    eng = InferenceEngine(
        gpt2_spec(cfg), params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )
    prompt = "the cat sat on the cat sat"
    want = eng.generate(prompt, "full_cache", max_new_tokens=10)
    picks = []
    for _ in range(4):
        text, n, s = eng.generate_speculative_auto(
            prompt, max_new_tokens=10, stats=True
        )
        assert text == want and n == 10
        picks.append((s["mode"], s["k"]))
    # both ngram candidates probed, then a committed (repeatable) choice
    assert ("ngram", 8) in picks and ("ngram", 4) in picks
    assert picks[2] == picks[3]
    assert set(eng._spec_auto["acc"]) == {("ngram", 8), ("ngram", 4)}
