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
