"""MegaBatchServer shared-prefix caching (round 5).

A second admission whose prompts extend a registered grain-aligned prefix
must prefill ONLY the suffix (one suffix dispatch per prefix group) and
still produce per-request outputs identical to per-prompt greedy — exact
for dense pools (the cached prefix KV is the same fp values a full
prefill computes), pool-precision prefix reads for quant pools (the
paged engine's documented divergence class).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.core.config import Config
from efficient_llm_inference_tpu.engine.batching import Request
from efficient_llm_inference_tpu.engine.engine import InferenceEngine
from efficient_llm_inference_tpu.engine.megaserver import (
    MegaBatchServer,
    MegaPoolConfig,
)
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec

CFG = gpt2_mod.GPT2Config(
    vocab_size=300, n_positions=256, n_embd=128, n_layer=2, n_head=2
)
C = 96
GRAIN = 16


@pytest.fixture(scope="module")
def params():
    return gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), CFG, jnp.float32)


@pytest.fixture(scope="module")
def eng(params):
    return InferenceEngine(
        gpt2_spec(CFG), params,
        config=Config(dtype=jnp.float32, megakernel=False, device="cpu"),
    )


def _mk_srv(params, **kw):
    return MegaBatchServer(
        gpt2_spec(CFG), params,
        pool=MegaPoolConfig(n_slots=4, capacity=C, max_chunk=4,
                            prompt_bucket=64),
        dtype=jnp.float32,
        interpret=True,
        enable_prefix_cache=True,
        prefix_grain=GRAIN,
        **kw,
    )


PREFIX = "the cat sat on the mat and"  # 26 chars > GRAIN
SUFFIXES = [" then a", " while the dog", " quietly", " again and again"]


def _reqs(tok, budgets):
    return [
        Request(rid=i, prompt_ids=tok.encode(PREFIX + s), max_new_tokens=n)
        for i, (s, n) in enumerate(zip(SUFFIXES, budgets))
    ]


def test_prefix_cache_dense_token_exact(params, eng):
    """Dense pools: prefix-HIT admissions are token-exact vs per-prompt
    greedy, and the registry actually gets hit (suffix programs built)."""
    srv = _mk_srv(params)
    budgets = [6, 7, 5, 8]
    # run 1: all misses -> registers the shared grain-aligned prefix
    reqs1 = _reqs(eng.tokenizer, budgets)
    srv.run(reqs1)
    assert len(srv._prefix_reg) >= 1
    # run 2: every prompt hits the registered prefix
    reqs2 = _reqs(eng.tokenizer, budgets)
    srv.run(reqs2)
    sfx_keys = [k for k in srv._prefills if k[0] == "sfx"]
    assert sfx_keys, "second admission should prefill suffixes only"
    for req, s, n in zip(reqs2, SUFFIXES, budgets):
        want = eng.generate_ids(PREFIX + s, "full_cache", max_new_tokens=n)
        assert req.prompt_ids + req.out_ids == want, f"req {req.rid}"
    # run-1 (miss path) outputs are identical too
    for a, b in zip(reqs1, reqs2):
        assert a.out_ids == b.out_ids


def test_prefix_cache_spec_token_exact(params, eng):
    """Prefix caching composes with spec="ngram" (device-side admission):
    still token-exact vs per-prompt greedy on dense fp32 pools."""
    srv = _mk_srv(params, spec="ngram", spec_k=4)
    budgets = [6, 9, 5, 7]
    srv.run(_reqs(eng.tokenizer, budgets))  # register
    reqs = _reqs(eng.tokenizer, budgets)
    srv.run(reqs)
    assert [k for k in srv._prefills if k[0] == "sfx"]
    for req, s, n in zip(reqs, SUFFIXES, budgets):
        want = eng.generate_ids(PREFIX + s, "full_cache", max_new_tokens=n)
        assert req.prompt_ids + req.out_ids == want, f"req {req.rid}"


def test_prefix_cache_quant_pool_bytes_stable(params, eng):
    """Quant pools: the HIT path copies the cached RAW prefix bytes, so
    the pool prefix region is bit-identical to the registering run and
    outputs match the miss-path outputs of the same server."""
    srv = _mk_srv(params, kv_mode="int8")
    budgets = [6, 7, 5, 8]
    reqs1 = _reqs(eng.tokenizer, budgets)
    srv.run(reqs1)
    reqs2 = _reqs(eng.tokenizer, budgets)
    srv.run(reqs2)
    assert [k for k in srv._prefills if k[0] == "sfx"]
    for a, b in zip(reqs1, reqs2):
        assert a.out_ids == b.out_ids, f"req {a.rid}"


def test_prefix_lru_eviction(params, eng):
    srv = _mk_srv(params)
    srv.prefix_cache_max = 2
    tok = eng.tokenizer
    prompts = [f"prefix number {i} with extra words {i}" for i in range(4)]
    for p in prompts:
        srv.run([Request(rid=0, prompt_ids=tok.encode(p),
                         max_new_tokens=3)])
    assert len(srv._prefix_reg) <= 2


def test_prefix_hit_survives_lru_eviction_within_admission(params, eng):
    """A hit group's registry entry may be LRU-evicted by an earlier miss
    group's registrations in the SAME admission wave — the captured entry
    must still serve the suffix prefill (round-5 review fix)."""
    srv = _mk_srv(params)
    srv.prefix_cache_max = 1
    tok = eng.tokenizer
    known = PREFIX + SUFFIXES[0]
    # register PREFIX's aligned chunks
    srv.run([Request(rid=0, prompt_ids=tok.encode(known), max_new_tokens=3)])
    # one HIT request + one MISS request whose registration evicts the
    # hit's key (cache_max=1), admitted in the same wave
    reqs = [
        Request(rid=0, prompt_ids=tok.encode(PREFIX + SUFFIXES[1]),
                max_new_tokens=4),
        Request(rid=1, prompt_ids=tok.encode(
            "completely different prompt with words"), max_new_tokens=4),
    ]
    srv.run(reqs)  # must not KeyError
    for req, p in zip(reqs, [PREFIX + SUFFIXES[1],
                             "completely different prompt with words"]):
        want = eng.generate_ids(p, "full_cache", max_new_tokens=4)
        assert req.prompt_ids + req.out_ids == want
