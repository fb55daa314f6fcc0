"""One-program draft bursts (ops/pallas/megakernel_draft.py) vs XLA scan.

The k-step in-kernel burst (token feedback, pane append, tied-head argmax
all inside one program) must reproduce, in fp32 interpret mode, the exact
proposals and pane rows of the k-program XLA draft scan that
engine/speculative.py's draft path runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.cache.kvcache import DenseKV
from efficient_llm_inference_tpu.models import gpt2 as gpt2_mod
from efficient_llm_inference_tpu.models import llama as llama_mod
from efficient_llm_inference_tpu.models.registry import gpt2_spec
from efficient_llm_inference_tpu.ops.pallas.megakernel import to_mega_layout
from efficient_llm_inference_tpu.ops.pallas.megakernel_draft import (
    gpt2_draft_burst,
    gpt2_draft_burst_supported,
    llama_draft_burst,
    llama_draft_burst_supported,
    pack_gpt2_draft,
    pack_llama_draft,
)

C = 64
K = 5

GCFG = gpt2_mod.GPT2Config(
    vocab_size=256, n_positions=256, n_embd=128, n_layer=2, n_head=4
)
LCFG = llama_mod.LlamaConfig(
    vocab_size=256, n_positions=256, hidden_size=256, intermediate_size=512,
    n_layer=1, n_head=4, n_kv_head=2, rope_theta=10000.0,
    tie_embeddings=True,
)


def _xla_burst(spec, params, ids, k):
    """Prefill + k greedy XLA draft steps (speculative.py's d_step)."""
    strat = DenseKV(
        n_layer=spec.n_layer, n_head=spec.n_kv_head, head_dim=spec.head_dim,
        capacity=C, dtype=jnp.float32,
    )
    T0 = len(ids)
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(T0, dtype=jnp.int32)[None]
    cache = strat.init()
    logits, cache = spec.forward(params, toks, pos, cache, strat, None)
    cache = strat.set_length(cache, T0)
    cur = jnp.argmax(logits[0, -1]).astype(jnp.int32)

    props = []
    tok = cur
    for _ in range(k):
        p = jnp.minimum(cache["length"], spec.n_positions - 1)
        lg, cache = spec.forward(
            params, tok[None, None], p[None, None].astype(jnp.int32),
            cache, strat, None,
        )
        cache = strat.set_length(cache, cache["length"] + 1)
        tok = jnp.argmax(lg[0, 0]).astype(jnp.int32)
        props.append(int(tok))
    return cur, props, cache


def test_gpt2_draft_burst_matches_xla_scan():
    params = gpt2_mod.init_gpt2_params(jax.random.PRNGKey(0), GCFG,
                                       jnp.float32)
    spec = gpt2_spec(GCFG)
    assert gpt2_draft_burst_supported(GCFG, C, jnp.float32)
    rng = np.random.RandomState(3)
    ids = rng.randint(0, GCFG.vocab_size, size=9).tolist()
    cur, want, cache = _xla_burst(spec, params, ids, K)

    # burst starts from the pre-burst cache state
    strat = DenseKV(n_layer=spec.n_layer, n_head=spec.n_head,
                    head_dim=spec.head_dim, capacity=C, dtype=jnp.float32)
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    c0 = strat.init()
    _, c0 = spec.forward(params, toks, pos, c0, strat, None)
    dk = to_mega_layout(c0["k"])
    dv = to_mega_layout(c0["v"])
    dpk = pack_gpt2_draft(params, GCFG)
    props, k2, v2 = gpt2_draft_burst(
        dpk, dk, dv, jnp.int32(len(ids)), cur,
        cfg=GCFG, capacity=C, k=K, interpret=True,
    )
    assert np.asarray(props).tolist() == want
    # appended pane rows match the XLA cache (mega layout reshape)
    T0 = len(ids)
    got_rows = np.asarray(k2)[:, T0:T0 + K, :]
    exp = np.asarray(to_mega_layout(cache["k"]))[:, T0:T0 + K, :]
    np.testing.assert_allclose(got_rows, exp, atol=1e-5)


def test_llama_draft_burst_matches_xla_scan():
    params = llama_mod.init_llama_params(jax.random.PRNGKey(1), LCFG,
                                         jnp.float32)
    spec = llama_mod.llama_spec(LCFG)
    assert llama_draft_burst_supported(LCFG, C, jnp.float32)
    rng = np.random.RandomState(4)
    ids = rng.randint(0, LCFG.vocab_size, size=11).tolist()
    cur, want, cache = _xla_burst(spec, params, ids, K)

    strat = DenseKV(n_layer=spec.n_layer, n_head=spec.n_kv_head,
                    head_dim=spec.head_dim, capacity=C, dtype=jnp.float32)
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    c0 = strat.init()
    _, c0 = spec.forward(params, toks, pos, c0, strat, None)
    dk = to_mega_layout(c0["k"])
    dv = to_mega_layout(c0["v"])
    dpk = pack_llama_draft(params, LCFG)
    props, k2, v2 = llama_draft_burst(
        dpk, dk, dv, jnp.int32(len(ids)), cur,
        cfg=LCFG, capacity=C, k=K, interpret=True,
    )
    assert np.asarray(props).tolist() == want
    T0 = len(ids)
    got_rows = np.asarray(k2)[:, T0:T0 + K, :]
    exp = np.asarray(to_mega_layout(cache["k"]))[:, T0:T0 + K, :]
    np.testing.assert_allclose(got_rows, exp, atol=1e-5)


def test_burst_gating():
    assert not gpt2_draft_burst_supported(
        gpt2_mod.GPT2Config(vocab_size=50257, n_positions=1024,
                            n_embd=768, n_layer=12, n_head=12),
        512, jnp.bfloat16,
    )  # full GPT-2 small is not VMEM-resident
    assert not llama_draft_burst_supported(
        llama_mod.LlamaConfig(
            vocab_size=256, n_positions=256, hidden_size=256,
            intermediate_size=512, n_layer=1, n_head=4, n_kv_head=2,
            rope_theta=10000.0, tie_embeddings=False,
        ),
        64, jnp.float32,
    )  # untied head unsupported
