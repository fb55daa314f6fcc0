"""Quality metrics: perplexity, sliding-window NLL, similarity, agreement.

JAX-native counterpart of /root/reference/src/evaluation/quality.py:11-150.
Perplexity and sliding-window NLL run through the engine's own model +
cache machinery instead of an injected HF model.
"""

from __future__ import annotations

import math
from difflib import SequenceMatcher
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.kvcache import DenseKV, NoCacheKV
from ..models.registry import ModelSpec


def compute_perplexity(
    model: ModelSpec,
    params,
    tokenizer,
    texts: List[str],
    max_length: int = 1024,
) -> Tuple[float, float]:
    """Teacher-forcing perplexity (reference quality.py:11-57).

    Matches the reference's token accounting: the mean NLL over shifted
    positions is weighted by the FULL sequence length (labels=input_ids with
    HF's internal shift divides by T-1 per text, then the reference
    multiplies by T — reproduced exactly).
    """
    total_nll = 0.0
    total_tokens = 0
    for text in texts:
        ids = tokenizer.encode(text)[:max_length]
        if len(ids) < 2:
            continue
        nll_mean = _sequence_mean_nll(model, params, ids)
        n_tokens = len(ids)
        total_nll += nll_mean * n_tokens
        total_tokens += n_tokens
    avg_nll = total_nll / max(total_tokens, 1)
    return avg_nll, math.exp(avg_nll)


def _sequence_mean_nll(model: ModelSpec, params, ids: List[int]) -> float:
    """Mean next-token NLL over a sequence (one cache-free forward)."""
    T = len(ids)
    strategy = NoCacheKV(
        n_layer=model.n_layer, n_head=model.n_kv_head, head_dim=model.head_dim
    )
    tokens = jnp.asarray([ids], jnp.int32)
    pos = jnp.minimum(jnp.arange(T, dtype=jnp.int32), model.n_positions - 1)[None]
    logits, _ = jax.jit(
        lambda p, t, q: model.forward(p, t, q, strategy.init(), strategy, None)
    )(params, tokens, pos)
    logp = jax.nn.log_softmax(logits[0, :-1].astype(jnp.float32), axis=-1)
    tgt = jnp.asarray(ids[1:], jnp.int32)
    nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    return float(jnp.mean(nll))


def compute_sliding_window_nll(
    model: ModelSpec,
    params,
    tokenizer,
    text: str,
    window_size: int = 256,
    max_length: Optional[int] = None,
) -> Tuple[float, float]:
    """Token-by-token NLL under sliding-window eviction (quality.py:60-121).

    Measures degradation from context truncation: decode each target token
    with a cache trimmed to `window_size` after every step. Runs as one
    jitted lax.scan (the reference loops in Python per token).
    """
    ids = tokenizer.encode(text)
    if max_length is not None:
        ids = ids[:max_length]
    T = len(ids)
    assert T >= 2, "need at least 2 tokens"

    from ..cache.eviction import trim_sliding_window

    cap = max(window_size + 1, 8)
    strategy = DenseKV(
        n_layer=model.n_layer,
        n_head=model.n_kv_head,
        head_dim=model.head_dim,
        capacity=cap,
    )

    def run(params, tokens):  # tokens: [T]
        cache = strategy.init()

        def step(carry, tok_pair):
            cache = carry
            prev_tok, target = tok_pair
            pos = jnp.minimum(cache["length"], model.n_positions - 1)
            logits, cache = model.forward(
                params,
                prev_tok[None, None],
                pos[None, None].astype(jnp.int32),
                cache,
                strategy,
                None,
            )
            cache = strategy.set_length(cache, cache["length"] + 1)
            cache = trim_sliding_window(cache, window_size)
            logp = jax.nn.log_softmax(logits[0, 0].astype(jnp.float32))
            return cache, -logp[target]

        _, nlls = jax.lax.scan(step, cache, (tokens[:-1], tokens[1:]))
        return nlls

    nlls = jax.jit(run)(params, jnp.asarray(ids, jnp.int32))
    avg_nll = float(jnp.mean(nlls))
    return avg_nll, math.exp(avg_nll)


def compute_method_nll(
    engine,
    text: str,
    method: str = "full_cache",
    max_tokens: int = 256,
    **kw,
) -> float:
    """Teacher-forced mean next-token NLL under a cache METHOD's semantics.

    Generalizes the reference's sliding-window NLL (quality.py:60-121) to
    every cache method: the text is fed one token at a time through the
    method's own prefill-one/decode-step machinery — per-step eviction,
    quantized storage, ring writes, everything — scoring the TRUE next
    token each step. The resulting NLL measures exactly what the method's
    KV budget costs in modeling quality; together with `est_bytes` it gives
    the "KV-cache MB at fixed quality delta" curve (BASELINE.json north
    star). full_cache reproduces plain teacher-forcing perplexity.
    """
    from ..engine.generate import bucket_for

    ids = engine.tokenizer.encode(text)[:max_tokens]
    T = bucket_for(len(ids))
    if len(ids) < T:  # right-pad; padded steps are masked out of the mean
        pad = T - len(ids)
    else:
        pad = 0
    true_len = len(ids)
    assert true_len >= 2, "need at least 2 tokens to score"
    model = engine.model

    # Reuse the engine's strategy construction: bucket=1 (prefill is one
    # token here), max_new = T-1 decode steps.
    if method == "no_cache":
        method = "full_cache"  # identical teacher-forced semantics
    kind, _, strategy, _ = engine._build(method, 1, T - 1, kw)
    trim_fn = None
    if method not in ("full_cache", "paged_attention") and not method.startswith(
        "quant_"
    ):
        from ..cache import eviction

        if method == "sliding_window" and kw.get("ring", True):
            pass  # RingKV needs no trim
        else:
            trim_kw = {k_: v_ for k_, v_ in kw.items() if k_ != "ring"}
            trim = eviction.TRIM_FNS[method]
            trim_fn = lambda c: trim(c, trim_kw)  # noqa: E731

    key = (method, T, tuple(sorted(kw.items())), "teacher_nll")
    if key not in engine._fns:
        pos_of = getattr(strategy, "position", lambda c: c["length"])

        def run(params, tokens, true_len):  # tokens [1, T]
            cache = strategy.init()
            pos0 = jnp.zeros((1, 1), jnp.int32)
            logits, cache = model.forward(
                params, tokens[:, :1], pos0, cache, strategy, None
            )
            cache = strategy.set_length(cache, 1)
            if trim_fn is not None:
                cache = trim_fn(cache)
            lp0 = jax.nn.log_softmax(logits[0, 0].astype(jnp.float32))
            nll0 = -lp0[tokens[0, 1]]

            def step(carry, t):
                cache, acc = carry
                tok = jax.lax.dynamic_slice(tokens, (0, t), (1, 1))
                pos = jnp.minimum(pos_of(cache), model.n_positions - 1)
                pos = jnp.broadcast_to(pos[None, None], (1, 1)).astype(jnp.int32)
                logits, cache = model.forward(
                    params, tok, pos, cache, strategy, None
                )
                cache = strategy.set_length(cache, cache["length"] + 1)
                if trim_fn is not None:
                    cache = trim_fn(cache)
                lp = jax.nn.log_softmax(logits[0, 0].astype(jnp.float32))
                nxt = jax.lax.dynamic_slice(tokens, (0, t + 1), (1, 1))[0, 0]
                nll = -lp[nxt]
                # only positions t+1 < true_len count
                acc = acc + jnp.where(t + 1 < true_len, nll, 0.0)
                return (cache, acc), None

            (cache, acc), _ = jax.lax.scan(
                step, (cache, nll0), jnp.arange(1, T - 1, dtype=jnp.int32)
            )
            return acc / (true_len - 1).astype(jnp.float32)

        engine._fns[key] = jax.jit(run)
    buf = np.zeros((1, T), np.int32)
    buf[0, :true_len] = ids
    return float(
        engine._fns[key](engine.params, jnp.asarray(buf), jnp.int32(true_len))
    )


def text_similarity(a: str, b: str) -> float:
    """difflib SequenceMatcher ratio (reference quality.py:124-134)."""
    return SequenceMatcher(None, a, b).ratio()


def token_agreement_rate(tok_a: List[int], tok_b: List[int]) -> float:
    """Fraction of positionally matching tokens (reference quality.py:137-150)."""
    L = min(len(tok_a), len(tok_b))
    if L == 0:
        return 0.0
    return sum(1 for i in range(L) if tok_a[i] == tok_b[i]) / L
