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


def text_similarity(a: str, b: str) -> float:
    """difflib SequenceMatcher ratio (reference quality.py:124-134)."""
    return SequenceMatcher(None, a, b).ratio()


def token_agreement_rate(tok_a: List[int], tok_b: List[int]) -> float:
    """Fraction of positionally matching tokens (reference quality.py:137-150)."""
    L = min(len(tok_a), len(tok_b))
    if L == 0:
        return 0.0
    return sum(1 for i in range(L) if tok_a[i] == tok_b[i]) / L
