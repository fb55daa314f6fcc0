"""KV-cache eviction / compression policies as static-shape transforms.

TPU-native re-design of /root/reference/src/cache/implementations.py:124-346.
The reference physically shrinks dynamic tuples; XLA requires fixed shapes, so
here every policy is a pure function on a static-capacity cache state

    {"k": [L, B, H, C, D], "v": ..., "length": int32[]}

that (1) builds a keep-mask over buffer slots from `length` and the policy's
static parameters, (2) compacts kept slots to the front with a stable
masked-sort gather, and (3) updates `length`. Shapes never change; the policy
runs inside the jitted decode scan.

Semantics reproduce the reference exactly, including its emergent behaviors:
policies re-apply every step to the *already-trimmed* buffer (so strided
re-strides its own output and chunk summaries get re-summarized as they age,
/root/reference/src/benchmarking/benchmarker.py:617-626).

`capacity_bound` computes the exact static buffer capacity a policy needs by
simulating the (data-independent) length dynamics in Python.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def _slots(C: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0).squeeze(-1)


def _compact(cache: dict, keep_mask: jax.Array) -> dict:
    """Stable-compact kept slots to the front of the buffer.

    keep_mask: bool[C] over buffer slots (never True at slot >= length).
    Gather indices come from sorting `where(keep, slot, C)`; slots past the
    new length hold garbage but are masked out by `length` everywhere.
    """
    C = keep_mask.shape[0]
    slots = _slots(C)
    key = jnp.where(keep_mask, slots, C)
    src = jnp.minimum(jnp.sort(key), C - 1)
    new_len = jnp.sum(keep_mask.astype(jnp.int32))
    out = dict(cache)
    for name in ("k", "v"):
        out[name] = jnp.take(cache[name], src, axis=3)
    # Quantized trim would also need scale gathers; trim policies run on
    # DenseKV only (as in the reference, where trim and quant are disjoint
    # method families, benchmarker.py:673-687).
    out["length"] = new_len.astype(jnp.int32)
    return out


# ---------------------------------------------------------------------------
# Mask builders — slot t is kept iff mask[t]
# ---------------------------------------------------------------------------


def sliding_window_mask(length, C: int, window_size: int) -> jax.Array:
    """Keep last `window_size` (reference implementations.py:124-140)."""
    t = _slots(C)
    return (t >= length - window_size) & (t < length)


def prefix_window_mask(length, C: int, prefix_len: int, window_size: int) -> jax.Array:
    """Keep first prefix + last window; no-op when len <= P+W (impl.py:143-154)."""
    t = _slots(C)
    in_len = t < length
    noop = length <= prefix_len + window_size
    keep = (t < prefix_len) | (t >= length - window_size)
    return jnp.where(noop, in_len, keep & in_len)


def strided_mask(
    length, C: int, window_size: int, stride: int, prefix_len: int = 0
) -> jax.Array:
    """Prefix + every stride-th older token + dense tail (impl.py:157-190)."""
    t = _slots(C)
    in_len = t < length
    noop = length <= prefix_len + window_size
    tail_start = jnp.maximum(prefix_len, length - window_size)
    old = (t >= prefix_len) & (t < tail_start)
    keep = (t < prefix_len) | (t >= tail_start) | (old & ((t - prefix_len) % stride == 0))
    return jnp.where(noop, in_len, keep & in_len)


def block_old_mask(
    length,
    C: int,
    window_size: int,
    block_size: int = 64,
    keep_per_block: int = 8,
    prefix_len: int = 0,
) -> jax.Array:
    """Keep the LAST keep_per_block tokens of each older block (impl.py:193-245)."""
    t = _slots(C)
    in_len = t < length
    noop = length <= prefix_len + window_size
    tail_start = jnp.maximum(prefix_len, length - window_size)
    blk = (t - prefix_len) // block_size
    blk_end = jnp.minimum(prefix_len + (blk + 1) * block_size, tail_start)
    old = (t >= prefix_len) & (t < tail_start)
    keep = (t < prefix_len) | (t >= tail_start) | (old & (t >= blk_end - keep_per_block))
    return jnp.where(noop, in_len, keep & in_len)


def budget_old_mask(
    length, C: int, window_size: int, old_budget: int = 64, prefix_len: int = 0
) -> jax.Array:
    """Uniform fixed-budget sample of older tokens (impl.py:248-292).

    Reproduces torch.linspace(P, ts-1, budget).long() in float32 arithmetic
    (step computed once, values truncated) with duplicate indices collapsing
    via scatter — the masked analog of unique_consecutive (impl.py:282).
    """
    t = _slots(C)
    in_len = t < length
    noop = length <= prefix_len + window_size
    tail_start = jnp.maximum(prefix_len, length - window_size)
    old_len = tail_start - prefix_len

    keep = (t < prefix_len) | (t >= tail_start)
    if old_budget > 0:
        small = old_len <= old_budget
        old = (t >= prefix_len) & (t < tail_start)
        if old_budget == 1:
            sampled = jnp.zeros((C,), bool).at[jnp.minimum(prefix_len, C - 1)].set(True)
        else:
            j = jnp.arange(old_budget, dtype=jnp.float32)
            step = (tail_start - 1 - prefix_len).astype(jnp.float32) / (old_budget - 1)
            idx = (prefix_len + j * step).astype(jnp.int32)  # trunc like .long()
            sampled = (
                jnp.zeros((C,), bool)
                .at[jnp.clip(idx, 0, C - 1)]
                .set(True, mode="drop")
            )
        keep = keep | (old & jnp.where(small, True, sampled))
    return jnp.where(noop, in_len, keep & in_len)


# ---------------------------------------------------------------------------
# Policy application
# ---------------------------------------------------------------------------


def trim_sliding_window(cache: dict, window_size: int) -> dict:
    C = cache["k"].shape[3]
    return _compact(cache, sliding_window_mask(cache["length"], C, window_size))


def trim_prefix_window(cache: dict, prefix_len: int, window_size: int) -> dict:
    C = cache["k"].shape[3]
    return _compact(
        cache, prefix_window_mask(cache["length"], C, prefix_len, window_size)
    )


def trim_strided(cache: dict, window_size: int, stride: int, prefix_len: int = 0) -> dict:
    C = cache["k"].shape[3]
    return _compact(
        cache, strided_mask(cache["length"], C, window_size, stride, prefix_len)
    )


def trim_block_old(
    cache: dict,
    window_size: int,
    block_size: int = 64,
    keep_per_block: int = 8,
    prefix_len: int = 0,
) -> dict:
    C = cache["k"].shape[3]
    return _compact(
        cache,
        block_old_mask(
            cache["length"], C, window_size, block_size, keep_per_block, prefix_len
        ),
    )


def trim_budget_old(
    cache: dict, window_size: int, old_budget: int = 64, prefix_len: int = 0
) -> dict:
    C = cache["k"].shape[3]
    return _compact(
        cache, budget_old_mask(cache["length"], C, window_size, old_budget, prefix_len)
    )


def chunk_summarize(cache: dict, chunk_size: int, keep_last: int) -> dict:
    """Mean-pool older tokens into chunk summaries (impl.py:295-346).

    Padding semantics preserved: the reference zero-pads the old region to a
    chunk multiple and divides by chunk_size regardless, so a partial final
    chunk's summary is scaled by old_len%chunk/chunk — reproduced here by
    summing real tokens and always dividing by chunk_size.
    """
    k, v, length = cache["k"], cache["v"], cache["length"]
    C = k.shape[3]
    t = _slots(C)

    old_len = jnp.maximum(length - keep_last, 0)
    n_chunks = -(-old_len // chunk_size)  # ceil

    in_old = t < old_len
    chunk_id = jnp.where(in_old, t // chunk_size, C)  # C = dropped

    def pool(x):
        vals = jnp.where(in_old[None, None, None, :, None], x, jnp.zeros_like(x))
        sums = jnp.zeros_like(x).at[:, :, :, chunk_id, :].add(vals, mode="drop")
        return sums / jnp.asarray(chunk_size, x.dtype)

    k_sum, v_sum = pool(k), pool(v)

    # out[i] = summary[i] for i < n_chunks, else recent token old_len+(i-n_chunks)
    src_recent = jnp.clip(old_len + t - n_chunks, 0, C - 1)
    is_summary = t < n_chunks

    def assemble(summaries, x):
        recent = jnp.take(x, src_recent, axis=3)
        sel = is_summary[None, None, None, :, None]
        return jnp.where(sel, jnp.take(summaries, jnp.minimum(t, C - 1), axis=3), recent)

    new_len = n_chunks + (length - old_len)
    noop = old_len <= 0
    out = dict(cache)
    out["k"] = jnp.where(noop, k, assemble(k_sum, k))
    out["v"] = jnp.where(noop, v, assemble(v_sum, v))
    out["length"] = jnp.where(noop, length, new_len).astype(jnp.int32)
    return out


# ---------------------------------------------------------------------------
# Static capacity bounds via exact length-dynamics simulation
# ---------------------------------------------------------------------------


def len_after(method: str, n: int, p: Dict) -> int:
    """Pure-Python mirror of each policy's length map (for capacity bounds
    and KV-size estimation — public: engine.estimate_kv_bytes builds on it)."""
    if method == "sliding_window":
        return min(n, p["window_size"])
    P, W = p.get("prefix_len", 0), p.get("window_size", 0)
    if method == "prefix_window":
        return n if n <= P + W else P + W
    if method == "strided_cache":
        if n <= P + W:
            return n
        ts = max(P, n - W)
        return P + math.ceil((ts - P) / p["stride"]) + (n - ts)
    if method == "block_cache":
        if n <= P + W:
            return n
        ts = max(P, n - W)
        kept = 0
        start = P
        while start < ts:
            end = min(start + p["block_size"], ts)
            kept += min(p["keep_per_block"], end - start)
            start = end
        return P + kept + (n - ts)
    if method == "budget_cache":
        if n <= P + W:
            return n
        ts = max(P, n - W)
        old_len = ts - P
        b = p["old_budget"]
        if b <= 0:
            kept = 0
        elif old_len <= b:
            kept = old_len
        else:
            if b == 1:
                kept = 1
            else:
                step = (ts - 1 - P) / (b - 1)
                kept = len({int(P + j * step) for j in range(b)})
        return P + kept + (n - ts)
    if method == "chunked_cache":
        keep = p["keep_last"]
        if n <= keep:
            return n
        return math.ceil((n - keep) / p["chunk_size"]) + keep
    return n  # full_cache / identity


def capacity_bound(method: str, prompt_len: int, max_new_tokens: int, params: Dict) -> int:
    """Exact static capacity a policy needs for prompt_len + max_new_tokens.

    Simulates the deterministic length dynamics: prefill stores prompt_len
    tokens, then each decode step appends one token before re-trimming.
    """
    if method in ("full_cache", "no_cache", "paged_attention") or method.startswith(
        "quant"
    ):
        return prompt_len + max_new_tokens
    peak = prompt_len
    n = len_after(method, prompt_len, params)
    for _ in range(max_new_tokens):
        n += 1
        peak = max(peak, n)
        n = len_after(method, n, params)
    return peak


_len_after = len_after  # back-compat alias (pre-round-4 name)


TRIM_FNS: Dict[str, Callable] = {
    "sliding_window": lambda c, p: trim_sliding_window(c, p["window_size"]),
    "prefix_window": lambda c, p: trim_prefix_window(
        c, p["prefix_len"], p["window_size"]
    ),
    "strided_cache": lambda c, p: trim_strided(
        c, p["window_size"], p["stride"], p.get("prefix_len", 0)
    ),
    "block_cache": lambda c, p: trim_block_old(
        c,
        p["window_size"],
        p["block_size"],
        p["keep_per_block"],
        p.get("prefix_len", 0),
    ),
    "budget_cache": lambda c, p: trim_budget_old(
        c, p["window_size"], p["old_budget"], p.get("prefix_len", 0)
    ),
    "chunked_cache": lambda c, p: chunk_summarize(c, p["chunk_size"], p["keep_last"]),
}
