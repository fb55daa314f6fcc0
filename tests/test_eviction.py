"""Eviction policy index math vs an independent numpy oracle.

The oracle re-derives each policy from the reference's documented semantics
(/root/reference/src/cache/implementations.py:124-346) with dynamic shapes;
our static-shape mask/gather implementation must select exactly the same
token positions in the same order, and chunk-summary must produce the same
pooled values (including the divide-by-chunk_size-with-zero-pad behavior).
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from efficient_llm_inference_tpu.cache import eviction
from efficient_llm_inference_tpu.cache.kvcache import DenseKV


def make_cache(length, capacity, L=2, B=1, H=2, D=4, seed=0):
    rng = np.random.default_rng(seed)
    k = np.zeros((L, B, H, capacity, D), np.float32)
    v = np.zeros_like(k)
    k[:, :, :, :length] = rng.normal(size=(L, B, H, length, D))
    v[:, :, :, :length] = rng.normal(size=(L, B, H, length, D))
    cache = {
        "k": jnp.asarray(k),
        "v": jnp.asarray(v),
        "length": jnp.asarray(length, jnp.int32),
    }
    return cache, k, v


# ---------------------------------------------------------------------------
# numpy oracles (dynamic shapes, straight from the documented semantics)
# ---------------------------------------------------------------------------


def oracle_sliding(T, W):
    return list(range(max(0, T - W), T))


def oracle_prefix_window(T, P, W):
    if T <= P + W:
        return list(range(T))
    return list(range(P)) + list(range(T - W, T))


def oracle_strided(T, W, stride, P):
    if T <= P + W:
        return list(range(T))
    ts = max(P, T - W)
    idx = list(range(P))
    idx += list(range(P, ts, stride))
    idx += list(range(ts, T))
    return idx


def oracle_block(T, W, bs, kpb, P):
    if T <= P + W:
        return list(range(T))
    ts = max(P, T - W)
    idx = list(range(P))
    start = P
    while start < ts:
        end = min(start + bs, ts)
        keep_start = max(start, end - kpb)
        idx += list(range(keep_start, end))
        start = end
    idx += list(range(ts, T))
    return idx


def oracle_budget(T, W, budget, P):
    if T <= P + W:
        return list(range(T))
    ts = max(P, T - W)
    old_len = ts - P
    idx = list(range(P))
    if old_len > 0 and budget > 0:
        if old_len <= budget:
            idx += list(range(P, ts))
        else:
            # torch.linspace(...).long() + unique_consecutive, float32 math
            lin = torch.linspace(P, ts - 1, steps=budget).long()
            lin = torch.unique_consecutive(lin)
            idx += lin.tolist()
    idx += list(range(ts, T))
    return idx


# ---------------------------------------------------------------------------


CASES = [  # (T, params)
    (5, {}),
    (17, {}),
    (64, {}),
    (100, {}),
    (257, {}),
]


@pytest.mark.parametrize("T", [5, 17, 64, 100, 257])
def test_sliding(T):
    W = 32
    cap = max(T, W + 1)
    cache, k, _ = make_cache(T, cap)
    out = eviction.trim_sliding_window(cache, W)
    idx = oracle_sliding(T, W)
    assert int(out["length"]) == len(idx)
    np.testing.assert_array_equal(
        np.asarray(out["k"])[:, :, :, : len(idx)], k[:, :, :, idx]
    )


@pytest.mark.parametrize("T,P,W", [(5, 4, 8), (20, 4, 8), (13, 4, 8), (100, 16, 32)])
def test_prefix_window(T, P, W):
    cap = max(T, P + W + 1)
    cache, k, _ = make_cache(T, cap)
    out = eviction.trim_prefix_window(cache, P, W)
    idx = oracle_prefix_window(T, P, W)
    assert int(out["length"]) == len(idx)
    np.testing.assert_array_equal(
        np.asarray(out["k"])[:, :, :, : len(idx)], k[:, :, :, idx]
    )


@pytest.mark.parametrize(
    "T,W,stride,P", [(10, 8, 3, 0), (50, 16, 4, 4), (100, 32, 2, 0), (37, 8, 5, 3)]
)
def test_strided(T, W, stride, P):
    cap = T + 4
    cache, k, _ = make_cache(T, cap)
    out = eviction.trim_strided(cache, W, stride, P)
    idx = oracle_strided(T, W, stride, P)
    assert int(out["length"]) == len(idx)
    np.testing.assert_array_equal(
        np.asarray(out["k"])[:, :, :, : len(idx)], k[:, :, :, idx]
    )


@pytest.mark.parametrize(
    "T,W,bs,kpb,P", [(50, 16, 8, 3, 0), (100, 32, 16, 4, 8), (33, 8, 8, 8, 0)]
)
def test_block(T, W, bs, kpb, P):
    cap = T + 4
    cache, k, _ = make_cache(T, cap)
    out = eviction.trim_block_old(cache, W, bs, kpb, P)
    idx = oracle_block(T, W, bs, kpb, P)
    assert int(out["length"]) == len(idx)
    np.testing.assert_array_equal(
        np.asarray(out["k"])[:, :, :, : len(idx)], k[:, :, :, idx]
    )


@pytest.mark.parametrize(
    "T,W,budget,P", [(50, 16, 8, 0), (100, 32, 16, 4), (200, 16, 7, 0), (40, 16, 64, 0)]
)
def test_budget(T, W, budget, P):
    cap = T + 4
    cache, k, _ = make_cache(T, cap)
    out = eviction.trim_budget_old(cache, W, budget, P)
    idx = oracle_budget(T, W, budget, P)
    assert int(out["length"]) == len(idx)
    np.testing.assert_array_equal(
        np.asarray(out["k"])[:, :, :, : len(idx)], k[:, :, :, idx]
    )


@pytest.mark.parametrize("T,chunk,keep", [(100, 16, 32), (33, 8, 16), (20, 8, 32), (64, 16, 0)])
def test_chunk_summarize(T, chunk, keep):
    cap = T + 4
    cache, k, v = make_cache(T, cap)
    out = eviction.chunk_summarize(cache, chunk, keep)

    keep_eff = min(keep, T)
    old_len = T - keep_eff
    if old_len <= 0:
        assert int(out["length"]) == T
        np.testing.assert_array_equal(np.asarray(out["k"])[:, :, :, :T], k[:, :, :, :T])
        return

    n_chunks = math.ceil(old_len / chunk)
    # reference zero-pads then means over the chunk axis -> sum/chunk_size
    pad = (-old_len) % chunk
    k_old = np.concatenate(
        [k[:, :, :, :old_len], np.zeros_like(k[:, :, :, :pad])], axis=3
    )
    k_sum = k_old.reshape(*k.shape[:3], n_chunks, chunk, k.shape[-1]).mean(axis=4)
    expected_k = np.concatenate([k_sum, k[:, :, :, old_len:T]], axis=3)

    new_len = int(out["length"])
    assert new_len == n_chunks + keep_eff
    np.testing.assert_allclose(
        np.asarray(out["k"])[:, :, :, :new_len], expected_k, rtol=1e-6, atol=1e-6
    )


def test_capacity_bound_simulation_consistency():
    """capacity_bound must never be exceeded by the actual trim dynamics."""
    for method, params in [
        ("sliding_window", {"window_size": 16}),
        ("prefix_window", {"prefix_len": 4, "window_size": 16}),
        ("strided_cache", {"prefix_len": 2, "window_size": 16, "stride": 3}),
        (
            "block_cache",
            {"prefix_len": 0, "window_size": 16, "block_size": 8, "keep_per_block": 2},
        ),
        ("budget_cache", {"prefix_len": 2, "window_size": 16, "old_budget": 8}),
        ("chunked_cache", {"chunk_size": 8, "keep_last": 16}),
    ]:
        T0, steps = 50, 20
        cap = eviction.capacity_bound(method, T0, steps, params)
        cache, _, _ = make_cache(T0, cap)
        trim = eviction.TRIM_FNS[method]
        cache = trim(cache, params)
        for _ in range(steps):
            ln = int(cache["length"])
            assert ln + 1 <= cap, (method, ln, cap)
            # emulate append of one token
            cache["length"] = jnp.asarray(ln + 1, jnp.int32)
            cache = trim(cache, params)
