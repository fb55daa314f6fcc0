"""Quantization numerics: exact agreement with the reference math.

The reference semantics (/root/reference/src/quantization/ops.py:10-133):
int8 scale=max|x|/127, int4 scale=max|x|/7 clamp [-8,7] +8 nibble offset,
even index in high nibble, fp32 scale math, eps clamp. Verified here against
an independent torch computation of the same definitions, plus round-trip
error bounds.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from efficient_llm_inference_tpu.ops.quantization import (
    dequantize_int4_packed,
    dequantize_int8,
    quantize_int4_packed,
    quantize_int8,
    unpack_int4,
)


def _torch_int8(x):
    x32 = torch.tensor(x, dtype=torch.float32)
    scale = (x32.abs().max() / 127.0).clamp(min=1e-8)
    q = torch.clamp((x32 / scale).round(), -127, 127).to(torch.int8)
    return q.numpy(), float(scale)


def _torch_int4_packed(x):
    x32 = torch.tensor(x, dtype=torch.float32)
    scale = (x32.abs().max() / 7.0).clamp(min=1e-8)
    q = torch.clamp((x32 / scale).round(), -8, 7).to(torch.int8)
    q_u = (q + 8).to(torch.uint8)
    hi, lo = q_u[..., 0::2], q_u[..., 1::2]
    return ((hi << 4) | lo).numpy(), float(scale)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_int8_matches_torch_reference(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=2.0, size=(1, 4, 1, 16)).astype(np.float32)
    q_ref, s_ref = _torch_int8(x)
    q, s = quantize_int8(jnp.asarray(x), axes=(0, 1, 2, 3))
    assert np.array_equal(np.asarray(q), q_ref)
    # XLA may lower the /127 as multiply-by-reciprocal: allow 1-ulp on scale
    assert np.isclose(float(s), s_ref, rtol=1e-6, atol=0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_int4_matches_torch_reference(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(scale=0.5, size=(1, 4, 1, 16)).astype(np.float32)
    p_ref, s_ref = _torch_int4_packed(x)
    p, s = quantize_int4_packed(jnp.asarray(x), axes=(0, 1, 2, 3))
    assert np.array_equal(np.asarray(p), p_ref)
    assert np.isclose(float(s), s_ref, rtol=1e-6, atol=0)


def test_int8_roundtrip_error_bound():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4, 8, 32)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(x), axes=(0, 1, 3))  # per-token scales
    y = dequantize_int8(q, jnp.asarray(s)[None, None, :, None])
    max_abs = np.abs(x).max(axis=(0, 1, 3))
    # symmetric quantization error <= scale/2 per element
    bound = (max_abs / 127.0) / 2 + 1e-6
    err = np.abs(np.asarray(y) - x).max(axis=(0, 1, 3))
    assert (err <= bound).all()


def test_int4_roundtrip_error_bound():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 4, 8, 32)).astype(np.float32)
    p, s = quantize_int4_packed(jnp.asarray(x), axes=(0, 1, 3))
    y = dequantize_int4_packed(p, jnp.asarray(s)[None, None, :, None])
    max_abs = np.abs(x).max(axis=(0, 1, 3))
    bound = (max_abs / 7.0) / 2 + 1e-6
    err = np.abs(np.asarray(y) - x).max(axis=(0, 1, 3))
    assert (err <= bound).all()


def test_int4_pack_order():
    # even index -> high nibble (reference ops.py:59-63)
    x = jnp.asarray([[1.0, -1.0, 0.5, -0.5]])
    p, s = quantize_int4_packed(x, axes=(0, 1))
    q = np.asarray(unpack_int4(p))
    expected = np.clip(np.round(np.asarray(x) / float(s)), -8, 7)
    assert np.array_equal(q, expected)


def test_eps_clamp_on_zeros():
    x = jnp.zeros((1, 2, 1, 8))
    q, s = quantize_int8(x, axes=(0, 1, 2, 3))
    assert float(s) == float(np.float32(1e-8))
    assert np.all(np.asarray(q) == 0)


def _torch_int4_packed_odd(x):
    """Reference odd-last-dim path: pad quantized values by one zero element
    before the nibble offset (/root/reference/src/quantization/ops.py:54-56)."""
    x32 = torch.tensor(x, dtype=torch.float32)
    scale = (x32.abs().max() / 7.0).clamp(min=1e-8)
    q = torch.clamp((x32 / scale).round(), -8, 7).to(torch.int8)
    orig_last = q.size(-1)
    if orig_last % 2 == 1:
        q = torch.cat([q, torch.zeros_like(q[..., :1])], dim=-1)
    q_u = (q + 8).to(torch.uint8)
    packed = (q_u[..., 0::2] << 4) | q_u[..., 1::2]
    return packed.numpy(), float(scale), orig_last


@pytest.mark.parametrize("last_dim", [5, 7, 15])
def test_int4_odd_last_dim_matches_torch_reference(last_dim):
    rng = np.random.default_rng(10 + last_dim)
    x = rng.normal(scale=0.5, size=(2, 3, last_dim)).astype(np.float32)
    p_ref, s_ref, orig = _torch_int4_packed_odd(x)
    p, s = quantize_int4_packed(jnp.asarray(x), axes=(0, 1, 2))
    assert p.shape[-1] == (last_dim + 1) // 2
    assert np.array_equal(np.asarray(p), p_ref)
    assert np.isclose(float(s), s_ref, rtol=1e-6, atol=0)
    # round-trip through orig_last_dim truncation recovers the odd shape
    y = dequantize_int4_packed(p, s, orig_last_dim=orig)
    assert y.shape == x.shape
    bound = float(s) / 2 + 1e-6
    assert np.abs(np.asarray(y) - x).max() <= bound


def test_int4_odd_dim_pad_lane_is_zero_nibble():
    # the pad lane must encode exactly q=0 (nibble 8), reference ops.py:54-56
    x = jnp.asarray([[3.0, -3.0, 1.0]])
    p, s = quantize_int4_packed(x, axes=(0, 1))
    q = np.asarray(unpack_int4(p))
    assert q.shape[-1] == 4 and q[0, -1] == 0


def test_per_head_granularity_scales():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 4, 6, 16)).astype(np.float32)
    q, s = quantize_int8(jnp.asarray(x), axes=(0, 3))  # per (head, token)
    assert s.shape == (4, 6)
    y = dequantize_int8(q, jnp.asarray(s)[None, :, :, None])
    assert np.abs(np.asarray(y) - x).max() <= np.abs(x).max() / 127.0
