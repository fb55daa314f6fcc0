"""Batched two-region fused quantized attention kernel vs jnp reference.

The kernel (ops/pallas/attention.py:fused_quant_attention_batched) is the
serving path's attention: quantized past read at compressed size + fp staged
region, batched over slots with per-slot lengths. Interpret mode on CPU must
match a straightforward jnp implementation of the same math.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from efficient_llm_inference_tpu.ops.pallas.attention import (
    fused_quant_attention_batched,
)
from efficient_llm_inference_tpu.ops.quantization import (
    dequantize_int4_packed,
    dequantize_int8,
    quantize_int4_packed,
    quantize_int8,
)

NEG = float(np.finfo(np.float32).min)


def _jnp_reference(q, k_fp, v_fp, k_ex, v_ex, lengths, n_extra):
    """Dense two-region attention: [B,Hq,D] out."""
    B, Hq, D = q.shape
    Hkv, C = k_fp.shape[1], k_fp.shape[2]
    S = k_ex.shape[2]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, D).astype(np.float32)
    k_all = np.concatenate([k_fp, k_ex], axis=2).astype(np.float32)
    v_all = np.concatenate([v_fp, v_ex], axis=2).astype(np.float32)
    s = np.einsum("bhgd,bhcd->bhgc", qg, k_all) / np.sqrt(D)
    t = np.arange(C + S)
    mask = np.where(
        t[None, :] < C,
        t[None, :] < lengths[:, None],
        (t[None, :] - C) < n_extra,
    )  # [B, C+S]
    s = np.where(mask[:, None, None, :], s, NEG)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    out = np.einsum("bhgc,bhcd->bhgd", p, v_all)
    return out.reshape(B, Hq, D)


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("G", [1, 2])
def test_batched_kernel_matches_reference(bits, G):
    rng = np.random.default_rng(0)
    B, Hkv, C, S, D = 3, 2, 32, 5, 16
    Hq = Hkv * G
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    k_ex = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v_ex = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    lengths = np.array([0, 7, 32], np.int32)
    n_extra = 3

    # quantize per (slot, token) over heads+D — serving-pool granularity
    if bits == 8:
        kq, ksc = quantize_int8(jnp.asarray(k), axes=(1, 3))
        vq, vsc = quantize_int8(jnp.asarray(v), axes=(1, 3))
        k_fp = np.asarray(dequantize_int8(kq, ksc[:, None, :, None]))
        v_fp = np.asarray(dequantize_int8(vq, vsc[:, None, :, None]))
    else:
        kq, ksc = quantize_int4_packed(jnp.asarray(k), axes=(1, 3))
        vq, vsc = quantize_int4_packed(jnp.asarray(v), axes=(1, 3))
        k_fp = np.asarray(dequantize_int4_packed(kq, ksc[:, None, :, None]))
        v_fp = np.asarray(dequantize_int4_packed(vq, vsc[:, None, :, None]))

    want = _jnp_reference(q, k_fp, v_fp, k_ex, v_ex, lengths, n_extra)
    got = fused_quant_attention_batched(
        jnp.asarray(q),
        kq,
        jnp.broadcast_to(jnp.asarray(ksc)[:, None, :], (B, Hkv, C)),
        vq,
        jnp.broadcast_to(jnp.asarray(vsc)[:, None, :], (B, Hkv, C)),
        jnp.asarray(k_ex),
        jnp.asarray(v_ex),
        jnp.asarray(lengths),
        jnp.int32(n_extra),
        k_bits=bits,
        v_bits=bits,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_zero_length_slot_attends_extra_only():
    """A slot with no past must softmax purely over the extra region."""
    rng = np.random.default_rng(1)
    B, Hkv, C, S, D = 1, 1, 16, 4, 16
    q = rng.standard_normal((B, Hkv, D)).astype(np.float32)
    k = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    v = rng.standard_normal((B, Hkv, C, D)).astype(np.float32)
    k_ex = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    v_ex = rng.standard_normal((B, Hkv, S, D)).astype(np.float32)
    kq, ksc = quantize_int8(jnp.asarray(k), axes=(1, 3))
    vq, vsc = quantize_int8(jnp.asarray(v), axes=(1, 3))
    want = _jnp_reference(
        q,
        np.asarray(dequantize_int8(kq, ksc[:, None, :, None])),
        np.asarray(dequantize_int8(vq, vsc[:, None, :, None])),
        k_ex, v_ex, np.array([0], np.int32), 1,
    )
    got = fused_quant_attention_batched(
        jnp.asarray(q), kq,
        jnp.broadcast_to(jnp.asarray(ksc)[:, None, :], (B, Hkv, C)), vq,
        jnp.broadcast_to(jnp.asarray(vsc)[:, None, :], (B, Hkv, C)),
        jnp.asarray(k_ex), jnp.asarray(v_ex),
        jnp.asarray([0], jnp.int32), jnp.int32(1),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)
