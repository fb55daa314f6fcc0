"""Pallas kernels vs jnp reference implementations (interpret mode on CPU).

SURVEY.md §4 test plan item (c): every kernel is validated against the
plain-jnp reference tier that itself matches the reference's numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_llm_inference_tpu.ops import quantization as qops
from efficient_llm_inference_tpu.ops.pallas import attention as pattn
from efficient_llm_inference_tpu.ops.pallas import dequant as pdq
from efficient_llm_inference_tpu.ops.pallas import quantize as pq


def test_dequant_int8_kernel():
    rng = np.random.default_rng(0)
    q = rng.integers(-127, 128, size=(6, 64), dtype=np.int8)
    scale = np.float32(0.0123)
    got = pdq.dequant_int8(jnp.asarray(q), scale, jnp.float32, interpret=True)
    ref = qops.dequantize_int8(jnp.asarray(q), scale, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_dequant_int8_kernel_per_row_scale():
    rng = np.random.default_rng(1)
    q = rng.integers(-127, 128, size=(6, 64), dtype=np.int8)
    scale = rng.uniform(0.001, 0.1, size=(6, 1)).astype(np.float32)
    got = pdq.dequant_int8(jnp.asarray(q), jnp.asarray(scale), jnp.float32, interpret=True)
    ref = qops.dequantize_int8(jnp.asarray(q), jnp.asarray(scale), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


@pytest.mark.parametrize("orig_last", [64, 63])
def test_dequant_int4_kernel(orig_last):
    rng = np.random.default_rng(2)
    x = rng.normal(size=(5, orig_last)).astype(np.float32)
    packed, scale = qops.quantize_int4_packed(jnp.asarray(np.pad(x, ((0, 0), (0, orig_last % 2)))), axes=(1,))
    got = pdq.dequant_int4_packed(
        packed, jnp.asarray(scale)[:, None], orig_last, jnp.float32, interpret=True
    )
    ref = qops.dequantize_int4_packed(packed, jnp.asarray(scale)[:, None], jnp.float32)[
        ..., :orig_last
    ]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_quantize_int8_kernel_matches_reference():
    rng = np.random.default_rng(3)
    x = rng.normal(scale=2.0, size=(8, 64)).astype(np.float32)
    q, s = pq.quantize_int8_rows(jnp.asarray(x), interpret=True)
    q_ref, s_ref = qops.quantize_int8(jnp.asarray(x), axes=(1,))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s)[:, 0], np.asarray(s_ref), rtol=1e-6)


def test_quantize_int4_kernel_matches_reference():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    p, s = pq.quantize_int4_rows(jnp.asarray(x), interpret=True)
    p_ref, s_ref = qops.quantize_int4_packed(jnp.asarray(x), axes=(1,))
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p_ref))
    np.testing.assert_allclose(np.asarray(s)[:, 0], np.asarray(s_ref), rtol=1e-6)


def _jnp_reference_attention(q, k_q, k_scale, v_q, v_scale, k_cur, v_cur, length, k_bits, v_bits):
    """Reference path: dequantize, overlay fp current token, masked softmax."""
    Hq, D = q.shape
    Hkv, C = k_q.shape[0], k_q.shape[1]

    def dq(buf, scale, bits):
        if bits == 8:
            x = qops.dequantize_int8(buf, scale[..., None], jnp.float32)
        else:
            x = qops.dequantize_int4_packed(buf, scale[..., None], jnp.float32)
        return x

    k = dq(k_q, k_scale, k_bits)  # [Hkv, C, D]
    v = dq(v_q, v_scale, v_bits)
    G = Hq // Hkv
    qg = q.reshape(Hkv, G, D).astype(jnp.float32)
    s = jnp.einsum("hgd,hcd->hgc", qg, k) / np.sqrt(D)
    mask = jnp.arange(C)[None, None, :] < length
    s = jnp.where(mask, s, jnp.finfo(jnp.float32).min)
    s_cur = jnp.einsum("hgd,hd->hg", qg, k_cur.astype(jnp.float32)) / np.sqrt(D)
    full = jnp.concatenate([s, s_cur[..., None]], axis=-1)
    p = jax.nn.softmax(full, axis=-1)
    out = jnp.einsum("hgc,hcd->hgd", p[..., :C], v)
    out = out + p[..., C:] * v_cur.astype(jnp.float32)[:, None, :]
    return out.reshape(Hq, D)


@pytest.mark.parametrize(
    "k_bits,v_bits,Hq,Hkv", [(8, 8, 4, 4), (4, 4, 4, 4), (8, 4, 4, 2), (4, 8, 8, 2)]
)
def test_fused_attention_decode(k_bits, v_bits, Hq, Hkv):
    rng = np.random.default_rng(5)
    C, D = 48, 64
    length = 37

    k_fp = rng.normal(size=(Hkv, C, D)).astype(np.float32)
    v_fp = rng.normal(size=(Hkv, C, D)).astype(np.float32)

    def quant(x, bits):
        if bits == 8:
            q, s = qops.quantize_int8(jnp.asarray(x), axes=(2,))
        else:
            q, s = qops.quantize_int4_packed(jnp.asarray(x), axes=(2,))
        return q, s  # scale [Hkv, C]

    k_q, k_s = quant(k_fp, k_bits)
    v_q, v_s = quant(v_fp, v_bits)
    q = jnp.asarray(rng.normal(size=(Hq, D)).astype(np.float32))
    k_cur = jnp.asarray(rng.normal(size=(Hkv, D)).astype(np.float32))
    v_cur = jnp.asarray(rng.normal(size=(Hkv, D)).astype(np.float32))

    got = pattn.fused_quant_attention_decode(
        q, k_q, k_s, v_q, v_s, k_cur, v_cur, length,
        k_bits=k_bits, v_bits=v_bits, interpret=True,
    )
    ref = _jnp_reference_attention(
        q, k_q, k_s, v_q, v_s, k_cur, v_cur, length, k_bits, v_bits
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
