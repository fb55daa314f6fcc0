"""Pallas weight-streaming linear kernels vs jnp (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from efficient_llm_inference_tpu.ops.pallas.linear import (
    pallas_linear,
    pallas_linear_int8,
    quantize_weight_int8,
)


@pytest.mark.parametrize("B,E,F", [(1, 64, 256), (4, 128, 512)])
def test_pallas_linear_matches_jnp(B, E, F):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, F)).astype(np.float32))
    got = pallas_linear(x, w, interpret=True)
    ref = jnp.einsum("be,ef->bf", x, w, preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_linear_int8_matches_dequant_matmul():
    rng = np.random.default_rng(1)
    B, E, F = 2, 64, 256
    x = jnp.asarray(rng.normal(size=(B, E)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(E, F)).astype(np.float32))
    w_q, w_scale = quantize_weight_int8(w)
    got = pallas_linear_int8(x, w_q, w_scale, interpret=True)
    w_deq = w_q.astype(jnp.float32) * w_scale
    ref = jnp.einsum("be,ef->bf", x, w_deq, preferred_element_type=jnp.float32)
    # kernel computes in bf16; tolerance reflects bf16 mantissa
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-1)


def test_weight_quantization_error_bound():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(64, 128)).astype(np.float32)
    w_q, s = quantize_weight_int8(jnp.asarray(w))
    w_deq = np.asarray(w_q, np.float32) * np.asarray(s)
    bound = np.abs(w).max(axis=0) / 127.0 / 2 + 1e-6
    assert (np.abs(w_deq - w).max(axis=0) <= bound).all()
