"""Pallas quantization kernels (per-row symmetric INT8 / packed INT4).

The reference quantizes in Python per token slice
(/root/reference/src/quantization/ops.py:10-65); here a single kernel
quantizes a whole [rows, D] block with one scale per row (a "row" is a
token, or a (head, token) pair for per-head granularity), matching the
reference's scale math exactly: fp32 max|x|, /qmax, eps clamp, round,
clamp, and for int4 the +8 nibble offset with even-index-high packing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _q8_kernel(x_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    max_abs = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(max_abs / 127.0, 1e-8)
    q_ref[:] = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    s_ref[:] = scale


def _q4_kernel(x_ref, p_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    max_abs = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(max_abs / 7.0, 1e-8)
    q = jnp.clip(jnp.round(x / scale), -8, 7).astype(jnp.int32) + 8
    hi = q[..., 0::2]
    lo = q[..., 1::2]
    p_ref[:] = ((hi << 4) | lo).astype(jnp.uint8)
    s_ref[:] = scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_rows(x, interpret: bool = False):
    """x: [rows, D] -> (q int8 [rows, D], scale f32 [rows, 1])."""
    q, s = pl.pallas_call(
        _q8_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, jnp.int8),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x)
    return q, s


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int4_rows(x, interpret: bool = False):
    """x: [rows, D] (even D) -> (packed uint8 [rows, D//2], scale [rows, 1])."""
    assert x.shape[-1] % 2 == 0
    p, s = pl.pallas_call(
        _q4_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], x.shape[1] // 2), jnp.uint8),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x)
    return p, s
