"""Pallas weight-streaming linear (gemv/skinny-gemm) kernels.

Decode at small batch is weight-bandwidth bound, and XLA's stock lowering
for [B<=8, E] x [E, F] only sustains ~130 GB/s of the chip's ~800 GB/s HBM
bandwidth (measured on v5e; see docs/BENCHMARKS.md). These kernels stream
the weight matrix through VMEM in [E, TILE_F] tiles with the Pallas
pipeline's double buffering, keeping the MXU fed at close to memory speed.

Two tiers:
* `pallas_linear`       — bf16/f32 weights;
* `pallas_linear_int8`  — int8 weights with per-output-channel scales,
  dequantized IN-KERNEL on the VMEM tile (XLA's convert+dot materializes a
  full-size bf16 copy in HBM instead, which measures *slower* than bf16 —
  fusion has to happen inside the kernel to win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_f(F: int) -> int:
    for t in (1024, 512, 256, 128):
        if F % t == 0:
            return t
    return F


def _linear_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_linear(x, w, interpret: bool = False):
    """x: [B, E]; w: [E, F] -> [B, F] (x.dtype out, f32 accumulation)."""
    B, E = x.shape
    F = w.shape[1]
    TF = _tile_f(F)
    out = pl.pallas_call(
        _linear_kernel,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), x.dtype),
        interpret=interpret,
    )(x, w)
    return out


def _linear_int8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)  # dequant on the VMEM tile
    y = jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (y * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_linear_int8(x, w_q, w_scale, interpret: bool = False):
    """x: [B, E]; w_q: [E, F] int8; w_scale: [1, F] f32 -> [B, F]."""
    B, E = x.shape
    F = w_q.shape[1]
    TF = _tile_f(F)
    out = pl.pallas_call(
        _linear_int8_kernel,
        grid=(F // TF,),
        in_specs=[
            pl.BlockSpec((B, E), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, TF), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F), x.dtype),
        interpret=interpret,
    )(x, w_q, w_scale)
    return out


def quantize_weight_int8(w, axis: int = 0):
    """Per-output-channel symmetric int8 weight quantization.

    w: [E, F] -> (w_q int8 [E, F], scale f32 [1, F]); reduction over `axis`
    (the contraction axis) so each output feature has one scale.
    """
    w32 = jnp.asarray(w, jnp.float32)
    max_abs = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(max_abs / 127.0, 1e-8)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_q, scale
