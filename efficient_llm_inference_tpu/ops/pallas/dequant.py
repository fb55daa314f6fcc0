"""Standalone Pallas dequantization kernels.

TPU-native parity tier for the reference's two CUDA kernels
(/root/reference/src/cuda/extensions.py:37-68: `dequant_int8_fp16_kernel`,
`dequant_int4_packed_fp16_kernel`). Element-wise VPU work, tiled over rows;
scale can be scalar (reference semantics) or per-row (our per-token scales).

These exist for parity and for materializing paths; the performance path is
the FUSED dequant+attention kernel in ops/pallas/attention.py, which never
materializes the dequantized cache (the reference's kernels only accelerate
a materialization the TPU design avoids entirely).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dq8_kernel(q_ref, s_ref, o_ref):
    o_ref[:] = (q_ref[:].astype(jnp.float32) * s_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _dq4_kernel(p_ref, s_ref, o_ref):
    # Upcast to int32 before shifting (Mosaic can't shift sub-32-bit
    # vectors) and emit DEINTERLEAVED order [evens..., odds...] — Mosaic
    # can't interleave minor dims; the wrapper re-interleaves in XLA.
    p = p_ref[:].astype(jnp.int32)
    hi = (p >> 4) & 0x0F
    lo = p & 0x0F
    q = jnp.concatenate([hi, lo], axis=-1) - 8
    o_ref[:] = (q.astype(jnp.float32) * s_ref[:].astype(jnp.float32)).astype(
        o_ref.dtype
    )


def _rows_2d(x):
    """Collapse to [rows, last] (kernels are rank-2)."""
    return x.reshape(-1, x.shape[-1])


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def dequant_int8(q, scale, out_dtype=jnp.bfloat16, interpret: bool = False):
    """q: [..., D] int8; scale: scalar or broadcastable [..., 1] -> [..., D]."""
    q2 = _rows_2d(q)
    s2 = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), q.shape).reshape(
        q2.shape
    )
    out = pl.pallas_call(
        _dq8_kernel,
        out_shape=jax.ShapeDtypeStruct(q2.shape, out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q2, s2)
    return out.reshape(q.shape)


@functools.partial(
    jax.jit, static_argnames=("orig_last_dim", "out_dtype", "interpret")
)
def dequant_int4_packed(
    packed, scale, orig_last_dim: int, out_dtype=jnp.bfloat16, interpret: bool = False
):
    """packed: [..., D//2] uint8 -> [..., orig_last_dim] (pad lane sliced off,
    reference extensions.py:114-119).

    `scale` must be constant along the last axis (scalar / per-row), which
    holds for all quantization granularities here — the kernel works in
    deinterleaved nibble order and the interleave happens outside in XLA.
    """
    p2 = _rows_2d(packed)
    full = p2.shape[-1] * 2
    s2 = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32), (*packed.shape[:-1], full)
    ).reshape(-1, full)
    out = pl.pallas_call(
        _dq4_kernel,
        out_shape=jax.ShapeDtypeStruct((p2.shape[0], full), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p2, s2)
    # kernel output order is [evens..., odds...]; interleave back (XLA-side)
    half = full // 2
    out = jnp.stack([out[:, :half], out[:, half:]], axis=-1).reshape(
        out.shape[0], full
    )
    out = out.reshape(*packed.shape[:-1], full)
    return out[..., :orig_last_dim]
