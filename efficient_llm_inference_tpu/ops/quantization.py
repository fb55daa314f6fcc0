"""Symmetric INT8 / packed-INT4 quantization ops (pure jnp reference tier).

Numerics reproduce /root/reference/src/quantization/ops.py:10-133 exactly:

* scales computed in float32: ``scale = clamp(max|x| / qmax, eps)`` with
  qmax = 127 (int8) / 7 (int4);
* values: ``q = clamp(round(x/scale), -127..127)`` int8, or
  ``clamp(round(x/scale), -8..7) + 8`` packed two-per-byte along the last
  axis with the EVEN element in the HIGH nibble (ops.py:59-63);
* dequant: ``q * scale`` in fp32 then cast (ops.py:90,121-133).

Unlike the reference (which quantizes one [B,H,1,D] token-slice per Python
call, ops.py:174-210), these are vectorized: `axes` selects the reduction
axes for the scale so a whole [B,H,T,D] block is quantized with per-token
(or per-head-per-token) scales in one XLA op. The Pallas fused tier lives in
ops/pallas/.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _scale(x32: jax.Array, qmax: float, axes, eps: float) -> jax.Array:
    max_abs = jnp.max(jnp.abs(x32), axis=axes, keepdims=True)
    return jnp.maximum(max_abs / qmax, eps)


def quantize_int8(
    x: jax.Array, axes: Sequence[int] = (), eps: float = 1e-8
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric INT8 quantization (reference ops.py:10-30).

    Returns (q int8 with x's shape, scale fp32 with reduced axes squeezed).
    `axes=()` quantizes per-element... pass the axes to reduce for the scale;
    e.g. for x=[B,H,T,D] use axes=(0,1,3) for one scale per token.
    """
    x32 = x.astype(jnp.float32)
    scale = _scale(x32, 127.0, tuple(axes), eps)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=tuple(axes))


def dequantize_int8(q: jax.Array, scale: jax.Array, out_dtype=jnp.float32) -> jax.Array:
    """INT8 dequantize: q * scale in fp32, cast to out_dtype (ops.py:90).

    `scale` must be broadcastable against q's shape.
    """
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(out_dtype)


def quantize_int4_packed(
    x: jax.Array, axes: Sequence[int] = (), eps: float = 1e-8
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric INT4 quantization packed 2-per-byte along the last axis.

    Reproduces reference ops.py:33-65: scale = max|x|/7, clamp [-8,7], +8 to
    unsigned nibble, even index in the high nibble. An ODD last dimension is
    zero-padded by one element before packing (reference ops.py:54-56 tracks
    this as `orig_last_dim`); pass `orig_last_dim` to
    :func:`dequantize_int4_packed` to slice the pad lane off again. The scale
    is computed on the unpadded values (the pad is zero, so it never affects
    max|x| anyway).

    Returns (packed uint8 [..., ceil(D/2)], scale fp32, reduced axes squeezed).
    """
    x32 = x.astype(jnp.float32)
    scale = _scale(x32, 7.0, tuple(axes), eps)
    q = jnp.clip(jnp.round(x32 / scale), -8, 7).astype(jnp.int8)
    if x.shape[-1] % 2 == 1:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, 1)]
        q = jnp.pad(q, pad)  # pad quantizes to 0 -> nibble 8 after offset
    q_u = (q + 8).astype(jnp.uint8)
    hi = q_u[..., 0::2]
    lo = q_u[..., 1::2]
    packed = (hi << 4) | lo
    return packed, jnp.squeeze(scale, axis=tuple(axes))


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Unpack uint8 nibbles -> int8 in [-8, 7], interleaved (hi=even, lo=odd)."""
    hi = (packed >> 4) & 0x0F
    lo = packed & 0x0F
    q_u = jnp.stack([hi, lo], axis=-1).reshape(*packed.shape[:-1], -1)
    return (q_u.astype(jnp.int8) - 8).astype(jnp.int8)


def dequantize_int4_packed(
    packed: jax.Array,
    scale: jax.Array,
    out_dtype=jnp.float32,
    orig_last_dim: int | None = None,
) -> jax.Array:
    """Packed INT4 dequantize (reference ops.py:121-133).

    `scale` must be broadcastable against the *unpacked* shape
    [..., 2*packed.shape[-1]]. `orig_last_dim` slices off the zero pad lane
    when the original last dimension was odd (reference ops.py:114-133).
    """
    q = unpack_int4(packed)
    if orig_last_dim is not None and orig_last_dim != q.shape[-1]:
        q = q[..., :orig_last_dim]
    return (q.astype(jnp.float32) * scale.astype(jnp.float32)).astype(out_dtype)
