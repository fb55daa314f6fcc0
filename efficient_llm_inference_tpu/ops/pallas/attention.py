"""Fused dequant + attention decode kernel (the performance-critical path).

The reference dequantizes its ENTIRE quantized KV cache to fp16 and
re-materializes it every decode step (O(T) dequant work per token,
/root/reference/src/quantization/ops.py:212-269) — its CUDA kernels only
accelerate that materialization. The TPU-native design removes it: this
kernel reads the int8 / packed-int4 KV straight from the cache buffer and
fuses nibble-unpack + scale + QK^T + online softmax + PV into one pass, so
quantized KV traffic stays at its compressed size.

Decode shape (one new token, batch 1): grid over KV heads, each program
handles the full [C, D] stripe of one head plus that head's query group
(GQA: G = Hq/Hkv query heads share the stripe). The in-flight token's K/V
stays full-precision (reference semantics, benchmarker.py:473-477) and is
merged into the same softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _unpack_int4_deinterleaved(p):
    """Unpack nibbles into DEINTERLEAVED order: [evens..., odds...].

    Mosaic cannot interleave sub-32-bit vectors (minor-dim insertion), but
    attention score sums are invariant to a permutation of D applied to both
    operands — so the kernel works in deinterleaved-D space and the caller
    permutes q / current-token K/V (tiny [H, D] tensors) outside the kernel.
    """
    p32 = p.astype(jnp.int32)  # Mosaic can't shift sub-32-bit vectors
    hi = (p32 >> 4) & 0x0F
    lo = p32 & 0x0F
    return jnp.concatenate([hi, lo], axis=-1) - 8


def _deinterleave(x):
    """[..., D] -> [..., D] with evens first, odds second."""
    return jnp.concatenate([x[..., 0::2], x[..., 1::2]], axis=-1)


def _interleave(x):
    """Inverse of _deinterleave."""
    d = x.shape[-1] // 2
    return jnp.stack([x[..., :d], x[..., d:]], axis=-1).reshape(
        *x.shape[:-1], -1
    )


def _make_batched_kernel(kv_bits_k: int, kv_bits_v: int, D: int, C: int,
                         G: int, S: int, H: int, Bt: int):
    """Two-region batched decode attention: quantized past + fp extra block.

    Grid (B/Bt,) with Bt slots AND all KV heads fused into each program
    (per-program launch cost is ~5 us: a (slot, head) grid is DMA-overhead
    bound and even one-slot programs cost ~1 ms/step at B=16 x 12 layers).
    The program walks (slot, head) pairs with a fori_loop over [H, C, Ds]
    stripes and merges a small full-precision region of S positions (the
    staged chunk buffer, or just the current token when S == 1) into the
    same online softmax. Quantized values feed the MXU directly; scales
    fold into scores/probs, so no dequantized buffer ever exists anywhere.
    """
    scale = 1.0 / (D**0.5)

    def kernel(
        len_ref,  # SMEM scalar-prefetch: [B] int32 valid past (t < len)
        nex_ref,  # SMEM scalar-prefetch: [1] int32 valid extra (j < nex)
        q_ref,  # [Bt, H, G, D]
        kq_ref,  # [Bt, H, C, Ds]
        ks_ref,  # [Bt, H, 1, C] f32 per-(head,)token scales, lane-major
        vq_ref,
        vs_ref,
        ke_ref,  # [Bt, H, S, D] fp extra K
        ve_ref,  # [Bt, H, S, D] fp extra V
        o_ref,  # [Bt, H, G, D]
    ):
        b0 = pl.program_id(0) * Bt
        nex = nex_ref[0]
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        j_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
        d2 = D // 2

        def _nibbles(packed, dt):
            """hi/lo int4 planes WITHOUT the lane-concat: a dot over a
            deinterleaved D splits into (evens half) + (odds half), so the
            kernel computes two half-width dots and never shuffles lanes."""
            p32 = packed.astype(jnp.int32)
            hi = ((p32 >> 4) & 0x0F) - 8
            lo = (p32 & 0x0F) - 8
            return hi.astype(dt), lo.astype(dt)

        def _dot(a, bm):  # [G, D?] x [C, D?] -> [G, C]
            return jax.lax.dot_general(
                a, bm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def _pv(p, vm):  # [G, C] x [C, D?] -> [G, D?]
            return jax.lax.dot_general(
                p, vm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def head_body(idx, _):  # fori_loop: VMEM scratch reused per (slot, head)
            # Scales FOLD INTO scores/probs instead of dequantizing K/V:
            # s[g,c] = (q . k_q[c]) * ks[c] and p' = p * vs — the quantized
            # stripes feed the MXU directly (int8 is exact in bf16) and the
            # kernel never holds a dequantized [C, D] buffer, keeping scoped
            # VMEM flat in C (a full f32 dequant of every head OOMs at
            # C >= 1024).
            bb = idx // H
            h = idx % H
            length = len_ref[b0 + bb]
            q = q_ref[bb, h]  # [G, D], model dtype
            dt = q.dtype
            if kv_bits_k == 4:
                k_hi, k_lo = _nibbles(kq_ref[bb, h], dt)
                s_raw = _dot(q[:, :d2], k_hi) + _dot(q[:, d2:], k_lo)
            else:
                s_raw = _dot(q, kq_ref[bb, h].astype(dt) if kv_bits_k == 8
                             else kq_ref[bb, h])
            if kv_bits_k != 16:
                s_raw = s_raw * ks_ref[bb, h]  # [1, C] broadcast over G
            s_past = jnp.where(t_idx < length, s_raw * scale, NEG_INF)

            s_ex = _dot(q, ke_ref[bb, h]) * scale  # [G, S]
            s_ex = jnp.where(j_idx < nex, s_ex, NEG_INF)

            m = jnp.maximum(
                jnp.max(s_past, axis=-1, keepdims=True),
                jnp.max(s_ex, axis=-1, keepdims=True),
            )  # [G, 1]
            p_past = jnp.exp(s_past - m)
            p_ex = jnp.exp(s_ex - m)
            denom = (
                jnp.sum(p_past, axis=-1, keepdims=True)
                + jnp.sum(p_ex, axis=-1, keepdims=True)
            )
            if kv_bits_v != 16:
                pp = (p_past * vs_ref[bb, h]).astype(dt)  # fold V scales
            else:
                pp = p_past.astype(dt)
            if kv_bits_v == 4:
                v_hi, v_lo = _nibbles(vq_ref[bb, h], dt)
                out = jnp.concatenate(
                    [_pv(pp, v_hi), _pv(pp, v_lo)], axis=-1
                )  # [G, D] in deinterleaved order
            else:
                out = _pv(pp, vq_ref[bb, h].astype(dt) if kv_bits_v == 8
                          else vq_ref[bb, h])
            out = out + _pv(p_ex.astype(dt), ve_ref[bb, h])
            o_ref[bb, h] = (out / denom).astype(o_ref.dtype)
            return 0

        jax.lax.fori_loop(0, Bt * H, head_body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k_bits", "v_bits", "interpret")
)
def fused_quant_attention_batched(
    q,  # [B, Hq, D] fp queries (one decode row per slot)
    k_q,  # [B, Hkv, C, D] int8 or [B, Hkv, C, D//2] uint8
    k_scale,  # [B, Hkv, C] f32
    v_q,
    v_scale,
    k_extra,  # [B, Hkv, S, D] fp region (staged chunk / current token)
    v_extra,
    lengths,  # [B] int32: past positions t < lengths[b] are visible
    n_extra,  # int32 scalar: extra positions j < n_extra are visible
    k_bits: int = 8,
    v_bits: int = 8,
    interpret: bool = False,
):
    """Returns [B, Hq, D] (q's dtype). Reads the quantized KV at compressed
    size — the serving-path replacement for materializing a dequantized past
    every chunk (the reference pays this per STEP, ops.py:212-269).

    k_bits/v_bits: 8 = int8 + per-token scale, 4 = packed int4 + scale,
    16 = raw fp storage (scales ignored — lets the fp pool share this
    kernel and skip the per-step concat materialization)."""
    B, Hq, D = q.shape
    Hkv, C = k_q.shape[1], k_q.shape[2]
    S = k_extra.shape[2]
    G = Hq // Hkv

    if k_bits == 4:
        q = _deinterleave(q)
        k_extra = _deinterleave(k_extra)
    if v_bits == 4:
        v_extra = _deinterleave(v_extra)

    qg = q.reshape(B, Hkv, G, D)
    lengths = jnp.asarray(lengths, jnp.int32).reshape(B)
    nex = jnp.asarray(n_extra, jnp.int32).reshape(1)
    ks = k_scale.astype(jnp.float32)[:, :, None, :]  # [B, Hkv, 1, C]
    vs = v_scale.astype(jnp.float32)[:, :, None, :]

    # Slot-block size: as many slots per program as a ~3 MB input block
    # allows (the auto-pipeline double-buffers, so x2 in flight). One
    # program per slot measured ~5 us of fixed cost -> at B=16, 12 layers
    # that is ~1 ms/step of pure launch overhead; slot-blocking removes it.
    per_slot = Hkv * C * (k_q.shape[3] + v_q.shape[3] + 8) + 2 * Hkv * S * D * 2
    Bt = max(1, min(B, (3 << 20) // max(per_slot, 1)))
    while B % Bt:
        Bt -= 1

    kernel = _make_batched_kernel(k_bits, v_bits, D, C, G, S, Hkv, Bt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B // Bt,),
        in_specs=[
            pl.BlockSpec((Bt, Hkv, G, D), lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hkv, C, k_q.shape[3]),
                         lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hkv, 1, C), lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hkv, C, v_q.shape[3]),
                         lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hkv, 1, C), lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hkv, S, D), lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, Hkv, S, D), lambda b, ln, nx: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bt, Hkv, G, D), lambda b, ln, nx: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), q.dtype),
        interpret=interpret,
    )(lengths, nex, qg, k_q, ks, v_q, vs, k_extra, v_extra)
    out = out.reshape(B, Hq, D)
    if v_bits == 4:
        out = _interleave(out)
    return out


def _make_kernel(kv_bits_k: int, kv_bits_v: int, D: int, C: int, G: int):
    scale = 1.0 / (D**0.5)

    def kernel(
        len_ref,  # SMEM (1,1) int32: number of past tokens
        q_ref,  # [G, D] queries of this KV head's group
        kq_ref,  # [C, D] int8  or [C, D//2] uint8
        ks_ref,  # [C, 1] f32 per-token K scales for this head
        vq_ref,
        vs_ref,
        kc_ref,  # [G_pad?, D] -> [1, D] current-token K (fp)
        vc_ref,  # [1, D] current-token V (fp)
        o_ref,  # [G, D] out
    ):
        length = len_ref[0, 0]

        # Dequantize this head's K stripe in registers/VMEM.
        # (refs carry a leading block dim of 1 for the head axis)
        if kv_bits_k == 8:
            k = kq_ref[0].astype(jnp.float32) * ks_ref[0]
        else:
            k = _unpack_int4_deinterleaved(kq_ref[0]).astype(jnp.float32) * ks_ref[0]
        if kv_bits_v == 8:
            v = vq_ref[0].astype(jnp.float32) * vs_ref[0]
        else:
            v = _unpack_int4_deinterleaved(vq_ref[0]).astype(jnp.float32) * vs_ref[0]

        q = q_ref[0].astype(jnp.float32)  # [G, D]
        # scores over past tokens: [G, C]
        s_past = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        token_idx = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
        s_past = jnp.where(token_idx < length, s_past, NEG_INF)

        # current (fp) token score: [G, 1]
        kc = kc_ref[0].astype(jnp.float32)  # [1, D]
        s_cur = jax.lax.dot_general(
            q, kc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

        m = jnp.maximum(jnp.max(s_past, axis=-1, keepdims=True), s_cur)  # [G,1]
        p_past = jnp.exp(s_past - m)  # [G, C]
        p_cur = jnp.exp(s_cur - m)  # [G, 1]
        denom = jnp.sum(p_past, axis=-1, keepdims=True) + p_cur

        out = jax.lax.dot_general(
            p_past, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [G, D]
        out = out + p_cur * vc_ref[0].astype(jnp.float32)
        o_ref[0] = (out / denom).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("k_bits", "v_bits", "interpret")
)
def fused_quant_attention_decode(
    q,  # [Hq, D] fp queries for the new token
    k_q,  # [Hkv, C, D] int8 or [Hkv, C, D//2] uint8
    k_scale,  # [Hkv, C] f32 (per_token scales broadcast over heads upstream)
    v_q,
    v_scale,
    k_cur,  # [Hkv, D] fp current-token K
    v_cur,  # [Hkv, D] fp current-token V
    length,  # int32 scalar: number of valid past tokens in the buffer
    k_bits: int = 8,
    v_bits: int = 8,
    interpret: bool = False,
):
    """Returns [Hq, D] attention output (same dtype as q)."""
    Hq, D = q.shape
    Hkv = k_q.shape[0]
    C = k_q.shape[1]
    G = Hq // Hkv

    # int4 stripes dequantize into deinterleaved-D order inside the kernel;
    # permute the small fp tensors to match (see _unpack_int4_deinterleaved).
    if k_bits == 4:
        q = _deinterleave(q)
        k_cur = _deinterleave(k_cur)
    if v_bits == 4:
        v_cur = _deinterleave(v_cur)

    qg = q.reshape(Hkv, G, D)
    len_arr = jnp.asarray(length, jnp.int32).reshape(1, 1)
    ks = k_scale.astype(jnp.float32)[..., None]  # [Hkv, C, 1]
    vs = v_scale.astype(jnp.float32)[..., None]

    kernel = _make_kernel(k_bits, v_bits, D, C, G)
    out = pl.pallas_call(
        kernel,
        grid=(Hkv,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # length
            pl.BlockSpec((1, G, D), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, C, k_q.shape[2]), lambda h: (h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, C, 1), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, C, v_q.shape[2]), lambda h: (h, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, C, 1), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda h: (h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, D), lambda h: (h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Hkv, G, D), q.dtype),
        interpret=interpret,
    )(len_arr, qg, k_q, ks, v_q, vs, k_cur[:, None, :], v_cur[:, None, :])
    out = out.reshape(Hq, D)
    if v_bits == 4:
        out = _interleave(out)  # back to natural D order (fp32-safe)
    return out
