"""Whole-step GPT-2 decode megakernel with QUANTIZED KV panes.

The north-star metric (BASELINE.json) is decode tokens/sec/chip WITH
INT4/INT8 KV — the reference's entire object of study is the quantized KV
cache (/root/reference/src/quantization/ops.py:136-290, which re-dequantizes
the whole cache to fp16 every step). The full-precision megakernel
(ops/pallas/megakernel.py) already streams weights at HBM speed but keeps
its KV panes in the model dtype, so the engine's quant_int8/int4/mixed
methods fell back to the slower XLA layer-scan path. This module is the
missing composition: the SAME whole-step kernel with int8 / packed-int4 /
mixed (K int8, V int4) KV storage, per-token fp32 scales, dequant fused
into the score/PV matmuls, and quantize-on-write in the aligned RMW —
quantization now buys BOTH memory and speed (half/quarter the per-layer KV
pane DMA).

Design notes (beyond megakernel.py's):

* TRANSPOSED attention orientation. Per-token scales multiply score ROW c —
  a [C, 1] column in the [C, H] orientation, which Mosaic can neither DMA
  compactly (any sublane-axis scale layout pads to 128 lanes in HBM) nor
  build from a lane vector (no lane->sublane reshapes). Computing scores as
  [H, C] instead makes the scale a [1, C] LANE vector: free broadcast, and
  the scale tables live compactly as [L, C] fp32 VMEM-resident arrays.
  scoresT = (selT * q) @ k8^T via a rhs-transposed dot_general (probed:
  Mosaic compiles (((1,), (1,)), ((), ())) natively), softmax statistics
  reduce over lanes ([H, 1]), the PV side is one [H, C] @ [C, E] matmul with
  V scales folded into the probabilities, and the head fold-back is a cheap
  sum(M * selT, axis=0).
* INT4 panes use HALF-SPLIT nibble pairing: byte lane j packs full-lane j
  (HIGH nibble, two's complement) with full-lane j + E/2 (LOW nibble,
  biased +8), stored as int8 = 16*q_hi + q_lo + 8. Unlike the reference's
  even/odd-in-D interleave (a Mosaic-hostile lane shuffle), both unpacked
  halves are contiguous lane blocks; dequantized VALUES are identical
  (pairing choice only decides which two values share a byte). In-kernel
  unpack reuses the weight tiles' float identity (megakernel_llama.py
  `_pack_halves`): lo = (byte & 0xF) - 8, hi = (byte_f - (byte_f & 0xF))/16
  — the byte's own sign extends the high nibble; no int8 vector shifts
  (Mosaic cannot legalize them) and no f32->uint8 casts (unsupported).
* Quantize-on-write reproduces the reference math exactly
  (ops/quantization.py: scale = max(max|x|/qmax, eps) in fp32, round
  half-to-even, clip): the new K/V rows quantize in-kernel, the packed rows
  enter the 8-row aligned RMW (probed: int8/uint8 8-row DMA slices and
  iota-inserts compile), and the new scales land at lane `cur` of the
  [L, C] tables with one masked select.
* Attention semantics match cache/kvcache.py QuantizedKV: past tokens are
  dequantized (scale applied on the fp32 score/PV accumulators — a ~1e-7
  reassociation vs the XLA path's dequantize-then-dot), the current token
  stays full-precision and merges into the same softmax.

The engine auto-selects this path for quant_int8/int4/mixed greedy batch-1
decode on TPU (engine._mega_quant_spec); tests run it in interpret mode on
CPU against the XLA QuantizedKV path (tests/test_megakernel_quant.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (
    _gpt2_int4_group,
    _gpt2_weight_mode,
    _num_lm_tiles,
    _tile_bytes,
    _S4_VMEM_MAX,
)
from .megakernel_llama import _int4_tile_dot, _s4_geom

NEG_INF = float(jnp.finfo(jnp.float32).min)

_VMEM_BUDGET = 40 * 1024 * 1024
_SCOPED_VMEM = 64 * 1024 * 1024
_ATTN_CHUNK = 512


def _kv_kinds(kv_mode: str) -> tuple[str, str]:
    """(k_kind, v_kind) — mirrors cache/kvcache.py QuantizedKV."""
    assert kv_mode in ("int8", "int4", "mixed"), kv_mode
    k_kind = "int8" if kv_mode in ("int8", "mixed") else "int4"
    v_kind = "int8" if kv_mode == "int8" else "int4"
    return k_kind, v_kind


def _pane_width(kind: str, E: int) -> int:
    return E if kind == "int8" else E // 2


def _pane_dtype(kind: str):
    return jnp.int8  # int4 panes pack as int8 = 16*q_hi + q_lo + 8


def unpack_halves(pk, dtype):
    """Half-split pane byte = 16*q_hi + (q_lo + 8) -> (q_hi, q_lo) values.

    The float identity (byte_f - lo_biased) carries 16 * signed hi value
    — the byte's own sign extends the nibble — so no int8 vector shifts
    (Mosaic cannot legalize them). THE decode for this packing: used by
    both quant megakernel attention loops and the prefix-cache dequant
    (engine/megaserver.py); change the packing only here + the packers.
    """
    lo_b = jnp.bitwise_and(pk, 0xF).astype(dtype)  # q_lo + 8, exact
    hi = (pk.astype(dtype) - lo_b) * 0.0625  # q_hi, exact
    return hi, lo_b - 8.0


def to_mega_quant_layout(buf: jax.Array, kind: str) -> jax.Array:
    """QuantizedKV buffer [L, 1, H, C, D(/2)] -> kernel pane (one-time).

    int8: [L, C, E] int8 (pure transpose/reshape). int4: unpack the
    reference's even/odd-in-D nibbles, then repack with the kernel's
    half-split pairing -> [L, C, E/2] int8 (16*q_hi + q_lo + 8, q_hi from
    lanes [0, E/2), q_lo from [E/2, E)). Values are preserved exactly.
    """
    L, B, H, C, Dp = buf.shape
    assert B == 1, "megakernel is single-stream"
    if kind == "int8":
        return buf[:, 0].transpose(0, 2, 1, 3).reshape(L, C, H * Dp)
    from ..quantization import unpack_int4

    q = unpack_int4(buf)  # [L, 1, H, C, D] int8 in [-8, 7]
    q = q[:, 0].transpose(0, 2, 1, 3).reshape(L, C, H * q.shape[-1])
    E = q.shape[-1]
    hi = q[..., : E // 2].astype(jnp.int32)
    lo = q[..., E // 2:].astype(jnp.int32)
    return (16 * hi + lo + 8).astype(jnp.int8)


def llama_mega_quant_supported(
    cfg, capacity: int, params: dict, kv_mode: str
) -> bool:
    """Llama-family quant-KV megakernel eligibility.

    Weight-side constraints are the fp kernel's (megakernel_llama.py
    mega_supported, checked at a minimal capacity); on top of that the
    quantized panes need 128-lane alignment (int4 halves the lane width)
    and the quant kernel's own VMEM envelope must fit.
    """
    from . import megakernel_llama as _ml

    if not _ml.mega_supported(cfg, 8, params):
        return False
    if capacity % 8 != 0:
        return False
    KW = cfg.n_kv_head * cfg.head_dim
    k_kind, v_kind = _kv_kinds(kv_mode)
    EK = _pane_width(k_kind, KW)
    EV = _pane_width(v_kind, KW)
    if EK % 128 != 0 or EV % 128 != 0:
        return False
    b = params["blocks"]
    mode = _ml._weight_mode(b)
    TR, TC, Ip = _ml._tile_geometry(cfg)
    G = _ml._q4_group(b["wq"]) if mode == "int4" else 0
    dt_item = jnp.dtype(params["embed"].dtype).itemsize
    slot = _ml._w_slot_bytes(
        mode, TR, TC, G, dt_item,
        2 * _ml._s4_half_rows(TR, G) if mode == "int4" else None,
    )
    return _llama_quant_fits(
        cfg, capacity, slot, EK, EV, KW, mode == "int8", TC,
        _llama_n_tiles(cfg, TR, TC, Ip),
    )


def _llama_n_tiles(cfg, TR: int, TC: int, Ip: int) -> int:
    from . import megakernel_llama as _ml

    return cfg.n_layer * _ml._tiles_per_layer(cfg, TR, TC, Ip) + (
        _ml._num_lm_tiles(cfg.vocab_size, TC) * (cfg.hidden_size // TR)
    )


def _llama_quant_fits(
    cfg, C: int, w_slot_bytes: int, EK: int, EV: int, KW: int,
    int8_w: bool, TC: int, n_tiles: int,
) -> bool:
    """VMEM envelope for the quant-KV Llama kernel at capacity C."""
    L, Hq = cfg.n_layer, cfg.n_head
    kv_ring = 2 * C * (EK + EV)  # 2-deep int8 rings for K and V
    scales = 4 * L * C * 4  # ks/vs in + out tables
    scratch = 9 * L * (EK + EV) + 2 * L * 512  # new rows, RMW, scale stash
    attn = 6 * min(C, _ATTN_CHUNK) * KW * 4 + 6 * Hq * C * 4
    ws = 4 * n_tiles * TC if int8_w else 0
    return (
        2 * w_slot_bytes + kv_ring + scales + scratch + attn + ws
        <= _VMEM_BUDGET
    )


def mega_quant_supported(
    cfg, capacity: int, params: dict, kv_mode: str
) -> bool:
    """Engine-side eligibility for the quant-KV GPT-2 megakernel."""
    b = params.get("blocks", {})
    mode = _gpt2_weight_mode(b)
    if mode is None:
        return False
    if mode == "int8" and "lm_q" not in params:
        return False
    if mode == "int4" and "lm_q4" not in params:
        return False
    E, L = cfg.n_embd, cfg.n_layer
    if E % 128 != 0 or capacity % 8 != 0:
        return False
    k_kind, v_kind = _kv_kinds(kv_mode)
    if "int4" in (k_kind, v_kind) and (E // 2) % 128 != 0:
        return False
    G = 0
    if mode == "int4":
        G = _gpt2_int4_group(params)
        if G == 0 or E % G or (E // 2) % G or E % 16:
            return False
    dt_item = jnp.dtype(params["wte"].dtype).itemsize
    ekb = _pane_width(k_kind, E)
    evb = _pane_width(v_kind, E)
    tile_b = _tile_bytes(mode, E, G, dt_item)
    C = capacity
    kv_ring = 2 * C * (ekb + evb)  # 2-deep ring for K and for V
    scales = 4 * L * C * 4  # [L, C] fp32 ks/vs, in+out copies
    scratch = (
        L * (ekb + evb)  # quantized new rows
        + 8 * L * (ekb + evb)  # RMW groups
        + 2 * L * 128 * 4  # new-scale stash
    )
    attn_tmp = 8 * min(C, _ATTN_CHUNK) * E * 4
    for tps in (3, 2, 1):
        if (
            2 * tps * tile_b + kv_ring + scales + scratch + attn_tmp
            <= _VMEM_BUDGET
        ):
            return True
    return False


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "kv_mode", "eps", "interpret")
)
def gpt2_megastep_quant(
    packed: dict,
    k: jax.Array,  # [L, C, EK] quantized pane (aliased output)
    v: jax.Array,  # [L, C, EV]
    ks: jax.Array,  # [L, C] fp32 per-token K scales (aliased output)
    vs: jax.Array,  # [L, C] fp32 per-token V scales
    length: jax.Array,  # int32 [] — tokens already cached
    x_emb: jax.Array,  # [1, E] token+position embedding (model dtype)
    *,
    cfg: Any,
    capacity: int,
    kv_mode: str,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """One full decode step over quantized KV panes.

    Returns (token id int32 [], new k, new v, new ks, new vs).
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    V = cfg.vocab_size
    ln_eps = cfg.layer_norm_epsilon
    n_lm = _num_lm_tiles(V, E)
    n_tiles = L * 12 + n_lm
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    k_kind, v_kind = _kv_kinds(kv_mode)
    EK = _pane_width(k_kind, E)
    EV = _pane_width(v_kind, E)
    kdt = _pane_dtype(k_kind)
    vdt = _pane_dtype(v_kind)
    dtype = x_emb.dtype  # compute/residual dtype (the model dtype)
    dt_item = jnp.dtype(dtype).itemsize
    s4_vmem = False
    if int4_w:
        G, n_gh, s4p = _s4_geom(E, packed)
        s4_rows = packed["w4scale"].shape[1]
        mode = "int4"
        s4_bytes = n_tiles * s4_rows * E * dt_item
        s4_vmem = s4_bytes <= _S4_VMEM_MAX
    else:
        G, n_gh, s4p = E, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
    tile_b = (E // 2) * E if s4_vmem else _tile_bytes(mode, E, G, dt_item)
    tps = 0
    kv_ring = 2 * C * (EK + EV)
    reserve = 4 * L * C * 4 + 9 * L * (EK + EV) + 2 * L * 512
    reserve += 8 * min(C, _ATTN_CHUNK) * E * 4
    for cand in (3, 2, 1):
        if 2 * cand * tile_b + kv_ring + reserve <= _VMEM_BUDGET:
            tps = cand
            break
    if tps == 0:
        raise ValueError("quant megakernel does not fit VMEM at this capacity")
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)
    E2 = E // 2

    def ln(x32, g, b_):  # x32,g,b_: [1, E] fp32
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + ln_eps) * g + b_

    def kernel(len_ref, x_ref, w_ref, k_ref, v_ref, ks_ref, vs_ref,
               sm_ref, lnf_ref, ws_ref, s4_ref,
               tok_ref, ko_ref, vo_ref, kso_ref, vso_ref, *scr):
        if int4_w and not s4_vmem:
            (wbuf, sbuf, kbuf, vbuf, q8k, q8v, ksn, vsn, gk, gv,
             wsem, ssem, ksem, vsem, gsem, osem) = scr
        else:
            (wbuf, kbuf, vbuf, q8k, q8v, ksn, vsn, gk, gv,
             wsem, ksem, vsem, gsem, osem) = scr
            sbuf = ssem = None
        cur = len_ref[0, 0]

        if int4_w:
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (E2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (E2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        # 0/1 head-segment selector, transposed: selT[h, e] = 1 iff e//D == h
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
        selT = (e_ids == h_ids).astype(jnp.float32).T  # [H, E]

        def wdma(slot, s):
            lo = s * tps
            sz = min(tps, n_tiles - lo)
            return pltpu.make_async_copy(
                w_ref.at[pl.ds(lo, sz)], wbuf.at[slot, pl.ds(0, sz)],
                wsem.at[slot],
            )

        def sdma(slot, s):
            lo = s * tps
            sz = min(tps, n_tiles - lo)
            return pltpu.make_async_copy(
                s4_ref.at[pl.ds(lo, sz)], sbuf.at[slot, pl.ds(0, sz)],
                ssem.at[slot],
            )

        def kdma(slot, l):
            return pltpu.make_async_copy(
                k_ref.at[l], kbuf.at[slot], ksem.at[slot]
            )

        def vdma(slot, l):
            return pltpu.make_async_copy(
                v_ref.at[l], vbuf.at[slot], vsem.at[slot]
            )

        gbase = pl.multiple_of((cur // 8) * 8, 8)

        def group_in(ref, buf, sem):
            return pltpu.make_async_copy(
                ref.at[:, pl.ds(gbase, 8), :], buf, sem
            )

        def group_out(buf, ref, sem):
            return pltpu.make_async_copy(
                buf, ref.at[:, pl.ds(gbase, 8), :], sem
            )

        wdma(0, 0).start()
        if int4_w and not s4_vmem:
            sdma(0, 0).start()
        kdma(0, 0).start()
        vdma(0, 0).start()
        gk_in = group_in(k_ref, gk, gsem.at[0])
        gv_in = group_in(v_ref, gv, gsem.at[1])
        gk_in.start()
        gv_in.start()

        waited = [False] * n_slabs

        def tile_slab(t):
            s = t // tps
            if not waited[s]:
                if s + 1 < n_slabs:
                    wdma((s + 1) % 2, s + 1).start()
                    if int4_w and not s4_vmem:
                        sdma((s + 1) % 2, s + 1).start()
                wdma(s % 2, s).wait()
                if int4_w and not s4_vmem:
                    sdma(s % 2, s).wait()
                waited[s] = True
            return s % 2, t % tps

        def mm(x_, t, b32=None):  # [1,E] @ tile(t) -> [1,E] fp32
            slab, off = tile_slab(t)
            if int4_w:
                st = s4_ref[t] if s4_vmem else sbuf[slab, off]
                y = _int4_tile_dot(
                    x_.astype(dtype), wbuf[slab, off], st,
                    gsel, E, G, n_gh, dtype, s4p,
                )
            else:
                y = jax.lax.dot_general(
                    x_.astype(dtype), wbuf[slab, off].astype(dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if int8_w:
                    y = y * ws_ref[t:t + 1]
            if b32 is not None:
                y = y + b32
            return y

        def dot_nt(a, b):  # [M, K] @ [N, K]^T -> [M, N] fp32
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_nn(a, b):  # [M, K] @ [K, N] -> [M, N] fp32
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # Pane-dot precision (round 4): v5e has no native f32 MXU — an f32
        # dot lowers to multiple bf16 passes, and the attention chunk dots
        # are LINEAR IN C, which made the quant kernel lose 20% to the bf16
        # kernel at 2k context. int8/nibble pane values and the
        # dtype-rounded query are EXACT in bf16, so the QK dot runs as ONE
        # bf16 pass with identical f32-accumulated results. The fp32
        # softmax probabilities round to dtype for the PV dot (~2^-9 on
        # probs — below the bf16 OUTPUT rounding the attention result gets
        # anyway, and measured: a compensated hi+lo two-pass split gave
        # back the whole win on int4 panes). With dtype == f32
        # (interpret-mode tests) both are exact identities.
        def dot_nt16(a32, b16):  # a32 dtype-exact f32, b16 pane in dtype
            return dot_nt(a32.astype(dtype), b16)

        def pv_dot(p32, b16):  # [M, C] f32 probs @ [C, N] dtype pane
            return dot_nn(p32.astype(dtype), b16)

        def unpack4(pk):  # [cw, E2] int8 -> (hi_vals, lo_vals) in dtype
            return unpack_halves(pk, dtype)

        def quant_row(x16, kind):
            """[1, E] dtype -> (q fp32 rounded/clipped, scale fp32 [1,1]).

            Exact reference math (ops/quantization.py:27-44,70-76):
            fp32 scale = max(max|x|/qmax, eps), round half-to-even, clip.
            """
            x32 = x16.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            if kind == "int8":
                s = jnp.maximum(amax * (1.0 / 127.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0)
            else:
                s = jnp.maximum(amax * (1.0 / 7.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -8.0, 7.0)
            return q, s

        x = x_ref[:].astype(dtype)  # [1, E] residual stream (model dtype)
        col_hc = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)

        for l in range(L):
            base = l * 12

            def sm(r):  # [1, E] fp32 smalls row
                return sm_ref[l, r:r + 1]

            h = ln(x.astype(jnp.float32), sm(0), sm(1)).astype(dtype)
            q32 = mm(h, base + 0, sm(4))
            k32 = mm(h, base + 1, sm(5))
            v32 = mm(h, base + 2, sm(6))
            kc16 = k32.astype(dtype)
            vc16 = v32.astype(dtype)

            # quantize-on-write: new K/V rows + their per-token scales
            qk, sk = quant_row(kc16, k_kind)
            qv, sv = quant_row(vc16, v_kind)
            if k_kind == "int8":
                q8k[l] = qk.astype(jnp.int8)
            else:
                q8k[l] = (
                    16.0 * qk[:, :E2] + qk[:, E2:] + 8.0
                ).astype(jnp.int8)
            if v_kind == "int8":
                q8v[l] = qv.astype(jnp.int8)
            else:
                q8v[l] = (
                    16.0 * qv[:, :E2] + qv[:, E2:] + 8.0
                ).astype(jnp.int8)
            ksn[l:l + 1, :] = jnp.broadcast_to(sk, (1, 128))
            vsn[l:l + 1, :] = jnp.broadcast_to(sv, (1, 128))

            # prefetch next layer's cache panes while attending this one
            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            # transposed attention over the quantized pane: scores as
            # [H, C] so per-token scales are free lane broadcasts
            qf = q32.astype(dtype).astype(jnp.float32)  # [1, E] (bf16 round)
            u = selT * qf  # [H, E] fp32 (zero outside each head's segment)
            raw_chunks = []
            for c0 in range(0, C, _ATTN_CHUNK):
                cw = min(_ATTN_CHUNK, C - c0)
                if k_kind == "int8":
                    kc = kbuf[l % 2, c0:c0 + cw, :].astype(dtype)
                    raw_chunks.append(dot_nt16(u, kc))  # [H, cw]
                else:
                    khi, klo = unpack4(kbuf[l % 2, c0:c0 + cw, :])
                    raw_chunks.append(
                        dot_nt16(u[:, :E2], khi) + dot_nt16(u[:, E2:], klo)
                    )
            raw = jnp.concatenate(raw_chunks, axis=1)  # [H, C]
            st = raw * ks_ref[l:l + 1, :] * scale  # per-token K scales
            st = jnp.where(col_hc < cur, st, NEG_INF)
            kcf = kc16.astype(jnp.float32)
            s_cur = jnp.sum(u * kcf, axis=1, keepdims=True) * scale  # [H, 1]
            mx = jnp.maximum(jnp.max(st, axis=1, keepdims=True), s_cur)
            p = jnp.exp(st - mx)  # [H, C] fp32
            p_cur = jnp.exp(s_cur - mx)  # [H, 1]
            denom = jnp.sum(p, axis=1, keepdims=True) + p_cur  # [H, 1]
            ps = p * vs_ref[l:l + 1, :]  # fold per-token V scales
            M = jnp.zeros((H, E), jnp.float32)
            for c0 in range(0, C, _ATTN_CHUNK):
                cw = min(_ATTN_CHUNK, C - c0)
                psc = ps[:, c0:c0 + cw]
                if v_kind == "int8":
                    vc = vbuf[l % 2, c0:c0 + cw, :].astype(dtype)
                    M = M + pv_dot(psc, vc)
                else:
                    vhi, vlo = unpack4(vbuf[l % 2, c0:c0 + cw, :])
                    M = M + jnp.concatenate(
                        [pv_dot(psc, vhi), pv_dot(psc, vlo)], axis=1
                    )
            vcf = vc16.astype(jnp.float32)
            num = M + p_cur * vcf  # current token, full-precision
            ao = jnp.sum(num * selT, axis=0, keepdims=True) / jnp.sum(
                denom * selT, axis=0, keepdims=True
            )  # [1, E]
            a = ao.astype(dtype)

            x = x + mm(a, base + 3, sm(7)).astype(dtype)

            h2 = ln(x.astype(jnp.float32), sm(2), sm(3)).astype(dtype)
            m32 = jnp.concatenate(
                [mm(h2, base + 4 + i, sm(8 + i)) for i in range(4)], axis=-1
            )  # [1, 4E] fp32
            g32 = 0.5 * m32 * (
                1.0
                + jnp.tanh(0.7978845608028654 * (m32 + 0.044715 * m32 ** 3))
            )
            gh = g32.astype(dtype)
            y32 = sm(12)
            for i in range(4):
                y32 = y32 + mm(gh[:, i * E:(i + 1) * E], base + 8 + i)
            x = x + y32.astype(dtype)

        # merge the quantized new K/V rows into their aligned 8-row groups
        # and write back, overlapped with the LM-head tile stream; the new
        # scales land at lane `cur` of the [L, C] tables
        gk_in.wait()
        gv_in.wait()
        ridx_k = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EK), 1)
        ridx_v = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EV), 1)
        ins_k = ridx_k == (cur - gbase)
        ins_v = ridx_v == (cur - gbase)
        gk[:] = jnp.where(ins_k, jnp.broadcast_to(q8k[:], (L, 8, EK)), gk[:])
        gv[:] = jnp.where(ins_v, jnp.broadcast_to(q8v[:], (L, 8, EV)), gv[:])
        okd = group_out(gk, ko_ref, osem.at[0])
        ovd = group_out(gv, vo_ref, osem.at[1])
        okd.start()
        ovd.start()

        lane_lc = jax.lax.broadcasted_iota(jnp.int32, (L, C), 1)
        kso_ref[:] = jnp.where(
            lane_lc == cur, jnp.broadcast_to(ksn[:, 0:1], (L, C)), ks_ref[:]
        )
        vso_ref[:] = jnp.where(
            lane_lc == cur, jnp.broadcast_to(vsn[:, 0:1], (L, C)), vs_ref[:]
        )

        xf = ln(
            x.astype(jnp.float32), lnf_ref[0:1], lnf_ref[1:2]
        ).astype(dtype)  # [1, E]
        best = jnp.float32(NEG_INF)
        best_idx = jnp.int32(0)
        lm_base = L * 12
        for t in range(n_lm):
            y = mm(xf, lm_base + t)  # [1, E] fp32 logits chunk
            if (t + 1) * E > V:  # mask vocab padding in the last tile
                cidx = jax.lax.broadcasted_iota(jnp.int32, (1, E), 1)
                y = jnp.where(cidx < V - t * E, y, NEG_INF)
            ymax = jnp.max(y)
            yarg = jnp.argmax(y).astype(jnp.int32) + t * E
            take = ymax > best  # strict: first max wins, as jnp.argmax
            best_idx = jnp.where(take, yarg, best_idx)
            best = jnp.maximum(best, ymax)
        tok_ref[0, 0] = best_idx

        okd.wait()
        ovd.wait()

    wtile_shape = (2, tps, E // 2, E) if int4_w else (2, tps, E, E)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]  # weight ring
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, tps, s4_rows, E), dtype))  # scale ring
    scratch += [
        pltpu.VMEM((2, C, EK), kdt),  # K ring (quantized)
        pltpu.VMEM((2, C, EV), vdt),  # V ring
        pltpu.VMEM((L, 1, EK), kdt),  # quantized new K rows
        pltpu.VMEM((L, 1, EV), vdt),  # quantized new V rows
        pltpu.VMEM((L, 128), jnp.float32),  # new K scales
        pltpu.VMEM((L, 128), jnp.float32),  # new V scales
        pltpu.VMEM((L, 8, EK), kdt),  # RMW group (K)
        pltpu.VMEM((L, 8, EV), vdt),  # RMW group (V)
        pltpu.SemaphoreType.DMA((2,)),  # wsem
    ]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # ssem
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),  # ksem
        pltpu.SemaphoreType.DMA((2,)),  # vsem
        pltpu.SemaphoreType.DMA((2,)),  # gsem
        pltpu.SemaphoreType.DMA((2,)),  # osem
    ]
    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # length (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, C, EK]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v  [L, C, EV]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks [L, C] fp32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smalls
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale [n_tiles, E]
            pl.BlockSpec(  # w4scale: VMEM-resident unless ring mode
                memory_space=pltpu.HBM
                if (int4_w and not s4_vmem) else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # token
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((L, C, EK), kdt),
            jax.ShapeDtypeStruct((L, C, EV), vdt),
            jax.ShapeDtypeStruct((L, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C), jnp.float32),
        ],
        scratch_shapes=scratch,
        input_output_aliases={3: 1, 4: 2, 5: 3, 6: 4},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=interpret,
    )
    wscale = packed.get("wscale")
    if wscale is None:  # constant-folded away by XLA on the fp path
        wscale = jnp.ones((n_tiles, E), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:  # never read on non-int4 paths
        w4scale = jnp.zeros((1, 1, 128), dtype)
    tok, k2, v2, ks2, vs2 = f(
        jnp.reshape(length.astype(jnp.int32), (1, 1)),
        x_emb,
        packed["wstack"],
        k,
        v,
        ks,
        vs,
        packed["smalls"],
        packed["lnf"],
        wscale,
        w4scale,
    )
    return tok[0, 0], k2, v2, ks2, vs2


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "kv_mode", "eps", "interpret")
)
def llama_megastep_quant(
    packed: dict,
    k: jax.Array,  # [L, C, EK] quantized pane (aliased output)
    v: jax.Array,  # [L, C, EV]
    ks: jax.Array,  # [L, C] fp32 per-token K scales (aliased output)
    vs: jax.Array,  # [L, C] fp32 per-token V scales
    length: jax.Array,  # int32 [] — tokens already cached
    x_emb: jax.Array,  # [1, E] token embedding (model dtype)
    cos_q: jax.Array,  # [1, Hq*D] f32 RoPE cos, tiled per head
    sin_q: jax.Array,  # [1, Hq*D] f32
    *,
    cfg: Any,
    capacity: int,
    kv_mode: str,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """One full Llama/Qwen decode step over quantized KV panes.

    Same weight-streaming skeleton as megakernel_llama._llama_megapass
    (uniform [TR, TC] tile grid, fori_loop layer walk, f/int8/grouped-int4
    weight tiers, Qwen qkv biases) with the GPT-2 quant kernel's cache
    treatment: int8 / packed-int4 panes, [L, C] fp32 per-token scale
    tables, quantize-on-write in the aligned 8-row RMW.

    GQA attention runs in a STACKED-ROTATION transposed orientation: the
    GR = Hq/Hkv query-head rotations concatenate into one [Hq, KW] operand
    (row r*Hkv + kv = query head kv*GR + r masked to KV head kv's lane
    segment), so each cache chunk costs ONE rhs-transposed score matmul and
    ONE PV matmul regardless of GR, per-token scales broadcast as [1, C]
    lane vectors, and softmax statistics reduce over lanes. The fp kernel's
    per-rotation segment-selector reductions (GR score + GR PV passes per
    chunk) collapse into matmuls with 4x the sublane occupancy.

    Returns (token id int32 [], new k, new v, new ks, new vs).
    """
    from . import megakernel_llama as _ml

    E = cfg.hidden_size
    Hq, Hkv, D, L = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_layer
    QW, KW = Hq * D, Hkv * D
    GR = Hq // Hkv
    C, V = capacity, cfg.vocab_size
    rms_eps = cfg.rms_eps
    TR, TC, Ip = _ml._tile_geometry(cfg)
    plan = _ml._layer_tile_plan(cfg, TR, TC, Ip)
    per_layer = sum(r * c for _, r, c in plan)
    n_lm = _ml._num_lm_tiles(V, TC)
    n_tiles = L * per_layer + n_lm * (E // TR)
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    has_bias = "qkvb" in packed
    k_kind, v_kind = _kv_kinds(kv_mode)
    EK = _pane_width(k_kind, KW)
    EV = _pane_width(v_kind, KW)
    dtype = x_emb.dtype  # compute/residual dtype (the model dtype)
    dt_item = jnp.dtype(dtype).itemsize
    s4_vmem = False
    if int4_w:
        G, n_gh, s4p = _s4_geom(TR, packed)
        s4_rows = packed["w4scale"].shape[1]
        gsel_bytes = (TR // 2) * n_gh * 4
        s4_bytes = n_tiles * s4_rows * TC * dt_item
        s4_vmem = not _ml._S4_RING_ONLY and _llama_quant_fits(
            cfg, C, (TR // 2) * TC, EK, EV, KW, False, TC, n_tiles
        ) and (
            gsel_bytes + s4_bytes + (TR // 2) * TC * 2 < _VMEM_BUDGET // 2
        )
        mode = "int4"
    else:
        G, n_gh, s4p = TR, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
    slot = (TR // 2) * TC if s4_vmem else _ml._w_slot_bytes(
        mode, TR, TC, G, dt_item, s4_rows or None
    )
    if not _llama_quant_fits(cfg, C, slot, EK, EV, KW, int8_w, TC, n_tiles):
        raise ValueError(
            "llama quant megakernel does not fit VMEM at this capacity"
        )
    scale = 1.0 / math.sqrt(float(D))
    half = D // 2
    KW2 = KW // 2

    name_off = {}
    off = 0
    for name, r, c in plan:
        name_off[name] = (off, r, c)
        off += r * c

    def rms(x, g32):  # x [1, W] dtype, g32 [1, W] f32 -> [1, W] dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + rms_eps)
        return y.astype(dtype) * g32.astype(dtype)

    def rot_half(x32, W):  # [1, W] f32, rotate-half within each D-lane head
        rp = jnp.concatenate([x32[:, W - half:], x32[:, :W - half]], axis=1)
        rm = jnp.concatenate([x32[:, half:], x32[:, :half]], axis=1)
        d = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) % D
        return jnp.where(d < half, -rm, rp)

    def kernel(len_ref, x_ref, cq_ref, sq_ref, w_ref, k_ref, v_ref,
               ks_ref, vs_ref, nm_ref, lnf_ref, ws_ref, qb_ref, s4_ref,
               tok_ref, ko_ref, vo_ref, kso_ref, vso_ref, *scr):
        if int4_w and not s4_vmem:
            (wbuf, sbuf, kbuf, vbuf, knew, vnew, ksn, vsn, gk, gv,
             wsem, ssem, ksem, vsem, gsem, osem) = scr
        else:
            (wbuf, kbuf, vbuf, knew, vnew, ksn, vsn, gk, gv,
             wsem, ksem, vsem, gsem, osem) = scr
            sbuf = ssem = None
        cur = len_ref[0, 0]

        if int4_w:
            r_ids = jax.lax.broadcasted_iota(
                jnp.int32, (TR // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (TR // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        # 0/1 KV-head segment selector, transposed: selT[h, kl] = 1 iff
        # kl // D == h
        kl_ids = jax.lax.broadcasted_iota(jnp.int32, (Hkv, KW), 1) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (Hkv, KW), 0)
        selT = (kl_ids == h_ids).astype(jnp.float32)  # [Hkv, KW]

        def wdma(slot_, t):
            return pltpu.make_async_copy(
                w_ref.at[t], wbuf.at[slot_], wsem.at[slot_]
            )

        def sdma(slot_, t):
            return pltpu.make_async_copy(
                s4_ref.at[t], sbuf.at[slot_], ssem.at[slot_]
            )

        def kdma(slot_, l):
            return pltpu.make_async_copy(k_ref.at[l], kbuf.at[slot_],
                                         ksem.at[slot_])

        def vdma(slot_, l):
            return pltpu.make_async_copy(v_ref.at[l], vbuf.at[slot_],
                                         vsem.at[slot_])

        gbase = pl.multiple_of((cur // 8) * 8, 8)

        def group_in(ref, buf, sem):
            return pltpu.make_async_copy(
                ref.at[:, pl.ds(gbase, 8), :], buf, sem
            )

        def group_out(buf, ref, sem):
            return pltpu.make_async_copy(
                buf, ref.at[:, pl.ds(gbase, 8), :], sem
            )

        wdma(0, 0).start()
        if int4_w and not s4_vmem:
            sdma(0, 0).start()
        kdma(0, 0).start()
        vdma(0, 0).start()
        gk_in = group_in(k_ref, gk, gsem.at[0])
        gv_in = group_in(v_ref, gv, gsem.at[1])
        gk_in.start()
        gv_in.start()

        def tile(t):
            """Depth-1 pipelined read of the sequential tile stream (see
            megakernel_llama: dynamic t keeps program size O(1) in tiles)."""
            slot_ = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < n_tiles)
            def _():
                wdma(nxt, t + 1).start()
                if int4_w and not s4_vmem:
                    sdma(nxt, t + 1).start()

            wdma(slot_, t).wait()
            if int4_w and not s4_vmem:
                sdma(slot_, t).wait()
            return slot_

        def tile_dot(xg, t):
            """[1, TR] @ tile t -> [1, TC] f32 (un-scaled for int8 tiles)."""
            slot_ = tile(t)
            if not int4_w:
                return jax.lax.dot_general(
                    xg, wbuf[pl.ds(slot_, 1)][0].astype(dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            pk = wbuf[pl.ds(slot_, 1)][0]
            if s4_vmem:
                st = s4_ref[pl.ds(t, 1)][0]
            else:
                st = sbuf[pl.ds(slot_, 1)][0]
            return _int4_tile_dot(xg, pk, st, gsel, TR, G, n_gh, dtype, s4p)

        def mm_chunks(x_, base, rg, cg):
            outs = []
            for c in range(cg):
                acc = None
                for g in range(rg):
                    t = base + c * rg + g
                    y = tile_dot(x_[:, g * TR:(g + 1) * TR].astype(dtype), t)
                    acc = y if acc is None else acc + y
                if int8_w:
                    acc = acc * ws_ref[pl.ds(base + c * rg, 1)]
                outs.append(acc)
            return outs

        def dot_nt(a, b):  # [M, K] @ [N, K]^T -> [M, N] fp32
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_nn(a, b):  # [M, K] @ [K, N] -> [M, N] fp32
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # Pane-dot precision (round 4, same rationale as the GPT-2 kernel
        # above): f32 MXU dots decompose into multiple bf16 passes and the
        # attention chunk dots are linear in C. Pane values are bf16-exact.
        # Rounding the roped query to dtype MATCHES the XLA path (whose
        # apply_rope returns model-dtype q); rounding the probs costs ~2^-9
        # — below the attention output's own dtype rounding. Identity when
        # dtype == f32 (interpret-mode tests).
        def split_nt(a32, b16):  # [M, K] f32 @ [N, K]^T dtype pane
            return dot_nt(a32.astype(dtype), b16)

        def pv_dot(p32, b16):  # [M, C] f32 probs @ [C, N] dtype pane
            return dot_nn(p32.astype(dtype), b16)

        def unpack4(pk):  # [cw, W/2] int8 -> (hi_vals, lo_vals) in dtype
            return unpack_halves(pk, dtype)

        def quant_row(x16, kind):
            """[1, KW] dtype -> (q fp32 rounded/clipped, scale fp32 [1,1]).

            Exact reference math (ops/quantization.py): fp32 scale =
            max(max|x|/qmax, eps), round half-to-even, clip.
            """
            x32 = x16.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            if kind == "int8":
                s = jnp.maximum(amax * (1.0 / 127.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0)
            else:
                s = jnp.maximum(amax * (1.0 / 7.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -8.0, 7.0)
            return q, s

        def pack_pane(q, kind):  # [1, KW] fp32 codes -> [1, EK/EV] int8
            if kind == "int8":
                return q.astype(jnp.int8)
            return (16.0 * q[:, :KW2] + q[:, KW2:] + 8.0).astype(jnp.int8)

        cosq = cq_ref[:]  # [1, QW] f32
        sinq = sq_ref[:]
        cosk, sink = cosq[:, :KW], sinq[:, :KW]  # D-periodic

        x = x_ref[:].astype(dtype)  # [1, E] residual stream
        col_qc = jax.lax.broadcasted_iota(jnp.int32, (Hq, C), 1)

        def layer_body(l, x):
            lbase = l * per_layer
            par = jax.lax.rem(l, 2)

            h = rms(x, nm_ref[pl.ds(l, 1), 0, :])
            qo, rq, cq_ = name_off["wq"]
            q32 = jnp.concatenate(mm_chunks(h, lbase + qo, rq, cq_), axis=-1)
            ko_, rk, ck = name_off["wk"]
            k32 = jnp.concatenate(mm_chunks(h, lbase + ko_, rk, ck), axis=-1)
            vo_, rv, cv = name_off["wv"]
            v32 = jnp.concatenate(mm_chunks(h, lbase + vo_, rv, cv), axis=-1)
            if has_bias:  # Qwen2: bias on the fp32 accumulator, as _mm does
                bias = qb_ref[pl.ds(l, 1), :]  # [1, QW + 2*KW] f32
                q32 = q32 + bias[:, :QW]
                k32 = k32 + bias[:, QW:QW + KW]
                v32 = v32 + bias[:, QW + KW:]

            # RoPE on the bf16-rounded projections (models/llama.py casts
            # the matmul result to the model dtype before apply_rope)
            qd = q32.astype(dtype).astype(jnp.float32)
            kd = k32.astype(dtype).astype(jnp.float32)
            q_rope = (qd * cosq + rot_half(qd, QW) * sinq).astype(dtype)
            k_rope = (kd * cosk + rot_half(kd, KW) * sink).astype(dtype)
            kc16 = k_rope  # [1, KW] dtype
            vc16 = v32.astype(dtype)

            # quantize-on-write: new K/V rows + their per-token scales
            qk, sk = quant_row(kc16, k_kind)
            qv, sv = quant_row(vc16, v_kind)
            knew[pl.ds(l, 1)] = pack_pane(qk, k_kind)[None]
            vnew[pl.ds(l, 1)] = pack_pane(qv, v_kind)[None]
            ksn[pl.ds(l, 1), :] = jnp.broadcast_to(sk, (1, 128))
            vsn[pl.ds(l, 1), :] = jnp.broadcast_to(sv, (1, 128))

            @pl.when(l + 1 < L)
            def _():
                nxt = jax.lax.rem(l + 1, 2)
                kdma(nxt, l + 1).start()
                vdma(nxt, l + 1).start()

            kdma(par, l).wait()
            vdma(par, l).wait()

            # stacked-rotation transposed GQA attention over the quantized
            # pane: U row r*Hkv + kv carries query head kv*GR + r masked to
            # KV head kv's lane segment
            qf = q_rope.astype(jnp.float32)  # [1, QW]
            q_rs = [
                jnp.concatenate(
                    [
                        qf[:, (kv * GR + r) * D:(kv * GR + r) * D + D]
                        for kv in range(Hkv)
                    ],
                    axis=1,
                )
                for r in range(GR)
            ]  # GR x [1, KW]
            U = jnp.concatenate(
                [selT * q_rs[r] for r in range(GR)], axis=0
            )  # [Hq, KW] f32
            kcur32 = kc16.astype(jnp.float32)  # [1, KW]
            vcur32 = vc16.astype(jnp.float32)

            raw_chunks = []
            for c0 in range(0, C, _ATTN_CHUNK):
                cw = min(_ATTN_CHUNK, C - c0)
                if k_kind == "int8":
                    kc = kbuf[pl.ds(par, 1), c0:c0 + cw, :][0].astype(dtype)
                    raw_chunks.append(split_nt(U, kc))  # [Hq, cw]
                else:
                    khi, klo = unpack4(
                        kbuf[pl.ds(par, 1), c0:c0 + cw, :][0])
                    raw_chunks.append(
                        split_nt(U[:, :KW2], khi)
                        + split_nt(U[:, KW2:], klo)
                    )
            raw = jnp.concatenate(raw_chunks, axis=1)  # [Hq, C]
            st = raw * ks_ref[pl.ds(l, 1), :] * scale  # per-token K scales
            st = jnp.where(col_qc < cur, st, NEG_INF)
            s_cur = jnp.sum(
                U * kcur32, axis=1, keepdims=True
            ) * scale  # [Hq, 1]
            mx = jnp.maximum(jnp.max(st, axis=1, keepdims=True), s_cur)
            p = jnp.exp(st - mx)  # [Hq, C] fp32
            p_cur = jnp.exp(s_cur - mx)  # [Hq, 1]
            denom = jnp.sum(p, axis=1, keepdims=True) + p_cur  # [Hq, 1]
            ps = p * vs_ref[pl.ds(l, 1), :]  # fold per-token V scales
            M = jnp.zeros((Hq, KW), jnp.float32)
            for c0 in range(0, C, _ATTN_CHUNK):
                cw = min(_ATTN_CHUNK, C - c0)
                psc = ps[:, c0:c0 + cw]
                if v_kind == "int8":
                    vc = vbuf[pl.ds(par, 1), c0:c0 + cw, :][0].astype(dtype)
                    M = M + pv_dot(psc, vc)
                else:
                    vhi, vlo = unpack4(
                        vbuf[pl.ds(par, 1), c0:c0 + cw, :][0])
                    M = M + jnp.concatenate(
                        [pv_dot(psc, vhi), pv_dot(psc, vlo)], axis=1
                    )
            num = M + p_cur * vcur32  # current token, full-precision

            # fold rotations back: per rotation r, rows r*Hkv..(r+1)*Hkv
            # collapse over sublanes into each KV head's lane segment, then
            # static lane slices interleave to query-head order [1, QW]
            ao_rs = []
            for r in range(GR):
                rows = slice(r * Hkv, (r + 1) * Hkv)
                nr = jnp.sum(num[rows] * selT, axis=0, keepdims=True)
                dr = jnp.sum(denom[rows] * selT, axis=0, keepdims=True)
                ao_rs.append(nr / dr)  # [1, KW]
            a = jnp.concatenate(
                [
                    ao_rs[hq % GR][:, (hq // GR) * D:(hq // GR) * D + D]
                    for hq in range(Hq)
                ],
                axis=1,
            ).astype(dtype)  # [1, QW]

            oo, ro, co = name_off["wo"]
            o32 = jnp.concatenate(mm_chunks(a, lbase + oo, ro, co), axis=-1)
            x = x + o32.astype(dtype)

            h2 = rms(x, nm_ref[pl.ds(l, 1), 1, :])
            go, rgt, cgt = name_off["w_gate"]
            g32 = jnp.concatenate(mm_chunks(h2, lbase + go, rgt, cgt),
                                  axis=-1)
            uo, ru, cu = name_off["w_up"]
            u32 = jnp.concatenate(mm_chunks(h2, lbase + uo, ru, cu), axis=-1)
            gate = (g32 * jax.nn.sigmoid(g32)).astype(dtype)
            prod = gate * u32.astype(dtype)
            do, rd, cd = name_off["w_down"]
            y32 = jnp.concatenate(mm_chunks(prod, lbase + do, rd, cd),
                                  axis=-1)
            return x + y32.astype(dtype)

        x = jax.lax.fori_loop(0, L, layer_body, x)

        # merge the quantized new K/V rows into their aligned 8-row groups
        # and write back, overlapped with the LM-head tile stream; the new
        # scales land at lane `cur` of the [L, C] tables
        gk_in.wait()
        gv_in.wait()
        ridx_k = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EK), 1)
        ridx_v = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EV), 1)
        ins_k = ridx_k == (cur - gbase)
        ins_v = ridx_v == (cur - gbase)
        gk[:] = jnp.where(ins_k, jnp.broadcast_to(knew[:], (L, 8, EK)), gk[:])
        gv[:] = jnp.where(ins_v, jnp.broadcast_to(vnew[:], (L, 8, EV)), gv[:])
        okd = group_out(gk, ko_ref, osem.at[0])
        ovd = group_out(gv, vo_ref, osem.at[1])
        okd.start()
        ovd.start()

        lane_lc = jax.lax.broadcasted_iota(jnp.int32, (L, C), 1)
        kso_ref[:] = jnp.where(
            lane_lc == cur, jnp.broadcast_to(ksn[:, 0:1], (L, C)), ks_ref[:]
        )
        vso_ref[:] = jnp.where(
            lane_lc == cur, jnp.broadcast_to(vsn[:, 0:1], (L, C)), vs_ref[:]
        )

        xf = rms(x, lnf_ref[:])  # [1, E] dtype
        lm_base = L * per_layer
        rg_lm = E // TR
        cidx = jax.lax.broadcasted_iota(jnp.int32, (1, TC), 1)
        big = jnp.int32(2 ** 30)

        def lm_body(t, carry):
            best, best_idx = carry  # [1, 1] f32 / int32
            acc = None
            for g in range(rg_lm):
                y = tile_dot(
                    xf[:, g * TR:(g + 1) * TR], lm_base + t * rg_lm + g
                )
                acc = y if acc is None else acc + y
            if int8_w:
                acc = acc * ws_ref[pl.ds(lm_base + t * rg_lm, 1)]
            acc = jnp.where(t * TC + cidx < V, acc, NEG_INF)
            ymax = jnp.max(acc, axis=1, keepdims=True)
            cand = jnp.min(
                jnp.where(acc == ymax, cidx, big), axis=1, keepdims=True
            ) + t * TC
            take = ymax > best  # strict: earlier tiles win ties
            return jnp.maximum(best, ymax), jnp.where(take, cand, best_idx)

        _, best_idx = jax.lax.fori_loop(
            0, n_lm, lm_body,
            (jnp.full((1, 1), NEG_INF, jnp.float32),
             jnp.zeros((1, 1), jnp.int32)),
        )
        tok_ref[:] = jnp.broadcast_to(best_idx, (1, 128))

        okd.wait()
        ovd.wait()

    wtile_shape = (2, TR // 2, TC) if int4_w else (2, TR, TC)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]  # weight ring (2-deep)
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, s4_rows, TC), dtype))  # scale ring
    scratch += [
        pltpu.VMEM((2, C, EK), jnp.int8),  # K ring (quantized)
        pltpu.VMEM((2, C, EV), jnp.int8),  # V ring
        pltpu.VMEM((L, 1, EK), jnp.int8),  # quantized new K rows
        pltpu.VMEM((L, 1, EV), jnp.int8),  # quantized new V rows
        pltpu.VMEM((L, 128), jnp.float32),  # new K scales
        pltpu.VMEM((L, 128), jnp.float32),  # new V scales
        pltpu.VMEM((L, 8, EK), jnp.int8),  # RMW group (K)
        pltpu.VMEM((L, 8, EV), jnp.int8),  # RMW group (V)
        pltpu.SemaphoreType.DMA((2,)),  # wsem
    ]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # ssem
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),  # ksem
        pltpu.SemaphoreType.DMA((2,)),  # vsem
        pltpu.SemaphoreType.DMA((2,)),  # gsem
        pltpu.SemaphoreType.DMA((2,)),  # osem
    ]
    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # length (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos_q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin_q
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, C, EK]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v  [L, C, EV]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks [L, C] fp32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norms [L, 2, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf [1, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale [n_tiles, TC]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkvb [L, QW+2KW]
            pl.BlockSpec(  # w4scale: VMEM-resident unless ring mode
                memory_space=pltpu.HBM
                if (int4_w and not s4_vmem) else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # token [1, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, C, EK), jnp.int8),
            jax.ShapeDtypeStruct((L, C, EV), jnp.int8),
            jax.ShapeDtypeStruct((L, C), jnp.float32),
            jax.ShapeDtypeStruct((L, C), jnp.float32),
        ],
        scratch_shapes=scratch,
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=interpret,
    )
    wscale = packed.get("wscale")
    if wscale is None:  # never read on the full-precision path
        wscale = jnp.ones((1, TC), jnp.float32)
    qkvb = packed.get("qkvb")
    if qkvb is None:  # never read when the model has no qkv biases
        qkvb = jnp.zeros((L, 1), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:  # never read on non-int4 paths
        w4scale = jnp.zeros((1, 1, 128), dtype)
    tok, k2, v2, ks2, vs2 = f(
        jnp.reshape(length.astype(jnp.int32), (1, 1)),
        x_emb,
        cos_q.astype(jnp.float32),
        sin_q.astype(jnp.float32),
        packed["wstack"],
        k,
        v,
        ks,
        vs,
        packed["norms"],
        packed["lnf"],
        wscale,
        qkvb,
        w4scale,
    )
    return tok[0, 0], k2, v2, ks2, vs2
