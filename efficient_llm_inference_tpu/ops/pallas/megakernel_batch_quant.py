"""Batched whole-step decode megakernel over QUANTIZED KV panes.

Composition of the two round-2/3 kernels:

* `megakernel_batch.py` — B independent streams ride ONE weight-streaming
  pass per step (the per-step weight stream, the dominant cost at small
  batch, is paid once for B tokens);
* `megakernel_quant.py` — int8 / packed-int4 / mixed KV panes with per-token
  fp32 scales, dequant fused into the score/PV matmuls, quantize-on-write in
  the aligned 8-row RMW (the north-star composition vs the reference's
  per-step full dequant, /root/reference/src/quantization/ops.py:212-269).

Batched serving is where quantized KV matters MOST on TPU: the [B, C, W]
per-layer pane DMA grows linearly with both batch and context, so at serving
shapes the pane stream overtakes the weight stream as the bandwidth bound.
int8 panes halve it, int4 quarters it — which also doubles/quadruples the
(batch x capacity) envelope that fits the VMEM pane ring (a bf16 16-slot
1024-token GPT-2 pool does NOT fit the ring budget; the int8 pool does).

Design notes beyond the parents':

* Per-(slot, token) scales live as [L, B, C] fp32 VMEM tables (pane-major,
  like the [L, B, C, W] panes). In-kernel reads use the proven
  `ref[pl.ds(l, 1), b, :]` -> [1, C] lane-vector pattern; the end-of-step
  scale writeback is ONE vectorized select over the whole table — the
  per-slot cursor vector [1, B, 1] is assembled from the SMEM length
  scalars, so no per-slot sub-tile writes are needed (Mosaic cannot address
  middle-axis single-slot writes).
* Attention runs per slot in the TRANSPOSED orientation of
  megakernel_quant.py ([H, C] scores; GQA uses the stacked-rotation [Hq, KW]
  operand), so per-token scales broadcast as free [1, C] lane vectors.
* Prefill stays on the fast dense XLA path; `quantize_panes_batch` converts
  the dense prefill panes once with the reference's exact scale math
  (per-token fp32 amax/qmax, round half-to-even, clip) — identical values
  to QuantizedKV's quantize-on-write since prefill attention keeps the whole
  prompt block full-precision in both paths.

Per-row numerics equal the single-stream quant megakernel exactly in fp32
(row-wise matmuls are independent); tests/test_megakernel_batch_quant.py
asserts per-row token-exact decode against the engine's quant methods in
interpret mode.
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
)
from .megakernel_llama import _int4_tile_dot, _s4_geom
from .megakernel_quant import _kv_kinds, _pane_width

NEG_INF = float(jnp.finfo(jnp.float32).min)

_VMEM_BUDGET = 40 * 1024 * 1024
_SCOPED_VMEM = 64 * 1024 * 1024
_ATTN_CHUNK = 256  # as megakernel_batch.py (B unrolled per-row bodies)
_S4_VMEM_MAX = 4 * 1024 * 1024


# ---------------------------------------------------------------------------
# One-time prefill conversion: dense panes -> quantized panes + scale tables
# ---------------------------------------------------------------------------

def _quant_pane_tokens(x: jax.Array, kind: str, eps: float):
    """[L, B, C, W] model-dtype pane -> ([L, B, C, W(/2)] int8, [L, B, C] f32).

    Exact reference scale math per (slot, token) row
    (ops/quantization.py:27-44): fp32 scale = max(max|x|/qmax, eps), round
    half-to-even, clip; int4 packs with the kernels' half-split pairing
    (byte = 16*q_hi + q_lo + 8, hi from lanes [0, W/2), lo from [W/2, W)).
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    if kind == "int8":
        s = jnp.maximum(amax * (1.0 / 127.0), eps)
        q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0)
        codes = q.astype(jnp.int8)
    else:
        s = jnp.maximum(amax * (1.0 / 7.0), eps)
        q = jnp.clip(jnp.round(x32 / s), -8.0, 7.0)
        W2 = q.shape[-1] // 2
        codes = (16.0 * q[..., :W2] + q[..., W2:] + 8.0).astype(jnp.int8)
    return codes, s[..., 0]


def quantize_panes_batch(kb: jax.Array, vb: jax.Array, kv_mode: str,
                         eps: float = 1e-8):
    """Dense [L, B, C, W] K/V mega-layout panes -> quantized panes + scales.

    Returns (k8 [L, B, C, EK] int8, v8 [L, B, C, EV] int8,
    ks [L, B, C] f32, vs [L, B, C] f32).
    """
    k_kind, v_kind = _kv_kinds(kv_mode)
    k8, ks = _quant_pane_tokens(kb, k_kind, eps)
    v8, vs = _quant_pane_tokens(vb, v_kind, eps)
    return k8, v8, ks, vs


# ---------------------------------------------------------------------------
# Eligibility / VMEM envelopes
# ---------------------------------------------------------------------------

def _pick_tps_batch_quant(
    E: int, EK: int, EV: int, C: int, B: int, L: int, tile_bytes: int,
    extra: int = 0,
) -> int:
    """Largest slab (1..3 tiles) whose rings + batch scratch fit the budget."""
    kv_ring = 2 * B * C * (EK + EV)  # 2-deep int8 rings for K and V
    rows = L * B * (EK + EV)  # knew/vnew
    stash = 2 * L * B * 128 * 4  # new-scale stashes
    rmw = B * L * 8 * (EK + EV)  # per-slot RMW windows
    scales = 4 * L * B * C * 4  # ks/vs in + out tables
    attn = 8 * min(C, _ATTN_CHUNK) * E * 4  # fp32 attention temporaries
    for tps in (3, 2, 1):
        if (2 * tps * tile_bytes + kv_ring + rows + stash + rmw + scales
                + attn + extra <= _VMEM_BUDGET):
            return tps
    return 0


def mega_batch_quant_supported(
    cfg, capacity: int, params: dict, batch: int, kv_mode: str
) -> bool:
    """Engine-side eligibility for the batched quant-KV GPT-2 megakernel."""
    b = params.get("blocks", {})
    mode = _gpt2_weight_mode(b)
    if mode is None:
        return False
    if mode == "int8" and "lm_q" not in params:
        return False
    if mode == "int4" and "lm_q4" not in params:
        return False
    E = cfg.n_embd
    if E % 128 != 0 or capacity % 8 != 0 or batch < 1:
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
    return _pick_tps_batch_quant(
        E, _pane_width(k_kind, E), _pane_width(v_kind, E), capacity, batch,
        cfg.n_layer, _tile_bytes(mode, E, G, dt_item),
    ) > 0


def llama_mega_batch_quant_supported(
    cfg, capacity: int, params: dict, batch: int, kv_mode: str
) -> bool:
    """Engine-side eligibility for the batched quant-KV Llama megakernel."""
    from .megakernel_batch import llama_mega_batch_supported
    from . import megakernel_llama as _ml

    # structural weight-side constraints are the fp batch kernel's, checked
    # at a minimal capacity (its pane-ring envelope does not apply here)
    if not llama_mega_batch_supported(cfg, 8, params, 1):
        return False
    if capacity % 8 != 0 or batch < 1:
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
    n_tiles = cfg.n_layer * _ml._tiles_per_layer(cfg, TR, TC, Ip) + (
        _ml._num_lm_tiles(cfg.vocab_size, TC) * (cfg.hidden_size // TR)
    )
    if mode == "int8":
        ws_bytes = 4 * n_tiles * TC
    elif mode == "int4":
        ws_bytes = (TR // 2) * ((TR // G) // 2) * 4
    else:
        ws_bytes = 0
    if "bq" in b:
        ws_bytes += 4 * cfg.n_layer * (cfg.n_head * cfg.head_dim + 2 * KW)
    stacked = 6 * cfg.n_head * capacity * 4  # [Hq, C] score temporaries
    return _pick_tps_batch_quant(
        KW, EK, EV, capacity, batch, cfg.n_layer, slot, ws_bytes + stacked,
    ) > 0


# ---------------------------------------------------------------------------
# GPT-2 batched quant step
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "kv_mode", "eps", "interpret")
)
def gpt2_megabatch_quant(
    packed: dict,
    k: jax.Array,  # [L, B, C, EK] quantized pane (aliased output)
    v: jax.Array,  # [L, B, C, EV]
    ks: jax.Array,  # [L, B, C] fp32 per-(slot, token) K scales (aliased)
    vs: jax.Array,  # [L, B, C]
    lengths: jax.Array,  # int32 [B] — per-slot tokens already cached
    x_emb: jax.Array,  # [B, E] per-slot token+position embedding
    *,
    cfg: Any,
    capacity: int,
    kv_mode: str,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """One decode step for B independent streams over quantized panes.

    Returns (tokens int32 [B], new k, new v, new ks, new vs). Slot b's new
    quantized K/V row lands at column lengths[b] of ITS pane, its scales at
    lane lengths[b] of its scale rows.
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    B = x_emb.shape[0]
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
    tps = _pick_tps_batch_quant(E, EK, EV, C, B, L, tile_b)
    if tps == 0:
        raise ValueError(
            "batched quant megakernel does not fit VMEM at this "
            "(batch, capacity)"
        )
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)
    E2 = E // 2

    def ln(x32, g, b_):  # row-wise LN, [B, E] fp32
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + ln_eps) * g + b_

    def kernel(len_ref, x_ref, w_ref, k_ref, v_ref, ks_ref, vs_ref,
               sm_ref, lnf_ref, ws_ref, s4_ref,
               tok_ref, ko_ref, vo_ref, kso_ref, vso_ref, *scr):
        if int4_w and not s4_vmem:
            (wbuf, sbuf, kbuf, vbuf, knew, vnew, ksn, vsn, gk, gv,
             wsem, ssem, ksem, vsem, gsem, osem) = scr
        else:
            (wbuf, kbuf, vbuf, knew, vnew, ksn, vsn, gk, gv,
             wsem, ksem, vsem, gsem, osem) = scr
            sbuf = ssem = None

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

        def kdma(slot, l):  # whole-batch quantized pane: one DMA per layer
            return pltpu.make_async_copy(
                k_ref.at[l], kbuf.at[slot], ksem.at[slot]
            )

        def vdma(slot, l):
            return pltpu.make_async_copy(
                v_ref.at[l], vbuf.at[slot], vsem.at[slot]
            )

        def gbase_of(b):
            cur_b = len_ref[b, 0]
            return pl.multiple_of((cur_b // 8) * 8, 8)

        def group_in(ref, buf, b, sem):
            return pltpu.make_async_copy(
                ref.at[:, b, pl.ds(gbase_of(b), 8), :], buf.at[b], sem
            )

        def group_out(buf, ref, b, sem):
            return pltpu.make_async_copy(
                buf.at[b], ref.at[:, b, pl.ds(gbase_of(b), 8), :], sem
            )

        wdma(0, 0).start()
        if int4_w and not s4_vmem:
            sdma(0, 0).start()
        kdma(0, 0).start()
        vdma(0, 0).start()
        gk_ins = [group_in(k_ref, gk, b, gsem.at[0, b]) for b in range(B)]
        gv_ins = [group_in(v_ref, gv, b, gsem.at[1, b]) for b in range(B)]
        for d in gk_ins:
            d.start()
        for d in gv_ins:
            d.start()

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

        def mm(x_, t, b32=None):  # [B, E] @ tile(t) -> [B, E] fp32
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

        # bf16 pane dots (round 4, see megakernel_quant.py): f32 MXU dots
        # decompose into multiple bf16 passes; pane values and the
        # dtype-rounded query are bf16-exact (ONE pass, identical f32
        # accumulation); probs round to dtype (~2^-9, below the output's
        # own rounding). Identity when dtype == f32 (interpret tests).
        def dot_nt16(a32, b16):
            return dot_nt(a32.astype(dtype), b16)

        def pv_dot(p32, b16):
            return dot_nn(p32.astype(dtype), b16)

        def unpack4(pk):  # [cw, E2] int8 -> (hi_vals, lo_vals) in dtype
            lo_b = jnp.bitwise_and(pk, 0xF).astype(dtype)  # q_lo + 8, exact
            hi = (pk.astype(dtype) - lo_b) * 0.0625  # q_hi, exact
            return hi, lo_b - 8.0

        def quant_rows(x16, kind):
            """[B, E] dtype -> (q fp32 rounded/clipped, scales fp32 [B, 1])."""
            x32 = x16.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            if kind == "int8":
                s = jnp.maximum(amax * (1.0 / 127.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0)
            else:
                s = jnp.maximum(amax * (1.0 / 7.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -8.0, 7.0)
            return q, s

        def pack_rows(q, kind):  # [B, E] fp32 codes -> [B, EK/EV] int8
            if kind == "int8":
                return q.astype(jnp.int8)
            return (16.0 * q[:, :E2] + q[:, E2:] + 8.0).astype(jnp.int8)

        x = x_ref[:].astype(dtype)  # [B, E] residual stream
        col_hc = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)

        for l in range(L):
            base = l * 12

            def sm(r):
                return sm_ref[l, r:r + 1]

            h = ln(x.astype(jnp.float32), sm(0), sm(1)).astype(dtype)
            q32 = mm(h, base + 0, sm(4))
            k32 = mm(h, base + 1, sm(5))
            v32 = mm(h, base + 2, sm(6))
            kc16 = k32.astype(dtype)  # [B, E]
            vc16 = v32.astype(dtype)

            # quantize-on-write: new K/V rows + their per-(slot,token) scales
            qk, sk = quant_rows(kc16, k_kind)
            qv, sv = quant_rows(vc16, v_kind)
            knew[l] = pack_rows(qk, k_kind)
            vnew[l] = pack_rows(qv, v_kind)
            ksn[l] = jnp.broadcast_to(sk, (B, 128))
            vsn[l] = jnp.broadcast_to(sv, (B, 128))

            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            # independent per-slot transposed attention over quantized panes
            qf_all = q32.astype(dtype).astype(jnp.float32)  # [B, E]
            kf = kc16.astype(jnp.float32)
            vf = vc16.astype(jnp.float32)
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                u = selT * qf_all[b:b + 1]  # [H, E] fp32
                raw_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    if k_kind == "int8":
                        kc = kbuf[l % 2, b, c0:c0 + cw, :].astype(dtype)
                        raw_chunks.append(dot_nt16(u, kc))  # [H, cw]
                    else:
                        khi, klo = unpack4(kbuf[l % 2, b, c0:c0 + cw, :])
                        raw_chunks.append(
                            dot_nt16(u[:, :E2], khi)
                            + dot_nt16(u[:, E2:], klo)
                        )
                raw = jnp.concatenate(raw_chunks, axis=1)  # [H, C]
                st = raw * ks_ref[pl.ds(l, 1), b, :] * scale
                st = jnp.where(col_hc < cur_b, st, NEG_INF)
                s_cur = jnp.sum(
                    u * kf[b:b + 1], axis=1, keepdims=True
                ) * scale  # [H, 1]
                mx = jnp.maximum(jnp.max(st, axis=1, keepdims=True), s_cur)
                p = jnp.exp(st - mx)  # [H, C] fp32
                p_cur = jnp.exp(s_cur - mx)
                denom = jnp.sum(p, axis=1, keepdims=True) + p_cur  # [H, 1]
                ps = p * vs_ref[pl.ds(l, 1), b, :]  # fold per-token V scales
                M = jnp.zeros((H, E), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    psc = ps[:, c0:c0 + cw]
                    if v_kind == "int8":
                        vc = vbuf[l % 2, b, c0:c0 + cw, :].astype(dtype)
                        M = M + pv_dot(psc, vc)
                    else:
                        vhi, vlo = unpack4(vbuf[l % 2, b, c0:c0 + cw, :])
                        M = M + jnp.concatenate(
                            [pv_dot(psc, vhi), pv_dot(psc, vlo)], axis=1
                        )
                num = M + p_cur * vf[b:b + 1]  # current token, full-precision
                ao = jnp.sum(num * selT, axis=0, keepdims=True) / jnp.sum(
                    denom * selT, axis=0, keepdims=True
                )  # [1, E]
                a_rows.append(ao)
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)  # [B, E]

            x = x + mm(a, base + 3, sm(7)).astype(dtype)

            h2 = ln(x.astype(jnp.float32), sm(2), sm(3)).astype(dtype)
            m32 = jnp.concatenate(
                [mm(h2, base + 4 + i, sm(8 + i)) for i in range(4)], axis=-1
            )  # [B, 4E] fp32
            g32 = 0.5 * m32 * (
                1.0
                + jnp.tanh(0.7978845608028654 * (m32 + 0.044715 * m32 ** 3))
            )
            gh = g32.astype(dtype)
            y32 = sm(12)
            for i in range(4):
                y32 = y32 + mm(gh[:, i * E:(i + 1) * E], base + 8 + i)
            x = x + y32.astype(dtype)

        # per-slot quantized writeback at each slot's own cursor
        ridx_k = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EK), 1)
        ridx_v = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EV), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)  # 0..7
            gk[b] = jnp.where(
                ridx_k == off_b,
                jnp.broadcast_to(knew[:, b:b + 1, :], (L, 8, EK)), gk[b],
            )
            gv[b] = jnp.where(
                ridx_v == off_b,
                jnp.broadcast_to(vnew[:, b:b + 1, :], (L, 8, EV)), gv[b],
            )
        gk_outs = [group_out(gk, ko_ref, b, osem.at[0, b]) for b in range(B)]
        gv_outs = [group_out(gv, vo_ref, b, osem.at[1, b]) for b in range(B)]
        for d in gk_outs:
            d.start()
        for d in gv_outs:
            d.start()

        # scale writeback: one vectorized select over the [L, B, C] tables —
        # the per-slot cursor vector assembles from the SMEM length scalars
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        curv = jnp.zeros((1, B, 1), jnp.int32)
        for b in range(B):
            curv = jnp.where(slot_ids == b, len_ref[b, 0], curv)
        col_lbc = jax.lax.broadcasted_iota(jnp.int32, (L, B, C), 2)
        ins_s = col_lbc == curv
        kso_ref[:] = jnp.where(
            ins_s, jnp.broadcast_to(ksn[:, :, 0:1], (L, B, C)), ks_ref[:]
        )
        vso_ref[:] = jnp.where(
            ins_s, jnp.broadcast_to(vsn[:, :, 0:1], (L, B, C)), vs_ref[:]
        )

        xf = ln(
            x.astype(jnp.float32), lnf_ref[0:1], lnf_ref[1:2]
        ).astype(dtype)  # [B, E]
        big = jnp.int32(2 ** 30)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (B, E), 1)
        best = jnp.full((B, 1), NEG_INF, jnp.float32)
        best_idx = jnp.zeros((B, 1), jnp.int32)
        lm_base = L * 12
        for t in range(n_lm):
            y = mm(xf, lm_base + t)  # [B, E] fp32 logits chunk
            if (t + 1) * E > V:
                y = jnp.where(cidx < V - t * E, y, NEG_INF)
            ymax = jnp.max(y, axis=1, keepdims=True)  # [B, 1]
            cand = jnp.min(
                jnp.where(y == ymax, cidx, big), axis=1, keepdims=True
            ) + t * E
            take = ymax > best  # strict: earlier tiles win ties, as argmax
            best_idx = jnp.where(take, cand, best_idx)
            best = jnp.maximum(best, ymax)
        tok_ref[:] = jnp.broadcast_to(best_idx, (B, 128))

        for d in gk_outs:
            d.wait()
        for d in gv_outs:
            d.wait()

    wtile_shape = (2, tps, E // 2, E) if int4_w else (2, tps, E, E)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, tps, s4_rows, E), dtype))
    scratch += [
        pltpu.VMEM((2, B, C, EK), jnp.int8),  # K ring (quantized panes)
        pltpu.VMEM((2, B, C, EV), jnp.int8),  # V ring
        pltpu.VMEM((L, B, EK), jnp.int8),  # quantized new K rows
        pltpu.VMEM((L, B, EV), jnp.int8),  # quantized new V rows
        pltpu.VMEM((L, B, 128), jnp.float32),  # new K scales
        pltpu.VMEM((L, B, 128), jnp.float32),  # new V scales
        pltpu.VMEM((B, L, 8, EK), jnp.int8),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 8, EV), jnp.int8),  # per-slot RMW windows (V)
        pltpu.SemaphoreType.DMA((2,)),  # wsem
    ]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # ssem
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),  # ksem
        pltpu.SemaphoreType.DMA((2,)),  # vsem
        pltpu.SemaphoreType.DMA((2, B)),  # gsem
        pltpu.SemaphoreType.DMA((2, B)),  # osem
    ]
    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb [B, E]
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, B, C, EK]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v  [L, B, C, EV]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks [L, B, C] fp32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smalls
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale
            pl.BlockSpec(  # w4scale: VMEM-resident unless ring mode
                memory_space=pltpu.HBM
                if (int4_w and not s4_vmem) else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [B, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, B, C, EK), jnp.int8),
            jax.ShapeDtypeStruct((L, B, C, EV), jnp.int8),
            jax.ShapeDtypeStruct((L, B, C), jnp.float32),
            jax.ShapeDtypeStruct((L, B, C), jnp.float32),
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
    toks, k2, v2, ks2, vs2 = f(
        jnp.reshape(lengths.astype(jnp.int32), (B, 1)),
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
    return toks[:, 0], k2, v2, ks2, vs2


# ---------------------------------------------------------------------------
# Llama-family batched quant step (stacked-rotation GQA, RoPE, SwiGLU)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "kv_mode", "eps", "interpret")
)
def llama_megabatch_quant(
    packed: dict,
    k: jax.Array,  # [L, B, C, EK] quantized pane (aliased output)
    v: jax.Array,  # [L, B, C, EV]
    ks: jax.Array,  # [L, B, C] fp32 per-(slot, token) K scales (aliased)
    vs: jax.Array,  # [L, B, C]
    lengths: jax.Array,  # int32 [B]
    x_emb: jax.Array,  # [B, E] per-slot token embedding
    cos_q: jax.Array,  # [B, Hq*D] f32 per-slot RoPE phase, tiled per head
    sin_q: jax.Array,  # [B, Hq*D] f32
    *,
    cfg: Any,
    capacity: int,
    kv_mode: str,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """One Llama/Qwen decode step for B streams over quantized panes.

    Weight streaming follows megakernel_batch.llama_megabatch (fori_loop
    layer walk, dynamic-index tile stream); attention runs per slot in the
    stacked-rotation transposed orientation of
    megakernel_quant.llama_megastep_quant. Returns
    (tokens int32 [B], new k, new v, new ks, new vs).
    """
    from .megakernel_llama import (
        _layer_tile_plan,
        _num_lm_tiles as _llama_num_lm_tiles,
        _tile_geometry,
        _w_slot_bytes,
    )

    E = cfg.hidden_size
    Hq, Hkv, D, L = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_layer
    QW, KW = Hq * D, Hkv * D
    GR = Hq // Hkv
    C, V = capacity, cfg.vocab_size
    B = x_emb.shape[0]
    rms_eps = cfg.rms_eps
    TR, TC, Ip = _tile_geometry(cfg)
    plan = _layer_tile_plan(cfg, TR, TC, Ip)
    per_layer = sum(r * c for _, r, c in plan)
    n_lm = _llama_num_lm_tiles(V, TC)
    n_tiles = L * per_layer + n_lm * (E // TR)
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    has_bias = "qkvb" in packed
    k_kind, v_kind = _kv_kinds(kv_mode)
    EK = _pane_width(k_kind, KW)
    EV = _pane_width(v_kind, KW)
    dtype = x_emb.dtype
    dt_item = jnp.dtype(dtype).itemsize
    s4_vmem = False
    stacked = 6 * Hq * C * 4
    if int4_w:
        G, n_gh, s4p = _s4_geom(TR, packed)
        s4_rows = packed["w4scale"].shape[1]
        gsel_bytes = (TR // 2) * n_gh * 4
        s4_bytes = n_tiles * s4_rows * TC * dt_item
        s4_vmem = _pick_tps_batch_quant(
            KW, EK, EV, C, B, L, (TR // 2) * TC,
            gsel_bytes + s4_bytes + stacked,
        ) > 0
        ws_vmem = gsel_bytes + (s4_bytes if s4_vmem else 0)
        mode = "int4"
    else:
        G, n_gh, s4p = TR, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
        ws_vmem = 4 * n_tiles * TC if int8_w else 0
    slot = (TR // 2) * TC if s4_vmem else _w_slot_bytes(
        mode, TR, TC, G, dt_item, s4_rows or None
    )
    tps = _pick_tps_batch_quant(
        KW, EK, EV, C, B, L, slot, ws_vmem + stacked
    )
    if tps == 0:
        raise ValueError(
            "batched llama quant megakernel does not fit VMEM at this "
            "(batch, capacity)"
        )
    scale = 1.0 / math.sqrt(float(D))
    half = D // 2
    KW2 = KW // 2

    name_off = {}
    off = 0
    for name, r, c in plan:
        name_off[name] = (off, r, c)
        off += r * c

    def rms(x, g32):
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + rms_eps)
        return y.astype(dtype) * g32.astype(dtype)

    def rot_half(x32, W):
        rp = jnp.concatenate([x32[:, W - half:], x32[:, :W - half]], axis=1)
        rm = jnp.concatenate([x32[:, half:], x32[:, :half]], axis=1)
        d = jax.lax.broadcasted_iota(jnp.int32, (x32.shape[0], W), 1) % D
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

        if int4_w:
            r_ids = jax.lax.broadcasted_iota(
                jnp.int32, (TR // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (TR // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

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

        def kdma(slot_, l):  # whole-batch [B, C, EK] pane per layer
            return pltpu.make_async_copy(k_ref.at[l], kbuf.at[slot_],
                                         ksem.at[slot_])

        def vdma(slot_, l):
            return pltpu.make_async_copy(v_ref.at[l], vbuf.at[slot_],
                                         vsem.at[slot_])

        def gbase_of(b):
            cur_b = len_ref[b, 0]
            return pl.multiple_of((cur_b // 8) * 8, 8)

        def group_in(ref, buf, b, sem):
            return pltpu.make_async_copy(
                ref.at[:, b, pl.ds(gbase_of(b), 8), :], buf.at[b], sem
            )

        def group_out(buf, ref, b, sem):
            return pltpu.make_async_copy(
                buf.at[b], ref.at[:, b, pl.ds(gbase_of(b), 8), :], sem
            )

        wdma(0, 0).start()
        if int4_w and not s4_vmem:
            sdma(0, 0).start()
        kdma(0, 0).start()
        vdma(0, 0).start()
        gk_ins = [group_in(k_ref, gk, b, gsem.at[0, b]) for b in range(B)]
        gv_ins = [group_in(v_ref, gv, b, gsem.at[1, b]) for b in range(B)]
        for d in gk_ins:
            d.start()
        for d in gv_ins:
            d.start()

        def tile(t):
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

        ones_b = jnp.ones((B, 1), jnp.float32)

        def brow(row):  # [1, X] f32 -> [B, X] via MXU (see megakernel_batch)
            return jax.lax.dot_general(
                ones_b, row, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def mm_chunks(x_, base, rg, cg):
            outs = []
            for c in range(cg):
                acc = None
                for g in range(rg):
                    t = base + c * rg + g
                    y = tile_dot(x_[:, g * TR:(g + 1) * TR].astype(dtype), t)
                    acc = y if acc is None else acc + y
                if int8_w:
                    acc = acc * brow(ws_ref[pl.ds(base + c * rg, 1)])
                outs.append(acc)
            return outs

        def dot_nt(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_nn(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # bf16 pane dots (round 4, see megakernel_quant.py): pane values
        # are bf16-exact; roped queries round to dtype (matching the XLA
        # path's model-dtype q), probs round to dtype (~2^-9).
        def split_nt(a32, b16):
            return dot_nt(a32.astype(dtype), b16)

        def pv_dot(p32, b16):
            return dot_nn(p32.astype(dtype), b16)

        def unpack4(pk):  # [cw, KW2] int8 -> (hi_vals, lo_vals) in dtype
            lo_b = jnp.bitwise_and(pk, 0xF).astype(dtype)
            hi = (pk.astype(dtype) - lo_b) * 0.0625
            return hi, lo_b - 8.0

        def quant_rows(x16, kind):
            x32 = x16.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            if kind == "int8":
                s = jnp.maximum(amax * (1.0 / 127.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0)
            else:
                s = jnp.maximum(amax * (1.0 / 7.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -8.0, 7.0)
            return q, s

        def pack_rows(q, kind):  # [B, KW] fp32 codes -> [B, EK/EV] int8
            if kind == "int8":
                return q.astype(jnp.int8)
            return (16.0 * q[:, :KW2] + q[:, KW2:] + 8.0).astype(jnp.int8)

        cosq = cq_ref[:]  # [B, QW] f32, per-slot phase
        sinq = sq_ref[:]
        cosk, sink = cosq[:, :KW], sinq[:, :KW]

        x = x_ref[:].astype(dtype)  # [B, E]
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
            if has_bias:
                bias = brow(qb_ref[pl.ds(l, 1), :])  # [B, QW + 2*KW]
                q32 = q32 + bias[:, :QW]
                k32 = k32 + bias[:, QW:QW + KW]
                v32 = v32 + bias[:, QW + KW:]

            qd = q32.astype(dtype).astype(jnp.float32)
            kd = k32.astype(dtype).astype(jnp.float32)
            q_rope = (qd * cosq + rot_half(qd, QW) * sinq).astype(dtype)
            k_rope = (kd * cosk + rot_half(kd, KW) * sink).astype(dtype)
            kc16 = k_rope  # [B, KW]
            vc16 = v32.astype(dtype)

            # quantize-on-write: new K/V rows + per-(slot, token) scales
            qk, sk = quant_rows(kc16, k_kind)
            qv, sv = quant_rows(vc16, v_kind)
            knew[pl.ds(l, 1)] = pack_rows(qk, k_kind)[None]
            vnew[pl.ds(l, 1)] = pack_rows(qv, v_kind)[None]
            ksn[pl.ds(l, 1)] = jnp.broadcast_to(sk, (B, 128))[None]
            vsn[pl.ds(l, 1)] = jnp.broadcast_to(sv, (B, 128))[None]

            @pl.when(l + 1 < L)
            def _():
                nxt = jax.lax.rem(l + 1, 2)
                kdma(nxt, l + 1).start()
                vdma(nxt, l + 1).start()

            kdma(par, l).wait()
            vdma(par, l).wait()

            # per-slot stacked-rotation transposed GQA attention
            qf_all = q_rope.astype(jnp.float32)  # [B, QW]
            kcur32 = kc16.astype(jnp.float32)
            vcur32 = vc16.astype(jnp.float32)
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                qf = qf_all[b:b + 1]  # [1, QW]
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
                raw_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    if k_kind == "int8":
                        kc = kbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                            dtype)
                        raw_chunks.append(split_nt(U, kc))  # [Hq, cw]
                    else:
                        khi, klo = unpack4(
                            kbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0])
                        raw_chunks.append(
                            split_nt(U[:, :KW2], khi)
                            + split_nt(U[:, KW2:], klo)
                        )
                raw = jnp.concatenate(raw_chunks, axis=1)  # [Hq, C]
                st = raw * ks_ref[pl.ds(l, 1), b, :] * scale
                st = jnp.where(col_qc < cur_b, st, NEG_INF)
                s_cur = jnp.sum(
                    U * kcur32[b:b + 1], axis=1, keepdims=True
                ) * scale  # [Hq, 1]
                mx = jnp.maximum(jnp.max(st, axis=1, keepdims=True), s_cur)
                p = jnp.exp(st - mx)  # [Hq, C]
                p_cur = jnp.exp(s_cur - mx)
                denom = jnp.sum(p, axis=1, keepdims=True) + p_cur
                ps = p * vs_ref[pl.ds(l, 1), b, :]
                M = jnp.zeros((Hq, KW), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    psc = ps[:, c0:c0 + cw]
                    if v_kind == "int8":
                        vc = vbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                            dtype)
                        M = M + pv_dot(psc, vc)
                    else:
                        vhi, vlo = unpack4(
                            vbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0])
                        M = M + jnp.concatenate(
                            [pv_dot(psc, vhi), pv_dot(psc, vlo)], axis=1
                        )
                num = M + p_cur * vcur32[b:b + 1]
                ao_rs = []
                for r in range(GR):
                    rows = slice(r * Hkv, (r + 1) * Hkv)
                    nr = jnp.sum(num[rows] * selT, axis=0, keepdims=True)
                    dr = jnp.sum(denom[rows] * selT, axis=0, keepdims=True)
                    ao_rs.append(nr / dr)  # [1, KW]
                a_rows.append(jnp.concatenate(
                    [
                        ao_rs[hq % GR][:, (hq // GR) * D:(hq // GR) * D + D]
                        for hq in range(Hq)
                    ],
                    axis=1,
                ))
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)  # [B, QW]

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

        # per-slot quantized writeback at each slot's own cursor
        ridx_k = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EK), 1)
        ridx_v = jax.lax.broadcasted_iota(jnp.int32, (L, 8, EV), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)
            gk[b] = jnp.where(
                ridx_k == off_b,
                jnp.broadcast_to(knew[:, b:b + 1, :], (L, 8, EK)), gk[b],
            )
            gv[b] = jnp.where(
                ridx_v == off_b,
                jnp.broadcast_to(vnew[:, b:b + 1, :], (L, 8, EV)), gv[b],
            )
        gk_outs = [group_out(gk, ko_ref, b, osem.at[0, b]) for b in range(B)]
        gv_outs = [group_out(gv, vo_ref, b, osem.at[1, b]) for b in range(B)]
        for d in gk_outs:
            d.start()
        for d in gv_outs:
            d.start()

        # vectorized scale writeback over the [L, B, C] tables
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        curv = jnp.zeros((1, B, 1), jnp.int32)
        for b in range(B):
            curv = jnp.where(slot_ids == b, len_ref[b, 0], curv)
        col_lbc = jax.lax.broadcasted_iota(jnp.int32, (L, B, C), 2)
        ins_s = col_lbc == curv
        kso_ref[:] = jnp.where(
            ins_s, jnp.broadcast_to(ksn[:, :, 0:1], (L, B, C)), ks_ref[:]
        )
        vso_ref[:] = jnp.where(
            ins_s, jnp.broadcast_to(vsn[:, :, 0:1], (L, B, C)), vs_ref[:]
        )

        xf = rms(x, lnf_ref[:])  # [B, E]
        lm_base = L * per_layer
        rg_lm = E // TR
        cidx = jax.lax.broadcasted_iota(jnp.int32, (B, TC), 1)
        big = jnp.int32(2 ** 30)

        def lm_body(t, carry):
            best, best_idx = carry  # [B, 1] f32 / int32
            acc = None
            for g in range(rg_lm):
                y = tile_dot(
                    xf[:, g * TR:(g + 1) * TR], lm_base + t * rg_lm + g
                )
                acc = y if acc is None else acc + y
            if int8_w:
                acc = acc * brow(ws_ref[pl.ds(lm_base + t * rg_lm, 1)])
            acc = jnp.where(t * TC + cidx < V, acc, NEG_INF)
            ymax = jnp.max(acc, axis=1, keepdims=True)
            cand = jnp.min(
                jnp.where(acc == ymax, cidx, big), axis=1, keepdims=True
            ) + t * TC
            take = ymax > best
            return jnp.maximum(best, ymax), jnp.where(take, cand, best_idx)

        _, best_idx = jax.lax.fori_loop(
            0, n_lm, lm_body,
            (jnp.full((B, 1), NEG_INF, jnp.float32),
             jnp.zeros((B, 1), jnp.int32)),
        )
        tok_ref[:] = jnp.broadcast_to(best_idx, (B, 128))

        for d in gk_outs:
            d.wait()
        for d in gv_outs:
            d.wait()

    wtile_shape = (2, TR // 2, TC) if int4_w else (2, TR, TC)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, s4_rows, TC), dtype))
    scratch += [
        pltpu.VMEM((2, B, C, EK), jnp.int8),  # K ring (quantized panes)
        pltpu.VMEM((2, B, C, EV), jnp.int8),  # V ring
        pltpu.VMEM((L, B, EK), jnp.int8),  # quantized new K rows
        pltpu.VMEM((L, B, EV), jnp.int8),  # quantized new V rows
        pltpu.VMEM((L, B, 128), jnp.float32),  # new K scales
        pltpu.VMEM((L, B, 128), jnp.float32),  # new V scales
        pltpu.VMEM((B, L, 8, EK), jnp.int8),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 8, EV), jnp.int8),  # per-slot RMW windows (V)
        pltpu.SemaphoreType.DMA((2,)),  # wsem
    ]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # ssem
    scratch += [
        pltpu.SemaphoreType.DMA((2,)),  # ksem
        pltpu.SemaphoreType.DMA((2,)),  # vsem
        pltpu.SemaphoreType.DMA((2, B)),  # gsem
        pltpu.SemaphoreType.DMA((2, B)),  # osem
    ]
    f = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lengths (B, 1)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos_q [B, QW]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin_q
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k [L, B, C, EK]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks [L, B, C] fp32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norms [L, 2, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf [1, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkvb
            pl.BlockSpec(
                memory_space=pltpu.HBM
                if (int4_w and not s4_vmem) else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [B, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, B, C, EK), jnp.int8),
            jax.ShapeDtypeStruct((L, B, C, EV), jnp.int8),
            jax.ShapeDtypeStruct((L, B, C), jnp.float32),
            jax.ShapeDtypeStruct((L, B, C), jnp.float32),
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
    toks, k2, v2, ks2, vs2 = f(
        jnp.reshape(lengths.astype(jnp.int32), (B, 1)),
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
    return toks[:, 0], k2, v2, ks2, vs2
