"""One-program draft bursts: k sequential draft decode steps in ONE kernel.

Round-4 verdict #5: after the draft-side megakernel landed, a speculation
round still cost k+1 Pallas programs — and on trained VMEM-small drafts
(draft_gpt2 0.6M / draft_llama 0.9M params, byte vocab) the k draft
programs are pure launch overhead: each step's compute is microseconds
while every pallas_call pays fixed dispatch cost, and the XLA glue between
programs (embedding gathers, argmax plumbing) serializes on top. This
module runs the ENTIRE k-step draft burst as one program:

* the draft's weights, embeddings, and positional/RoPE tables live fully
  in VMEM as kernel inputs (they fit by eligibility: `draft_burst_supported`
  gates on total bytes);
* token feedback is in-kernel: each step's greedy argmax feeds the next
  step's embedding row via a one-hot MXU lookup (robust where Mosaic's
  dynamic sublane slicing is not);
* the draft KV panes ([L, C, E] mega layout) are read, appended (masked
  row insert at the running cursor), and written back per step without
  leaving VMEM;
* attention uses the transposed [H, C] score orientation
  (megakernel_quant.py) so per-head reductions are single MXU dots.

A speculation round becomes draft-burst + verify = TWO programs instead
of k+1 (engine/speculative.py auto-selects the burst when the draft is
eligible). Proposals are bit-identical to the k-program path in fp32
(tests/test_megakernel_draft.py asserts equality against the XLA draft
scan); greedy acceptance makes output correctness unconditional either
way. No reference counterpart (the reference has no speculation,
/root/reference/src/benchmarking/benchmarker.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

_DRAFT_VMEM_MAX = 6 * 1024 * 1024  # weights + tables + panes budget


def _gpt2_draft_bytes(cfg, capacity: int, dt_item: int) -> int:
    E, L, V, P = cfg.n_embd, cfg.n_layer, cfg.vocab_size, cfg.n_positions
    w = L * (E * 3 * E + E * E + E * 4 * E + 4 * E * E)  # matmul weights
    tables = (V + P) * E
    panes = 2 * L * capacity * E
    return (w + tables + panes) * dt_item


def gpt2_draft_burst_supported(cfg, capacity: int, dtype) -> bool:
    dt_item = jnp.dtype(dtype).itemsize
    if cfg.n_embd % 128 or cfg.vocab_size > 2048:
        return False
    return _gpt2_draft_bytes(cfg, capacity, dt_item) <= _DRAFT_VMEM_MAX


def pack_gpt2_draft(params: dict, cfg) -> dict:
    """Draft params -> VMEM-ready stacked arrays (full precision)."""
    b = params["blocks"]
    return {
        "attn_w": b["attn_w"],          # [L, E, 3E]
        "attn_b": b["attn_b"][:, None],  # [L, 1, 3E]
        "proj_w": b["attn_proj_w"],     # [L, E, E]
        "proj_b": b["attn_proj_b"][:, None],
        "fc_w": b["fc_w"],              # [L, E, 4E]
        "fc_b": b["fc_b"][:, None],
        "fcp_w": b["fc_proj_w"],        # [L, 4E, E]
        "fcp_b": b["fc_proj_b"][:, None],
        "ln1": jnp.stack([b["ln1_g"], b["ln1_b"]], 1),  # [L, 2, E]
        "ln2": jnp.stack([b["ln2_g"], b["ln2_b"]], 1),
        "lnf": jnp.stack([params["lnf_g"], params["lnf_b"]]),  # [2, E]
        "wte": params["wte"],           # [V, E]
        "wpe": params["wpe"],           # [P, E]
    }


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "k", "interpret")
)
def gpt2_draft_burst(
    dpk: dict,
    dk: jax.Array,  # [L, C, E] mega-layout draft cache
    dv: jax.Array,
    dlen: jax.Array,  # int32 [] — tokens already cached
    cur: jax.Array,  # int32 [] — the round's current token
    *,
    cfg: Any,
    capacity: int,
    k: int,
    interpret: bool = False,
):
    """k greedy draft steps in one program -> (proposals [k], dk, dv)."""
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C, V, P = capacity, cfg.vocab_size, cfg.n_positions
    eps = cfg.layer_norm_epsilon
    dtype = dk.dtype
    scale = 1.0 / (float(D) ** 0.5)

    def ln(x32, g, b_):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b_

    def kernel(len_ref, cur_ref, aw_ref, ab_ref, pw_ref, pb_ref,
               fw_ref, fb_ref, gw_ref, gb_ref, l1_ref, l2_ref, lnf_ref,
               wte_ref, wpe_ref, dk_ref, dv_ref,
               out_ref, ko_ref, vo_ref):
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (H, E), 1) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (H, E), 0)
        selT = (e_ids == h_ids).astype(jnp.float32)  # [H, E]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        col_hc = jax.lax.broadcasted_iota(jnp.int32, (H, C), 1)
        row_ce = jax.lax.broadcasted_iota(jnp.int32, (C, E), 0)
        big = jnp.int32(2 ** 30)

        def dot_nn(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_nt(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # copy panes through (outputs carry the updated rows)
        ko_ref[:] = dk_ref[:]
        vo_ref[:] = dv_ref[:]

        tok = cur_ref[0, 0]
        base = len_ref[0, 0]
        for t in range(k):
            cur_len = base + t
            pos = jnp.minimum(cur_len, P - 1)
            oh_v = (iota_v == tok).astype(dtype)  # [1, V]
            oh_p = (iota_p == pos).astype(dtype)
            x = (
                dot_nn(oh_v, wte_ref[:].astype(dtype))
                + dot_nn(oh_p, wpe_ref[:].astype(dtype))
            ).astype(dtype)  # [1, E]

            for l in range(L):
                h32 = ln(x.astype(jnp.float32), l1_ref[l, 0:1],
                         l1_ref[l, 1:2])
                h = h32.astype(dtype)
                qkv = (
                    dot_nn(h, aw_ref[l].astype(dtype)) + ab_ref[l]
                )  # [1, 3E] f32
                q32, k32, v32 = (qkv[:, :E], qkv[:, E:2 * E], qkv[:, 2 * E:])
                kn = k32.astype(dtype)
                vn = v32.astype(dtype)
                qf = q32.astype(dtype).astype(jnp.float32)
                u = selT * qf  # [H, E]
                kl = ko_ref[l]  # [C, E] dtype
                vl = vo_ref[l]
                s_past = dot_nt(u.astype(dtype), kl) * scale  # [H, C]
                s_past = jnp.where(col_hc < cur_len, s_past, NEG_INF)
                s_cur = dot_nt(u.astype(dtype), kn) * scale  # [H, 1]
                mx = jnp.maximum(
                    jnp.max(s_past, axis=1, keepdims=True), s_cur
                )
                p = jnp.exp(s_past - mx)
                p_cur = jnp.exp(s_cur - mx)
                denom = jnp.sum(p, axis=1, keepdims=True) + p_cur
                M = dot_nn(p.astype(dtype), vl)  # [H, E]
                M = M + p_cur * vn.astype(jnp.float32)
                ao = (
                    jnp.sum(M * selT, axis=0, keepdims=True)
                    / jnp.sum(denom * selT, axis=0, keepdims=True)
                ).astype(dtype)  # [1, E]
                x = x + (
                    dot_nn(ao, pw_ref[l].astype(dtype)) + pb_ref[l]
                ).astype(dtype)

                h2 = ln(x.astype(jnp.float32), l2_ref[l, 0:1],
                        l2_ref[l, 1:2]).astype(dtype)
                m32 = dot_nn(h2, fw_ref[l].astype(dtype)) + fb_ref[l]
                g32 = 0.5 * m32 * (
                    1.0 + jnp.tanh(
                        0.7978845608028654 * (m32 + 0.044715 * m32 ** 3)
                    )
                )
                y32 = dot_nn(g32.astype(dtype), gw_ref[l].astype(dtype))
                x = x + (y32 + gb_ref[l]).astype(dtype)

                # pane row insert at the running cursor
                ins = row_ce == cur_len
                ko_ref[l] = jnp.where(ins, jnp.broadcast_to(kn, (C, E)), kl)
                vo_ref[l] = jnp.where(ins, jnp.broadcast_to(vn, (C, E)), vl)

            xf = ln(
                x.astype(jnp.float32), lnf_ref[0:1], lnf_ref[1:2]
            ).astype(dtype)
            logits = dot_nt(xf, wte_ref[:].astype(dtype))  # [1, V] (tied)
            lmax = jnp.max(logits, axis=1, keepdims=True)
            tok = jnp.min(
                jnp.where(logits == lmax, iota_v, big), axis=1
            )[0].astype(jnp.int32)
            out_ref[t:t + 1] = jnp.broadcast_to(tok[None, None], (1, 128))

    f = pl.pallas_call(
        kernel,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 15
        ),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # proposals [k, 128]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dk out
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dv out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, C, E), dk.dtype),
            jax.ShapeDtypeStruct((L, C, E), dv.dtype),
        ],
        interpret=interpret,
    )
    props, k2, v2 = f(
        jnp.reshape(dlen.astype(jnp.int32), (1, 1)),
        jnp.reshape(cur.astype(jnp.int32), (1, 1)),
        dpk["attn_w"], dpk["attn_b"], dpk["proj_w"], dpk["proj_b"],
        dpk["fc_w"], dpk["fc_b"], dpk["fcp_w"], dpk["fcp_b"],
        dpk["ln1"], dpk["ln2"], dpk["lnf"], dpk["wte"], dpk["wpe"],
        dk, dv,
    )
    return props[:, 0], k2, v2


# ---------------------------------------------------------------------------
# Llama-family draft burst (GQA lane space, RoPE, SwiGLU, tied head)
# ---------------------------------------------------------------------------


def _llama_draft_bytes(cfg, capacity: int, dt_item: int) -> int:
    E, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.n_layer
    QW = cfg.n_head * cfg.head_dim
    KW = cfg.n_kv_head * cfg.head_dim
    w = L * (E * QW + 2 * E * KW + QW * E + 3 * E * I)
    tables = cfg.vocab_size * E + 2 * cfg.n_positions * cfg.head_dim
    panes = 2 * L * capacity * KW
    return (w + tables + panes) * dt_item


def llama_draft_burst_supported(cfg, capacity: int, dtype) -> bool:
    dt_item = jnp.dtype(dtype).itemsize
    KW = cfg.n_kv_head * cfg.head_dim
    if KW % 128 or cfg.vocab_size > 2048 or cfg.head_dim % 2:
        return False
    if not cfg.tie_embeddings:
        return False
    return _llama_draft_bytes(cfg, capacity, dt_item) <= _DRAFT_VMEM_MAX


def pack_llama_draft(params: dict, cfg) -> dict:
    """Llama draft params -> VMEM-ready stacked arrays + RoPE tables."""
    b = params["blocks"]
    P, D = cfg.n_positions, cfg.head_dim
    inv = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    )
    freqs = jnp.arange(P, dtype=jnp.float32)[:, None] * inv[None]  # [P, D/2]
    emb = jnp.concatenate([freqs, freqs], axis=1)  # [P, D]
    out = {
        "wq": b["wq"], "wk": b["wk"], "wv": b["wv"], "wo": b["wo"],
        "w_gate": b["w_gate"], "w_up": b["w_up"], "w_down": b["w_down"],
        "ln1": b["ln1"][:, None], "ln2": b["ln2"][:, None],  # [L, 1, E]
        "lnf": params["ln_f"][None],  # [1, E]
        "embed": params["embed"],  # [V, E]
        "cos": jnp.cos(emb), "sin": jnp.sin(emb),  # [P, D]
    }
    if "bq" in b:
        out["bq"] = b["bq"][:, None]
        out["bk"] = b["bk"][:, None]
        out["bv"] = b["bv"][:, None]
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "k", "interpret")
)
def llama_draft_burst(
    dpk: dict,
    dk: jax.Array,  # [L, C, KW] mega-layout draft cache
    dv: jax.Array,
    dlen: jax.Array,
    cur: jax.Array,
    *,
    cfg: Any,
    capacity: int,
    k: int,
    interpret: bool = False,
):
    """k greedy Llama draft steps in one program -> (proposals, dk, dv)."""
    E = cfg.hidden_size
    Hq, Hkv, D, L = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_layer
    QW, KW = Hq * D, Hkv * D
    GR = Hq // Hkv
    C, V, P = capacity, cfg.vocab_size, cfg.n_positions
    eps = cfg.rms_eps
    dtype = dk.dtype
    scale = 1.0 / (float(D) ** 0.5)
    half = D // 2
    has_bias = cfg.qkv_bias

    def rms(x32, g):
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return x32 * jax.lax.rsqrt(var + eps) * g

    def rot_half(x32, W):
        rp = jnp.concatenate([x32[:, W - half:], x32[:, :W - half]], axis=1)
        rm = jnp.concatenate([x32[:, half:], x32[:, :half]], axis=1)
        d = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) % D
        return jnp.where(d < half, -rm, rp)

    def kernel(len_ref, cur_ref, wq_ref, wk_ref, wv_ref, wo_ref,
               wg_ref, wu_ref, wd_ref, l1_ref, l2_ref, lnf_ref,
               emb_ref, cos_ref, sin_ref, bq_ref, bk_ref, bv_ref,
               out_ref, ko_ref, vo_ref):
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (Hkv, KW), 1) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (Hkv, KW), 0)
        selT = (e_ids == h_ids).astype(jnp.float32)  # [Hkv, KW]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
        col_hc = jax.lax.broadcasted_iota(jnp.int32, (Hkv, C), 1)
        row_ck = jax.lax.broadcasted_iota(jnp.int32, (C, KW), 0)
        big = jnp.int32(2 ** 30)

        def dot_nn(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_nt(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        tok = cur_ref[0, 0]
        base = len_ref[0, 0]
        for t in range(k):
            cur_len = base + t
            pos = jnp.minimum(cur_len, P - 1)
            oh_v = (iota_v == tok).astype(dtype)
            oh_p = (iota_p == pos).astype(jnp.float32)  # [1, P]
            x = dot_nn(oh_v, emb_ref[:].astype(dtype)).astype(dtype)
            cos_d = dot_nn(oh_p, cos_ref[:])  # [1, D] f32
            sin_d = dot_nn(oh_p, sin_ref[:])
            cosq = jnp.concatenate([cos_d] * Hq, axis=1)  # [1, QW]
            sinq = jnp.concatenate([sin_d] * Hq, axis=1)
            cosk, sink = cosq[:, :KW], sinq[:, :KW]

            for l in range(L):
                h32 = rms(x.astype(jnp.float32), l1_ref[l])
                h = h32.astype(dtype)
                q32 = dot_nn(h, wq_ref[l].astype(dtype))
                k32 = dot_nn(h, wk_ref[l].astype(dtype))
                v32 = dot_nn(h, wv_ref[l].astype(dtype))
                if has_bias:
                    q32 = q32 + bq_ref[l]
                    k32 = k32 + bk_ref[l]
                    v32 = v32 + bv_ref[l]
                qd = q32.astype(dtype).astype(jnp.float32)
                kd = k32.astype(dtype).astype(jnp.float32)
                q_rope = (qd * cosq + rot_half(qd, QW) * sinq).astype(dtype)
                k_rope = (kd * cosk + rot_half(kd, KW) * sink).astype(dtype)
                vn = v32.astype(dtype)

                kl = ko_ref[l]  # [C, KW]
                vl = vo_ref[l]
                qf = q_rope.astype(jnp.float32)  # [1, QW]
                ao_parts = []
                for r in range(GR):
                    qr = jnp.concatenate(
                        [
                            qf[:, (kv * GR + r) * D:(kv * GR + r) * D + D]
                            for kv in range(Hkv)
                        ],
                        axis=1,
                    )  # [1, KW]
                    u = selT * qr  # [Hkv, KW]
                    s_past = dot_nt(u.astype(dtype), kl) * scale
                    s_past = jnp.where(col_hc < cur_len, s_past, NEG_INF)
                    s_cur = dot_nt(u.astype(dtype), k_rope) * scale
                    mx = jnp.maximum(
                        jnp.max(s_past, axis=1, keepdims=True), s_cur
                    )
                    p = jnp.exp(s_past - mx)
                    p_cur = jnp.exp(s_cur - mx)
                    denom = jnp.sum(p, axis=1, keepdims=True) + p_cur
                    M = dot_nn(p.astype(dtype), vl)
                    M = M + p_cur * vn.astype(jnp.float32)
                    ao_parts.append(
                        jnp.sum(M * selT, axis=0, keepdims=True)
                        / jnp.sum(denom * selT, axis=0, keepdims=True)
                    )  # [1, KW]
                a = jnp.concatenate(
                    [
                        ao_parts[hq % GR][:, (hq // GR) * D:(hq // GR) * D + D]
                        for hq in range(Hq)
                    ],
                    axis=1,
                ).astype(dtype)  # [1, QW]
                x = x + dot_nn(a, wo_ref[l].astype(dtype)).astype(dtype)

                h2 = rms(x.astype(jnp.float32), l2_ref[l]).astype(dtype)
                g32 = dot_nn(h2, wg_ref[l].astype(dtype))
                u32 = dot_nn(h2, wu_ref[l].astype(dtype))
                gate = (g32 * jax.nn.sigmoid(g32)).astype(dtype)
                prod = gate * u32.astype(dtype)
                y32 = dot_nn(prod, wd_ref[l].astype(dtype))
                x = x + y32.astype(dtype)

                ins = row_ck == cur_len
                ko_ref[l] = jnp.where(
                    ins, jnp.broadcast_to(k_rope, (C, KW)), kl
                )
                vo_ref[l] = jnp.where(
                    ins, jnp.broadcast_to(vn, (C, KW)), vl
                )

            xf = rms(x.astype(jnp.float32), lnf_ref[:]).astype(dtype)
            logits = dot_nt(xf, emb_ref[:].astype(dtype))  # [1, V]
            lmax = jnp.max(logits, axis=1, keepdims=True)
            tok = jnp.min(
                jnp.where(logits == lmax, iota_v, big), axis=1
            )[0].astype(jnp.int32)
            out_ref[t:t + 1] = jnp.broadcast_to(tok[None, None], (1, 128))

    def kernel_wrap(len_ref, cur_ref, *refs):
        *ins, dk_in, dv_in, out_ref, ko_ref, vo_ref = refs
        ko_ref[:] = dk_in[:]
        vo_ref[:] = dv_in[:]
        kernel(len_ref, cur_ref, *ins, out_ref, ko_ref, vo_ref)

    bq = dpk.get("bq")
    if bq is None:
        bq = jnp.zeros((L, 1, QW), jnp.float32)
        bk = jnp.zeros((L, 1, KW), jnp.float32)
        bv = jnp.zeros((L, 1, KW), jnp.float32)
    else:
        bk, bv = dpk["bk"], dpk["bv"]

    f = pl.pallas_call(
        kernel_wrap,
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 18
        ),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, C, KW), dk.dtype),
            jax.ShapeDtypeStruct((L, C, KW), dv.dtype),
        ],
        interpret=interpret,
    )
    props, k2, v2 = f(
        jnp.reshape(dlen.astype(jnp.int32), (1, 1)),
        jnp.reshape(cur.astype(jnp.int32), (1, 1)),
        dpk["wq"], dpk["wk"], dpk["wv"], dpk["wo"],
        dpk["w_gate"], dpk["w_up"], dpk["w_down"],
        dpk["ln1"], dpk["ln2"], dpk["lnf"],
        dpk["embed"], dpk["cos"], dpk["sin"], bq, bk, bv,
        dk, dv,
    )
    return props[:, 0], k2, v2
