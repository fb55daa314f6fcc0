"""Explicit-collective tensor-parallel decode: shard_map + hand-placed
all-gather / reduce-scatter (the scaling-book recipe).

The GSPMD TP path (parallel/sharding.py specs + jit) leaves collective
CHOICE and PLACEMENT to XLA's sharding propagation. This module is the
hand-scheduled alternative for the latency-critical decode step, written
the way the public "How to Scale Your Model" recipe prescribes: pick a
mesh axis, keep activations SHARDED between blocks, gather activations on
entry, reduce-scatter matmul outputs on exit — so every collective is an
explicit op in the program that XLA's latency-hiding scheduler can slide
against compute, instead of an artifact of spec propagation.

Dataflow per transformer block (mp = model-axis size, Es = E/mp):

    x_shard [1, Es] --all_gather--> xg [1, E]          (LN needs full row)
    h = LN(xg); qkv = h @ W_qkv_local                   (column-parallel,
                                                         head-aligned)
    attention over the LOCAL head shard of the KV cache (heads are
        independent -> the cache lives sharded [L, H/mp, C, D], decode
        needs NO KV collectives at all)
    partial = a @ W_o_local                             (row-parallel)
    x_shard += psum_scatter(partial) + b_o_shard
    (same AG -> column FFN -> row FFN -> RS for the MLP)

The LM head is vocab-sharded: local argmax per shard, then one tiny
all-gather of (max, idx) pairs picks the global greedy token with
jnp.argmax's first-max-wins tie rule.

Latency model (why this layout, and where overlap lands on real ICI):
per step each device moves 4L vector collectives of (mp-1)/mp * E * dtype
bytes (2 AG + 2 RS per block). GPT-2-small bf16 on mp=4: 4*12 * 0.75 *
768*2B = 66 KB — sub-2 us of ICI bandwidth (v5e ~45 GB/s/link), so decode
TP is LATENCY-bound: ~48 collectives x ~1-2 us hop latency ~ 50-100 us/
step against a ~200 us compute step at mp=4 (weights stream 4x faster per
chip). The win condition is overlap: the block-l+1 all-gather depends only
on x_shard after block l's RS, so it can issue under block l+1's LN/QKV
compute, and each RS can issue under the next matmul; with explicit
collectives XLA's latency-hiding scheduler performs exactly this motion
(profile: the collective stream interleaves with the MXU stream). The
fully-replicated alternative (pure psum after each row-parallel matmul)
moves 2x the bytes and serializes both psums on the critical path.
Measured validation needs a real multi-chip pod (unavailable here); the
8-virtual-device CPU mesh validates placement + token-exactness, and
__graft_entry__.dryrun_multichip compiles/executes this path per round.

No reference counterpart: the reference is strictly single-GPU
(/root/reference/src/benchmarking/benchmarker.py) — this is part of the
TPU-native scaling story (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 re-exports shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

NEG_INF = float(jnp.finfo(jnp.float32).min)


def shard_gpt2_tp(params: dict, cfg, mesh, axis: str = "model") -> dict:
    """Rearrange GPT-2 params into head-aligned TP layout and device_put.

    The generic specs (parallel/sharding.py) shard attn_w's packed [3E]
    output dim directly — legal under GSPMD (it reshards), but an explicit
    shard_map needs each device to hold whole heads of q, k AND v. Returns
    a dict of global arrays laid out so P-sharding the marked axis gives
    each device its heads contiguously:

      attn_w  [L, E, H, 3D]   (q_h | k_h | v_h per head), heads sharded
      attn_b  [L, H, 3D]
      attn_proj_w [L, H, D, E] (row-parallel over heads)
      attn_proj_b / fc_proj_b [L, E]  sharded over E (post-scatter add)
      fc_w [L, E, 4E], fc_b [L, 4E], fc_proj_w [L, 4E, E]  plain TP
      wte_tp [Vp, E]  vocab-sharded LM head (Vp padded to mp | V)
      wte, wpe, ln*  replicated
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    V = cfg.vocab_size
    mp = mesh.shape[axis]
    assert H % mp == 0, f"n_head {H} must divide over mesh axis {mp}"
    assert E % mp == 0 and (4 * E) % mp == 0
    b = params["blocks"]

    # [L, E, 3E] -> [L, E, 3, H, D] -> [L, E, H, 3, D] -> [L, E, H, 3D]
    attn_w = (
        b["attn_w"].reshape(L, E, 3, H, D).transpose(0, 1, 3, 2, 4)
        .reshape(L, E, H, 3 * D)
    )
    attn_b = (
        b["attn_b"].reshape(L, 3, H, D).transpose(0, 2, 1, 3)
        .reshape(L, H, 3 * D)
    )
    attn_proj_w = b["attn_proj_w"].reshape(L, H, D, E)

    Vp = mp * (-(-V // mp))
    wte_tp = jnp.pad(params["wte"], ((0, Vp - V), (0, 0)))

    tp = {
        "attn_w": (attn_w, P(None, None, axis, None)),
        "attn_b": (attn_b, P(None, axis, None)),
        "attn_proj_w": (attn_proj_w, P(None, axis, None, None)),
        "attn_proj_b": (b["attn_proj_b"], P(None, axis)),
        "fc_w": (b["fc_w"], P(None, None, axis)),
        "fc_b": (b["fc_b"], P(None, axis)),
        "fc_proj_w": (b["fc_proj_w"], P(None, axis, None)),
        "fc_proj_b": (b["fc_proj_b"], P(None, axis)),
        "ln1_g": (b["ln1_g"], P(None, None)),
        "ln1_b": (b["ln1_b"], P(None, None)),
        "ln2_g": (b["ln2_g"], P(None, None)),
        "ln2_b": (b["ln2_b"], P(None, None)),
        "lnf_g": (params["lnf_g"], P(None)),
        "lnf_b": (params["lnf_b"], P(None)),
        "wte": (params["wte"], P(None, None)),
        "wpe": (params["wpe"], P(None, None)),
        "wte_tp": (wte_tp, P(axis, None)),
    }
    out = {
        k: jax.device_put(v, NamedSharding(mesh, s))
        for k, (v, s) in tp.items()
    }
    return out


def tp_param_specs(axis: str = "model") -> dict:
    """PartitionSpec pytree matching shard_gpt2_tp's output layout."""
    return {
        "attn_w": P(None, None, axis, None),
        "attn_b": P(None, axis, None),
        "attn_proj_w": P(None, axis, None, None),
        "attn_proj_b": P(None, axis),
        "fc_w": P(None, None, axis),
        "fc_b": P(None, axis),
        "fc_proj_w": P(None, axis, None),
        "fc_proj_b": P(None, axis),
        "ln1_g": P(None, None),
        "ln1_b": P(None, None),
        "ln2_g": P(None, None),
        "ln2_b": P(None, None),
        "lnf_g": P(None),
        "lnf_b": P(None),
        "wte": P(None, None),
        "wpe": P(None, None),
        "wte_tp": P(axis, None),
    }


@functools.lru_cache(maxsize=32)
def make_tp_decode(cfg, mesh, n_steps: int, capacity: int,
                   axis: str = "model", kv_mode: str = None):
    """Greedy TP decode loop with explicit collectives.

    Returns decode(tp_params, *cache, tok0) -> (toks [n_steps] i32,
    *cache', length'): cache is (k, v) head-sharded [L, H, C, D] in the
    model dtype, or — with kv_mode "int8" | "int4" | "mixed" — (k, v,
    ks, vs) quantized stores + per-(head, token) fp32 scales, the TP
    composition of QuantizedKV(granularity="per_head") for the MHA
    family (identical scheme to the Llama path below; GPT-2 just has
    Hkv == Hq). Token-exact vs the unsharded XLA decode up to psum
    partial-sum reassociation (greedy argmax is robust to it; asserted
    on the 8-device CPU mesh in tests/test_tp_decode.py).
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    V = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    mp = mesh.shape[axis]
    Hl, Es = H // mp, E // mp
    C = capacity
    scale = 1.0 / math.sqrt(float(D))
    c2 = math.sqrt(2.0 / math.pi)

    def ln(xg, g, b_):  # [1, E] f32 stats
        x32 = xg.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * g.astype(jnp.float32) + b_.astype(jnp.float32)).astype(
            xg.dtype
        )

    if kv_mode is not None:
        k_kind, v_kind = _kv_kinds_tp(kv_mode)

    def local_step(p, cache, length, tok):
        """One decode step on one device's shard (runs under shard_map)."""
        idx = jax.lax.axis_index(axis)
        dt = p["wte"].dtype
        if kv_mode is not None:
            k, v, ks, vs = cache
        else:
            k, v = cache
        pos = jnp.minimum(length, p["wpe"].shape[0] - 1)
        x_full = (p["wte"][tok] + p["wpe"][pos])[None].astype(dt)  # [1, E]
        x = jax.lax.dynamic_slice(x_full, (0, idx * Es), (1, Es))

        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        def rs(partial):  # [1, E] -> summed-and-scattered [1, Es]
            return jax.lax.psum_scatter(
                partial, axis, scatter_dimension=1, tiled=True
            )

        def ag(x_sh):  # [1, Es] -> [1, E]
            return jax.lax.all_gather(x_sh, axis, axis=1, tiled=True)

        for l in range(L):
            xg = ag(x)
            h = ln(xg, p["ln1_g"][l], p["ln1_b"][l])
            qkv = (
                jnp.einsum(
                    "te,ehd->thd", h, p["attn_w"][l],
                    preferred_element_type=jnp.float32,
                )
                + p["attn_b"][l].astype(jnp.float32)
            ).astype(dt)  # [1, Hl, 3D]
            q = qkv[0, :, :D]  # [Hl, D]
            kn = qkv[0, :, D:2 * D]
            vn = qkv[0, :, 2 * D:]
            if kv_mode is not None:
                kq_, ks_new = _q_rows(kn, k_kind)
                vq_, vs_new = _q_rows(vn, v_kind)
                k = jax.lax.dynamic_update_slice(
                    k, kq_[None, :, None, :], (l, 0, length, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    v, vq_[None, :, None, :], (l, 0, length, 0)
                )
                ks = jax.lax.dynamic_update_slice(
                    ks, ks_new[None, :, None], (l, 0, length)
                )
                vs = jax.lax.dynamic_update_slice(
                    vs, vs_new[None, :, None], (l, 0, length)
                )
                # dequantize past, overlay in-flight token in fp
                k_fp = _dequant_pane(k[l], ks[l], k_kind, dt)
                v_fp = _dequant_pane(v[l], vs[l], v_kind, dt)
                k_fp = jax.lax.dynamic_update_slice(
                    k_fp, kn[:, None, :].astype(dt), (0, length, 0)
                )
                v_fp = jax.lax.dynamic_update_slice(
                    v_fp, vn[:, None, :].astype(dt), (0, length, 0)
                )
            else:
                k = jax.lax.dynamic_update_slice(
                    k, kn[None, :, None, :].astype(k.dtype),
                    (l, 0, length, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    v, vn[None, :, None, :].astype(v.dtype),
                    (l, 0, length, 0)
                )
                k_fp, v_fp = k[l], v[l]
            scores = jnp.einsum(
                "hd,hcd->hc", q, k_fp, preferred_element_type=jnp.float32
            ) * scale
            scores = jnp.where(col <= length, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            ao = jnp.einsum(
                "hc,hcd->hd", probs, v_fp, preferred_element_type=jnp.float32
            ).astype(dt)  # [Hl, D]
            partial = jnp.einsum(
                "hd,hde->e", ao, p["attn_proj_w"][l],
                preferred_element_type=jnp.float32,
            )[None]  # [1, E] row-parallel partial
            x = x + (
                rs(partial)
                + p["attn_proj_b"][l].astype(jnp.float32)[None]
            ).astype(dt)

            xg2 = ag(x)
            h2 = ln(xg2, p["ln2_g"][l], p["ln2_b"][l])
            m32 = (
                jnp.dot(h2, p["fc_w"][l],
                        preferred_element_type=jnp.float32)
                + p["fc_b"][l].astype(jnp.float32)
            )  # [1, 4E/mp]
            g32 = 0.5 * m32 * (
                1.0 + jnp.tanh(c2 * (m32 + 0.044715 * m32 ** 3))
            )
            partial2 = jnp.dot(
                g32.astype(dt), p["fc_proj_w"][l],
                preferred_element_type=jnp.float32,
            )  # [1, E]
            x = x + (
                rs(partial2)
                + p["fc_proj_b"][l].astype(jnp.float32)[None]
            ).astype(dt)

        xf = ln(ag(x), p["lnf_g"], p["lnf_b"])  # [1, E]
        wl = p["wte_tp"]  # [Vl, E] local vocab shard
        Vl = wl.shape[0]
        logits = jnp.dot(
            xf, wl.T, preferred_element_type=jnp.float32
        )  # [1, Vl]
        lcol = jax.lax.broadcasted_iota(jnp.int32, (1, Vl), 1) + idx * Vl
        logits = jnp.where(lcol < V, logits, NEG_INF)
        lmax = jnp.max(logits, axis=1)  # [1]
        lidx = jnp.argmax(logits, axis=1).astype(jnp.int32) + idx * Vl
        gmax = jax.lax.all_gather(lmax, axis, axis=0, tiled=True)  # [mp]
        gidx = jax.lax.all_gather(lidx, axis, axis=0, tiled=True)
        # first-max-wins across shards == jnp.argmax over the full vocab
        tok2 = gidx[jnp.argmax(gmax)]
        if kv_mode is not None:
            return (k, v, ks, vs), tok2
        return (k, v), tok2

    def local_decode(p, *args):
        *cache, length, tok0 = args
        cache = tuple(cache)

        def step(carry, _):
            cache, length, tok = carry
            cache, tok2 = local_step(p, cache, length, tok)
            return (cache, length + 1, tok2), tok

        (cache, length, _), toks = jax.lax.scan(
            step, (cache, length, tok0), None, length=n_steps
        )
        return (toks,) + cache + (length,)

    pspecs = tp_param_specs(axis)
    kv_spec = P(None, axis, None, None)
    sc_spec = P(None, axis, None)
    if kv_mode is not None:
        cache_specs = (kv_spec, kv_spec, sc_spec, sc_spec)
    else:
        cache_specs = (kv_spec, kv_spec)
    decode = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(pspecs,) + cache_specs + (P(), P()),
        out_specs=(P(),) + cache_specs + (P(),),
        check_vma=False,
    )
    return jax.jit(decode)


# ---------------------------------------------------------------------------
# Llama/GQA explicit-TP decode with optional int8 KV panes (round 4).
#
# Composes the two north-star axes that the GPT-2 path above leaves apart:
# tensor parallelism x quantized KV. GQA shards CLEANLY over the model axis
# when n_kv_head % mp == 0: each device holds Hkl = Hkv/mp KV heads plus
# their G = Hq/Hkv query heads each (HF's query head h reads KV head h//G,
# so contiguous head blocks stay self-contained — no cross-shard attention).
# RoPE depends only on (position, head_dim), so it applies in-shard.
#
# int8 KV panes use per-(head, token) fp32 scales (QuantizedKV
# granularity="per_head"): the per-head max over D is local to the head, so
# quantization itself shards trivially — unlike per_token granularity, whose
# max spans ALL heads and would need a cross-shard max every step. Per-chip
# KV residency drops to (Hkv/mp) * 1 byte/elem (+ 4/D bytes of scale per
# token): Llama-1B at mp=4, 2048 tokens = 16L*2*2kv*2048*64 B = 8.0 MiB/chip
# vs 64 MiB/chip unsharded bf16 — an 8x smaller pane DMA per decode step,
# on top of the 4x weight-stream split. Token-exact vs the unsharded
# QuantizedKV(granularity="per_head") XLA path (tests/test_tp_decode.py).
# ---------------------------------------------------------------------------


def shard_llama_tp(params: dict, cfg, mesh, axis: str = "model") -> dict:
    """Device_put Llama params in head-aligned TP layout.

    wq/wk/wv outputs are already head-contiguous ([Hq*D] ordered by head),
    so unlike GPT-2's packed qkv no rearrange is needed — only sharding:

      wq [L, E, Hq*D] cols sharded | wk/wv [L, E, Hkv*D] cols sharded
      wo [L, Hq*D, E] rows sharded | w_gate/w_up cols, w_down rows
      ln1/ln2/ln_f/embed replicated; embed_tp [Vp, E] vocab-sharded head
    """
    V, E = cfg.vocab_size, cfg.hidden_size
    mp = mesh.shape[axis]
    assert cfg.n_kv_head % mp == 0, (
        f"n_kv_head {cfg.n_kv_head} must divide over mesh axis {mp}"
    )
    assert E % mp == 0 and cfg.intermediate_size % mp == 0
    b = params["blocks"]
    Vp = mp * (-(-V // mp))
    head = params["lm_head"].T if "lm_head" in params else params["embed"]
    embed_tp = jnp.pad(head, ((0, Vp - V), (0, 0)))

    tp = {
        "wq": (b["wq"], P(None, None, axis)),
        "wk": (b["wk"], P(None, None, axis)),
        "wv": (b["wv"], P(None, None, axis)),
        "wo": (b["wo"], P(None, axis, None)),
        "w_gate": (b["w_gate"], P(None, None, axis)),
        "w_up": (b["w_up"], P(None, None, axis)),
        "w_down": (b["w_down"], P(None, axis, None)),
        "ln1": (b["ln1"], P(None, None)),
        "ln2": (b["ln2"], P(None, None)),
        "ln_f": (params["ln_f"], P(None)),
        "embed": (params["embed"], P(None, None)),
        "embed_tp": (embed_tp, P(axis, None)),
    }
    for name in ("bq", "bk", "bv"):
        if name in b:
            tp[name] = (b[name], P(None, axis))
    return {
        k: jax.device_put(v, NamedSharding(mesh, s))
        for k, (v, s) in tp.items()
    }


def llama_tp_param_specs(params: dict, axis: str = "model") -> dict:
    """PartitionSpec pytree matching shard_llama_tp's output layout."""
    specs = {
        "wq": P(None, None, axis),
        "wk": P(None, None, axis),
        "wv": P(None, None, axis),
        "wo": P(None, axis, None),
        "w_gate": P(None, None, axis),
        "w_up": P(None, None, axis),
        "w_down": P(None, axis, None),
        "ln1": P(None, None),
        "ln2": P(None, None),
        "ln_f": P(None),
        "embed": P(None, None),
        "embed_tp": P(axis, None),
    }
    for name in ("bq", "bk", "bv"):
        if name in params:
            specs[name] = P(None, axis)
    return specs


def _kv_kinds_tp(kv_mode: str):
    """(k_kind, v_kind) — mirrors cache/kvcache.py QuantizedKV."""
    k_kind = "int8" if kv_mode in ("int8", "mixed") else "int4"
    v_kind = "int8" if kv_mode == "int8" else "int4"
    return k_kind, v_kind


def _q_rows(x, kind: str, eps: float = 1e-8):
    """[H, D] new row -> (store row, fp32 scale [H]), per-head symmetric.

    int8: reference scale math (max|x|/127). int4: packed uint8 [H, D/2],
    even index in the HIGH nibble (+8 offset) — byte-identical to
    ops/quantization.py quantize_int4_packed, so TP panes interoperate
    with QuantizedKV(granularity="per_head") prefill buffers.
    """
    x32 = x.astype(jnp.float32)
    if kind == "int8":
        s = jnp.maximum(jnp.max(jnp.abs(x32), axis=1) / 127.0, eps)
        q = jnp.clip(jnp.round(x32 / s[:, None]), -127, 127).astype(jnp.int8)
        return q, s
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=1) / 7.0, eps)
    q = jnp.clip(jnp.round(x32 / s[:, None]), -8, 7).astype(jnp.int8)
    q_u = (q + 8).astype(jnp.uint8)
    return (q_u[:, 0::2] << 4) | q_u[:, 1::2], s


def _dequant_pane(store, scales, kind: str, dt):
    """[H, C, D(/2)] store + [H, C] scales -> [H, C, D] values in dt."""
    if kind == "int8":
        vals = store.astype(jnp.float32)
    else:
        hi = ((store >> 4) & 0x0F).astype(jnp.int8) - 8
        lo = (store & 0x0F).astype(jnp.int8) - 8
        vals = jnp.stack([hi, lo], axis=-1).reshape(
            *store.shape[:-1], 2 * store.shape[-1]
        ).astype(jnp.float32)
    return (vals * scales[:, :, None]).astype(dt)


@functools.lru_cache(maxsize=32)
def make_llama_tp_decode(cfg, mesh, n_steps: int, capacity: int,
                         axis: str = "model", kv_mode: str = None):
    """Greedy Llama/GQA TP decode with explicit AG/RS collectives.

    kv_mode None: cache = (k, v, length), k/v [L, Hkv, C, D] head-sharded
    in the model dtype. kv_mode "int8" | "int4" | "mixed" (K int8, V
    int4): cache = (k, v, ks, vs, length)
    with int8 stores + per-(head, token) fp32 scales — the TP composition
    of QuantizedKV(granularity="per_head"): past tokens dequantize on
    read, the in-flight token stays full precision (reference
    benchmarker.py:473-477 semantics), scales shard over heads.

    Returns decode(tp_params, *cache, tok0) -> (toks [n_steps], *cache').
    Collective traffic per step is IDENTICAL to the GPT-2 path (2 AG + 2
    RS per block of (mp-1)/mp * E bytes + one [mp] argmax gather — KV
    needs no collectives); what int8 panes change is the LOCAL HBM
    read per step: C * Hkv/mp * D bytes/layer/pane instead of 2x that in
    bf16 — at mp=4 on Llama-1B/2048-ctx, 8 MiB vs 64 MiB of per-chip KV.
    """
    E, L = cfg.hidden_size, cfg.n_layer
    Hq, Hkv, D = cfg.n_head, cfg.n_kv_head, cfg.head_dim
    I, V = cfg.intermediate_size, cfg.vocab_size
    mp = mesh.shape[axis]
    Hkl = Hkv // mp
    G = Hq // Hkv
    Hql = Hq // mp
    Es = E // mp
    C = capacity
    scale = 1.0 / math.sqrt(float(D))
    eps_q = 1e-8  # QuantizedKV default eps

    inv_freq = 1.0 / (
        cfg.rope_theta
        ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D)
    )  # [D/2]

    def rms(xg, g):
        x32 = xg.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + cfg.rms_eps)
        return (y.astype(xg.dtype) * g).astype(xg.dtype)

    def rope(x, cos, sin):  # x [H, D], cos/sin [D]
        x32 = x.astype(jnp.float32)
        half = jnp.concatenate([-x32[:, D // 2:], x32[:, : D // 2]], axis=1)
        return (x32 * cos[None] + half * sin[None]).astype(x.dtype)

    if kv_mode is not None:
        k_kind, v_kind = _kv_kinds_tp(kv_mode)

    def local_step(p, cache, length, tok):
        idx = jax.lax.axis_index(axis)
        dt = p["embed"].dtype
        if kv_mode is not None:
            k, v, ks, vs = cache
        else:
            k, v = cache
        pos = jnp.minimum(length, cfg.n_positions - 1)
        x_full = p["embed"][tok][None].astype(dt)  # [1, E]
        x = jax.lax.dynamic_slice(x_full, (0, idx * Es), (1, Es))

        freqs = pos.astype(jnp.float32) * inv_freq  # [D/2]
        emb = jnp.concatenate([freqs, freqs])  # [D]
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)

        def rs_(partial):
            return jax.lax.psum_scatter(
                partial, axis, scatter_dimension=1, tiled=True
            )

        def ag(x_sh):
            return jax.lax.all_gather(x_sh, axis, axis=1, tiled=True)

        for l in range(L):
            xg = ag(x)
            h = rms(xg, p["ln1"][l])
            q = jnp.dot(h, p["wq"][l],
                        preferred_element_type=jnp.float32)  # [1, Hql*D]
            kn = jnp.dot(h, p["wk"][l], preferred_element_type=jnp.float32)
            vn = jnp.dot(h, p["wv"][l], preferred_element_type=jnp.float32)
            if "bq" in p:
                q = q + p["bq"][l].astype(jnp.float32)
                kn = kn + p["bk"][l].astype(jnp.float32)
                vn = vn + p["bv"][l].astype(jnp.float32)
            q = rope(q.astype(dt).reshape(Hql, D), cos, sin)
            kn = rope(kn.astype(dt).reshape(Hkl, D), cos, sin)
            vn = vn.astype(dt).reshape(Hkl, D)

            if kv_mode is not None:
                kq_, ks_new = _q_rows(kn, k_kind, eps_q)
                vq_, vs_new = _q_rows(vn, v_kind, eps_q)
                k = jax.lax.dynamic_update_slice(
                    k, kq_[None, :, None, :], (l, 0, length, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    v, vq_[None, :, None, :], (l, 0, length, 0)
                )
                ks = jax.lax.dynamic_update_slice(
                    ks, ks_new[None, :, None], (l, 0, length)
                )
                vs = jax.lax.dynamic_update_slice(
                    vs, vs_new[None, :, None], (l, 0, length)
                )
                # dequantize past, overlay in-flight token in fp
                # (QuantizedKV reference-numerics path)
                k_fp = _dequant_pane(k[l], ks[l], k_kind, dt)
                v_fp = _dequant_pane(v[l], vs[l], v_kind, dt)
                k_fp = jax.lax.dynamic_update_slice(
                    k_fp, kn[:, None, :], (0, length, 0)
                )
                v_fp = jax.lax.dynamic_update_slice(
                    v_fp, vn[:, None, :], (0, length, 0)
                )
            else:
                k = jax.lax.dynamic_update_slice(
                    k, kn[None, :, None, :].astype(k.dtype),
                    (l, 0, length, 0)
                )
                v = jax.lax.dynamic_update_slice(
                    v, vn[None, :, None, :].astype(v.dtype),
                    (l, 0, length, 0)
                )
                k_fp, v_fp = k[l], v[l]

            qg = q.reshape(Hkl, G, D)
            scores = jnp.einsum(
                "kgd,kcd->kgc", qg, k_fp,
                preferred_element_type=jnp.float32,
            ) * scale
            scores = jnp.where(col[None] <= length, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            ao = jnp.einsum(
                "kgc,kcd->kgd", probs, v_fp,
                preferred_element_type=jnp.float32,
            ).astype(dt).reshape(1, Hql * D)
            partial = jnp.dot(
                ao, p["wo"][l], preferred_element_type=jnp.float32
            )  # [1, E] row-parallel partial
            x = x + rs_(partial).astype(dt)

            xg2 = ag(x)
            h2 = rms(xg2, p["ln2"][l])
            gate = jnp.dot(h2, p["w_gate"][l],
                           preferred_element_type=jnp.float32)
            up = jnp.dot(h2, p["w_up"][l],
                         preferred_element_type=jnp.float32)
            act = (jax.nn.silu(gate) * up).astype(dt)  # [1, I/mp]
            partial2 = jnp.dot(
                act, p["w_down"][l], preferred_element_type=jnp.float32
            )
            x = x + rs_(partial2).astype(dt)

        xf = rms(ag(x), p["ln_f"])  # [1, E]
        wl = p["embed_tp"]  # [Vl, E]
        Vl = wl.shape[0]
        logits = jnp.dot(xf, wl.T, preferred_element_type=jnp.float32)
        lcol = jax.lax.broadcasted_iota(jnp.int32, (1, Vl), 1) + idx * Vl
        logits = jnp.where(lcol < V, logits, NEG_INF)
        lmax = jnp.max(logits, axis=1)
        lidx = jnp.argmax(logits, axis=1).astype(jnp.int32) + idx * Vl
        gmax = jax.lax.all_gather(lmax, axis, axis=0, tiled=True)
        gidx = jax.lax.all_gather(lidx, axis, axis=0, tiled=True)
        tok2 = gidx[jnp.argmax(gmax)]
        if kv_mode is not None:
            return (k, v, ks, vs), tok2
        return (k, v), tok2

    def local_decode(p, *args):
        *cache, length, tok0 = args
        cache = tuple(cache)

        def step(carry, _):
            cache, length, tok = carry
            cache, tok2 = local_step(p, cache, length, tok)
            return (cache, length + 1, tok2), tok

        (cache, length, _), toks = jax.lax.scan(
            step, (cache, length, tok0), None, length=n_steps
        )
        return (toks,) + cache + (length,)

    kv_spec = P(None, axis, None, None)
    sc_spec = P(None, axis, None)
    if kv_mode is not None:
        cache_specs = (kv_spec, kv_spec, sc_spec, sc_spec)
    else:
        cache_specs = (kv_spec, kv_spec)

    def wrapped(p, *args):
        specs = llama_tp_param_specs(p, axis)
        return shard_map(
            local_decode,
            mesh=mesh,
            in_specs=(specs,) + cache_specs + (P(), P()),
            out_specs=(P(),) + cache_specs + (P(),),
            check_vma=False,
        )(p, *args)

    return jax.jit(wrapped)


_PREFILL_CACHE: dict = {}


def _cached_prefill(spec, strategy):
    """make_prefill once per (model config, strategy) — a fresh closure per
    call would defeat jax.jit's cache and recompile every generation."""
    from ..engine.generate import make_prefill

    key = (spec.name, spec.config, strategy)
    if key not in _PREFILL_CACHE:
        _PREFILL_CACHE[key] = make_prefill(spec, strategy, None)
    return _PREFILL_CACHE[key]


def tp_generate(spec, params, mesh, ids, max_new_tokens: int,
                axis: str = "model", kv_mode: str = None,
                tp_params=None):
    """End-to-end explicit-TP greedy generation from token ids.

    The serving composition the per-kernel builders above leave to the
    caller: XLA prefill over the prompt (replicated weights — prefill is
    compute-bound, one dispatch), cache buffers resharded over KV heads,
    then the explicit-collective shard_map decode loop. Returns the
    generated token ids (length max_new_tokens).

    spec/params: a ModelSpec + params pytree (models/gpt2.py or
    models/llama.py families). kv_mode None = fp cache; "int8" | "int4" |
    "mixed" = quantized KV panes + per-(head, token) scales, the TP
    composition of QuantizedKV(granularity="per_head"), both families.
    """
    import numpy as np

    from ..cache.kvcache import DenseKV, QuantizedKV

    cfg = spec.config
    family = spec.name
    assert family in ("gpt2", "llama"), family
    assert kv_mode in (None, "int8", "int4", "mixed")

    n = len(ids)
    cap = n + max_new_tokens + 1
    bucket = max(8, -(-n // 8) * 8)
    kw = dict(n_layer=spec.n_layer, n_head=spec.n_kv_head,
              head_dim=spec.head_dim, capacity=cap)
    strategy = (
        QuantizedKV(**kw, mode=kv_mode, granularity="per_head", fused=False)
        if kv_mode else DenseKV(**kw)
    )
    if kv_mode in ("int4", "mixed"):
        assert spec.head_dim % 2 == 0, "int4 panes need an even head_dim"
    prefill = _cached_prefill(spec, strategy)
    buf = np.zeros((1, bucket), np.int32)
    buf[0, :n] = ids
    cache, last = prefill(params, jnp.asarray(buf), jnp.int32(n))
    tok0 = jnp.argmax(last[0]).astype(jnp.int32)

    kv_sh = NamedSharding(mesh, P(None, axis, None, None))
    k0 = jax.device_put(cache["k"][:, 0], kv_sh)
    v0 = jax.device_put(cache["v"][:, 0], kv_sh)
    if kv_mode:
        sc_sh = NamedSharding(mesh, P(None, axis, None))
        ks0 = jax.device_put(cache["k_scale"], sc_sh)
        vs0 = jax.device_put(cache["v_scale"], sc_sh)
        cache_args = (k0, v0, ks0, vs0)
    else:
        cache_args = (k0, v0)

    if family == "gpt2":
        if tp_params is None:
            tp_params = shard_gpt2_tp(params, cfg, mesh, axis)
        decode = make_tp_decode(
            cfg, mesh, max_new_tokens, cap, axis, kv_mode=kv_mode
        )
    else:
        if tp_params is None:
            tp_params = shard_llama_tp(params, cfg, mesh, axis)
        decode = make_llama_tp_decode(
            cfg, mesh, max_new_tokens, cap, axis, kv_mode=kv_mode
        )
    toks, *_ = decode(tp_params, *cache_args, jnp.int32(n), tok0)
    return np.asarray(toks).tolist()
