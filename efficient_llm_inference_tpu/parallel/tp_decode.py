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


def make_tp_decode(cfg, mesh, n_steps: int, capacity: int,
                   axis: str = "model"):
    """Greedy TP decode loop with explicit collectives.

    Returns decode(tp_params, k, v, length, tok0) -> (toks [n_steps] i32,
    k, v, length'): k/v are head-sharded [L, H, C, D] caches, tok0 the
    first feed token, length the tokens already cached. Token-exact vs the
    unsharded XLA decode up to psum partial-sum reassociation (greedy
    argmax is robust to it; asserted on the 8-device CPU mesh in
    tests/test_tp_decode.py).
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

    def local_step(p, k, v, length, tok):
        """One decode step on one device's shard (runs under shard_map)."""
        idx = jax.lax.axis_index(axis)
        dt = p["wte"].dtype
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
            k = jax.lax.dynamic_update_slice(
                k, kn[None, :, None, :].astype(k.dtype), (l, 0, length, 0)
            )
            v = jax.lax.dynamic_update_slice(
                v, vn[None, :, None, :].astype(v.dtype), (l, 0, length, 0)
            )
            scores = jnp.einsum(
                "hd,hcd->hc", q, k[l], preferred_element_type=jnp.float32
            ) * scale
            scores = jnp.where(col <= length, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            ao = jnp.einsum(
                "hc,hcd->hd", probs, v[l], preferred_element_type=jnp.float32
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
        return k, v, tok2

    def local_decode(p, k, v, length, tok0):
        def step(carry, _):
            k, v, length, tok = carry
            k, v, tok2 = local_step(p, k, v, length, tok)
            return (k, v, length + 1, tok2), tok

        (k, v, length, _), toks = jax.lax.scan(
            step, (k, v, length, tok0), None, length=n_steps
        )
        return toks, k, v, length

    pspecs = tp_param_specs(axis)
    kv_spec = P(None, axis, None, None)
    decode = shard_map(
        local_decode,
        mesh=mesh,
        in_specs=(pspecs, kv_spec, kv_spec, P(), P()),
        out_specs=(P(), kv_spec, kv_spec, P()),
        check_vma=False,
    )
    return jax.jit(decode)
