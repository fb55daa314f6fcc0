"""Batched whole-step decode megakernel: B independent streams, one program.

The single-stream megakernel (ops/pallas/megakernel.py) showed that decode is
weight-bandwidth bound: the whole step costs ~one pass over the weights. The
R-row verify pass (gpt2_megaverify) then showed that R rows ride that same
pass for almost free. This module applies the same observation to BATCHED
decode: B *independent* sequences (own cache pane, own length, own position)
step together in ONE Pallas program, so the per-step weight stream — the
dominant cost — is paid once for B tokens instead of B times. That is the
slot-blocked "megakernel batch>1" design docs/ROADMAP.md #4 calls for, and
it is the TPU-native answer to the reference's batched serving loop
(/root/reference/src/benchmarking/benchmarker.py:473 runs one HF forward per
step per batch and pays full weight traffic regardless of batch size).

What changes vs the R-row verify kernel:

* Rows are independent streams, not a causal block: row b attends ONLY its
  own cache pane columns < lengths[b] plus its own current token — there is
  no in-block coupling, and each row has its own RoPE/positional phase
  (the caller bakes positions into x_emb for GPT-2).
* The KV cache is [L, B, C, E]: layer l's panes for ALL slots arrive as one
  contiguous [B, C, E] DMA per K/V per layer (2-deep ring as before) — B
  small pane fetches would be DMA-issue bound at serving batch sizes.
* Cache writeback is per-slot: each slot's new K/V row lands at its own
  `lengths[b]`, so the aligned 8-row read-modify-write window (Mosaic DMA
  cannot address single sub-tile rows) is per (slot): 2B window-in DMAs
  overlap the first layers, 2B window-out DMAs overlap the LM-head stream.
* The matmul chain runs at [B, E] row width — better MXU utilization than
  the single row's [1, E] — through the same int8 / grouped-int4 in-kernel
  dequant tiles (`_int4_tile_dot`) as the single-stream kernel.

Numerics per row are identical to the single-stream megakernel up to the
usual [B, E]-vs-[1, E] fp32 reassociation of batched dots;
tests/test_megakernel_batch.py asserts token-exact decode per row against
the XLA path in interpret mode (fp32).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel import (
    _gpt2_weight_mode,
    _num_lm_tiles,
    _tile_bytes,
    _gpt2_int4_group,
)
from .megakernel_llama import _int4_tile_dot, _s4_geom

NEG_INF = float(jnp.finfo(jnp.float32).min)

# Batched rings are bigger than the single-stream kernel's ([B, C, E] panes);
# the Llama megakernel already runs a 40 MB scratch envelope on v5e.
_VMEM_BUDGET = 40 * 1024 * 1024
_ATTN_CHUNK = 256  # smaller than the single-stream kernels' 512: B unrolled
# per-row attention bodies multiply Mosaic's scoped-VMEM temporaries
# (measured: B=8 C=512 at chunk 512 overshoots the default 16 MB scoped
# limit by 800 KB)
_SCOPED_VMEM = 64 * 1024 * 1024  # raised scoped limit for the temporaries
# (bf16 tile streams measured 35.1 MB scoped at B=8 C=512; v5e VMEM is
# 128 MB/core and the _VMEM_BUDGET gate caps explicit scratch at 40 MB,
# so 64 MB scoped + scratch stays within the core)
_S4_VMEM_MAX = 4 * 1024 * 1024


def to_mega_layout_batch(buf: jax.Array) -> jax.Array:
    """[L, B, H, C, D] cache buffer -> [L, B, C, H*D] kernel layout."""
    L, B, H, C, D = buf.shape
    return buf.transpose(0, 1, 3, 2, 4).reshape(L, B, C, H * D)


def from_mega_layout_batch(kb: jax.Array, H: int) -> jax.Array:
    """[L, B, C, H*D] kernel layout -> [L, B, H, C, D] cache buffer."""
    L, B, C, HD = kb.shape
    return kb.reshape(L, B, C, H, HD // H).transpose(0, 1, 3, 2, 4)


def _pick_tps_batch(
    E: int, C: int, B: int, L: int, tile_bytes: int, dt_item: int
) -> int:
    """Largest slab (1..3 tiles) whose rings + batch scratch fit the budget."""
    kv_ring = 4 * B * C * E * dt_item  # 2-deep ring for K and for V
    rows = 2 * L * B * E * dt_item  # knew/vnew
    rmw = 2 * B * L * 8 * E * dt_item  # per-slot RMW windows
    attn = 6 * min(C, _ATTN_CHUNK) * E * 4  # fp32 attention temporaries
    for tps in (3, 2, 1):
        if 2 * tps * tile_bytes + kv_ring + rows + rmw + attn <= _VMEM_BUDGET:
            return tps
    return 0


def mega_batch_supported(cfg, capacity: int, params: dict, batch: int) -> bool:
    """Engine-side eligibility for the batched GPT-2 megakernel."""
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
    G = 0
    if mode == "int4":
        G = _gpt2_int4_group(params)
        if G == 0 or E % G or (E // 2) % G or E % 16:
            return False
    dt_item = jnp.dtype(params["wte"].dtype).itemsize
    return _pick_tps_batch(
        E, capacity, batch, cfg.n_layer, _tile_bytes(mode, E, G, dt_item),
        dt_item,
    ) > 0


@functools.partial(jax.jit, static_argnames=("cfg", "capacity", "interpret"))
def gpt2_megabatch(
    packed: dict,
    k: jax.Array,  # [L, B, C, E] batch mega-layout cache (aliased output)
    v: jax.Array,
    lengths: jax.Array,  # int32 [B] — per-slot tokens already cached
    x_emb: jax.Array,  # [B, E] per-slot token+position embedding
    *,
    cfg: Any,
    capacity: int,
    interpret: bool = False,
):
    """One decode step for B independent streams. Returns (tokens [B], k, v).

    Slot b's new K/V row is written at column lengths[b] of ITS pane and its
    greedy next token comes back in tokens[b]. Requires capacity % 8 == 0 and
    lengths[b] + 1 <= capacity for every slot.
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    B = x_emb.shape[0]
    V = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    n_lm = _num_lm_tiles(V, E)
    n_tiles = L * 12 + n_lm
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    dtype = k.dtype
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
    tps = _pick_tps_batch(E, C, B, L, tile_b, dt_item)
    if tps == 0:
        raise ValueError(
            "batched megakernel does not fit VMEM at this (batch, capacity)"
        )
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)

    def ln(x32, g, b_):  # row-wise LN, [B, E] fp32
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        return (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b_

    def kernel(len_ref, x_ref, w_ref, k_ref, v_ref, sm_ref, lnf_ref, ws_ref,
               s4_ref, tok_ref, ko_ref, vo_ref, *scr):
        if int4_w and not s4_vmem:
            (wbuf, sbuf, kbuf, vbuf, knew, vnew, gk, gv,
             wsem, ssem, ksem, vsem, gsem, osem) = scr
        else:
            (wbuf, kbuf, vbuf, knew, vnew, gk, gv,
             wsem, ksem, vsem, gsem, osem) = scr
            sbuf = ssem = None

        if int4_w:
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (E // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (E // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
        sel = (e_ids == h_ids).astype(jnp.float32)  # [E, H]
        selT = sel.T

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

        def kdma(slot, l):  # whole-batch pane: one DMA per layer
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

        # per-slot aligned RMW windows against the slot's own pane
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

        def seg_reduce(x32):  # [N, E] fp32 -> [N, H]
            return jax.lax.dot_general(
                x32, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_bcast(x32):  # [N, H] fp32 -> [N, E]
            return jax.lax.dot_general(
                x32, selT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        x = x_ref[:].astype(dtype)  # [B, E] residual stream

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
            knew[l] = kc16
            vnew[l] = vc16

            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            # independent per-slot attention: row b sees ONLY its own pane
            # columns < lengths[b] plus its own current token
            qf = q32.astype(dtype).astype(jnp.float32)  # [B, E]
            kf = kc16.astype(jnp.float32)
            vf = vc16.astype(jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, (C, H), 0)
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                qr = qf[b:b + 1]  # [1, E]
                s_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    kc = kbuf[l % 2, b, c0:c0 + cw, :].astype(jnp.float32)
                    s_chunks.append(seg_reduce(kc * qr))
                scores = jnp.concatenate(s_chunks, axis=0) * scale  # [C, H]
                scores = jnp.where(row < cur_b, scores, NEG_INF)
                s_cur = seg_reduce(kf[b:b + 1] * qr) * scale  # [1, H]
                mx = jnp.maximum(
                    jnp.max(scores, axis=0, keepdims=True), s_cur
                )
                p = jnp.exp(scores - mx)  # [C, H]
                p_cur = jnp.exp(s_cur - mx)
                denom = jnp.sum(p, axis=0, keepdims=True) + p_cur
                ao = jnp.zeros((1, E), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    vc = vbuf[l % 2, b, c0:c0 + cw, :].astype(jnp.float32)
                    pe = seg_bcast(p[c0:c0 + cw])
                    ao = ao + jnp.sum(pe * vc, axis=0, keepdims=True)
                ao = ao + seg_bcast(p_cur) * vf[b:b + 1]
                a_rows.append(ao / seg_bcast(denom))
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

        # per-slot writeback: insert slot b's new rows at lengths[b] inside
        # its 8-row window, start the window-out DMAs, overlap the LM head
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 8, E), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)  # 0..7
            ins = ridx == off_b
            gk[b] = jnp.where(
                ins, jnp.broadcast_to(knew[:, b:b + 1, :], (L, 8, E)), gk[b]
            )
            gv[b] = jnp.where(
                ins, jnp.broadcast_to(vnew[:, b:b + 1, :], (L, 8, E)), gv[b]
            )
        gk_outs = [group_out(gk, ko_ref, b, osem.at[0, b]) for b in range(B)]
        gv_outs = [group_out(gv, vo_ref, b, osem.at[1, b]) for b in range(B)]
        for d in gk_outs:
            d.start()
        for d in gv_outs:
            d.start()

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
        pltpu.VMEM((2, B, C, E), dtype),  # K ring (whole-batch panes)
        pltpu.VMEM((2, B, C, E), dtype),  # V ring
        pltpu.VMEM((L, B, E), dtype),  # new K rows
        pltpu.VMEM((L, B, E), dtype),  # new V rows
        pltpu.VMEM((B, L, 8, E), dtype),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 8, E), dtype),  # per-slot RMW windows (V)
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, B, C, E]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, B, C, E), k.dtype),
            jax.ShapeDtypeStruct((L, B, C, E), v.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases={3: 1, 4: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=interpret,
    )
    wscale = packed.get("wscale")
    if wscale is None:
        wscale = jnp.ones((n_tiles, E), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:
        w4scale = jnp.zeros((1, 1, 128), dtype)
    toks, k2, v2 = f(
        jnp.reshape(lengths.astype(jnp.int32), (B, 1)),
        x_emb,
        packed["wstack"],
        k,
        v,
        packed["smalls"],
        packed["lnf"],
        wscale,
        w4scale,
    )
    return toks[:, 0], k2, v2


# ---------------------------------------------------------------------------
# Llama-family batched step (GQA in compact KV lane space, RoPE, SwiGLU)
# ---------------------------------------------------------------------------

def to_mega_layout_batch_llama(buf: jax.Array) -> jax.Array:
    """[L, B, Hkv, C, D] cache buffer -> [L, B, C, Hkv*D] kernel layout."""
    return to_mega_layout_batch(buf)


def _llama_pick_tps_batch(
    C: int, B: int, L: int, KW: int, slot_bytes: int, ws_bytes: int,
    dt_item: int,
) -> int:
    """1 if the weight(+scale) ring + batched KV rings + per-slot RMW
    windows + fp32 attention temporaries fit the budget, else 0."""
    kv_ring = 4 * B * C * KW * dt_item
    rows = 2 * L * B * KW * dt_item  # knew/vnew
    rmw = 2 * B * L * 8 * KW * dt_item
    attn = 6 * min(C, _ATTN_CHUNK) * KW * 4
    if 2 * slot_bytes + kv_ring + rows + rmw + ws_bytes + attn <= _VMEM_BUDGET:
        return 1
    return 0


def llama_mega_batch_supported(
    cfg, capacity: int, params: dict, batch: int
) -> bool:
    """Engine-side eligibility for the batched Llama megakernel."""
    from .megakernel_llama import (
        _WEIGHT_NAMES,
        _num_lm_tiles as _llama_num_lm_tiles,
        _q4_group,
        _tile_geometry,
        _tiles_per_layer,
        _w_slot_bytes,
        _weight_mode,
    )

    b = params.get("blocks", {})
    mode = _weight_mode(b)
    if mode is None:
        return False
    if mode == "int8" and "lm_q" not in params:
        return False
    if mode == "int4" and "lm_q4" not in params:
        return False
    if mode == "f" and not cfg.tie_embeddings and "lm_head" not in params:
        return False
    TR, TC, Ip = _tile_geometry(cfg)
    KW = cfg.n_kv_head * cfg.head_dim
    if TC % 128 != 0 or KW % 128 != 0 or TR % 8 != 0:
        return False
    if cfg.head_dim % 2 != 0 or capacity % 8 != 0 or batch < 1:
        return False
    G = 0
    if mode == "int4":
        gs = {_q4_group(b[n]) for n in _WEIGHT_NAMES}
        gs.add(_q4_group({"q4": params["lm_q4"]}))
        if len(gs) != 1:
            return False
        G = gs.pop()
        if TR % G or (TR // 2) % G or TR % 16:
            return False
        if (Ip - cfg.intermediate_size) % G:
            return False
    dt_item = jnp.dtype(params["embed"].dtype).itemsize
    n_tiles = cfg.n_layer * _tiles_per_layer(cfg, TR, TC, Ip) + (
        _llama_num_lm_tiles(cfg.vocab_size, TC) * (cfg.hidden_size // TR)
    )
    from .megakernel_llama import _s4_half_rows
    slot_bytes = _w_slot_bytes(
        mode, TR, TC, G, dt_item,
        2 * _s4_half_rows(TR, G) if mode == "int4" else None,
    )
    if n_tiles > 2048 and slot_bytes < 256 * 1024:
        return False  # DMA-issue bound (same gate as the single-stream kernel)
    stream_cap = 5 * 1024**3 if mode == "int4" else 4 * 1024**3
    if n_tiles * slot_bytes > stream_cap:
        return False
    if mode == "int8":
        ws_bytes = 4 * n_tiles * TC
    elif mode == "int4":
        ws_bytes = (TR // 2) * ((TR // G) // 2) * 4
    else:
        ws_bytes = 0
    if "bq" in b:
        ws_bytes += 4 * cfg.n_layer * (cfg.n_head * cfg.head_dim + 2 * KW)
    return _llama_pick_tps_batch(
        capacity, batch, cfg.n_layer, KW, slot_bytes, ws_bytes, dt_item
    ) > 0


@functools.partial(jax.jit, static_argnames=("cfg", "capacity", "interpret"))
def llama_megabatch(
    packed: dict,
    k: jax.Array,  # [L, B, C, KW] batch mega-layout cache (aliased output)
    v: jax.Array,
    lengths: jax.Array,  # int32 [B] — per-slot tokens already cached
    x_emb: jax.Array,  # [B, E] per-slot token embedding
    cos_q: jax.Array,  # [B, Hq*D] f32 — per-slot RoPE phase, tiled per head
    sin_q: jax.Array,  # [B, Hq*D] f32
    *,
    cfg: Any,
    capacity: int,
    interpret: bool = False,
):
    """One Llama decode step for B independent streams.

    Returns (tokens int32 [B], new k, new v). Same independent-stream
    semantics as gpt2_megabatch; attention runs in compact GQA lane space
    exactly as ops/pallas/megakernel_llama.py (see its module docstring),
    with per-slot masking/current-token merge/RMW writeback.
    """
    import math as _math

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
    eps = cfg.rms_eps
    TR, TC, Ip = _tile_geometry(cfg)
    plan = _layer_tile_plan(cfg, TR, TC, Ip)
    per_layer = sum(r * c for _, r, c in plan)
    n_lm = _llama_num_lm_tiles(V, TC)
    n_tiles = L * per_layer + n_lm * (E // TR)
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    has_bias = "qkvb" in packed
    dtype = k.dtype
    dt_item = jnp.dtype(dtype).itemsize
    s4_vmem = False
    if int4_w:
        G, n_gh, s4p = _s4_geom(TR, packed)
        s4_rows = packed["w4scale"].shape[1]
        mode = "int4"
        gsel_bytes = (TR // 2) * n_gh * 4
        s4_bytes = n_tiles * s4_rows * TC * dt_item
        s4_vmem = _llama_pick_tps_batch(
            C, B, L, KW, (TR // 2) * TC, gsel_bytes + s4_bytes, dt_item
        ) > 0
        ws_vmem = gsel_bytes + (s4_bytes if s4_vmem else 0)
    else:
        G, n_gh, s4p = TR, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
        ws_vmem = 4 * n_tiles * TC if int8_w else 0
    tps = _llama_pick_tps_batch(
        C, B, L, KW,
        (TR // 2) * TC if s4_vmem
        else _w_slot_bytes(mode, TR, TC, G, dt_item, s4_rows or None),
        ws_vmem, dt_item,
    )
    if tps == 0:
        raise ValueError(
            "batched llama megakernel does not fit VMEM at this "
            "(batch, capacity)"
        )
    scale = 1.0 / _math.sqrt(float(D))
    half = D // 2

    name_off = {}
    off = 0
    for name, r, c in plan:
        name_off[name] = (off, r, c)
        off += r * c

    def rms(x, g32):
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + eps)
        return y.astype(dtype) * g32.astype(dtype)

    def rot_half(x32, W):
        rp = jnp.concatenate([x32[:, W - half:], x32[:, :W - half]], axis=1)
        rm = jnp.concatenate([x32[:, half:], x32[:, :half]], axis=1)
        d = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1) % D
        return jnp.where(d < half, -rm, rp)

    def kernel(len_ref, x_ref, cq_ref, sq_ref, w_ref, k_ref, v_ref,
               nm_ref, lnf_ref, ws_ref, qb_ref, s4_ref,
               tok_ref, ko_ref, vo_ref, *scr):
        if int4_w and not s4_vmem:
            (wbuf, sbuf, kbuf, vbuf, knew, vnew, gk, gv,
             wsem, ssem, ksem, vsem, gsem, osem) = scr
        else:
            (wbuf, kbuf, vbuf, knew, vnew, gk, gv,
             wsem, ksem, vsem, gsem, osem) = scr
            sbuf = ssem = None

        if int4_w:
            r_ids = jax.lax.broadcasted_iota(
                jnp.int32, (TR // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (TR // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        kl_ids = jax.lax.broadcasted_iota(jnp.int32, (KW, Hkv), 0) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (KW, Hkv), 1)
        sel = (kl_ids == h_ids).astype(jnp.float32)  # [KW, Hkv]
        selT = sel.T

        def wdma(slot, t):
            return pltpu.make_async_copy(
                w_ref.at[t], wbuf.at[slot], wsem.at[slot]
            )

        def sdma(slot, t):
            return pltpu.make_async_copy(
                s4_ref.at[t], sbuf.at[slot], ssem.at[slot]
            )

        def kdma(slot, l):  # whole-batch [B, C, KW] pane per layer
            return pltpu.make_async_copy(k_ref.at[l], kbuf.at[slot],
                                         ksem.at[slot])

        def vdma(slot, l):
            return pltpu.make_async_copy(v_ref.at[l], vbuf.at[slot],
                                         vsem.at[slot])

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
            # depth-1 pipelined tile stream (dynamic t — program size is
            # independent of the tile count, as megakernel_llama.py)
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < n_tiles)
            def _():
                wdma(nxt, t + 1).start()
                if int4_w and not s4_vmem:
                    sdma(nxt, t + 1).start()

            wdma(slot, t).wait()
            if int4_w and not s4_vmem:
                sdma(slot, t).wait()
            return slot

        def tile_dot(xg, t):
            slot = tile(t)
            if not int4_w:
                return jax.lax.dot_general(
                    xg, wbuf[pl.ds(slot, 1)][0].astype(dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            pk = wbuf[pl.ds(slot, 1)][0]
            if s4_vmem:
                st = s4_ref[pl.ds(t, 1)][0]
            else:
                st = sbuf[pl.ds(slot, 1)][0]
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
                    acc = acc * brow(ws_ref[pl.ds(base + c * rg, 1)])
                outs.append(acc)
            return outs

        ones_b = jnp.ones((B, 1), jnp.float32)

        def brow(row):  # [1, X] f32 -> [B, X] via MXU (Mosaic cannot
            # legalize vector.broadcast of [1, 256]-wide f32 rows —
            # "Invalid input layout" on Qwen's TC = KW = 256 geometry)
            return jax.lax.dot_general(
                ones_b, row, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_reduce(x32):
            return jax.lax.dot_general(
                x32, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_bcast(x32):
            return jax.lax.dot_general(
                x32, selT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        cosq = cq_ref[:]  # [B, QW] f32, per-slot phase
        sinq = sq_ref[:]
        cosk, sink = cosq[:, :KW], sinq[:, :KW]

        x = x_ref[:].astype(dtype)  # [B, E]

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
            knew[pl.ds(l, 1)] = kc16[None]
            vnew[pl.ds(l, 1)] = vc16[None]

            @pl.when(l + 1 < L)
            def _():
                nxt = jax.lax.rem(l + 1, 2)
                kdma(nxt, l + 1).start()
                vdma(nxt, l + 1).start()

            kdma(par, l).wait()
            vdma(par, l).wait()

            qf_all = q_rope.astype(jnp.float32)  # [B, QW]
            kcur32 = kc16.astype(jnp.float32)  # [B, KW]
            vcur32 = vc16.astype(jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, (C, Hkv), 0)
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

                s_chunks = [[] for _ in range(GR)]
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    kc = kbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                        jnp.float32)
                    for r in range(GR):
                        s_chunks[r].append(seg_reduce(kc * q_rs[r]))
                p_rs, pc_rs, denom_rs = [], [], []
                for r in range(GR):
                    scores = jnp.concatenate(s_chunks[r], axis=0) * scale
                    scores = jnp.where(row < cur_b, scores, NEG_INF)
                    s_cur = seg_reduce(kcur32[b:b + 1] * q_rs[r]) * scale
                    mx = jnp.maximum(
                        jnp.max(scores, axis=0, keepdims=True), s_cur
                    )
                    p = jnp.exp(scores - mx)  # [C, Hkv]
                    p_cur = jnp.exp(s_cur - mx)
                    denom_rs.append(
                        jnp.sum(p, axis=0, keepdims=True) + p_cur
                    )
                    p_rs.append(p)
                    pc_rs.append(p_cur)
                ao_rs = []
                for r in range(GR):
                    ao = jnp.zeros((1, KW), jnp.float32)
                    for c0 in range(0, C, _ATTN_CHUNK):
                        cw = min(_ATTN_CHUNK, C - c0)
                        vc = vbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                            jnp.float32)
                        pe = seg_bcast(p_rs[r][c0:c0 + cw])
                        ao = ao + jnp.sum(pe * vc, axis=0, keepdims=True)
                    ao = ao + seg_bcast(pc_rs[r]) * vcur32[b:b + 1]
                    ao_rs.append(ao / seg_bcast(denom_rs[r]))
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

        # per-slot writeback at each slot's own cursor
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 8, KW), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)
            ins = ridx == off_b
            gk[b] = jnp.where(
                ins, jnp.broadcast_to(knew[:, b:b + 1, :], (L, 8, KW)), gk[b]
            )
            gv[b] = jnp.where(
                ins, jnp.broadcast_to(vnew[:, b:b + 1, :], (L, 8, KW)), gv[b]
            )
        gk_outs = [group_out(gk, ko_ref, b, osem.at[0, b]) for b in range(B)]
        gv_outs = [group_out(gv, vo_ref, b, osem.at[1, b]) for b in range(B)]
        for d in gk_outs:
            d.start()
        for d in gv_outs:
            d.start()

        xf = rms(x, lnf_ref[:])  # [B, E]
        lm_base = L * per_layer
        rg_lm = E // TR
        cidx = jax.lax.broadcasted_iota(jnp.int32, (B, TC), 1)
        big = jnp.int32(2 ** 30)

        def lm_body(t, carry):
            best, best_idx = carry
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
        pltpu.VMEM((2, B, C, KW), dtype),  # K ring (whole-batch panes)
        pltpu.VMEM((2, B, C, KW), dtype),  # V ring
        pltpu.VMEM((L, B, KW), dtype),  # new K rows
        pltpu.VMEM((L, B, KW), dtype),  # new V rows
        pltpu.VMEM((B, L, 8, KW), dtype),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 8, KW), dtype),  # per-slot RMW windows (V)
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # k [L, B, C, KW]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norms
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, B, C, KW), k.dtype),
            jax.ShapeDtypeStruct((L, B, C, KW), v.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases={5: 1, 6: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=interpret,
    )
    wscale = packed.get("wscale")
    if wscale is None:
        wscale = jnp.ones((1, TC), jnp.float32)
    qkvb = packed.get("qkvb")
    if qkvb is None:
        qkvb = jnp.zeros((L, 1), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:
        w4scale = jnp.zeros((1, 1, 128), dtype)
    toks, k2, v2 = f(
        jnp.reshape(lengths.astype(jnp.int32), (B, 1)),
        x_emb,
        cos_q.astype(jnp.float32),
        sin_q.astype(jnp.float32),
        packed["wstack"],
        k,
        v,
        packed["norms"],
        packed["lnf"],
        wscale,
        qkvb,
        w4scale,
    )
    return toks[:, 0], k2, v2
