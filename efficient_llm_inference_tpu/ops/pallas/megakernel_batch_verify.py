"""Batched speculative-verify megakernel: B slots x R verify rows, one program.

Composes the two proven megakernel shapes into the one the serving engine
was missing (round-4 verdict #1):

* `gpt2_megaverify` (ops/pallas/megakernel.py) rides R in-block-causal
  verify rows on ONE weight-streaming pass — the speculative-decoding
  primitive, but single-stream only.
* `gpt2_megabatch` (ops/pallas/megakernel_batch.py) steps B independent
  slot panes on one weight pass — the continuous-batching primitive, but
  one token per slot per step.

This kernel does both at once: every slot advances up to R tokens per
weight pass. Slot b's R rows carry its verify block (its current token +
R-1 proposals); row (b, r) attends slot b's pane columns < lengths[b]
PLUS slot b's in-block rows j <= r (the same causal set as the XLA verify
forward). The R new K/V rows land at lengths[b] of slot b's pane through
a per-slot 16-row aligned read-modify-write window, and the per-row
greedy argmax comes back as [B, R] so the host-free acceptance logic
(engine/megaserver.py spec mode) can roll each slot back independently —
rollback is a pure per-slot length update, rejected rows are simply
overwritten by the next round's verify block.

The matmul chain runs at [B*R, E] row width — the fattest MXU shape any
kernel in this package feeds — over the same int8 / grouped-int4 dequant
tile stream as the step kernels. The per-slot attention bodies are the
cost that scales: B*R chunked pane reductions per layer (vs B for the
step kernel), which is why `mega_batch_verify_supported` gates on a
separate VMEM envelope (per-slot 16-row RMW windows + [B*R]-row scratch).

No reference counterpart on either axis: the reference is batch-1 with
one HF forward per token (/root/reference/src/benchmarking/benchmarker.py:63-639)
and has no speculative decoding at all. Numerics per row are identical
to the single-stream verify kernel up to [B*R, E]-vs-[R, E] fp32 dot
reassociation; tests/test_megakernel_batch_verify.py asserts per-slot
token-exactness against independent XLA verify forwards in fp32
interpret mode.
"""

from __future__ import annotations

import functools
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
from .megakernel_llama import _int4_tile_dot

NEG_INF = float(jnp.finfo(jnp.float32).min)

# Verify rings carry the same whole-batch panes as the step kernel plus
# [B*R]-row scratch and 16-row (not 8-row) per-slot RMW windows; the
# envelope is its own constant so the step kernels' tuning is untouched.
_VMEM_BUDGET = 44 * 1024 * 1024
_ATTN_CHUNK = 256
_SCOPED_VMEM = 64 * 1024 * 1024
_S4_VMEM_MAX = 4 * 1024 * 1024


def _pick_tps_batch_verify(
    E: int, C: int, B: int, R: int, L: int, tile_bytes: int, dt_item: int
) -> int:
    """Largest slab (1..3 tiles) whose rings + verify scratch fit."""
    kv_ring = 4 * B * C * E * dt_item  # 2-deep ring for K and for V
    rows = 2 * L * B * R * E * dt_item  # knew/vnew, R rows per slot
    rmw = 2 * B * L * 16 * E * dt_item  # per-slot 16-row RMW windows
    # fp32 attention temporaries live in SCOPED vmem (separate 64 MB
    # limit), so only a small margin is charged against the scratch budget
    attn = 4 * min(C, _ATTN_CHUNK) * E * 4
    for tps in (3, 2, 1):
        if 2 * tps * tile_bytes + kv_ring + rows + rmw + attn <= _VMEM_BUDGET:
            return tps
    return 0


def mega_batch_verify_supported(
    cfg, capacity: int, params: dict, batch: int, rows: int
) -> bool:
    """Engine-side eligibility for the batched GPT-2 verify megakernel."""
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
    if rows < 1 or rows > 8 or capacity < 16:
        return False  # verify block must fit one 16-row RMW window
    G = 0
    if mode == "int4":
        G = _gpt2_int4_group(params)
        if G == 0 or E % G or (E // 2) % G or E % 16:
            return False
    dt_item = jnp.dtype(params["wte"].dtype).itemsize
    return _pick_tps_batch_verify(
        E, capacity, batch, rows, cfg.n_layer,
        _tile_bytes(mode, E, G, dt_item), dt_item,
    ) > 0


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "rows", "interpret")
)
def gpt2_megabatch_verify(
    packed: dict,
    k: jax.Array,  # [L, B, C, E] batch mega-layout cache (aliased output)
    v: jax.Array,
    lengths: jax.Array,  # int32 [B] — per-slot tokens already cached
    x_emb: jax.Array,  # [B*R, E] verify-row embeddings, slot-major
    *,
    cfg: Any,
    capacity: int,
    rows: int,
    interpret: bool = False,
):
    """Verify R rows for each of B slots in ONE weight pass (greedy).

    Returns (tokens int32 [B, R], new k, new v). Slot b's rows are
    x_emb[b*R:(b+1)*R]; its R new K/V rows are written at columns
    lengths[b]..lengths[b]+R-1 of ITS pane. Requires rows <= 8,
    capacity % 8 == 0 and, per slot, (lengths[b]//8)*8 + 16 <= capacity
    (the caller clamps slot cursors so the RMW window stays in-pane).
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    R = rows
    B = x_emb.shape[0] // R
    V = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    assert R <= 8 and x_emb.shape[0] == B * R
    n_lm = _num_lm_tiles(V, E)
    n_tiles = L * 12 + n_lm
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    dtype = k.dtype
    dt_item = jnp.dtype(dtype).itemsize
    s4_vmem = False
    if int4_w:
        G = E // packed["w4scale"].shape[1]
        n_gh = (E // G) // 2
        mode = "int4"
        s4_bytes = n_tiles * (E // G) * E * dt_item
        s4_vmem = s4_bytes <= _S4_VMEM_MAX
    else:
        G, n_gh = E, 0
        mode = "int8" if int8_w else "f"
    tile_b = (E // 2) * E if s4_vmem else _tile_bytes(mode, E, G, dt_item)
    tps = _pick_tps_batch_verify(E, C, B, R, L, tile_b, dt_item)
    if tps == 0:
        raise ValueError(
            "batched verify megakernel does not fit VMEM at this "
            "(batch, rows, capacity)"
        )
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)

    def ln(x32, g, b_):  # row-wise LN, [B*R, E] fp32
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

        # Fused R-row transposed attention constants: all R rows of a slot
        # ride ONE [R*H, E]-row dot per pane chunk (score orientation of
        # megakernel_quant.py, extended to a row block) — program size is
        # R-independent, vs the per-row chunk loops of the single-stream
        # verify kernel (compile time at B=16 R=8 made per-row loops
        # impractical: 128 unrolled bodies/layer).
        RH = R * H
        i_head = jax.lax.broadcasted_iota(jnp.int32, (RH, E), 0) % H
        e_seg = jax.lax.broadcasted_iota(jnp.int32, (RH, E), 1) // D
        selT_t = (e_seg == i_head).astype(jnp.float32)  # [RH, E]
        rep = (
            jax.lax.broadcasted_iota(jnp.int32, (RH, R), 0) // H
            == jax.lax.broadcasted_iota(jnp.int32, (RH, R), 1)
        ).astype(jnp.float32)  # [RH, R]: repeat q row r into H head rows
        fold = rep.T  # [R, RH]: sum a slot's H head rows back per verify row
        blk_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (RH, R), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (RH, R), 0) // H
        )  # in-block causal: row (r, h) may see block key j <= r
        col_rc = jax.lax.broadcasted_iota(jnp.int32, (RH, C), 1)

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

        # per-slot aligned 16-row RMW windows against the slot's own pane
        def group_in(ref, buf, b, sem):
            return pltpu.make_async_copy(
                ref.at[:, b, pl.ds(gbase_of(b), 16), :], buf.at[b], sem
            )

        def group_out(buf, ref, b, sem):
            return pltpu.make_async_copy(
                buf.at[b], ref.at[:, b, pl.ds(gbase_of(b), 16), :], sem
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

        def mm(x_, t, b32=None):  # [B*R, E] @ tile(t) -> [B*R, E] fp32
            slab, off = tile_slab(t)
            if int4_w:
                st = s4_ref[t] if s4_vmem else sbuf[slab, off]
                y = _int4_tile_dot(
                    x_.astype(dtype), wbuf[slab, off], st,
                    gsel, E, G, n_gh, dtype,
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

        def dot_nn(a, b):  # [M, K] @ [K, N] -> [M, N] fp32
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def dot_nt(a, b):  # [M, K] @ [N, K]^T -> [M, N] fp32
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        x = x_ref[:].astype(dtype)  # [B*R, E] residual stream, slot-major

        for l in range(L):
            base = l * 12

            def sm(r):
                return sm_ref[l, r:r + 1]

            h = ln(x.astype(jnp.float32), sm(0), sm(1)).astype(dtype)
            q32 = mm(h, base + 0, sm(4))
            k32 = mm(h, base + 1, sm(5))
            v32 = mm(h, base + 2, sm(6))
            kc16 = k32.astype(dtype)  # [B*R, E]
            vc16 = v32.astype(dtype)
            knew[l] = kc16
            vnew[l] = vc16

            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            # per-slot fused verify-block attention: all R rows of slot b
            # ride one [RH, *] dot per pane chunk; row (b, r) sees slot
            # b's pane columns < lengths[b] plus slot b's rows j <= r.
            # U row (r*H + h) = q_r masked to head h's lane segment, so
            # dot_nt(U, pane) yields per-(row, head) scores [RH, C] and
            # the softmax runs rowwise over lanes (megakernel_quant.py's
            # transposed orientation, extended to a row block).
            qf = q32.astype(dtype).astype(jnp.float32)  # [B*R, E]
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                qf_b = qf[b * R:(b + 1) * R]  # [R, E] f32
                qrep = dot_nn(rep, qf_b)  # [RH, E]: q row r into H rows
                U = (selT_t * qrep).astype(dtype)  # dtype-exact products
                kf_b = kc16[b * R:(b + 1) * R]  # [R, E] dtype
                vf_b = vc16[b * R:(b + 1) * R]
                s_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    s_chunks.append(dot_nt(U, kbuf[l % 2, b, c0:c0 + cw, :]))
                scores = jnp.concatenate(s_chunks, axis=1) * scale  # [RH, C]
                scores = jnp.where(col_rc < cur_b, scores, NEG_INF)
                s_blk = dot_nt(U, kf_b) * scale  # [RH, R] in-block keys
                s_blk = jnp.where(blk_ok, s_blk, NEG_INF)
                mx = jnp.maximum(
                    jnp.max(scores, axis=1, keepdims=True),
                    jnp.max(s_blk, axis=1, keepdims=True),
                )  # [RH, 1]
                p = jnp.exp(scores - mx)
                p_blk = jnp.exp(s_blk - mx)  # 0 where masked
                denom = (
                    jnp.sum(p, axis=1, keepdims=True)
                    + jnp.sum(p_blk, axis=1, keepdims=True)
                )  # [RH, 1]
                M = jnp.zeros((RH, E), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    M = M + dot_nn(
                        p[:, c0:c0 + cw].astype(dtype),
                        vbuf[l % 2, b, c0:c0 + cw, :],
                    )
                M = M + dot_nn(p_blk.astype(dtype), vf_b)
                # fold the H head rows back per verify row; each lane has
                # exactly one live head row (selT_t), so the 0/1 fold
                # matmul is an exact selection for both numerator and the
                # row's own softmax denominator
                num = dot_nn(fold, M * selT_t)  # [R, E]
                den = dot_nn(fold, denom * selT_t)
                a_rows.append(num / den)
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)  # [B*R, E]

            x = x + mm(a, base + 3, sm(7)).astype(dtype)

            h2 = ln(x.astype(jnp.float32), sm(2), sm(3)).astype(dtype)
            m32 = jnp.concatenate(
                [mm(h2, base + 4 + i, sm(8 + i)) for i in range(4)], axis=-1
            )  # [B*R, 4E] fp32
            g32 = 0.5 * m32 * (
                1.0
                + jnp.tanh(0.7978845608028654 * (m32 + 0.044715 * m32 ** 3))
            )
            gh = g32.astype(dtype)
            y32 = sm(12)
            for i in range(4):
                y32 = y32 + mm(gh[:, i * E:(i + 1) * E], base + 8 + i)
            x = x + y32.astype(dtype)

        # per-slot writeback: insert slot b's R new rows at lengths[b]
        # inside its 16-row window, overlap window-out DMAs with LM head
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 16, E), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)  # 0..7, off_b + R <= 16
            gkv = gk[b]
            gvv = gv[b]
            for r in range(R):
                ins = ridx == off_b + r
                src = b * R + r
                gkv = jnp.where(
                    ins,
                    jnp.broadcast_to(knew[:, src:src + 1, :], (L, 16, E)),
                    gkv,
                )
                gvv = jnp.where(
                    ins,
                    jnp.broadcast_to(vnew[:, src:src + 1, :], (L, 16, E)),
                    gvv,
                )
            gk[b] = gkv
            gv[b] = gvv
        gk_outs = [group_out(gk, ko_ref, b, osem.at[0, b]) for b in range(B)]
        gv_outs = [group_out(gv, vo_ref, b, osem.at[1, b]) for b in range(B)]
        for d in gk_outs:
            d.start()
        for d in gv_outs:
            d.start()

        xf = ln(
            x.astype(jnp.float32), lnf_ref[0:1], lnf_ref[1:2]
        ).astype(dtype)  # [B*R, E]
        big = jnp.int32(2 ** 30)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (B * R, E), 1)
        best = jnp.full((B * R, 1), NEG_INF, jnp.float32)
        best_idx = jnp.zeros((B * R, 1), jnp.int32)
        lm_base = L * 12
        for t in range(n_lm):
            y = mm(xf, lm_base + t)  # [B*R, E] fp32 logits chunk
            if (t + 1) * E > V:
                y = jnp.where(cidx < V - t * E, y, NEG_INF)
            ymax = jnp.max(y, axis=1, keepdims=True)  # [B*R, 1]
            cand = jnp.min(
                jnp.where(y == ymax, cidx, big), axis=1, keepdims=True
            ) + t * E
            take = ymax > best  # strict: earlier tiles win ties, as argmax
            best_idx = jnp.where(take, cand, best_idx)
            best = jnp.maximum(best, ymax)
        tok_ref[:] = jnp.broadcast_to(best_idx, (B * R, 128))

        for d in gk_outs:
            d.wait()
        for d in gv_outs:
            d.wait()

    wtile_shape = (2, tps, E // 2, E) if int4_w else (2, tps, E, E)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, tps, E // G, E), dtype))
    scratch += [
        pltpu.VMEM((2, B, C, E), dtype),  # K ring (whole-batch panes)
        pltpu.VMEM((2, B, C, E), dtype),  # V ring
        pltpu.VMEM((L, B * R, E), dtype),  # new K rows (slot-major)
        pltpu.VMEM((L, B * R, E), dtype),  # new V rows
        pltpu.VMEM((B, L, 16, E), dtype),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 16, E), dtype),  # per-slot RMW windows (V)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb [B*R, E]
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [B*R, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * R, 128), jnp.int32),
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
    return toks[:, 0].reshape(B, R), k2, v2
