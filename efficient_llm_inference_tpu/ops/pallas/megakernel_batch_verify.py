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
from .megakernel_llama import _int4_tile_dot, _s4_geom
from .megakernel_quant import _kv_kinds, _pane_width

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
        scratch.append(pltpu.VMEM((2, tps, s4_rows, E), dtype))
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


# ---------------------------------------------------------------------------
# Verify over QUANTIZED panes: spec serving x compressed pools (round 5)
# ---------------------------------------------------------------------------

def _pick_tps_verify_quant(
    E: int, EK: int, EV: int, C: int, B: int, R: int, L: int,
    tile_bytes: int,
) -> int:
    """Largest slab (1..3 tiles) whose quant rings + verify scratch fit."""
    kv_ring = 2 * B * C * (EK + EV)  # 2-deep int8 rings for K and V
    rows = L * B * R * (EK + EV)  # knew/vnew, R quantized rows per slot
    stash = 2 * L * B * R * 128 * 4  # new-scale stashes
    rmw = B * L * 16 * (EK + EV)  # per-slot 16-row int8 RMW windows
    scales = 4 * L * B * C * 4  # ks/vs in + out tables
    attn = 4 * min(C, _ATTN_CHUNK) * E * 4  # fp32 margin (rest is scoped)
    for tps in (3, 2, 1):
        if (2 * tps * tile_bytes + kv_ring + rows + stash + rmw + scales
                + attn <= _VMEM_BUDGET):
            return tps
    return 0


def mega_batch_verify_quant_supported(
    cfg, capacity: int, params: dict, batch: int, rows: int, kv_mode: str
) -> bool:
    """Engine-side eligibility for the quant-pane batched verify kernel."""
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
    k_kind, v_kind = _kv_kinds(kv_mode)
    if "int4" in (k_kind, v_kind) and (E // 2) % 128 != 0:
        return False
    G = 0
    if mode == "int4":
        G = _gpt2_int4_group(params)
        if G == 0 or E % G or (E // 2) % G or E % 16:
            return False
    dt_item = jnp.dtype(params["wte"].dtype).itemsize
    return _pick_tps_verify_quant(
        E, _pane_width(k_kind, E), _pane_width(v_kind, E), capacity, batch,
        rows, cfg.n_layer, _tile_bytes(mode, E, G, dt_item),
    ) > 0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "rows", "kv_mode", "eps", "interpret"),
)
def gpt2_megabatch_verify_quant(
    packed: dict,
    k: jax.Array,  # [L, B, C, EK] quantized pane (aliased output)
    v: jax.Array,  # [L, B, C, EV]
    ks: jax.Array,  # [L, B, C] fp32 per-(slot, token) K scales (aliased)
    vs: jax.Array,  # [L, B, C]
    lengths: jax.Array,  # int32 [B] — per-slot tokens already cached
    x_emb: jax.Array,  # [B*R, E] verify-row embeddings, slot-major
    *,
    cfg: Any,
    capacity: int,
    rows: int,
    kv_mode: str,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """Verify R rows per slot over QUANTIZED panes, one weight pass.

    The round-5 composition the round-4 roadmap names: speculative batched
    serving (`gpt2_megabatch_verify`) x compressed pools
    (`gpt2_megabatch_quant`). Returns (tokens int32 [B, R], new k, new v,
    new ks, new vs); slot b's R QUANTIZED rows land at columns
    lengths[b]..lengths[b]+R-1 of its pane, their fp32 scales at the same
    lanes of its scale rows.

    Numerics are exactly the SEQUENTIAL quant stepper's
    (gpt2_megabatch_quant fed the same tokens row by row): verify row r
    attends the cache codes with post-dot [1, C] scale folds, the
    in-block rows j < r through their QUANTIZED codes (what the pane
    would hold by the time a sequential step read them — scale folded
    into probs exactly like pane columns), and its OWN row j == r in full
    precision (the sequential step's "current token, full-precision"
    term). Acceptance therefore keeps per-request outputs identical to
    the plain quant server for any proposal source — the invariant the
    bf16 spec server establishes (tests/test_megakernel_batch_verify.py).
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    R = rows
    B = x_emb.shape[0] // R
    V = cfg.vocab_size
    ln_eps = cfg.layer_norm_epsilon
    assert R <= 8 and x_emb.shape[0] == B * R
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
    tps = _pick_tps_verify_quant(E, EK, EV, C, B, R, L, tile_b)
    if tps == 0:
        raise ValueError(
            "quant-pane batched verify megakernel does not fit VMEM at "
            "this (batch, rows, capacity)"
        )
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)
    E2 = E // 2

    def ln(x32, g, b_):  # row-wise LN, [B*R, E] fp32
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

        # fused R-row transposed-attention constants (gpt2_megabatch_verify)
        RH = R * H
        i_head = jax.lax.broadcasted_iota(jnp.int32, (RH, E), 0) % H
        e_seg = jax.lax.broadcasted_iota(jnp.int32, (RH, E), 1) // D
        selT_t = (e_seg == i_head).astype(jnp.float32)  # [RH, E]
        rep = (
            jax.lax.broadcasted_iota(jnp.int32, (RH, R), 0) // H
            == jax.lax.broadcasted_iota(jnp.int32, (RH, R), 1)
        ).astype(jnp.float32)  # [RH, R]
        fold = rep.T  # [R, RH]
        # STRICT in-block causality (j < r): rows j < r are read through
        # their quantized codes; the diagonal j == r is the row's own
        # full-precision K/V (the sequential stepper's current-token term)
        blk_lt = (
            jax.lax.broadcasted_iota(jnp.int32, (RH, R), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (RH, R), 0) // H
        )
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

        # bf16 pane dots (megakernel_quant.py): identity when dtype == f32
        def dot_nt16(a32, b16):
            return dot_nt(a32.astype(dtype), b16)

        def pv_dot(p32, b16):
            return dot_nn(p32.astype(dtype), b16)

        def unpack4(pk):  # [cw, E2] int8 -> (hi_vals, lo_vals) in dtype
            lo_b = jnp.bitwise_and(pk, 0xF).astype(dtype)  # q_lo + 8, exact
            hi = (pk.astype(dtype) - lo_b) * 0.0625  # q_hi, exact
            return hi, lo_b - 8.0

        def quant_rows(x16, kind):
            """[N, E] dtype -> (q fp32 codes, scales fp32 [N, 1])."""
            x32 = x16.astype(jnp.float32)
            amax = jnp.max(jnp.abs(x32), axis=1, keepdims=True)
            if kind == "int8":
                s = jnp.maximum(amax * (1.0 / 127.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0)
            else:
                s = jnp.maximum(amax * (1.0 / 7.0), eps)
                q = jnp.clip(jnp.round(x32 / s), -8.0, 7.0)
            return q, s

        def pack_rows(q, kind):  # [N, E] fp32 codes -> [N, EK/EV] int8
            if kind == "int8":
                return q.astype(jnp.int8)
            return (16.0 * q[:, :E2] + q[:, E2:] + 8.0).astype(jnp.int8)

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

            # quantize-on-write for ALL R rows; keep the fp32 codes for the
            # in-block attention (exactly what a sequential step would read
            # back from the pane — pack/unpack is a lossless roundtrip)
            qk, sk = quant_rows(kc16, k_kind)  # [B*R, E], [B*R, 1]
            qv, sv = quant_rows(vc16, v_kind)
            knew[l] = pack_rows(qk, k_kind)
            vnew[l] = pack_rows(qv, v_kind)
            ksn[l] = jnp.broadcast_to(sk, (B * R, 128))
            vsn[l] = jnp.broadcast_to(sv, (B * R, 128))
            qk16 = qk.astype(dtype)  # integer codes: dtype-exact
            qv16 = qv.astype(dtype)

            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            qf = q32.astype(dtype).astype(jnp.float32)  # [B*R, E]
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                qf_b = qf[b * R:(b + 1) * R]  # [R, E] f32
                qrep = dot_nn(rep, qf_b)  # [RH, E]
                U = (selT_t * qrep).astype(dtype)
                kf_b = kc16[b * R:(b + 1) * R]  # [R, E] dtype (full prec)
                vf_b = vc16[b * R:(b + 1) * R]
                qk_b = qk16[b * R:(b + 1) * R]  # [R, E] codes
                qv_b = qv16[b * R:(b + 1) * R]
                sk_b = sk[b * R:(b + 1) * R]  # [R, 1] fp32
                sv_b = sv[b * R:(b + 1) * R]
                # cache scores: raw code dots, post-dot [1, C] scale fold
                raw_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    if k_kind == "int8":
                        kc = kbuf[l % 2, b, c0:c0 + cw, :].astype(dtype)
                        raw_chunks.append(dot_nt(U, kc))  # [RH, cw]
                    else:
                        khi, klo = unpack4(kbuf[l % 2, b, c0:c0 + cw, :])
                        raw_chunks.append(
                            dot_nt(U[:, :E2], khi) + dot_nt(U[:, E2:], klo)
                        )
                scores = jnp.concatenate(raw_chunks, axis=1)  # [RH, C]
                scores = scores * ks_ref[pl.ds(l, 1), b, :] * scale
                scores = jnp.where(col_rc < cur_b, scores, NEG_INF)
                # in-block keys j < r through their quantized codes
                s_blk = dot_nt(U, qk_b) * sk_b.reshape(1, R) * scale
                s_blk = jnp.where(blk_lt, s_blk, NEG_INF)
                # diagonal j == r: own K in full precision
                krep = dot_nn(rep, kf_b.astype(jnp.float32))  # [RH, E]
                s_self = jnp.sum(
                    U.astype(jnp.float32) * krep, axis=1, keepdims=True
                ) * scale  # [RH, 1]
                mx = jnp.maximum(
                    jnp.maximum(
                        jnp.max(scores, axis=1, keepdims=True),
                        jnp.max(s_blk, axis=1, keepdims=True),
                    ),
                    s_self,
                )
                p = jnp.exp(scores - mx)  # [RH, C]
                p_blk = jnp.exp(s_blk - mx)  # 0 where masked
                p_self = jnp.exp(s_self - mx)  # [RH, 1]
                denom = (
                    jnp.sum(p, axis=1, keepdims=True)
                    + jnp.sum(p_blk, axis=1, keepdims=True)
                    + p_self
                )
                ps = p * vs_ref[pl.ds(l, 1), b, :]  # fold per-token V scales
                M = jnp.zeros((RH, E), jnp.float32)
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
                # in-block V: codes with scales folded into probs; own row
                # full-precision
                ps_blk = p_blk * sv_b.reshape(1, R)
                M = M + pv_dot(ps_blk, qv_b)
                vrep = dot_nn(rep, vf_b.astype(jnp.float32))  # [RH, E]
                M = M + p_self * vrep
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

        # per-slot quantized writeback: R rows at each slot's cursor
        ridx_k = jax.lax.broadcasted_iota(jnp.int32, (L, 16, EK), 1)
        ridx_v = jax.lax.broadcasted_iota(jnp.int32, (L, 16, EV), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)  # 0..7, off_b + R <= 16
            gkv = gk[b]
            gvv = gv[b]
            for r in range(R):
                src = b * R + r
                gkv = jnp.where(
                    ridx_k == off_b + r,
                    jnp.broadcast_to(knew[:, src:src + 1, :], (L, 16, EK)),
                    gkv,
                )
                gvv = jnp.where(
                    ridx_v == off_b + r,
                    jnp.broadcast_to(vnew[:, src:src + 1, :], (L, 16, EV)),
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

        # scale writeback: R vectorized selects over the [L, B, C] tables
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        curv = jnp.zeros((1, B, 1), jnp.int32)
        for b in range(B):
            curv = jnp.where(slot_ids == b, len_ref[b, 0], curv)
        col_lbc = jax.lax.broadcasted_iota(jnp.int32, (L, B, C), 2)
        ksel = ks_ref[:]
        vsel = vs_ref[:]
        for r in range(R):
            ins_r = col_lbc == curv + r
            # ksn is [L, B*R, 128] slot-major: row r of slot b at b*R + r
            kr = ksn[:, :, 0:1].reshape(L, B, R)[:, :, r:r + 1]  # [L, B, 1]
            vr = vsn[:, :, 0:1].reshape(L, B, R)[:, :, r:r + 1]
            ksel = jnp.where(ins_r, jnp.broadcast_to(kr, (L, B, C)), ksel)
            vsel = jnp.where(ins_r, jnp.broadcast_to(vr, (L, B, C)), vsel)
        kso_ref[:] = ksel
        vso_ref[:] = vsel

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
            ymax = jnp.max(y, axis=1, keepdims=True)
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
        scratch.append(pltpu.VMEM((2, tps, s4_rows, E), dtype))
    scratch += [
        pltpu.VMEM((2, B, C, EK), jnp.int8),  # K ring (quantized panes)
        pltpu.VMEM((2, B, C, EV), jnp.int8),  # V ring
        pltpu.VMEM((L, B * R, EK), jnp.int8),  # quantized new K rows
        pltpu.VMEM((L, B * R, EV), jnp.int8),  # quantized new V rows
        pltpu.VMEM((L, B * R, 128), jnp.float32),  # new K scales
        pltpu.VMEM((L, B * R, 128), jnp.float32),  # new V scales
        pltpu.VMEM((B, L, 16, EK), jnp.int8),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 16, EV), jnp.int8),  # per-slot RMW windows (V)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [B*R, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * R, 128), jnp.int32),
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
    if wscale is None:
        wscale = jnp.ones((n_tiles, E), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:
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
    return toks[:, 0].reshape(B, R), k2, v2, ks2, vs2


# ---------------------------------------------------------------------------
# Llama/Qwen-family batched verify: GQA R-row spec serving (round 5)
# ---------------------------------------------------------------------------

def _llama_pick_tps_verify(
    C: int, B: int, R: int, L: int, KW: int, slot_bytes: int, ws: int,
    dt_item: int, Hq: int,
) -> int:
    """Slab size (0/1) for the llama verify: rings + R-row scratch fit."""
    kv_ring = 4 * B * C * KW * dt_item  # 2-deep ring for K and for V
    rows = 2 * L * B * R * KW * dt_item  # knew/vnew
    rmw = 2 * B * L * 16 * KW * dt_item  # per-slot 16-row RMW windows
    # fused-attention fp32 stacks: [R*Hq, C] scores/probs + [R*Hq, KW]
    stacked = 6 * R * Hq * C * 4 + 4 * R * Hq * KW * 4
    attn = 6 * min(C, _ATTN_CHUNK) * KW * 4
    if 2 * slot_bytes + kv_ring + rows + rmw + stacked + attn + ws \
            <= _VMEM_BUDGET:
        return 1
    return 0


def llama_mega_batch_verify_supported(
    cfg, capacity: int, params: dict, batch: int, rows: int
) -> bool:
    """Engine-side eligibility for the batched Llama/GQA verify kernel."""
    from .megakernel_batch import llama_mega_batch_supported
    from . import megakernel_llama as _ml

    # weight-side structural constraints are the batch step kernel's
    if not llama_mega_batch_supported(cfg, 8, params, 1):
        return False
    if rows < 1 or rows > 8 or capacity < 16 or capacity % 8 != 0:
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
        ws = 4 * n_tiles * TC
    elif mode == "int4":
        ws = (TR // 2) * ((TR // G) // 2) * 4
    else:
        ws = 0
    KW = cfg.n_kv_head * cfg.head_dim
    if "bq" in b:
        ws += 4 * cfg.n_layer * (cfg.n_head * cfg.head_dim + 2 * KW)
    return _llama_pick_tps_verify(
        capacity, batch, rows, cfg.n_layer, KW, slot, ws, dt_item,
        cfg.n_head,
    ) > 0


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "rows", "interpret")
)
def llama_megabatch_verify(
    packed: dict,
    k: jax.Array,  # [L, B, C, KW] batch mega-layout cache (aliased output)
    v: jax.Array,
    lengths: jax.Array,  # int32 [B] — per-slot tokens already cached
    x_emb: jax.Array,  # [B*R, E] verify-row embeddings, slot-major
    cos_q: jax.Array,  # [B*R, Hq*D] f32 — per-ROW RoPE phase, tiled/head
    sin_q: jax.Array,  # [B*R, Hq*D] f32
    *,
    cfg: Any,
    capacity: int,
    rows: int,
    interpret: bool = False,
):
    """Verify R rows per slot for a Llama/Qwen-family model, one weight
    pass (greedy). Returns (tokens int32 [B, R], new k, new v).

    The GQA analogue of gpt2_megabatch_verify: all R verify rows of a
    slot ride ONE fused attention block in a [R*Hq, KW] orientation —
    query-head values scatter to their KV-group lane segments through
    constant 0/1 permutation matmuls (M1 masks a row to its own head's
    query lanes, P maps query lanes onto KV lanes, sel_seg masks a row
    to its group's KV segment), so per-(row, head) scores come from full
    [R*Hq, KW] x [C, KW]^T dots and program size is R-independent — the
    per-row/ per-rotation chunk loops of the single-stream verify
    (megakernel_llama R>1) would unroll B*R*GR bodies per layer here.
    Row (b, t) attends slot b's pane columns < lengths[b] plus slot b's
    in-block rows j <= t (register K/V, exact: bf16 pane round-trip is
    identity); the R new K/V rows land at lengths[b].. of slot b's pane
    through 16-row RMW windows. Numerics match sequential
    llama_megabatch steps up to fp32 dot reassociation
    (tests/test_megakernel_batch_verify.py asserts token equality and
    cache-row closeness in fp32 interpret mode).
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
    R = rows
    B = x_emb.shape[0] // R
    eps = cfg.rms_eps
    assert R <= 8 and x_emb.shape[0] == B * R
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
        s4_vmem = _llama_pick_tps_verify(
            C, B, R, L, KW, (TR // 2) * TC, gsel_bytes + s4_bytes,
            dt_item, Hq,
        ) > 0
        ws_vmem = gsel_bytes + (s4_bytes if s4_vmem else 0)
    else:
        G, n_gh, s4p = TR, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
        ws_vmem = 4 * n_tiles * TC if int8_w else 0
    tps = _llama_pick_tps_verify(
        C, B, R, L, KW,
        (TR // 2) * TC if s4_vmem
        else _w_slot_bytes(mode, TR, TC, G, dt_item, s4_rows or None),
        ws_vmem, dt_item, Hq,
    )
    if tps == 0:
        raise ValueError(
            "batched llama verify megakernel does not fit VMEM at this "
            "(batch, rows, capacity)"
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

        # fused GQA verify-attention constants (see docstring)
        RHq = R * Hq
        rep = (
            jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 0) // Hq
            == jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 1)
        ).astype(jnp.float32)  # [RHq, R]: repeat verify row t into Hq rows
        fold = rep.T  # [R, RHq]
        hq_r = jax.lax.broadcasted_iota(jnp.int32, (RHq, QW), 0) % Hq
        ql_r = jax.lax.broadcasted_iota(jnp.int32, (RHq, QW), 1)
        M1 = (ql_r // D == hq_r).astype(jnp.float32)  # own-head query lanes
        qli = jax.lax.broadcasted_iota(jnp.int32, (QW, KW), 0)
        kli = jax.lax.broadcasted_iota(jnp.int32, (QW, KW), 1)
        P = (
            (qli // D // GR) * D + qli % D == kli
        ).astype(jnp.float32)  # query lane -> its KV-group lane
        PT = P.T  # [KW, QW]
        hq_k = jax.lax.broadcasted_iota(jnp.int32, (RHq, KW), 0) % Hq
        kl_k = jax.lax.broadcasted_iota(jnp.int32, (RHq, KW), 1)
        sel_seg = (kl_k // D == hq_k // GR).astype(jnp.float32)
        blk_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 0) // Hq
        )  # in-block causal: row t may see block key j <= t
        col_rc = jax.lax.broadcasted_iota(jnp.int32, (RHq, C), 1)

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

        def wdma(slot, t):
            return pltpu.make_async_copy(
                w_ref.at[t], wbuf.at[slot], wsem.at[slot]
            )

        def sdma(slot, t):
            return pltpu.make_async_copy(
                s4_ref.at[t], sbuf.at[slot], ssem.at[slot]
            )

        def kdma(slot, l):
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

        def tile(t):
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

        ones_r = jnp.ones((B * R, 1), jnp.float32)

        def brow(row):  # [1, X] f32 -> [B*R, X] via MXU
            return jax.lax.dot_general(
                ones_r, row, (((1,), (0,)), ((), ())),
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

        cosq = cq_ref[:]  # [B*R, QW] f32, per-row phase
        sinq = sq_ref[:]
        cosk, sink = cosq[:, :KW], sinq[:, :KW]

        x = x_ref[:].astype(dtype)  # [B*R, E], slot-major

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
                bias = brow(qb_ref[pl.ds(l, 1), :])
                q32 = q32 + bias[:, :QW]
                k32 = k32 + bias[:, QW:QW + KW]
                v32 = v32 + bias[:, QW + KW:]

            qd = q32.astype(dtype).astype(jnp.float32)
            kd = k32.astype(dtype).astype(jnp.float32)
            q_rope = (qd * cosq + rot_half(qd, QW) * sinq).astype(dtype)
            k_rope = (kd * cosk + rot_half(kd, KW) * sink).astype(dtype)
            kc16 = k_rope  # [B*R, KW]
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

            qf_all = q_rope.astype(jnp.float32)  # [B*R, QW]
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                q_b = qf_all[b * R:(b + 1) * R]  # [R, QW]
                Uk = dot_nn(M1 * dot_nn(rep, q_b), P)  # [RHq, KW]
                kblk = kc16[b * R:(b + 1) * R].astype(jnp.float32)
                vblk = vc16[b * R:(b + 1) * R].astype(jnp.float32)
                s_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    kc = kbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                        jnp.float32)
                    s_chunks.append(dot_nt(Uk, kc))  # [RHq, cw]
                scores = jnp.concatenate(s_chunks, axis=1) * scale
                scores = jnp.where(col_rc < cur_b, scores, NEG_INF)
                s_blk = dot_nt(Uk, kblk) * scale  # [RHq, R]
                s_blk = jnp.where(blk_ok, s_blk, NEG_INF)
                mx = jnp.maximum(
                    jnp.max(scores, axis=1, keepdims=True),
                    jnp.max(s_blk, axis=1, keepdims=True),
                )
                p = jnp.exp(scores - mx)  # [RHq, C]
                p_blk = jnp.exp(s_blk - mx)
                denom = (
                    jnp.sum(p, axis=1, keepdims=True)
                    + jnp.sum(p_blk, axis=1, keepdims=True)
                )
                M = jnp.zeros((RHq, KW), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    vc = vbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                        jnp.float32)
                    M = M + dot_nn(p[:, c0:c0 + cw], vc)
                M = M + dot_nn(p_blk, vblk)
                # fold head rows back to [R, QW]: mask to the row's KV
                # segment, permute KV lanes onto the row's OWN query-head
                # lanes, sum the Hq disjoint-lane rows per verify row
                A = M1 * dot_nn(sel_seg * M, PT)  # [RHq, QW]
                num = dot_nn(fold, A)  # [R, QW]
                den = dot_nn(fold, M1 * denom)
                a_rows.append(num / den)
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)  # [B*R, QW]

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

        # per-slot writeback: R rows at each slot's cursor (16-row RMW)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 16, KW), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)  # 0..7, off_b + R <= 16
            gkv = gk[b]
            gvv = gv[b]
            for r in range(R):
                src = b * R + r
                ins = ridx == off_b + r
                gkv = jnp.where(
                    ins,
                    jnp.broadcast_to(knew[:, src:src + 1, :], (L, 16, KW)),
                    gkv,
                )
                gvv = jnp.where(
                    ins,
                    jnp.broadcast_to(vnew[:, src:src + 1, :], (L, 16, KW)),
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

        xf = rms(x, lnf_ref[:])  # [B*R, E]
        lm_base = L * per_layer
        rg_lm = E // TR
        cidx = jax.lax.broadcasted_iota(jnp.int32, (B * R, TC), 1)
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
            (jnp.full((B * R, 1), NEG_INF, jnp.float32),
             jnp.zeros((B * R, 1), jnp.int32)),
        )
        tok_ref[:] = jnp.broadcast_to(best_idx, (B * R, 128))

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
        pltpu.VMEM((L, B * R, KW), dtype),  # new K rows (slot-major)
        pltpu.VMEM((L, B * R, KW), dtype),  # new V rows
        pltpu.VMEM((B, L, 16, KW), dtype),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 16, KW), dtype),  # per-slot RMW windows (V)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos_q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin_q
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, B, C, KW]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norms [L, 2, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf [1, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkvb
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
        cos_q,
        sin_q,
        packed["wstack"],
        k,
        v,
        packed["norms"],
        packed["lnf"],
        wscale,
        qkvb,
        w4scale,
    )
    return toks[:, 0].reshape(B, R), k2, v2


# ---------------------------------------------------------------------------
# Llama verify over QUANTIZED panes: GQA spec serving x compressed pools
# ---------------------------------------------------------------------------

def _llama_pick_tps_verify_quant(
    C: int, B: int, R: int, L: int, KW: int, EK: int, EV: int,
    slot_bytes: int, ws: int, Hq: int,
) -> int:
    """Slab size (0/1) for the llama quant verify envelope."""
    kv_ring = 2 * B * C * (EK + EV)  # 2-deep int8 rings for K and V
    rows = L * B * R * (EK + EV)  # knew/vnew
    stash = 2 * L * B * R * 128 * 4  # new-scale stashes
    rmw = B * L * 16 * (EK + EV)  # per-slot 16-row int8 RMW windows
    scales = 4 * L * B * C * 4  # ks/vs in + out tables
    stacked = 6 * R * Hq * C * 4 + 4 * R * Hq * KW * 4
    attn = 6 * min(C, _ATTN_CHUNK) * KW * 4
    if 2 * slot_bytes + kv_ring + rows + stash + rmw + scales + stacked \
            + attn + ws <= _VMEM_BUDGET:
        return 1
    return 0


def llama_mega_batch_verify_quant_supported(
    cfg, capacity: int, params: dict, batch: int, rows: int, kv_mode: str
) -> bool:
    """Eligibility for the quant-pane batched Llama/GQA verify kernel."""
    from .megakernel_batch import llama_mega_batch_supported
    from . import megakernel_llama as _ml

    if not llama_mega_batch_supported(cfg, 8, params, 1):
        return False
    if rows < 1 or rows > 8 or capacity < 16 or capacity % 8 != 0:
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
        ws = 4 * n_tiles * TC
    elif mode == "int4":
        ws = (TR // 2) * ((TR // G) // 2) * 4
    else:
        ws = 0
    if "bq" in b:
        ws += 4 * cfg.n_layer * (cfg.n_head * cfg.head_dim + 2 * KW)
    return _llama_pick_tps_verify_quant(
        capacity, batch, rows, cfg.n_layer, KW, EK, EV, slot, ws,
        cfg.n_head,
    ) > 0


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "capacity", "rows", "kv_mode", "eps", "interpret"),
)
def llama_megabatch_verify_quant(
    packed: dict,
    k: jax.Array,  # [L, B, C, EK] quantized pane (aliased output)
    v: jax.Array,  # [L, B, C, EV]
    ks: jax.Array,  # [L, B, C] fp32 per-(slot, token) K scales (aliased)
    vs: jax.Array,  # [L, B, C]
    lengths: jax.Array,  # int32 [B]
    x_emb: jax.Array,  # [B*R, E] verify-row embeddings, slot-major
    cos_q: jax.Array,  # [B*R, Hq*D] f32 per-ROW RoPE phase
    sin_q: jax.Array,  # [B*R, Hq*D] f32
    *,
    cfg: Any,
    capacity: int,
    rows: int,
    kv_mode: str,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """Verify R rows per slot over QUANTIZED panes for a Llama/Qwen model.

    The GQA analogue of gpt2_megabatch_verify_quant: the fused
    [R*Hq, KW] verify orientation of llama_megabatch_verify over the
    int8/int4/mixed pane + per-token fp32 scale-table machinery of
    llama_megabatch_quant. Returns (tokens int32 [B, R], new k, new v,
    new ks, new vs). Numerics are the SEQUENTIAL quant stepper's
    (llama_megabatch_quant fed the same tokens row by row): cache codes
    dot raw with post-dot [1, C] scale folds, in-block rows j < r ride
    their quantized codes (scale folded per key row), the diagonal
    j == r stays full precision, and all R rows quantize-on-write.
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
    R = rows
    B = x_emb.shape[0] // R
    rms_eps = cfg.rms_eps
    assert R <= 8 and x_emb.shape[0] == B * R
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
    if int4_w:
        G, n_gh, s4p = _s4_geom(TR, packed)
        s4_rows = packed["w4scale"].shape[1]
        gsel_bytes = (TR // 2) * n_gh * 4
        s4_bytes = n_tiles * s4_rows * TC * dt_item
        s4_vmem = _llama_pick_tps_verify_quant(
            C, B, R, L, KW, EK, EV, (TR // 2) * TC,
            gsel_bytes + s4_bytes, Hq,
        ) > 0
        ws_vmem = gsel_bytes + (s4_bytes if s4_vmem else 0)
        mode = "int4"
    else:
        G, n_gh, s4p = TR, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
        ws_vmem = 4 * n_tiles * TC if int8_w else 0
    tps = _llama_pick_tps_verify_quant(
        C, B, R, L, KW, EK, EV,
        (TR // 2) * TC if s4_vmem
        else _w_slot_bytes(mode, TR, TC, G, dt_item, s4_rows or None),
        ws_vmem, Hq,
    )
    if tps == 0:
        raise ValueError(
            "quant-pane batched llama verify does not fit VMEM at this "
            "(batch, rows, capacity)"
        )
    scale = 1.0 / _math.sqrt(float(D))
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

        if int4_w:
            r_ids = jax.lax.broadcasted_iota(
                jnp.int32, (TR // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (TR // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        # fused GQA verify constants (llama_megabatch_verify)
        RHq = R * Hq
        rep = (
            jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 0) // Hq
            == jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 1)
        ).astype(jnp.float32)
        fold = rep.T
        hq_r = jax.lax.broadcasted_iota(jnp.int32, (RHq, QW), 0) % Hq
        ql_r = jax.lax.broadcasted_iota(jnp.int32, (RHq, QW), 1)
        M1 = (ql_r // D == hq_r).astype(jnp.float32)
        qli = jax.lax.broadcasted_iota(jnp.int32, (QW, KW), 0)
        kli = jax.lax.broadcasted_iota(jnp.int32, (QW, KW), 1)
        P = ((qli // D // GR) * D + qli % D == kli).astype(jnp.float32)
        PT = P.T
        hq_k = jax.lax.broadcasted_iota(jnp.int32, (RHq, KW), 0) % Hq
        kl_k = jax.lax.broadcasted_iota(jnp.int32, (RHq, KW), 1)
        sel_seg = (kl_k // D == hq_k // GR).astype(jnp.float32)
        # STRICT in-block (j < r): rows j < r ride their quantized codes,
        # the diagonal j == r is full precision (sequential semantics)
        blk_lt = (
            jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (RHq, R), 0) // Hq
        )
        col_rc = jax.lax.broadcasted_iota(jnp.int32, (RHq, C), 1)

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

        def wdma(slot, t):
            return pltpu.make_async_copy(
                w_ref.at[t], wbuf.at[slot], wsem.at[slot]
            )

        def sdma(slot, t):
            return pltpu.make_async_copy(
                s4_ref.at[t], sbuf.at[slot], ssem.at[slot]
            )

        def kdma(slot, l):
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

        def tile(t):
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

        ones_r = jnp.ones((B * R, 1), jnp.float32)

        def brow(row):
            return jax.lax.dot_general(
                ones_r, row, (((1,), (0,)), ((), ())),
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

        def pack_rows(q, kind):
            if kind == "int8":
                return q.astype(jnp.int8)
            return (16.0 * q[:, :KW2] + q[:, KW2:] + 8.0).astype(jnp.int8)

        cosq = cq_ref[:]  # [B*R, QW]
        sinq = sq_ref[:]
        cosk, sink = cosq[:, :KW], sinq[:, :KW]

        x = x_ref[:].astype(dtype)  # [B*R, E]

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
                bias = brow(qb_ref[pl.ds(l, 1), :])
                q32 = q32 + bias[:, :QW]
                k32 = k32 + bias[:, QW:QW + KW]
                v32 = v32 + bias[:, QW + KW:]

            qd = q32.astype(dtype).astype(jnp.float32)
            kd = k32.astype(dtype).astype(jnp.float32)
            q_rope = (qd * cosq + rot_half(qd, QW) * sinq).astype(dtype)
            k_rope = (kd * cosk + rot_half(kd, KW) * sink).astype(dtype)
            kc16 = k_rope  # [B*R, KW] full precision
            vc16 = v32.astype(dtype)

            # quantize-on-write; codes feed the in-block attention
            qk, sk = quant_rows(kc16, k_kind)  # [B*R, KW], [B*R, 1]
            qv, sv = quant_rows(vc16, v_kind)
            knew[pl.ds(l, 1)] = pack_rows(qk, k_kind)[None]
            vnew[pl.ds(l, 1)] = pack_rows(qv, v_kind)[None]
            ksn[pl.ds(l, 1)] = jnp.broadcast_to(sk, (B * R, 128))[None]
            vsn[pl.ds(l, 1)] = jnp.broadcast_to(sv, (B * R, 128))[None]
            qk16 = qk.astype(dtype)
            qv16 = qv.astype(dtype)

            @pl.when(l + 1 < L)
            def _():
                nxt = jax.lax.rem(l + 1, 2)
                kdma(nxt, l + 1).start()
                vdma(nxt, l + 1).start()

            kdma(par, l).wait()
            vdma(par, l).wait()

            qf_all = q_rope.astype(jnp.float32)  # [B*R, QW]
            a_rows = []
            for b in range(B):
                cur_b = len_ref[b, 0]
                q_b = qf_all[b * R:(b + 1) * R]
                Uk32 = dot_nn(M1 * dot_nn(rep, q_b), P)  # [RHq, KW] f32
                Uk = Uk32.astype(dtype)
                kblk = kc16[b * R:(b + 1) * R].astype(jnp.float32)
                vblk = vc16[b * R:(b + 1) * R].astype(jnp.float32)
                qk_b = qk16[b * R:(b + 1) * R]  # [R, KW] codes (dtype)
                qv_b = qv16[b * R:(b + 1) * R]
                sk_b = sk[b * R:(b + 1) * R]  # [R, 1] fp32
                sv_b = sv[b * R:(b + 1) * R]
                # cache scores: raw code dots, post-dot [1, C] scale fold
                raw_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    if k_kind == "int8":
                        kc = kbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                            dtype)
                        raw_chunks.append(dot_nt(Uk, kc))
                    else:
                        khi, klo = unpack4(
                            kbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0]
                        )
                        raw_chunks.append(
                            dot_nt(Uk[:, :KW2], khi)
                            + dot_nt(Uk[:, KW2:], klo)
                        )
                scores = jnp.concatenate(raw_chunks, axis=1)  # [RHq, C]
                scores = scores * ks_ref[pl.ds(l, 1), b, :] * scale
                scores = jnp.where(col_rc < cur_b, scores, NEG_INF)
                # in-block j < r via quantized codes (per-key scale fold)
                s_blk = dot_nt(Uk, qk_b) * jnp.reshape(
                    sk_b, (1, R)) * scale
                s_blk = jnp.where(blk_lt, s_blk, NEG_INF)
                # diagonal j == r: own K full precision
                krep = dot_nn(rep, kblk)  # [RHq, KW]
                s_self = jnp.sum(
                    Uk32 * krep, axis=1, keepdims=True
                ) * scale
                mx = jnp.maximum(
                    jnp.maximum(
                        jnp.max(scores, axis=1, keepdims=True),
                        jnp.max(s_blk, axis=1, keepdims=True),
                    ),
                    s_self,
                )
                p = jnp.exp(scores - mx)
                p_blk = jnp.exp(s_blk - mx)
                p_self = jnp.exp(s_self - mx)
                denom = (
                    jnp.sum(p, axis=1, keepdims=True)
                    + jnp.sum(p_blk, axis=1, keepdims=True)
                    + p_self
                )
                ps = p * vs_ref[pl.ds(l, 1), b, :]  # fold V scales
                M = jnp.zeros((RHq, KW), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    psc = ps[:, c0:c0 + cw].astype(dtype)
                    if v_kind == "int8":
                        vc = vbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0].astype(
                            dtype)
                        M = M + dot_nn(psc, vc)
                    else:
                        vhi, vlo = unpack4(
                            vbuf[pl.ds(par, 1), b, c0:c0 + cw, :][0]
                        )
                        M = M + jnp.concatenate(
                            [dot_nn(psc, vhi), dot_nn(psc, vlo)], axis=1
                        )
                ps_blk = (p_blk * jnp.reshape(sv_b, (1, R))).astype(dtype)
                M = M + dot_nn(ps_blk, qv_b)
                M = M + p_self * dot_nn(rep, vblk)
                A = M1 * dot_nn(sel_seg * M, PT)  # [RHq, QW]
                num = dot_nn(fold, A)  # [R, QW]
                den = dot_nn(fold, M1 * denom)
                a_rows.append(num / den)
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)

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

        # per-slot quantized writeback (16-row RMW, R rows per slot)
        ridx_k = jax.lax.broadcasted_iota(jnp.int32, (L, 16, EK), 1)
        ridx_v = jax.lax.broadcasted_iota(jnp.int32, (L, 16, EV), 1)
        for b in range(B):
            gk_ins[b].wait()
            gv_ins[b].wait()
            off_b = len_ref[b, 0] - gbase_of(b)
            gkv = gk[b]
            gvv = gv[b]
            for r in range(R):
                src = b * R + r
                gkv = jnp.where(
                    ridx_k == off_b + r,
                    jnp.broadcast_to(knew[:, src:src + 1, :], (L, 16, EK)),
                    gkv,
                )
                gvv = jnp.where(
                    ridx_v == off_b + r,
                    jnp.broadcast_to(vnew[:, src:src + 1, :], (L, 16, EV)),
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

        # scale writeback: R vectorized selects over the [L, B, C] tables
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        curv = jnp.zeros((1, B, 1), jnp.int32)
        for b in range(B):
            curv = jnp.where(slot_ids == b, len_ref[b, 0], curv)
        col_lbc = jax.lax.broadcasted_iota(jnp.int32, (L, B, C), 2)
        ksel = ks_ref[:]
        vsel = vs_ref[:]
        for r in range(R):
            ins_r = col_lbc == curv + r
            kr = ksn[:, :, 0:1].reshape(L, B, R)[:, :, r:r + 1]
            vr = vsn[:, :, 0:1].reshape(L, B, R)[:, :, r:r + 1]
            ksel = jnp.where(ins_r, jnp.broadcast_to(kr, (L, B, C)), ksel)
            vsel = jnp.where(ins_r, jnp.broadcast_to(vr, (L, B, C)), vsel)
        kso_ref[:] = ksel
        vso_ref[:] = vsel

        xf = rms(x, lnf_ref[:])
        lm_base = L * per_layer
        rg_lm = E // TR
        cidx = jax.lax.broadcasted_iota(jnp.int32, (B * R, TC), 1)
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
            (jnp.full((B * R, 1), NEG_INF, jnp.float32),
             jnp.zeros((B * R, 1), jnp.int32)),
        )
        tok_ref[:] = jnp.broadcast_to(best_idx, (B * R, 128))

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
        pltpu.VMEM((L, B * R, EK), jnp.int8),  # quantized new K rows
        pltpu.VMEM((L, B * R, EV), jnp.int8),  # quantized new V rows
        pltpu.VMEM((L, B * R, 128), jnp.float32),  # new K scales
        pltpu.VMEM((L, B * R, 128), jnp.float32),  # new V scales
        pltpu.VMEM((B, L, 16, EK), jnp.int8),  # per-slot RMW windows (K)
        pltpu.VMEM((B, L, 16, EV), jnp.int8),  # per-slot RMW windows (V)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos_q
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin_q
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, B, C, EK]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks [L, B, C] fp32
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norms [L, 2, E]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qkvb
            pl.BlockSpec(  # w4scale
                memory_space=pltpu.HBM
                if (int4_w and not s4_vmem) else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [B*R, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ks out (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # vs out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * R, 128), jnp.int32),
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
    if wscale is None:
        wscale = jnp.ones((1, TC), jnp.float32)
    qkvb = packed.get("qkvb")
    if qkvb is None:
        qkvb = jnp.zeros((L, 1), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:
        w4scale = jnp.zeros((1, 1, 128), dtype)
    toks, k2, v2, ks2, vs2 = f(
        jnp.reshape(lengths.astype(jnp.int32), (B, 1)),
        x_emb,
        cos_q,
        sin_q,
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
    return toks[:, 0].reshape(B, R), k2, v2, ks2, vs2
