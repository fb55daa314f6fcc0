"""Whole-step decode megakernel: one Pallas program per GPT-2 decode step.

Single-stream decode is weight-bandwidth bound, and the XLA step pays ~160 us
of per-op overhead on top of the ~380 us weight-streaming floor (measured on
v5e, docs/BENCHMARKS.md): the 49-matmul chain launches ~200 fused kernels per
step. This kernel runs the ENTIRE step — all layer matmuls, attention over
the HBM-resident KV cache, the final layer-norm, the LM head and the greedy
argmax — as ONE program that streams every weight byte through a
double-buffered VMEM ring at close to HBM speed (measured 732 GB/s of the
819 GB/s roofline on the bare 248 MB stream).

Design (TPU-native; no reference counterpart — the reference's decode step is
a full HF model forward, /root/reference/src/benchmarking/benchmarker.py:473):

* All weights are re-laid out host-side into ONE HBM array of [E, E] tiles
  (`pack_gpt2_mega`): per layer 12 tiles (q, k, v, attn_proj, 4x fc columns,
  4x fc_proj row-partials), then ceil(V/E) transposed LM-head tiles. Uniform
  tile geometry makes the DMA pipeline trivial: fixed-size slabs of
  `tiles_per_slab` tiles, 2-deep ring, prefetch slab s+1 while computing s.
* The KV cache uses a kernel-friendly [L, C, E] layout (`to_mega_layout`
  converts the prefill's [L, B, H, C, D] buffer once, before the decode
  scan). Everything in the kernel then lives in [., E] lane space — Mosaic
  supports no lane->sublane reshapes, so heads are never materialized as a
  dim: per-head score reductions go through a constant 0/1 segment-selector
  matmul [E, H], and per-head softmax stats broadcast back with its
  transpose. Each layer's K/V pane is DMA'd into a 2-deep VMEM ring one
  layer ahead; the current token's K/V merge into the softmax separately
  (identical math to cache/kvcache.py `_attend` after its in-place write).
  Cache row writes go through an aligned read-modify-write: Mosaic DMA
  cannot slice single sub-tile rows (sublane tiling is 8), so the kernel
  reads the 8-row group containing `cur` up front, inserts the new K/V rows
  with an iota-select, and writes the group back — both group DMAs overlap
  compute at either end of the step.
* Numerics mirror models/gpt2.py: fp32 layer-norm stats, fp32 matmul
  accumulation, residual stream in the model dtype, tanh-GELU in fp32, fp32
  softmax. The only reassociations are the fc_proj row-partial sums, the
  C-chunked attention reductions, and the current-token softmax merge (fp32
  bit-level reorderings).
* Greedy only: the LM head tracks a running (max, argmax) across tiles —
  first-max-wins tie-breaking matches `jnp.argmax` over the full vocab.

The engine auto-selects this path for full_cache greedy batch-1 decode on
TPU (engine/generate.py `make_generate(mega=...)`); everything else keeps
the XLA path, and tests run this kernel in Pallas interpret mode on CPU.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .megakernel_llama import _int4_tile_dot

NEG_INF = float(jnp.finfo(jnp.float32).min)

# VMEM cap for the weight ring + KV ring (bytes). v5e has ~16 MiB/core;
# leave headroom for attention temporaries, smalls, and Mosaic's own use.
_VMEM_BUDGET = 11 * 1024 * 1024
_ATTN_CHUNK = 512  # C-chunk for attention reductions (bounds fp32 temps)
# whole int4 scale table rides in VMEM below this size (test hook: set to
# 0 to force the per-slab scale DMA ring)
_S4_VMEM_MAX = 4 * 1024 * 1024


def _num_lm_tiles(vocab: int, E: int) -> int:
    return -(-vocab // E)


def to_mega_layout(buf: jax.Array) -> jax.Array:
    """[L, 1, H, C, D] cache pane -> [L, C, E] kernel layout (one-time)."""
    L, B, H, C, D = buf.shape
    assert B == 1, "megakernel is single-stream"
    return buf[:, 0].transpose(0, 2, 1, 3).reshape(L, C, H * D)


_GPT2_WEIGHT_NAMES = ("attn_w", "attn_proj_w", "fc_w", "fc_proj_w")


def _gpt2_weight_mode(b: dict) -> str | None:
    """"f" | "int8" | "int4" when the block weights are uniform, else None."""
    kinds = set()
    for n in _GPT2_WEIGHT_NAMES:
        w = b.get(n)
        if isinstance(w, dict):
            if "q" in w:
                kinds.add("int8")
            elif "q4" in w:
                kinds.add("int4")
            else:
                return None
        else:
            kinds.add("f")
    return kinds.pop() if len(kinds) == 1 else None


def pack_gpt2_mega(params: dict, cfg) -> dict | None:
    """Re-layout GPT-2 params into the megakernel's tile stream.

    Full-precision params pack into a bf16/f32 tile stack; int8
    weight-quantized params (models/gpt2.py quantize_gpt2_weights) pack into
    an int8 tile stack plus a per-tile [E] output-channel scale table
    ("wscale") — the kernel dequantizes each tile on its VMEM slab, halving
    the per-step weight stream. Grouped-int4 params pack into half-paired
    nibble tiles [E/2, E] plus per-tile group-scale panes ("w4scale",
    DMA'd alongside each slab) — same scheme as megakernel_llama.py.
    Returns None when the params are not packable (embedding width not
    lane-aligned, partially-quantized pytree). The packed pytree is
    computed once per engine and captured by the jitted generate function.
    """
    E, L = cfg.n_embd, cfg.n_layer
    b = params["blocks"]
    names = _GPT2_WEIGHT_NAMES
    mode = _gpt2_weight_mode(b)
    if mode is None:
        return None
    int8 = mode == "int8"
    if int8 and "lm_q" not in params:
        return None
    if mode == "int4" and "lm_q4" not in params:
        return None
    if E % 128 != 0:
        return None
    if mode == "int4":
        return _pack_gpt2_mega_int4(params, cfg)
    dtype = params["wte"].dtype

    def wv(name):  # weight values in the stream dtype
        return b[name]["q"] if int8 else b[name]

    # Per-layer tile block: [q, k, v, proj, fc0..fc3, p0..p3] -> [L, 12, E, E]
    attn = wv("attn_w").reshape(L, E, 3, E).transpose(0, 2, 1, 3)  # [L,3,E,E]
    proj = wv("attn_proj_w")[:, None]  # [L, 1, E, E]
    fc = wv("fc_w").reshape(L, E, 4, E).transpose(0, 2, 1, 3)  # [L,4,E,E]
    fcp = wv("fc_proj_w").reshape(L, 4, E, E)  # row partials  [L,4,E,E]
    layer_tiles = jnp.concatenate([attn, proj, fc, fcp], axis=1)
    layer_tiles = layer_tiles.reshape(L * 12, E, E)

    V = cfg.vocab_size
    n_lm = _num_lm_tiles(V, E)
    if int8:
        lm_pad = jnp.pad(params["lm_q"], ((0, 0), (0, n_lm * E - V)))
    else:
        lm_pad = jnp.pad(params["wte"].T, ((0, 0), (0, n_lm * E - V)))
    lm_tiles = lm_pad.reshape(E, n_lm, E).transpose(1, 0, 2)  # [n_lm, E, E]

    wstack = jnp.concatenate(
        [layer_tiles, lm_tiles.astype(layer_tiles.dtype)], axis=0
    )

    wscale = None
    if int8:
        # per-tile [E] output-channel scales; fc_proj row partials share
        # their columns' scale ((x @ q) * s distributes over the row sum)
        def sc(name, n_col_tiles):  # s: [L, 1, n_col_tiles*E]
            return b[name]["s"].reshape(L, n_col_tiles, E)

        layer_sc = jnp.concatenate(
            [
                sc("attn_w", 3),
                sc("attn_proj_w", 1),
                sc("fc_w", 4),
                jnp.broadcast_to(sc("fc_proj_w", 1), (L, 4, E)),
            ],
            axis=1,
        ).reshape(L * 12, E)
        lm_sc = jnp.pad(
            params["lm_s"][0], (0, n_lm * E - V), constant_values=1.0
        ).reshape(n_lm, E)
        wscale = jnp.concatenate(
            [layer_sc, lm_sc], axis=0
        ).astype(jnp.float32)

    out = {"wstack": wstack, **_gpt2_smalls(params, cfg)}
    if wscale is not None:
        out["wscale"] = wscale
    return out


def _gpt2_smalls(params: dict, cfg) -> dict:
    """Per-layer smalls as fp32 [L, 13, E] rows + the final layer-norm.

    Rows: 0 ln1_g, 1 ln1_b, 2 ln2_g, 3 ln2_b, 4-6 attn_b (q,k,v),
    7 proj_b, 8-11 fc_b, 12 fc_proj_b.
    """
    E, L = cfg.n_embd, cfg.n_layer
    b = params["blocks"]

    def rows(x, n):
        return x.astype(jnp.float32).reshape(L, n, E)

    smalls = jnp.concatenate(
        [
            rows(b["ln1_g"], 1),
            rows(b["ln1_b"], 1),
            rows(b["ln2_g"], 1),
            rows(b["ln2_b"], 1),
            rows(b["attn_b"], 3),
            rows(b["attn_proj_b"], 1),
            rows(b["fc_b"], 4),
            rows(b["fc_proj_b"], 1),
        ],
        axis=1,
    )
    lnf = jnp.stack(
        [params["lnf_g"].astype(jnp.float32), params["lnf_b"].astype(jnp.float32)]
    )
    return {"smalls": smalls, "lnf": lnf}


def _pack_gpt2_mega_int4(params: dict, cfg) -> dict | None:
    """Grouped-int4 GPT-2 tile stream: half-paired biased/two's-complement
    nibbles [E/2, E] + per-tile [E/G, E] scale panes (see
    megakernel_llama.py:_pack_halves for the nibble layout rationale)."""
    from .megakernel_llama import _pack_halves, _q4_group, _q4_to_int8

    E, L = cfg.n_embd, cfg.n_layer
    b = params["blocks"]
    dtype = params["wte"].dtype
    gs = {_q4_group(b[n]) for n in _GPT2_WEIGHT_NAMES}
    gs.add(_q4_group({"q4": params["lm_q4"]}))
    if len(gs) != 1:
        return None  # kernel wants one uniform group size
    G = gs.pop()
    if E % G or (E // 2) % G or E % 16:
        return None
    Gr = E // G  # scale rows per [E, E] tile

    attn = _q4_to_int8(b["attn_w"]).reshape(L, E, 3, E).transpose(0, 2, 1, 3)
    proj = _q4_to_int8(b["attn_proj_w"])[:, None]  # [L, 1, E, E]
    fc = _q4_to_int8(b["fc_w"]).reshape(L, E, 4, E).transpose(0, 2, 1, 3)
    fcp = _q4_to_int8(b["fc_proj_w"]).reshape(L, 4, E, E)  # row partials
    layer_tiles = jnp.concatenate([attn, proj, fc, fcp], axis=1)
    layer_tiles = layer_tiles.reshape(L * 12, E, E)

    def sc(name, n_col):  # s [L, K/G, 1, n_col*E] -> [L, n_col, K/G, E]
        s = b[name]["s"][..., 0, :]
        return s.reshape(L, s.shape[1], n_col, E).transpose(0, 2, 1, 3)

    # fc_proj row partials: partial i covers input rows i*E..(i+1)*E, so
    # its scale pane is rows i*Gr..(i+1)*Gr of the [4E/G, E] table
    fcp_sc = b["fc_proj_w"]["s"][..., 0, :].reshape(L, 4, Gr, E)
    layer_sc = jnp.concatenate(
        [sc("attn_w", 3), sc("attn_proj_w", 1), sc("fc_w", 4), fcp_sc],
        axis=1,
    ).reshape(L * 12, Gr, E)

    V = cfg.vocab_size
    n_lm = _num_lm_tiles(V, E)
    lm8 = jnp.pad(
        _q4_to_int8({"q4": params["lm_q4"]}), ((0, 0), (0, n_lm * E - V))
    )  # [E, n_lm*E] (pad weight = 0)
    lm_tiles = lm8.reshape(E, n_lm, E).transpose(1, 0, 2)
    lm_s = jnp.pad(
        params["lm_s4"][..., 0, :], ((0, 0), (0, n_lm * E - V)),
        constant_values=1.0,
    )  # [Gr, n_lm*E]
    lm_sc = lm_s.reshape(Gr, n_lm, E).transpose(1, 0, 2)

    wstack = _pack_halves(jnp.concatenate([layer_tiles, lm_tiles]), E)
    w4scale = jnp.concatenate([layer_sc, lm_sc])
    # high-half groups carry the /16 of the nibble-recovery identity
    w4scale = w4scale.at[:, Gr // 2:, :].multiply(1.0 / 16.0).astype(dtype)
    return {"wstack": wstack, "w4scale": w4scale, **_gpt2_smalls(params, cfg)}


def _pick_tiles_per_slab(
    E: int, C: int, tile_bytes: int, kv_item: int, reserve: int = 0
) -> int:
    """Largest slab (1..3 tiles) that keeps the VMEM rings under budget.

    `reserve` carves out space for caller-specific scratch beyond the
    rings (the R-row verify pass's knew/vnew rows and 16-row RMW windows
    — measured overshoot without it: 384 KB past the 16 MB scoped limit).
    """
    kv_ring = 4 * C * E * kv_item  # 2-deep ring for K and for V
    for tps in (3, 2, 1):
        if 2 * tps * tile_bytes + kv_ring + reserve <= _VMEM_BUDGET:
            return tps
    return 0  # does not fit: caller falls back to the XLA path


def _tile_bytes(mode: str, E: int, G: int, dt_item: int) -> int:
    """Per-tile ring bytes: weight tile (+ its scale pane for int4)."""
    if mode == "int4":
        return (E // 2) * E + (E // G) * E * dt_item
    if mode == "int8":
        return E * E
    return E * E * dt_item


def _gpt2_int4_group(params: dict) -> int:
    """Uniform int4 group size across blocks + lm head, or 0."""
    from .megakernel_llama import _q4_group

    b = params["blocks"]
    gs = {_q4_group(b[n]) for n in _GPT2_WEIGHT_NAMES}
    if "lm_q4" in params:
        gs.add(_q4_group({"q4": params["lm_q4"]}))
    return gs.pop() if len(gs) == 1 else 0


def mega_supported(cfg, capacity: int, params: dict) -> bool:
    """Can the megakernel run this geometry? (engine-side eligibility)"""
    b = params.get("blocks", {})
    mode = _gpt2_weight_mode(b)
    if mode is None:
        return False
    if mode == "int8" and "lm_q" not in params:
        return False
    if mode == "int4" and "lm_q4" not in params:
        return False
    E = cfg.n_embd
    if E % 128 != 0 or capacity % 8 != 0:
        return False
    dt_item = jnp.dtype(params["wte"].dtype).itemsize
    G = 0
    if mode == "int4":
        G = _gpt2_int4_group(params)
        if G == 0 or E % G or (E // 2) % G or E % 16:
            return False
    return _pick_tiles_per_slab(
        E, capacity, _tile_bytes(mode, E, G, dt_item), dt_item
    ) > 0


@functools.partial(jax.jit, static_argnames=("cfg", "capacity", "interpret"))
def gpt2_megastep(
    packed: dict,
    k: jax.Array,  # [L, C, E] mega-layout cache (aliased output)
    v: jax.Array,
    length: jax.Array,  # int32 [] — tokens already cached
    x_emb: jax.Array,  # [1, E] token+position embedding (model dtype)
    *,
    cfg: Any,
    capacity: int,
    interpret: bool = False,
):
    """One full decode step. Returns (token id int32 [], new k, new v)."""
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    V = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    n_lm = _num_lm_tiles(V, E)
    n_tiles = L * 12 + n_lm
    wdtype = packed["wstack"].dtype  # int8 when weight-quantized
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    dtype = k.dtype  # compute/residual dtype (the model dtype)
    s4_vmem = False
    if int4_w:
        G = E // packed["w4scale"].shape[1]
        n_gh = (E // G) // 2  # scale groups per packed half-plane
        mode = "int4"
        # whole scale table VMEM-resident when it fits: halves the DMA
        # issue count (per-slab scale DMAs are tiny)
        s4_bytes = n_tiles * (E // G) * E * jnp.dtype(dtype).itemsize
        s4_vmem = s4_bytes <= _S4_VMEM_MAX
    else:
        G, n_gh = E, 0
        mode = "int8" if int8_w else "f"
    tile_b = (E // 2) * E if s4_vmem else _tile_bytes(
        mode, E, G, jnp.dtype(dtype).itemsize
    )
    tps = _pick_tiles_per_slab(E, C, tile_b, jnp.dtype(dtype).itemsize)
    if tps == 0:
        raise ValueError("megakernel does not fit VMEM at this capacity")
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)

    def ln(x32, g, b_):  # x32,g,b_: [1, E] fp32
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
        cur = len_ref[0, 0]

        if int4_w:
            # group selector for the low-plane bias correction:
            # gsel[r, g] = 1 iff low-half input row r belongs to group g
            r_ids = jax.lax.broadcasted_iota(jnp.int32, (E // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (E // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        # 0/1 head-segment selector: sel[e, h] = 1 iff e // D == h.
        # (sel @ .) reduces lanes per head; (. @ selT) broadcasts per head.
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 0) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (E, H), 1)
        sel = (e_ids == h_ids).astype(jnp.float32)  # [E, H]
        selT = sel.T  # [H, E]

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

        # tile t lives in slab t//tps at offset t%tps; wait lazily, prefetch
        # the next slab the first time a slab is touched
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
            # int8 tiles dequantize on the VMEM slab (per-output-channel
            # scale applied to the fp32 accumulator — mirrors models/gpt2.py
            # _mm); the astype is a no-op for full-precision tiles
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

        def seg_reduce(x32):  # [N, E] fp32 -> [N, H]: sum within head segs
            return jax.lax.dot_general(
                x32, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_bcast(x32):  # [N, H] fp32 -> [N, E]
            return jax.lax.dot_general(
                x32, selT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        x = x_ref[:].astype(dtype)  # [1, E] residual stream (model dtype)

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
            knew[l] = kc16
            vnew[l] = vc16

            # prefetch next layer's cache panes while attending this one
            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            # attention over the cached region, C-chunked to bound fp32
            # temps; current token merged separately (same softmax set as
            # _attend after its in-place write at column `cur`)
            qf = q32.astype(dtype).astype(jnp.float32)  # [1, E] (bf16 round)
            s_chunks = []
            for c0 in range(0, C, _ATTN_CHUNK):
                cw = min(_ATTN_CHUNK, C - c0)
                kc = kbuf[l % 2, c0:c0 + cw, :].astype(jnp.float32)
                s_chunks.append(seg_reduce(kc * qf))
            scores = jnp.concatenate(s_chunks, axis=0) * scale  # [C, H]
            row = jax.lax.broadcasted_iota(jnp.int32, (C, H), 0)
            scores = jnp.where(row < cur, scores, NEG_INF)
            s_cur = seg_reduce(
                kc16.astype(jnp.float32) * qf
            ) * scale  # [1, H]
            mx = jnp.maximum(jnp.max(scores, axis=0, keepdims=True), s_cur)
            p = jnp.exp(scores - mx)  # [C, H] fp32
            p_cur = jnp.exp(s_cur - mx)  # [1, H]
            denom = jnp.sum(p, axis=0, keepdims=True) + p_cur  # [1, H]
            ao = jnp.zeros((1, E), jnp.float32)
            for c0 in range(0, C, _ATTN_CHUNK):
                cw = min(_ATTN_CHUNK, C - c0)
                vc = vbuf[l % 2, c0:c0 + cw, :].astype(jnp.float32)
                pe = seg_bcast(p[c0:c0 + cw])  # [cw, E]
                ao = ao + jnp.sum(pe * vc, axis=0, keepdims=True)
            ao = ao + seg_bcast(p_cur) * vc16.astype(jnp.float32)
            ao = ao / seg_bcast(denom)  # [1, E]
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

        # merge the new K/V rows into their aligned 8-row groups and write
        # both groups back, overlapped with the LM-head tile stream
        gk_in.wait()
        gv_in.wait()
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 8, E), 1)
        ins = ridx == (cur - gbase)
        gk[:] = jnp.where(ins, jnp.broadcast_to(knew[:], (L, 8, E)), gk[:])
        gv[:] = jnp.where(ins, jnp.broadcast_to(vnew[:], (L, 8, E)), gv[:])
        okd = group_out(gk, ko_ref, osem.at[0])
        ovd = group_out(gv, vo_ref, osem.at[1])
        okd.start()
        ovd.start()

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
        scratch.append(pltpu.VMEM((2, tps, E // G, E), dtype))  # scale ring
    scratch += [
        pltpu.VMEM((2, C, E), dtype),  # K ring
        pltpu.VMEM((2, C, E), dtype),  # V ring
        pltpu.VMEM((L, 1, E), dtype),  # new K rows
        pltpu.VMEM((L, 1, E), dtype),  # new V rows
        pltpu.VMEM((L, 8, E), dtype),  # RMW group (K)
        pltpu.VMEM((L, 8, E), dtype),  # RMW group (V)
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, C, E]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
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
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((L, C, E), k.dtype),
            jax.ShapeDtypeStruct((L, C, E), v.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases={3: 1, 4: 2},
        interpret=interpret,
    )
    wscale = packed.get("wscale")
    if wscale is None:  # constant-folded away by XLA on the fp path
        wscale = jnp.ones((n_tiles, E), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:  # never read on non-int4 paths
        w4scale = jnp.zeros((1, 1, 128), dtype)
    tok, k2, v2 = f(
        jnp.reshape(length.astype(jnp.int32), (1, 1)),
        x_emb,
        packed["wstack"],
        k,
        v,
        packed["smalls"],
        packed["lnf"],
        wscale,
        w4scale,
    )
    return tok[0, 0], k2, v2


@functools.partial(jax.jit, static_argnames=("cfg", "capacity", "interpret"))
def gpt2_megaverify(
    packed: dict,
    k: jax.Array,  # [L, C, E] mega-layout cache (aliased output)
    v: jax.Array,
    length: jax.Array,  # int32 [] — tokens already cached
    x_emb: jax.Array,  # [R, E] token+position embeddings of the verify rows
    *,
    cfg: Any,
    capacity: int,
    interpret: bool = False,
):
    """Verify R draft rows in ONE weight-streaming pass (greedy).

    Row t carries the t-th verify token (position cur + t); its K/V rows
    are written into the cache and the per-row greedy argmax over the LM
    head comes back as [R] int32. The weight stream dominates the step, so
    verifying R rows costs ~one decode step — this is what makes
    speculative decoding (engine/speculative.py) compose with the
    megakernel: k draft tokens verified for the price of one step.

    Row t attends to cache columns < cur plus verify rows j <= t (the
    in-block causal set — identical to the XLA verify forward's mask).
    Requires R <= 8 and capacity >= roundup8(cur + R) + 8: the cache
    writeback uses a 16-row aligned read-modify-write window.
    """
    E, H, D, L = cfg.n_embd, cfg.n_head, cfg.head_dim, cfg.n_layer
    C = capacity
    V = cfg.vocab_size
    eps = cfg.layer_norm_epsilon
    R = x_emb.shape[0]
    assert R <= 8, "verify block must fit one 16-row RMW window"
    n_lm = _num_lm_tiles(V, E)
    n_tiles = L * 12 + n_lm
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    dtype = k.dtype
    s4_vmem = False
    if int4_w:
        G = E // packed["w4scale"].shape[1]
        n_gh = (E // G) // 2
        mode = "int4"
        s4_bytes = n_tiles * (E // G) * E * jnp.dtype(dtype).itemsize
        s4_vmem = s4_bytes <= _S4_VMEM_MAX
    else:
        G, n_gh = E, 0
        mode = "int8" if int8_w else "f"
    tile_b = (E // 2) * E if s4_vmem else _tile_bytes(
        mode, E, G, jnp.dtype(dtype).itemsize
    )
    # verify-pass extras beyond the step kernel's envelope: R-row
    # knew/vnew + two 16-row RMW windows + the per-row fp32 attention
    # temporaries (measured: bf16 R=8 C=536 at tps=3 overshoots the 16 MB
    # scoped limit by 384 KB — this reserve drops it to tps=2)
    dt_item = jnp.dtype(dtype).itemsize
    reserve = 2 * L * (R + 16) * E * dt_item + 2 * 1024 * 1024
    tps = _pick_tiles_per_slab(E, C, tile_b, dt_item, reserve)
    if tps == 0:
        raise ValueError("megakernel does not fit VMEM at this capacity")
    n_slabs = -(-n_tiles // tps)
    scale = 1.0 / (float(D) ** 0.5)

    def ln(x32, g, b_):  # row-wise LN, [R, E] fp32
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
        cur = len_ref[0, 0]

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
                ref.at[:, pl.ds(gbase, 16), :], buf, sem
            )

        def group_out(buf, ref, sem):
            return pltpu.make_async_copy(
                buf, ref.at[:, pl.ds(gbase, 16), :], sem
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

        def mm(x_, t, b32=None):  # [R, E] @ tile(t) -> [R, E] fp32
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

        x = x_ref[:].astype(dtype)  # [R, E] residual stream

        for l in range(L):
            base = l * 12

            def sm(r):
                return sm_ref[l, r:r + 1]

            h = ln(x.astype(jnp.float32), sm(0), sm(1)).astype(dtype)
            q32 = mm(h, base + 0, sm(4))
            k32 = mm(h, base + 1, sm(5))
            v32 = mm(h, base + 2, sm(6))
            kc16 = k32.astype(dtype)  # [R, E]
            vc16 = v32.astype(dtype)
            knew[l] = kc16
            vnew[l] = vc16

            if l + 1 < L:
                kdma((l + 1) % 2, l + 1).start()
                vdma((l + 1) % 2, l + 1).start()
            kdma(l % 2, l).wait()
            vdma(l % 2, l).wait()

            qf = q32.astype(dtype).astype(jnp.float32)  # [R, E]
            kf = kc16.astype(jnp.float32)
            vf = vc16.astype(jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, (C, H), 0)
            a_rows = []
            for r in range(R):
                qr = qf[r:r + 1]  # [1, E]
                s_chunks = []
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    kc = kbuf[l % 2, c0:c0 + cw, :].astype(jnp.float32)
                    s_chunks.append(seg_reduce(kc * qr))
                scores = jnp.concatenate(s_chunks, axis=0) * scale  # [C, H]
                scores = jnp.where(row < cur, scores, NEG_INF)
                # in-block causal keys: verify rows j <= r (incl. self)
                s_new = [
                    seg_reduce(kf[j:j + 1] * qr) * scale for j in range(r + 1)
                ]  # (r+1) x [1, H]
                mx = jnp.max(scores, axis=0, keepdims=True)
                for sn in s_new:
                    mx = jnp.maximum(mx, sn)
                p = jnp.exp(scores - mx)  # [C, H]
                p_new = [jnp.exp(sn - mx) for sn in s_new]
                denom = jnp.sum(p, axis=0, keepdims=True)
                for pn in p_new:
                    denom = denom + pn
                ao = jnp.zeros((1, E), jnp.float32)
                for c0 in range(0, C, _ATTN_CHUNK):
                    cw = min(_ATTN_CHUNK, C - c0)
                    vc = vbuf[l % 2, c0:c0 + cw, :].astype(jnp.float32)
                    pe = seg_bcast(p[c0:c0 + cw])
                    ao = ao + jnp.sum(pe * vc, axis=0, keepdims=True)
                for j, pn in enumerate(p_new):
                    ao = ao + seg_bcast(pn) * vf[j:j + 1]
                a_rows.append(ao / seg_bcast(denom))
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)  # [R, E]

            x = x + mm(a, base + 3, sm(7)).astype(dtype)

            h2 = ln(x.astype(jnp.float32), sm(2), sm(3)).astype(dtype)
            m32 = jnp.concatenate(
                [mm(h2, base + 4 + i, sm(8 + i)) for i in range(4)], axis=-1
            )  # [R, 4E] fp32
            g32 = 0.5 * m32 * (
                1.0
                + jnp.tanh(0.7978845608028654 * (m32 + 0.044715 * m32 ** 3))
            )
            gh = g32.astype(dtype)
            y32 = sm(12)
            for i in range(4):
                y32 = y32 + mm(gh[:, i * E:(i + 1) * E], base + 8 + i)
            x = x + y32.astype(dtype)

        # insert the R new K/V rows into the 16-row aligned window
        gk_in.wait()
        gv_in.wait()
        off = cur - gbase  # 0..7, so off + R <= 16
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, 16, E), 1)
        gkv = gk[:]
        gvv = gv[:]
        for r in range(R):
            ins = ridx == off + r
            gkv = jnp.where(
                ins, jnp.broadcast_to(knew[:, r:r + 1, :], (L, 16, E)), gkv
            )
            gvv = jnp.where(
                ins, jnp.broadcast_to(vnew[:, r:r + 1, :], (L, 16, E)), gvv
            )
        gk[:] = gkv
        gv[:] = gvv
        okd = group_out(gk, ko_ref, osem.at[0])
        ovd = group_out(gv, vo_ref, osem.at[1])
        okd.start()
        ovd.start()

        xf = ln(
            x.astype(jnp.float32), lnf_ref[0:1], lnf_ref[1:2]
        ).astype(dtype)  # [R, E]
        big = jnp.int32(2 ** 30)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (R, E), 1)
        best = jnp.full((R, 1), NEG_INF, jnp.float32)
        best_idx = jnp.zeros((R, 1), jnp.int32)
        lm_base = L * 12
        for t in range(n_lm):
            y = mm(xf, lm_base + t)  # [R, E] fp32 logits chunk
            if (t + 1) * E > V:
                y = jnp.where(cidx < V - t * E, y, NEG_INF)
            ymax = jnp.max(y, axis=1, keepdims=True)  # [R, 1]
            # first-max-wins within the tile, as jnp.argmax
            cand = jnp.min(
                jnp.where(y == ymax, cidx, big), axis=1, keepdims=True
            ) + t * E
            take = ymax > best  # strict: earlier tiles win ties
            best_idx = jnp.where(take, cand, best_idx)
            best = jnp.maximum(best, ymax)
        tok_ref[:] = jnp.broadcast_to(best_idx, (R, 128))

        okd.wait()
        ovd.wait()

    wtile_shape = (2, tps, E // 2, E) if int4_w else (2, tps, E, E)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, tps, E // G, E), dtype))
    scratch += [
        pltpu.VMEM((2, C, E), dtype),  # K ring
        pltpu.VMEM((2, C, E), dtype),  # V ring
        pltpu.VMEM((L, R, E), dtype),  # new K rows
        pltpu.VMEM((L, R, E), dtype),  # new V rows
        pltpu.VMEM((L, 16, E), dtype),  # RMW window (K)
        pltpu.VMEM((L, 16, E), dtype),  # RMW window (V)
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x_emb [R, E]
            pl.BlockSpec(memory_space=pltpu.HBM),  # wstack
            pl.BlockSpec(memory_space=pltpu.HBM),  # k
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # smalls
            pl.BlockSpec(memory_space=pltpu.VMEM),  # lnf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wscale
            pl.BlockSpec(  # w4scale
                memory_space=pltpu.HBM
                if (int4_w and not s4_vmem) else pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [R, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, C, E), k.dtype),
            jax.ShapeDtypeStruct((L, C, E), v.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases={3: 1, 4: 2},
        interpret=interpret,
    )
    wscale = packed.get("wscale")
    if wscale is None:
        wscale = jnp.ones((n_tiles, E), jnp.float32)
    w4scale = packed.get("w4scale")
    if w4scale is None:
        w4scale = jnp.zeros((1, 1, 128), dtype)
    toks, k2, v2 = f(
        jnp.reshape(length.astype(jnp.int32), (1, 1)),
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
