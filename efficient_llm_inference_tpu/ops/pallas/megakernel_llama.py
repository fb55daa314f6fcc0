"""Whole-step decode megakernel for the Llama family (GQA, RoPE, SwiGLU).

Same design as ops/pallas/megakernel.py (see that module's header for the
rationale: single-stream decode is weight-bandwidth bound and the XLA step
pays per-op dispatch overhead on top of the weight-streaming floor), adapted
to Llama geometry. No reference counterpart — the reference's decode step is
a full HF model forward (/root/reference/src/benchmarking/benchmarker.py:473);
this module is the TPU-native replacement for its hot decode path on the
north-star Llama models.

What differs from the GPT-2 kernel:

* Non-square weight tiles. GPT-2's [E, E] unit doesn't exist here (projection
  widths are Hq*D, Hkv*D, I, E — all different). Every weight is cut into a
  uniform [TR, TC] grid where TR divides every matmul input dim and TC every
  output dim (for Llama-3.2-1B: [2048, 512] tiles, 58/layer + 251 LM tiles).
  Output chunks accumulate over row-group tiles; per-output-channel int8
  scales apply once per chunk after the row-group sum (same contraction
  order as models/gpt2.py:_mm up to the documented row-partial reassociation).
* GQA attention in compact KV lane space. The cache pane is [C, Hkv*D]; the
  32 query heads fold onto it as GR = Hq/Hkv "rotations": q_r gathers the
  r-th query head of each KV group into KV lane space (static 64-lane
  slices), scores reduce per KV head via a [KW, Hkv] 0/1 segment-selector
  matmul, and the per-rotation outputs interleave back to [1, Hq*D]. The
  cache is never expanded to query width — no 4x HBM inflation, no
  [C, 512]x[512, 2048] expansion matmuls.
* RoPE in-kernel via lane rolls. rotate-half needs x[d +- D/2] within each
  D-lane head segment; a full-lane roll by D/2 lands in-segment exactly for
  the lanes each branch keeps, so two static roll-concats + an iota select
  implement it with no cross-lane gather constants. cos/sin for the current
  position arrive tiled to query width ([1, Hq*D], computed by the caller —
  they depend only on the step's position).
* RMSNorm (fp32 stats, cast-before-scale as models/llama.py:_rms_norm) and
  SwiGLU (fp32 silu, product in the model dtype) replace LN/GELU.
* Grouped-int4 weight tiles (beyond the int8 tier): each [TR, TC] tile is
  stored as [TR/2, TC] int8 with row r paired with row r + TR/2 — the low
  nibble BIASED by +8, the high nibble in two's complement — plus a
  [TR/G, TC] per-group scale pane DMA'd alongside the tile on its own
  ring. The low plane dots the raw biased nibbles against scale-expanded
  panes and the +8 bias comes out as one small correction matmul per tile
  (8 * per-group x-sums against the scale rows); the high plane uses the
  float identity (byte - low_nibble) = 16 * signed_high (the byte's own
  sign extends the nibble) with the /16 pre-folded into its scale rows.
  No shifts (Mosaic cannot legalize arith.shrsi on int8 vectors), no
  per-element sign extension. Halves pairing (not the in-group interleave
  the XLA path packs) keeps both x-plane slices contiguous in lane space.

Numerics mirror models/llama.py exactly up to the same reassociation classes
as the GPT-2 kernel (row-partial sums, C-chunked attention reductions,
current-token softmax merge); tests/test_megakernel_llama.py asserts
token-exact decode against the XLA path in interpret mode.
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

_VMEM_BUDGET = 40 * 1024 * 1024  # of v5e's 128 MB; leaves Mosaic headroom
_ATTN_CHUNK = 512

_WEIGHT_NAMES = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")

# test hook: force the per-tile scale-pane DMA ring even when the whole
# scale table would fit VMEM (the big-model path, e.g. Llama-3-8B)
_S4_RING_ONLY = False


def _q4_group(d: dict) -> int:
    """Group size used by models/gpt2.py:quantize_int4_weights for this dict."""
    return 2 * d["q4"].shape[-2]


def _s4_half_rows(TR: int, G: int) -> int:
    """Scale-stack rows per packed half-plane, 8-aligned when grouped.

    Mosaic DMAs slice the per-tile scale pane out of HBM on its own ring;
    a sublane count that is not a multiple of 8 is unsliceable
    (`tpu.memref_slice` rejects it — Qwen2.5-7B's 1792-row tiles give 7
    groups per half at G=128). Halves with 2..7 (mod 8) groups are padded
    with zero rows up to the next multiple of 8; zero scales contribute
    nothing through the group-selector correction, so the pad is exact.
    n_gh == 1 (the int4w8 regime) keeps its 2-row pane: it is only ever
    read VMEM-resident.
    """
    n_gh = (TR // G) // 2
    if n_gh <= 1:
        return n_gh
    return -(-n_gh // 8) * 8


def _s4_geom(TR: int, packed: dict) -> tuple[int, int, int]:
    """(G, n_gh, p) of a packed int4 scale stack; p = rows per half-plane.

    Unpadded stacks ([n_tiles, TR/G, TC]) encode G in their row count.
    Padded stacks carry the real per-half group count in the SHAPE of the
    `s4g` marker (static under jit): low-half scales live at rows
    [0, n_gh), high-half at [p, p + n_gh), zeros elsewhere.
    """
    rows = packed["w4scale"].shape[1]
    if "s4g" in packed:
        n_gh = packed["s4g"].shape[0]
        return (TR // 2) // n_gh, n_gh, rows // 2
    G = TR // rows
    return G, rows // 2, rows // 2


def _q4_to_int8(d: dict) -> jax.Array:
    """{"q4": [.., Kg, g/2, F] packed, ...} -> signed int8 [.., K, F].

    Inverse of the in-group interleave packing (even in-group positions in
    the low nibble, odd in the high — models/gpt2.py:quantize_int4_weights).
    """
    q4 = d["q4"]
    lo = ((jnp.bitwise_and(q4, 0xF).astype(jnp.int8)) ^ 8) - 8
    hi = ((jnp.right_shift(q4, 4).astype(jnp.int8)) ^ 8) - 8
    inter = jnp.stack([lo, hi], axis=-2)  # [.., Kg, g/2, 2, F]
    s = inter.shape
    return inter.reshape(*s[:-4], s[-4] * s[-3] * s[-2], s[-1])


def _pack_halves(t8: jax.Array, TR: int) -> jax.Array:
    """[nt, TR, TC] signed int8 in [-8, 7] -> [nt, TR/2, TC] packed int8.

    Kernel-private layout: tile row r pairs with row r + TR/2. The LOW
    nibble stores the row-r value BIASED by +8 (0..15) so the kernel can
    dot it raw and subtract an 8*sum(x)*scale correction matmul instead of
    sign-extending per element. The HIGH nibble stores row r + TR/2 in
    two's complement: interpreting the whole byte as int8, the identity
    (byte - low_nibble) / 16 == signed high value
    recovers it exactly in float — no shift (Mosaic cannot legalize
    arith.shrsi on int8 vectors) and no sign-extension ALU. The /16 folds
    into the pre-packed high-half scales.
    """
    lo_u = (t8[:, : TR // 2, :].astype(jnp.int16) + 8).astype(jnp.uint8)
    hi_tc = (t8[:, TR // 2:, :].astype(jnp.int16) & 0xF).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(lo_u | (hi_tc << 4), jnp.int8)


def _int4_tile_dot(xg, pk, st, gsel, TR, G, n_gh, dtype, p=None):
    """[1, TR] x one packed int4 tile -> [1, TC] f32 (in-kernel dequant).

    pk [TR/2, TC] packed int8: tile row r (low nibble, BIASED +8) pairs
    with row r + TR/2 (high nibble, two's complement). st [2p, TC] scale
    pane (high rows pre-divided by 16 at pack time): low-half group scales
    at rows [0, n_gh), high-half at [p, p + n_gh) — p > n_gh on padded
    stacks (_s4_half_rows), where the extra rows are zeros and unread.
    Low plane:
    x @ (u * s) - 8 * (per-group x sums) @ s. High plane: the float
    identity (byte_f - lo_f) carries 16 * signed value — the byte's own
    sign extends the nibble — so (byte_f - lo_f) * (s/16) dequantizes with
    no shift (Mosaic cannot legalize arith.shrsi on int8 vectors) and no
    per-element sign extension.

    int4w8 fast path (n_gh == 1, i.e. G == TR/2, weight_quant="int4w8"):
    ONE scale per (half-tile plane, output column), so the scale factors
    OUT of the contraction entirely — the dots run on the RAW nibble
    values and the [1, TC] results are column-scaled afterwards. This
    deletes both full-tile [TR/2, TC] scale multiplies and the scale-pane
    broadcasts from the per-tile hot loop (the VPU work that kept the
    grouped-int4 step at 2.07 ms vs its 0.78 ms DMA floor on Llama-1B;
    docs/ROADMAP.md #2), at the quality cost of coarser (half-tile) group
    granularity — measured on scale_llama in docs/QUALITY.md.
    """
    TC = pk.shape[-1]
    if p is None:
        p = n_gh
    if n_gh == 1:  # G == TR/2: per-(half-tile, column) scales
        lo_f = jnp.bitwise_and(pk, 0xF).astype(dtype)  # u = v + 8
        hi_f = pk.astype(dtype) - lo_f  # 16 * signed high value, exactly
        y_lo = jax.lax.dot_general(
            xg[:, : TR // 2], lo_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_hi = jax.lax.dot_general(
            xg[:, TR // 2:], hi_f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_lo = st[0:1].astype(jnp.float32)  # [1, TC]
        s_hi = st[p:p + 1].astype(jnp.float32)  # [1, TC], pre-divided by 16
        xsum = jnp.sum(
            xg[:, : TR // 2].astype(jnp.float32), axis=1, keepdims=True
        )  # [1, 1] — the biased-nibble correction collapses to a scalar
        return (y_lo - 8.0 * xsum) * s_lo + y_hi * s_hi
    s_lo = jnp.broadcast_to(
        st[:n_gh][:, None, :], (n_gh, G, TC)
    ).reshape(TR // 2, TC)
    s_hi16 = jnp.broadcast_to(
        st[p:p + n_gh][:, None, :], (n_gh, G, TC)
    ).reshape(TR // 2, TC)
    lo_f = jnp.bitwise_and(pk, 0xF).astype(dtype)  # u = v + 8
    lo_w = lo_f * s_lo
    hi_w = (pk.astype(dtype) - lo_f) * s_hi16  # v * s, exactly
    y = jax.lax.dot_general(
        xg[:, : TR // 2], lo_w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        xg[:, TR // 2:], hi_w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    xs = jax.lax.dot_general(  # [1, n_gh] low-half group sums of x
        xg[:, : TR // 2], gsel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    corr = jax.lax.dot_general(
        xs, st[:n_gh].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y - 8.0 * corr


def _weight_mode(b: dict) -> str | None:
    """"f" | "int8" | "int4" when the block weights are uniform, else None."""
    kinds = set()
    for n in _WEIGHT_NAMES:
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


def _tile_geometry(cfg) -> tuple[int, int, int]:
    """Uniform [TR, TC] + padded FFN width Ip.

    TR divides every matmul input dim, TC every output dim. Geometries
    whose intermediate size shares a poor gcd with the hidden size (e.g.
    Qwen2.5-1.5B's 8960 vs 1536 -> 256x256 tiles, 23k of them) get the
    packed stream's gate/up columns and down rows ZERO-PADDED up to the
    next multiple of E — exact through SwiGLU (silu(0)*0 = 0 and zero
    down-rows add nothing) and only the stream pays the pad bytes (prefill
    keeps the unpadded originals). Adopted when it grows the tile >=2x at
    <=15% padding (fewer, bigger DMAs beat the <=15% extra stream bytes;
    Qwen2.5-1.5B: 256x256 -> 1536x256 at 2.9%, Qwen2.5-7B: 512x512 ->
    1792x512 at 13.5%).
    """
    E, I = cfg.hidden_size, cfg.intermediate_size
    QW = cfg.n_head * cfg.head_dim
    KW = cfg.n_kv_head * cfg.head_dim

    def geo(Ip):
        TR = math.gcd(math.gcd(E, QW), Ip)
        while TR > 2048:
            TR //= 2
        TC = math.gcd(math.gcd(QW, KW), math.gcd(E, Ip))
        while TC > 512:
            TC //= 2
        return TR, TC

    TR, TC = geo(I)
    Ie = -(-I // E) * E
    if Ie != I and (Ie - I) * 100 <= 15 * I:
        TRp, TCp = geo(Ie)
        if TRp * TCp >= 2 * TR * TC:
            return TRp, TCp, Ie
    return TR, TC, I


def _num_lm_tiles(vocab: int, TC: int) -> int:
    return -(-vocab // TC)


def _layer_tile_plan(cfg, TR: int, TC: int, Ip: int):
    """Per-layer (name, rows, cols) in stream order; rows/cols in tiles.

    Ip is the (possibly padded) FFN width from _tile_geometry.
    """
    E = cfg.hidden_size
    QW = cfg.n_head * cfg.head_dim
    KW = cfg.n_kv_head * cfg.head_dim
    return [
        ("wq", E // TR, QW // TC),
        ("wk", E // TR, KW // TC),
        ("wv", E // TR, KW // TC),
        ("wo", QW // TR, E // TC),
        ("w_gate", E // TR, Ip // TC),
        ("w_up", E // TR, Ip // TC),
        ("w_down", Ip // TR, E // TC),
    ]


def _tiles_per_layer(cfg, TR: int, TC: int, Ip: int) -> int:
    return sum(r * c for _, r, c in _layer_tile_plan(cfg, TR, TC, Ip))


def to_mega_layout(buf: jax.Array) -> jax.Array:
    """[L, 1, Hkv, C, D] cache pane -> [L, C, Hkv*D] kernel layout."""
    L, B, H, C, D = buf.shape
    assert B == 1, "megakernel is single-stream"
    return buf[:, 0].transpose(0, 2, 1, 3).reshape(L, C, H * D)


def _grid_tiles(w: jax.Array, TR: int, TC: int) -> jax.Array:
    """[Rin, Rout] -> [cg*rg, TR, TC] tiles, column-group major."""
    Rin, Rout = w.shape
    rg, cg = Rin // TR, Rout // TC
    return (
        w.reshape(rg, TR, cg, TC).transpose(2, 0, 1, 3).reshape(cg * rg, TR, TC)
    )


def _grid_scales(s: jax.Array, rg: int, TC: int) -> jax.Array:
    """[1, Rout] column scales -> per-tile [cg*rg, TC] (shared across rows)."""
    cg = s.shape[-1] // TC
    out = jnp.broadcast_to(s.reshape(cg, 1, TC), (cg, rg, TC))
    return out.reshape(cg * rg, TC)


def pack_llama_mega(params: dict, cfg) -> dict | None:
    """Re-layout Llama params into the megakernel's uniform tile stream.

    Returns {"wstack": [n_tiles, TR, TC] (or [n_tiles, TR/2, TC] uint8 for
    int4), "norms": [L, 2, E] f32, "lnf": [1, E] f32, "wscale":
    [n_tiles, TC] f32 (int8 only), "w4scale": [n_tiles, TR/G, TC] model
    dtype (int4 only)} or None when the params are not packable (mixed
    quantization, indivisible geometry).
    """
    E, L = cfg.hidden_size, cfg.n_layer
    b = params["blocks"]
    mode = _weight_mode(b)
    if mode is None:
        return None
    int8 = mode == "int8"
    int4 = mode == "int4"
    if int8 and "lm_q" not in params:
        return None
    if int4 and "lm_q4" not in params:
        return None
    TR, TC, Ip = _tile_geometry(cfg)
    plan = _layer_tile_plan(cfg, TR, TC, Ip)
    for _, r, c in plan:
        if r == 0 or c == 0:
            return None
    if int4:
        return _pack_llama_mega_int4(params, cfg, TR, TC, Ip, plan)
    I = cfg.intermediate_size

    def wv(name):
        w = b[name]["q"] if int8 else b[name]
        if Ip != I:  # zero-pad the packed stream's FFN dims (stream only)
            if name in ("w_gate", "w_up"):
                w = jnp.pad(w, ((0, 0), (0, 0), (0, Ip - I)))
            elif name == "w_down":
                w = jnp.pad(w, ((0, 0), (0, Ip - I), (0, 0)))
        return w

    layer_tiles = jnp.concatenate(
        [
            jax.vmap(lambda w: _grid_tiles(w, TR, TC))(wv(name))
            for name, _, _ in plan
        ],
        axis=1,
    )  # [L, tiles_per_layer, TR, TC]
    per_layer = layer_tiles.shape[1]
    layer_tiles = layer_tiles.reshape(L * per_layer, TR, TC)

    V = cfg.vocab_size
    n_lm = _num_lm_tiles(V, TC)
    if int8:
        head = params["lm_q"]
    elif cfg.tie_embeddings:
        head = params["embed"].T
    else:
        head = params["lm_head"]
    head = jnp.pad(head, ((0, 0), (0, n_lm * TC - V)))
    lm_tiles = _grid_tiles(head, TR, TC)

    wstack = jnp.concatenate([layer_tiles, lm_tiles.astype(layer_tiles.dtype)])

    out = {
        "wstack": wstack,
        "norms": jnp.stack(
            [b["ln1"].astype(jnp.float32), b["ln2"].astype(jnp.float32)], axis=1
        ),  # [L, 2, E]
        "lnf": params["ln_f"].astype(jnp.float32)[None],  # [1, E]
    }
    if "bq" in b:  # Qwen2-style q/k/v projection biases, one row per layer
        out["qkvb"] = jnp.concatenate(
            [b["bq"], b["bk"], b["bv"]], axis=-1
        ).astype(jnp.float32)  # [L, QW + 2*KW]
    if int8:

        def sv(name):  # per-output-channel scales, FFN cols padded with 1.0
            s = b[name]["s"]
            if Ip != I and name in ("w_gate", "w_up"):
                s = jnp.pad(s, ((0, 0), (0, 0), (0, Ip - I)),
                            constant_values=1.0)
            return s

        layer_sc = jnp.concatenate(
            [
                jax.vmap(lambda s: _grid_scales(s, r, TC))(sv(name))
                for (name, r, _) in plan
            ],
            axis=1,
        ).reshape(L * per_layer, TC)
        lm_sc = _grid_scales(
            jnp.pad(params["lm_s"], ((0, 0), (0, n_lm * TC - V)),
                    constant_values=1.0),
            E // TR, TC,
        )
        out["wscale"] = jnp.concatenate([layer_sc, lm_sc]).astype(jnp.float32)
    return out


def _pack_llama_mega_int4(
    params: dict, cfg, TR: int, TC: int, Ip: int, plan
) -> dict | None:
    """Grouped-int4 tile stream: biased half-paired nibbles + per-tile
    group-scale panes (DMA'd alongside each weight tile).

    The kernel reads each tile as [TR/2, TC] packed int8 (row r pairs with
    row r + TR/2) plus a [TR/G, TC] scale pane in the model dtype. Streams
    past ~1.5 GiB are packed on the HOST layer by layer — the device path
    transiently materializes the full unpacked int8 tile grid (2x the int4
    bytes), which OOMs a 16 GiB chip next to Llama-3-8B's resident params.
    """
    E, L = cfg.hidden_size, cfg.n_layer
    b = params["blocks"]
    dtype = params["embed"].dtype
    gs = {_q4_group(b[n]) for n in _WEIGHT_NAMES} | {_q4_group(
        {"q4": params["lm_q4"]})}
    if len(gs) != 1:
        return None  # kernel wants one uniform group size
    G = gs.pop()
    I = cfg.intermediate_size
    if TR % G or (TR // 2) % G or TR % 16 or (Ip - I) % G:
        return None
    stream_bytes = sum(b[n]["q4"].size for n in _WEIGHT_NAMES) * 2
    if stream_bytes > 3 * 512 * 1024**2:
        return _pack_llama_mega_int4_host(params, cfg, TR, TC, Ip, plan, G)

    def tiles_of(name):
        w8 = _q4_to_int8(b[name])  # [L, K, F] int8
        if Ip != I:  # stream-only FFN padding (zeros are exact)
            if name in ("w_gate", "w_up"):
                w8 = jnp.pad(w8, ((0, 0), (0, 0), (0, Ip - I)))
            elif name == "w_down":
                w8 = jnp.pad(w8, ((0, 0), (0, Ip - I), (0, 0)))
        return jax.vmap(lambda w: _grid_tiles(w, TR, TC))(w8)

    def scales_of(name):
        s2 = b[name]["s"][..., 0, :]  # [L, K/G, F] f32
        if Ip != I:
            if name in ("w_gate", "w_up"):
                s2 = jnp.pad(s2, ((0, 0), (0, 0), (0, Ip - I)),
                             constant_values=1.0)
            elif name == "w_down":
                s2 = jnp.pad(s2, ((0, 0), (0, (Ip - I) // G), (0, 0)),
                             constant_values=1.0)
        return jax.vmap(lambda s: _grid_tiles(s, TR // G, TC))(s2)

    layer_tiles = jnp.concatenate(
        [tiles_of(name) for name, _, _ in plan], axis=1
    )  # [L, per_layer, TR, TC] int8
    layer_sc = jnp.concatenate(
        [scales_of(name) for name, _, _ in plan], axis=1
    )  # [L, per_layer, TR/G, TC] f32
    per_layer = layer_tiles.shape[1]
    layer_tiles = layer_tiles.reshape(L * per_layer, TR, TC)
    layer_sc = layer_sc.reshape(L * per_layer, TR // G, TC)

    V = cfg.vocab_size
    n_lm = _num_lm_tiles(V, TC)
    head8 = jnp.pad(
        _q4_to_int8({"q4": params["lm_q4"]}), ((0, 0), (0, n_lm * TC - V))
    )  # [E, n_lm*TC] int8 (pad weight = 0)
    head_s = jnp.pad(
        params["lm_s4"][..., 0, :], ((0, 0), (0, n_lm * TC - V)),
        constant_values=1.0,
    )  # [E/G, n_lm*TC]
    lm_tiles = _grid_tiles(head8, TR, TC)
    lm_sc = _grid_tiles(head_s, TR // G, TC)

    wstack = _pack_halves(jnp.concatenate([layer_tiles, lm_tiles]), TR)
    w4scale = jnp.concatenate([layer_sc, lm_sc])
    # high-half groups carry the /16 of the nibble-recovery identity
    n_gh = (TR // G) // 2
    w4scale = w4scale.at[:, n_gh:, :].multiply(1.0 / 16.0).astype(dtype)
    p = _s4_half_rows(TR, G)
    s4g = None
    if p != n_gh:  # 8-align each half-plane for the scale-pane DMA ring
        zpad = jnp.zeros((w4scale.shape[0], p - n_gh, TC), w4scale.dtype)
        w4scale = jnp.concatenate(
            [w4scale[:, :n_gh], zpad, w4scale[:, n_gh:], zpad], axis=1
        )
        s4g = jnp.zeros((n_gh,), jnp.int8)  # shape encodes the real count

    out = {
        "wstack": wstack,
        "w4scale": w4scale,
        "norms": jnp.stack(
            [b["ln1"].astype(jnp.float32), b["ln2"].astype(jnp.float32)], axis=1
        ),
        "lnf": params["ln_f"].astype(jnp.float32)[None],
    }
    if s4g is not None:
        out["s4g"] = s4g
    if "bq" in b:
        out["qkvb"] = jnp.concatenate(
            [b["bq"], b["bk"], b["bv"]], axis=-1
        ).astype(jnp.float32)
    return out


def _pack_llama_mega_int4_host(
    params: dict, cfg, TR: int, TC: int, Ip: int, plan, G: int
) -> dict:
    """Host (numpy) variant of the int4 tile packer for big streams.

    Pulls each quantized weight to the host once, packs layer by layer,
    and ships only the finished stream back — device HBM never holds the
    unpacked int8 tile grid. One-time cost at engine build.
    """
    import numpy as np

    E, L = cfg.hidden_size, cfg.n_layer
    b = params["blocks"]
    dtype = params["embed"].dtype
    n_gh = (TR // G) // 2
    p = _s4_half_rows(TR, G)  # rows per half-plane after 8-alignment

    def np_grid(w, tr):
        Rin, Rout = w.shape
        rg, cg = Rin // tr, Rout // TC
        return (
            w.reshape(rg, tr, cg, TC).transpose(2, 0, 1, 3)
            .reshape(cg * rg, tr, TC)
        )

    def np_unpack(q4):  # [Kg, g/2, F] packed -> [K, F] int8
        lo = ((q4 & 0xF).astype(np.int8) ^ 8) - 8
        hi = ((q4 >> 4).astype(np.int8) ^ 8) - 8
        inter = np.stack([lo, hi], axis=-2)  # [Kg, g/2, 2, F]
        s = inter.shape
        return inter.reshape(s[0] * s[1] * s[2], s[3])

    def np_pack_halves(t8):
        lo_u = (t8[:, : TR // 2].astype(np.int16) + 8).astype(np.uint8)
        hi = (t8[:, TR // 2:].astype(np.int16) & 0xF).astype(np.uint8)
        return (lo_u | (hi << 4)).view(np.int8)

    per_layer = sum(r * c for _, r, c in plan)
    V = cfg.vocab_size
    n_lm = _num_lm_tiles(V, TC)
    n_tiles = L * per_layer + n_lm * (E // TR)
    wstack = np.empty((n_tiles, TR // 2, TC), np.int8)
    w4scale = np.zeros((n_tiles, 2 * p, TC), np.float32)

    def put_scales(off, nt, pane):  # pane [nt, TR/G, TC]: split the halves
        w4scale[off:off + nt, :n_gh] = pane[:, :n_gh]
        w4scale[off:off + nt, p:p + n_gh] = pane[:, n_gh:]

    I = cfg.intermediate_size

    def pad_w(name, w8):
        if Ip != I and name in ("w_gate", "w_up"):
            return np.pad(w8, ((0, 0), (0, Ip - I)))
        if Ip != I and name == "w_down":
            return np.pad(w8, ((0, Ip - I), (0, 0)))
        return w8

    def pad_s(name, s2):
        if Ip != I and name in ("w_gate", "w_up"):
            return np.pad(s2, ((0, 0), (0, Ip - I)), constant_values=1.0)
        if Ip != I and name == "w_down":
            return np.pad(s2, ((0, (Ip - I) // G), (0, 0)),
                          constant_values=1.0)
        return s2

    off = 0
    host_q = {n: np.asarray(b[n]["q4"]) for n in _WEIGHT_NAMES}
    host_s = {n: np.asarray(b[n]["s"][..., 0, :]) for n in _WEIGHT_NAMES}
    for l in range(L):
        for name, _, _ in plan:
            t8 = np_grid(pad_w(name, np_unpack(host_q[name][l])), TR)
            nt = t8.shape[0]
            wstack[off:off + nt] = np_pack_halves(t8)
            put_scales(off, nt, np_grid(pad_s(name, host_s[name][l]),
                                        TR // G))
            off += nt

    head8 = np.pad(np_unpack(np.asarray(params["lm_q4"])),
                   ((0, 0), (0, n_lm * TC - V)))
    head_s = np.pad(np.asarray(params["lm_s4"][..., 0, :]),
                    ((0, 0), (0, n_lm * TC - V)), constant_values=1.0)
    t8 = np_grid(head8, TR)
    wstack[off:off + t8.shape[0]] = np_pack_halves(t8)
    put_scales(off, t8.shape[0], np_grid(head_s, TR // G))
    assert off + t8.shape[0] == n_tiles

    w4scale[:, p:, :] *= 1.0 / 16.0  # nibble-recovery /16, high half

    out = {
        "wstack": jnp.asarray(wstack),
        "w4scale": jnp.asarray(w4scale).astype(dtype),
        "norms": jnp.stack(
            [b["ln1"].astype(jnp.float32), b["ln2"].astype(jnp.float32)],
            axis=1,
        ),
        "lnf": params["ln_f"].astype(jnp.float32)[None],
    }
    if p != n_gh:
        out["s4g"] = jnp.zeros((n_gh,), jnp.int8)
    if "bq" in b:
        out["qkvb"] = jnp.concatenate(
            [b["bq"], b["bk"], b["bv"]], axis=-1
        ).astype(jnp.float32)
    return out


def _pick_tiles_per_slab(
    w_slot_bytes: int, C: int, KW: int, kv_item: int, ws_bytes: int,
) -> int:
    """1 if the 2-deep weight(+scale) ring + KV rings + the kernel's
    fp32 attention temporaries fit the VMEM budget, else 0."""
    kv_ring = 4 * C * KW * kv_item  # 2-deep ring for K and for V
    # chunked attention fp32 temps: k/v chunk loads, probability pane, and
    # the [C, Hkv]-shaped score/prob columns (~6 chunk-sized panes is the
    # empirical envelope)
    attn_tmp = 6 * min(C, _ATTN_CHUNK) * KW * 4
    if 2 * w_slot_bytes + kv_ring + ws_bytes + attn_tmp <= _VMEM_BUDGET:
        return 1
    return 0


def _w_slot_bytes(
    mode: str, TR: int, TC: int, G: int, dt_item: int, s_rows: int | None = None
) -> int:
    """Per-ring-slot bytes for one weight tile (+ its scale pane for int4).

    s_rows overrides the scale-pane row count for padded stacks
    (_s4_half_rows); None keeps the unpadded TR/G rows (gpt2 packers).
    """
    if mode == "int4":
        if s_rows is None:
            s_rows = TR // G
        return (TR // 2) * TC + s_rows * TC * dt_item
    if mode == "int8":
        return TR * TC
    return TR * TC * dt_item


def mega_supported(cfg, capacity: int, params: dict) -> bool:
    """Engine-side eligibility for the Llama megakernel."""
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
    if cfg.head_dim % 2 != 0 or capacity % 8 != 0:
        return False
    G = 0
    if mode == "int4":
        gs = {_q4_group(b[n]) for n in _WEIGHT_NAMES}
        gs.add(_q4_group({"q4": params["lm_q4"]}))
        if len(gs) != 1:
            return False
        G = gs.pop()
        # halves pairing must not split a scale group, the packed tile
        # needs an even, 8-aligned sublane count, and FFN stream padding
        # must cover whole scale groups
        if TR % G or (TR // 2) % G or TR % 16:
            return False
        if (Ip - cfg.intermediate_size) % G:
            return False
    dt_item = jnp.dtype(params["embed"].dtype).itemsize
    kv_item = dt_item
    # LM head: n_lm column tiles x (E // TR) row-group tiles in the stream
    n_tiles = cfg.n_layer * _tiles_per_layer(cfg, TR, TC, Ip) + _num_lm_tiles(
        cfg.vocab_size, TC
    ) * (cfg.hidden_size // TR)
    slot_bytes = _w_slot_bytes(
        mode, TR, TC, G, dt_item,
        2 * _s4_half_rows(TR, G) if mode == "int4" else None,
    )
    # per-tile DMA issue cost (~1 us) must stay small vs the stream time:
    # thousands of sub-256KB tiles (e.g. Qwen2.5-1.5B's gcd-forced 256x256
    # grid = 23k tiles) would be DMA-overhead-bound — keep those on XLA
    if n_tiles > 2048 and slot_bytes < 256 * 1024:
        return False
    # the packed tile stream DUPLICATES the matmul weights in HBM (prefill
    # still needs the originals); past ~4 GiB the pair exceeds a 16 GiB
    # chip alongside the params — Llama-3-8B int8 stays on XLA. At int4 the
    # originals are half the stream's int8 equivalent, so the pair fits up
    # to a ~5 GiB stream (Llama-3-8B int4: 4.2 GiB stream + 4.2 GiB
    # originals + embeds ~ 9.5 GiB on a 16 GiB chip).
    stream_cap = 5 * 1024**3 if mode == "int4" else 4 * 1024**3
    if n_tiles * slot_bytes > stream_cap:
        return False
    if mode == "int8":
        ws_bytes = 4 * n_tiles * TC
    elif mode == "int4":
        # in-kernel group-selector constant (low half x groups-per-half)
        ws_bytes = (TR // 2) * ((TR // G) // 2) * 4
    else:
        ws_bytes = 0
    if "bq" in b:  # Qwen2 qkv biases live in VMEM too
        ws_bytes += 4 * cfg.n_layer * (cfg.n_head * cfg.head_dim + 2 * KW)
    return _pick_tiles_per_slab(
        slot_bytes, capacity, KW, kv_item, ws_bytes
    ) > 0


@functools.partial(jax.jit, static_argnames=("cfg", "capacity", "interpret"))
def _llama_megapass(
    packed: dict,
    k: jax.Array,  # [L, C, KW] mega-layout cache (aliased output)
    v: jax.Array,
    length: jax.Array,  # int32 [] — tokens already cached
    x_emb: jax.Array,  # [R, E] token embeddings (model dtype)
    cos_q: jax.Array,  # [R, Hq*D] f32 — RoPE cos per row position, tiled/head
    sin_q: jax.Array,  # [R, Hq*D] f32
    *,
    cfg: Any,
    capacity: int,
    interpret: bool = False,
):
    """R-row whole-step pass. Returns (token ids int32 [R], new k, new v).

    R == 1 is the decode step (llama_megastep); R > 1 is the speculative
    verify pass (llama_megaverify): row t attends to cache columns < cur
    plus rows j <= t of the block (in-block causal), all R K/V rows land
    in the cache, and the per-row greedy argmax comes back. R > 1 needs
    capacity >= roundup8(cur + R) + 8 (16-row aligned RMW window).
    """
    E = cfg.hidden_size
    Hq, Hkv, D, L = cfg.n_head, cfg.n_kv_head, cfg.head_dim, cfg.n_layer
    QW, KW = Hq * D, Hkv * D
    GR = Hq // Hkv
    C, V = capacity, cfg.vocab_size
    eps = cfg.rms_eps
    TR, TC, Ip = _tile_geometry(cfg)  # Ip: stream-padded FFN width
    plan = _layer_tile_plan(cfg, TR, TC, Ip)
    per_layer = sum(r * c for _, r, c in plan)
    n_lm = _num_lm_tiles(V, TC)
    # the LM head streams n_lm column tiles x (E // TR) row-group tiles
    n_tiles = L * per_layer + n_lm * (E // TR)
    wdtype = packed["wstack"].dtype
    int8_w = "wscale" in packed
    int4_w = "w4scale" in packed
    has_bias = "qkvb" in packed
    dtype = k.dtype
    dt_item = jnp.dtype(dtype).itemsize
    R = x_emb.shape[0]
    assert R <= 8, "pass must fit one 16-row RMW window"
    W_RMW = 8 if R == 1 else 16
    s4_vmem = False
    if int4_w:
        G, n_gh, s4p = _s4_geom(TR, packed)  # group size / groups per half
        s4_rows = packed["w4scale"].shape[1]  # pane rows (2*s4p, maybe padded)
        mode = "int4"
        gsel_bytes = (TR // 2) * n_gh * 4  # group-selector constant
        # Prefer the WHOLE scale stream resident in VMEM: per-tile scale
        # panes are tiny (tens of KB) and their DMAs double the per-step
        # issue count; when the full [n_tiles, 2*s4p, TC] table fits the
        # budget next to everything else, index it directly instead.
        s4_bytes = n_tiles * s4_rows * TC * dt_item
        s4_vmem = not _S4_RING_ONLY and _pick_tiles_per_slab(
            (TR // 2) * TC, C, KW, dt_item, gsel_bytes + s4_bytes
        ) > 0
        ws_vmem = gsel_bytes + (s4_bytes if s4_vmem else 0)
    else:
        G, n_gh, s4p = TR, 0, 0
        s4_rows = 0
        mode = "int8" if int8_w else "f"
        ws_vmem = 4 * n_tiles * TC if int8_w else 0
    # R-row verify extras beyond the step kernel's envelope
    ws_vmem += 2 * L * (R + W_RMW) * KW * dt_item if R > 1 else 0
    tps = _pick_tiles_per_slab(
        (TR // 2) * TC if s4_vmem
        else _w_slot_bytes(mode, TR, TC, G, dt_item, s4_rows or None),
        C, KW, dt_item, ws_vmem,
    )
    if tps == 0:
        raise ValueError("llama megakernel does not fit VMEM at this capacity")
    scale = 1.0 / math.sqrt(float(D))
    half = D // 2

    # per-layer tile base offsets by name, in stream order
    name_off = {}
    off = 0
    for name, r, c in plan:
        name_off[name] = (off, r, c)
        off += r * c

    def rms(x, g32):  # x [N, W] dtype, g32 [1, W] f32 -> [N, W] dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + eps)
        # cast-before-scale order matches models/llama.py:_rms_norm
        return y.astype(dtype) * g32.astype(dtype)

    def rot_half(x32, W):  # [N, W] f32, rotate-half within each D-lane head
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
        cur = len_ref[0, 0]

        if int4_w:
            # group selector for the low-plane bias correction:
            # gsel[r, g] = 1 iff low-half input row r belongs to group g
            r_ids = jax.lax.broadcasted_iota(
                jnp.int32, (TR // 2, n_gh), 0) // G
            g_ids = jax.lax.broadcasted_iota(jnp.int32, (TR // 2, n_gh), 1)
            gsel = (r_ids == g_ids).astype(dtype)

        # 0/1 KV-head segment selector: sel[kl, h] = 1 iff kl // D == h
        kl_ids = jax.lax.broadcasted_iota(jnp.int32, (KW, Hkv), 0) // D
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (KW, Hkv), 1)
        sel = (kl_ids == h_ids).astype(jnp.float32)  # [KW, Hkv]
        selT = sel.T  # [Hkv, KW]

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

        gbase = pl.multiple_of((cur // 8) * 8, 8)

        def group_in(ref, buf, sem):
            return pltpu.make_async_copy(
                ref.at[:, pl.ds(gbase, W_RMW), :], buf, sem
            )

        def group_out(buf, ref, sem):
            return pltpu.make_async_copy(
                buf, ref.at[:, pl.ds(gbase, W_RMW), :], sem
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
            """Depth-1 pipelined read of the strictly-sequential tile stream.

            Invariant: DMA for tile t is in flight in ring slot t%2 when
            tile(t) is called (prologue starts tile 0; every call prefetches
            t+1). Dynamic t keeps the program SIZE independent of the tile
            count — the static-unrolled predecessor took >5 min of Mosaic
            compile standalone at 1B scale (1179 tiles) and never finished
            inside the jitted generation.
            """
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
            """[R, TR] @ tile t -> [R, TC] f32 (un-scaled for int8 tiles)."""
            slot = tile(t)
            if not int4_w:
                return jax.lax.dot_general(
                    xg, wbuf[pl.ds(slot, 1)][0].astype(dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            # int4: in-kernel nibble dequant (see _int4_tile_dot)
            pk = wbuf[pl.ds(slot, 1)][0]  # [TR/2, TC] packed int8
            if s4_vmem:  # whole scale table VMEM-resident
                st = s4_ref[pl.ds(t, 1)][0]  # [TR/G, TC] dtype
            else:
                st = sbuf[pl.ds(slot, 1)][0]
            return _int4_tile_dot(xg, pk, st, gsel, TR, G, n_gh, dtype, s4p)

        def mm_chunks(x_, base, rg, cg):
            """[R, rg*TR] @ tiles -> list of cg [R, TC] f32 output chunks.

            rg/cg are static per weight name; `base` may be dynamic (layer
            index folds into it).
            """
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

        def seg_reduce(x32):  # [N, KW] f32 -> [N, Hkv]
            return jax.lax.dot_general(
                x32, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def seg_bcast(x32):  # [N, Hkv] f32 -> [N, KW]
            return jax.lax.dot_general(
                x32, selT, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        cosq = cq_ref[:]  # [R, QW] f32
        sinq = sq_ref[:]
        cosk, sink = cosq[:, :KW], sinq[:, :KW]  # D-periodic

        x = x_ref[:].astype(dtype)  # [R, E] residual stream

        def layer_body(l, x):
            lbase = l * per_layer
            par = jax.lax.rem(l, 2)

            h = rms(x, nm_ref[pl.ds(l, 1), 0, :])
            qo, rq, cq_ = name_off["wq"]
            q_chunks = mm_chunks(h, lbase + qo, rq, cq_)
            q32 = jnp.concatenate(q_chunks, axis=-1)  # [1, QW] f32
            ko_, rk, ck = name_off["wk"]
            k32 = jnp.concatenate(mm_chunks(h, lbase + ko_, rk, ck), axis=-1)
            vo_, rv, cv = name_off["wv"]
            v32 = jnp.concatenate(mm_chunks(h, lbase + vo_, rv, cv), axis=-1)
            if has_bias:  # Qwen2: bias on the fp32 accumulator, as _mm does
                bias = qb_ref[pl.ds(l, 1), :]  # [1, QW + 2*KW] f32
                q32 = q32 + bias[:, :QW]
                k32 = k32 + bias[:, QW:QW + KW]
                v32 = v32 + bias[:, QW + KW:]

            # RoPE on the bf16-rounded projections (matmul result is cast to
            # the model dtype before apply_rope in models/llama.py)
            qd = q32.astype(dtype).astype(jnp.float32)
            kd = k32.astype(dtype).astype(jnp.float32)
            q_rope = (qd * cosq + rot_half(qd, QW) * sinq).astype(dtype)
            k_rope = (kd * cosk + rot_half(kd, KW) * sink).astype(dtype)
            kc16 = k_rope
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

            # GQA attention in compact KV lane space: fold the GR query
            # heads of each KV group onto the [., KW] pane one rotation at
            # a time (all static slices). R > 1 (verify pass) loops rows:
            # row t additionally attends block rows j <= t (the in-block
            # causal set — K/V of those rows are in kc16/vc16 registers).
            qf_all = q_rope.astype(jnp.float32)  # [R, QW]
            kcur32 = kc16.astype(jnp.float32)  # [R, KW]
            vcur32 = vc16.astype(jnp.float32)
            row = jax.lax.broadcasted_iota(jnp.int32, (C, Hkv), 0)
            a_rows = []
            for t in range(R):
                qf = qf_all[t:t + 1]  # [1, QW]
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
                    kc = kbuf[pl.ds(par, 1), c0:c0 + cw, :][0].astype(
                        jnp.float32)
                    for r in range(GR):
                        s_chunks[r].append(seg_reduce(kc * q_rs[r]))
                ao_rs = []
                p_rs, pnew_rs, denom_rs = [], [], []
                for r in range(GR):
                    scores = jnp.concatenate(s_chunks[r], axis=0) * scale
                    scores = jnp.where(row < cur, scores, NEG_INF)
                    s_new = [
                        seg_reduce(kcur32[j:j + 1] * q_rs[r]) * scale
                        for j in range(t + 1)
                    ]  # (t+1) x [1, Hkv]
                    mx = jnp.max(scores, axis=0, keepdims=True)
                    for sn in s_new:
                        mx = jnp.maximum(mx, sn)
                    p = jnp.exp(scores - mx)  # [C, Hkv]
                    p_new = [jnp.exp(sn - mx) for sn in s_new]
                    denom = jnp.sum(p, axis=0, keepdims=True)
                    for pn in p_new:
                        denom = denom + pn
                    denom_rs.append(denom)
                    p_rs.append(p)
                    pnew_rs.append(p_new)
                for r in range(GR):
                    ao = jnp.zeros((1, KW), jnp.float32)
                    for c0 in range(0, C, _ATTN_CHUNK):
                        cw = min(_ATTN_CHUNK, C - c0)
                        vc = vbuf[pl.ds(par, 1), c0:c0 + cw, :][0].astype(
                            jnp.float32)
                        pe = seg_bcast(p_rs[r][c0:c0 + cw])  # [cw, KW]
                        ao = ao + jnp.sum(pe * vc, axis=0, keepdims=True)
                    for j, pn in enumerate(pnew_rs[r]):
                        ao = ao + seg_bcast(pn) * vcur32[j:j + 1]
                    ao_rs.append(ao / seg_bcast(denom_rs[r]))

                # interleave rotations back to query-head order [1, QW]
                a_rows.append(jnp.concatenate(
                    [
                        ao_rs[hq % GR][:, (hq // GR) * D:(hq // GR) * D + D]
                        for hq in range(Hq)
                    ],
                    axis=1,
                ))
            a = jnp.concatenate(a_rows, axis=0).astype(dtype)  # [R, QW]

            oo, ro, co = name_off["wo"]
            o32 = jnp.concatenate(mm_chunks(a, lbase + oo, ro, co), axis=-1)
            x = x + o32.astype(dtype)

            h2 = rms(x, nm_ref[pl.ds(l, 1), 1, :])
            go, rgt, cgt = name_off["w_gate"]
            g32 = jnp.concatenate(mm_chunks(h2, lbase + go, rgt, cgt),
                                  axis=-1)  # [1, I] f32
            uo, ru, cu = name_off["w_up"]
            u32 = jnp.concatenate(mm_chunks(h2, lbase + uo, ru, cu), axis=-1)
            # silu in fp32, product in the model dtype (models/llama.py)
            gate = (g32 * jax.nn.sigmoid(g32)).astype(dtype)
            prod = gate * u32.astype(dtype)  # [1, I] dtype
            do, rd, cd = name_off["w_down"]
            y32 = jnp.concatenate(mm_chunks(prod, lbase + do, rd, cd),
                                  axis=-1)
            return x + y32.astype(dtype)

        x = jax.lax.fori_loop(0, L, layer_body, x)

        # merge the new K/V rows into their aligned RMW window; write both
        # groups back overlapped with the LM-head tile stream
        gk_in.wait()
        gv_in.wait()
        off = cur - gbase  # 0..7, so off + R <= W_RMW
        ridx = jax.lax.broadcasted_iota(jnp.int32, (L, W_RMW, KW), 1)
        gkv = gk[:]
        gvv = gv[:]
        for r in range(R):
            ins = ridx == off + r
            gkv = jnp.where(
                ins,
                jnp.broadcast_to(knew[:, r:r + 1, :], (L, W_RMW, KW)), gkv,
            )
            gvv = jnp.where(
                ins,
                jnp.broadcast_to(vnew[:, r:r + 1, :], (L, W_RMW, KW)), gvv,
            )
        gk[:] = gkv
        gv[:] = gvv
        okd = group_out(gk, ko_ref, osem.at[0])
        ovd = group_out(gv, vo_ref, osem.at[1])
        okd.start()
        ovd.start()

        xf = rms(x, lnf_ref[:])  # [R, E] dtype
        lm_base = L * per_layer
        rg_lm = E // TR
        cidx = jax.lax.broadcasted_iota(jnp.int32, (R, TC), 1)
        big = jnp.int32(2 ** 30)

        def lm_body(t, carry):
            best, best_idx = carry  # [R, 1] f32 / int32
            acc = None
            for g in range(rg_lm):
                y = tile_dot(
                    xf[:, g * TR:(g + 1) * TR], lm_base + t * rg_lm + g
                )
                acc = y if acc is None else acc + y
            if int8_w:
                acc = acc * ws_ref[pl.ds(lm_base + t * rg_lm, 1)]
            # mask vocab padding in the last tile (no-op elsewhere)
            acc = jnp.where(t * TC + cidx < V, acc, NEG_INF)
            ymax = jnp.max(acc, axis=1, keepdims=True)  # [R, 1]
            # first-max-wins within the tile, as jnp.argmax
            cand = jnp.min(
                jnp.where(acc == ymax, cidx, big), axis=1, keepdims=True
            ) + t * TC
            take = ymax > best  # strict: earlier tiles win ties
            return jnp.maximum(best, ymax), jnp.where(take, cand, best_idx)

        _, best_idx = jax.lax.fori_loop(
            0, n_lm, lm_body,
            (jnp.full((R, 1), NEG_INF, jnp.float32),
             jnp.zeros((R, 1), jnp.int32)),
        )
        tok_ref[:] = jnp.broadcast_to(best_idx, (R, 128))

        okd.wait()
        ovd.wait()

    wtile_shape = (2, TR // 2, TC) if int4_w else (2, TR, TC)
    scratch = [pltpu.VMEM(wtile_shape, wdtype)]  # weight ring (2-deep)
    if int4_w and not s4_vmem:
        scratch.append(pltpu.VMEM((2, s4_rows, TC), dtype))  # scale ring
    scratch += [
        pltpu.VMEM((2, C, KW), dtype),  # K ring
        pltpu.VMEM((2, C, KW), dtype),  # V ring
        pltpu.VMEM((L, R, KW), dtype),  # new K rows
        pltpu.VMEM((L, R, KW), dtype),  # new V rows
        pltpu.VMEM((L, W_RMW, KW), dtype),  # RMW window (K)
        pltpu.VMEM((L, W_RMW, KW), dtype),  # RMW window (V)
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
            pl.BlockSpec(memory_space=pltpu.HBM),  # k  [L, C, KW]
            pl.BlockSpec(memory_space=pltpu.HBM),  # v
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
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens [R, 128]
            pl.BlockSpec(memory_space=pltpu.HBM),  # k out (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # v out (aliased)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
            jax.ShapeDtypeStruct((L, C, KW), k.dtype),
            jax.ShapeDtypeStruct((L, C, KW), v.dtype),
        ],
        scratch_shapes=scratch,
        input_output_aliases={5: 1, 6: 2},
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
    tok, k2, v2 = f(
        jnp.reshape(length.astype(jnp.int32), (1, 1)),
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
    return tok[:, 0], k2, v2


def llama_megastep(
    packed: dict, k, v, length, x_emb, cos_q, sin_q,
    *, cfg: Any, capacity: int, interpret: bool = False,
):
    """One full Llama decode step. Returns (token id int32 [], new k, new v).

    The single-row case of _llama_megapass (see its docstring for the
    kernel design).
    """
    toks, k2, v2 = _llama_megapass(
        packed, k, v, length, x_emb, cos_q, sin_q,
        cfg=cfg, capacity=capacity, interpret=interpret,
    )
    return toks[0], k2, v2


def llama_megaverify(
    packed: dict, k, v, length, x_emb, cos_q, sin_q,
    *, cfg: Any, capacity: int, interpret: bool = False,
):
    """Verify R draft rows in ONE weight-streaming pass (greedy).

    Row t carries the t-th verify token at position length + t; all R K/V
    rows land in the cache and per-row greedy argmax comes back as [R]
    int32. Requires R <= 8 and capacity >= roundup8(length + R) + 8 (the
    cache writeback uses a 16-row aligned read-modify-write window).
    """
    return _llama_megapass(
        packed, k, v, length, x_emb, cos_q, sin_q,
        cfg=cfg, capacity=capacity, interpret=interpret,
    )
