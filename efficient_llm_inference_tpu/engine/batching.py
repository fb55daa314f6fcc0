"""Continuous batching engine over a paged KV block pool.

Entirely new relative to the reference (strictly batch-1 single-stream,
SURVEY.md §2.3); this is the BASELINE.json north-star serving path:

* a shared HBM block pool `[L, H, n_blocks, block_size, D]` with a
  host-side free-list allocator and per-slot block tables — real paged
  attention (the reference only simulates the layout in Python lists,
  /root/reference/src/cache/implementations.py:10-121);
* B decode slots stepped together in ONE jitted batched decode step
  (per-slot lengths/positions, EOS masking) — decode cost is amortized
  across every active request;
* requests are admitted whenever a slot frees up: prefill writes the prompt
  KV into freshly-allocated blocks, then the slot joins the batched decode.

The step functions are pure and sharding-friendly: heads shard over
"model", slots over "data" (parallel/sharding.py specs apply unchanged).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import ModelSpec


@dataclasses.dataclass
class Request:
    rid: int
    prompt_ids: List[int]
    max_new_tokens: int
    out_ids: List[int] = dataclasses.field(default_factory=list)
    done: bool = False


@dataclasses.dataclass(frozen=True)
class PoolConfig:
    n_slots: int = 8
    block_size: int = 64
    n_blocks: int = 256  # shared pool capacity (tokens = n_blocks*block_size)
    max_blocks_per_seq: int = 32
    prompt_bucket: int = 256
    # max decode steps fused into one dispatch (amortizes dispatch overhead)
    max_chunk: int = 16
    # KV pool storage: "none" (engine dtype), "int8", or "int4" (packed) —
    # per-token symmetric scales, numerics matching ops/quantization.py
    quant: str = "none"
    # quantized-pool attention implementation: "xla" (two-region einsums
    # with online merge — no concat, no dequant materialization; int8
    # convert fuses into the dot), "pallas" (fused kernel; loses to "xla"
    # at decode shapes — per-(slot, head) work serializes in-kernel while
    # XLA batches it on the MXU), or "dequant" (materialize, reference-like)
    attn: str = "xla"


class BlockAllocator:
    """Host-side refcounted free-list over the shared pool (block-granular).

    Reference counting enables prefix caching: full prompt blocks with
    identical token content are shared read-only across requests (each
    holder retains; the block frees when the last holder releases).

    Released CACHEABLE blocks (registered prefixes) are not freed eagerly:
    they park in an LRU cached pool so later requests can reuse their KV
    across waves, and are only evicted when a fresh allocation needs them
    (the engine prunes its prefix registry via `pop_evicted`)."""

    def __init__(self, n_blocks: int):
        self.free = list(range(n_blocks - 1, -1, -1))
        self.refcount: Dict[int, int] = {}
        self.cached: Dict[int, None] = {}  # insertion order = LRU order
        self._evicted: List[int] = []

    def alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) + len(self.cached) < n:
            return None
        blocks = []
        for _ in range(n):
            if self.free:
                blocks.append(self.free.pop())
            else:  # evict the least-recently-cached prefix block
                b = next(iter(self.cached))
                del self.cached[b]
                self._evicted.append(b)
                blocks.append(b)
        for b in blocks:
            self.refcount[b] = 1
        return blocks

    def pop_evicted(self) -> List[int]:
        """Cached prefix blocks reclaimed since the last call (the engine
        must drop their prefix-registry entries)."""
        out, self._evicted = self._evicted, []
        return out

    def retain(self, block: int) -> None:
        if block in self.cached:  # revive a parked prefix block
            del self.cached[block]
            self.refcount[block] = self.refcount.get(block, 0) + 1
        else:
            self.refcount[block] += 1

    def release(self, blocks: List[int], cacheable=frozenset()) -> List[int]:
        """Decrement refs; returns the blocks that actually FREED (blocks in
        `cacheable` park in the LRU cache instead and are not returned)."""
        freed = []
        for b in blocks:
            self.refcount[b] -= 1
            if self.refcount[b] == 0:
                del self.refcount[b]
                if b in cacheable:
                    self.cached[b] = None
                else:
                    self.free.append(b)
                    freed.append(b)
        return freed

    @property
    def n_free(self) -> int:
        return len(self.free) + len(self.cached)


class ContinuousBatchingEngine:
    """Paged, continuously-batched greedy decoding."""

    def __init__(
        self,
        model: ModelSpec,
        params,
        pool: PoolConfig = PoolConfig(),
        dtype=jnp.bfloat16,
        eos_id: Optional[int] = None,
        enable_prefix_cache: bool = False,
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh with ("data", "model") axes.
        KV-head pools shard over "model", decode slots over "data" (the
        docstring contract above, now actually placed and tested). The
        default "xla" two-region attention is pure jnp and shards as-is;
        only attn="pallas" is single-device (silently mapped to "xla" when
        meshed)."""
        self.model = model
        self.params = params
        self.pool_cfg = pool
        self.dtype = dtype
        self.eos_id = eos_id
        self.mesh = mesh
        self.allocator = BlockAllocator(pool.n_blocks)
        # prefix cache: token-chunk -> shared pool block (+ reverse map)
        self.enable_prefix_cache = enable_prefix_cache
        self._prefix_map: Dict[tuple, int] = {}
        self._block_prefix: Dict[int, tuple] = {}

        L, H, D = model.n_layer, model.n_kv_head, model.head_dim
        P = pool
        assert P.quant in ("none", "int8", "int4"), P.quant
        # (head, block)-major so a pool block is a contiguous [bs, D] tile —
        # the layout ops/pallas/paged.py walks via the block table
        if P.quant == "none":
            store_dt, Dstore = dtype, D
        elif P.quant == "int8":
            store_dt, Dstore = jnp.int8, D
        else:  # int4 packed along D (even head_dim)
            assert D % 2 == 0
            store_dt, Dstore = jnp.uint8, D // 2
        self.k_pool = jnp.zeros((L, H, P.n_blocks, P.block_size, Dstore), store_dt)
        self.v_pool = jnp.zeros((L, H, P.n_blocks, P.block_size, Dstore), store_dt)
        # per-token scales (shared across heads/D, reference granularity)
        self.k_scale = jnp.ones((L, P.n_blocks, P.block_size), jnp.float32)
        self.v_scale = jnp.ones((L, P.n_blocks, P.block_size), jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            assert H % mesh.shape["model"] == 0, (H, dict(mesh.shape))
            assert P.n_slots % mesh.shape["data"] == 0, (
                P.n_slots, dict(mesh.shape))
            pool_s = NamedSharding(mesh, PS(None, "model"))
            rep = NamedSharding(mesh, PS())
            self.k_pool = jax.device_put(self.k_pool, pool_s)
            self.v_pool = jax.device_put(self.v_pool, pool_s)
            self.k_scale = jax.device_put(self.k_scale, rep)
            self.v_scale = jax.device_put(self.v_scale, rep)
            self._slot_sharding = NamedSharding(mesh, PS("data"))
        else:
            self._slot_sharding = None
        from ..core.config import default_device_kind

        self._on_tpu = default_device_kind() == "tpu"
        # NOTE: per-step block-table paged attention (ops/pallas/paged.py)
        # was rebuilt head-blocked and re-measured in round 2: the XLA
        # gather + batched einsum stays ~10x faster at decode shapes (it
        # batches (slot, head) into two MXU einsums; any per-slot program
        # serializes heads at G=1). The serving path therefore reads the
        # pool via ONE bucketed compressed gather per chunk and the fused
        # two-region kernel per step — see docs/BENCHMARKS.md.
        # per-slot state (host mirrors + device arrays)
        self.tables = np.zeros((P.n_slots, P.max_blocks_per_seq), np.int32)
        self.lengths = np.zeros((P.n_slots,), np.int32)
        self.active = np.zeros((P.n_slots,), bool)
        self.last_token = np.zeros((P.n_slots,), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * P.n_slots
        self.slot_blocks: List[List[int]] = [[] for _ in range(P.n_slots)]

        self._prefill = jax.jit(self._make_prefill())
        self._chunks: Dict[int, Callable] = {}

    def _slot_arr(self, x) -> jax.Array:
        """Host slot-state array -> device, sharded over "data" when meshed.

        Always snapshots: `jnp.asarray` on CPU zero-copy ALIASES an aligned
        numpy buffer, and the pipelined scheduler mutates the host mirrors
        while dispatches that consumed them are still in flight — a private
        copy makes every dispatch see its dispatch-time values.
        """
        a = jnp.asarray(np.array(x))
        if self._slot_sharding is not None:
            a = jax.device_put(a, self._slot_sharding)
        return a

    def _decode_chunk(self, n_steps: int, n_past_blocks: int):
        key = (n_steps, n_past_blocks)
        if key not in self._chunks:
            self._chunks[key] = jax.jit(
                self._make_decode_chunk(n_steps, n_past_blocks)
            )
        return self._chunks[key]

    def _past_blocks_bucket(self, lengths=None, active=None) -> int:
        """Blocks needed to cover every active slot's past, bucketed to a few
        compiled sizes (full, 1/2, 1/4 of max_blocks_per_seq).

        Early in serving most slots hold a few hundred tokens while the slot
        capacity is sized for the longest request — gathering and attending
        over the full padded capacity wastes most of the chunk's HBM
        traffic. Bucketing recovers it at the cost of <=3 compiled shapes.
        """
        P = self.pool_cfg
        lengths = self.lengths if lengths is None else lengths
        active = self.active if active is None else active
        if not active.any():
            return P.max_blocks_per_seq
        need = -(-int(lengths[active].max()) // P.block_size)
        need = max(need, 1)
        for b in (P.max_blocks_per_seq // 4, P.max_blocks_per_seq // 2):
            if b >= need:
                return b
        return P.max_blocks_per_seq

    def _admit_chunk(self, suffix, n_steps: int, n_past_blocks: int):
        """Fused admission prefill + first decode chunk: ONE dispatch.

        Each dispatch through the remote runtime costs ~tens of ms; fusing
        the wave's prefill with the chunk that always follows it halves the
        serving path's round-trips (prefill, chunk -> one program per wave).
        """
        key = ("admit_chunk", suffix, n_steps, n_past_blocks)
        if key not in self._chunks:
            pre = (
                self._make_suffix_prefill(*suffix)
                if suffix is not None
                else self._make_prefill()
            )
            chk = self._make_decode_chunk(n_steps, n_past_blocks)

            def fused(params, k_pool, v_pool, k_scale, v_scale, pre_args,
                      lengths_in, active_in, last_in, true_lens, admit):
                nxt, k_pool, v_pool, k_scale, v_scale = pre(
                    params, k_pool, v_pool, k_scale, v_scale, *pre_args
                )
                last = jnp.where(admit, nxt, last_in)
                lengths = jnp.where(admit, true_lens, lengths_in)
                active = jnp.logical_or(active_in, admit)
                tables = pre_args[0]
                toks, k_pool, v_pool, k_scale, v_scale = chk(
                    params, k_pool, v_pool, k_scale, v_scale, tables,
                    lengths, active, last,
                )
                return nxt, toks, k_pool, v_pool, k_scale, v_scale

            self._chunks[key] = jax.jit(fused)
        return self._chunks[key]

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------
    # -- quantized-pool helpers ------------------------------------------
    def _dequant_gathered(self, g, scale_g):
        """g: [L,B,H,Tcap,Dstore] raw storage; scale_g: [L,B,Tcap]."""
        P = self.pool_cfg
        if P.quant == "none":
            return g
        sc = scale_g[:, :, None, :, None]
        if P.quant == "int8":
            return (g.astype(jnp.float32) * sc).astype(self.dtype)
        # int4: unpack nibbles (even index in high nibble, reference order)
        p32 = g.astype(jnp.int32)
        hi = (p32 >> 4) & 0x0F
        lo = p32 & 0x0F
        q = jnp.stack([hi, lo], axis=-1).reshape(*g.shape[:-1], -1) - 8
        return (q.astype(jnp.float32) * sc).astype(self.dtype)

    def _quantize_rows(self, x):
        """x: [..., H, n, D] fp -> (storage values, scale [..., n]) with one
        scale per token over (H, D) — reference per-tensor-per-token math."""
        P = self.pool_cfg
        x32 = x.astype(jnp.float32)
        qmax = 127.0 if P.quant == "int8" else 7.0
        max_abs = jnp.max(jnp.abs(x32), axis=(-3, -1), keepdims=True)
        scale = jnp.maximum(max_abs / qmax, 1e-8)
        if P.quant == "int8":
            vals = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
        else:
            q = jnp.clip(jnp.round(x32 / scale), -8, 7).astype(jnp.int32) + 8
            hi = q[..., 0::2]
            lo = q[..., 1::2]
            vals = ((hi << 4) | lo).astype(jnp.uint8)
        return vals, jnp.squeeze(scale, axis=(-3, -1))

    def _make_decode_chunk(self, n_steps: int, n_past_blocks: int):
        """Staged chunk decode: `n_steps` batched steps in ONE dispatch with
        pool traffic amortized across the chunk.

        The pool is FROZEN for the duration of a chunk: the past KV is
        gathered once (not per step) — only the first `n_past_blocks` table
        entries, bucketed to what the active slots actually use — new tokens
        accumulate in a small staging buffer [L, B, H, n_steps, D] that each
        step's attention reads alongside the frozen past, and the whole
        staging buffer is scattered into the pool once at chunk end. This
        removes the per-step pool gather AND the per-step scatter (TPU
        scatters are slow), which dominated the unstaged step cost.

        Quantized pools stay COMPRESSED end to end: the gather keeps the raw
        int8 / packed-int4 values and per-token scales, and each step's
        attention reads them through the fused Pallas kernel
        (ops/pallas/attention.py:fused_quant_attention_batched) — the past is
        never materialized at full precision. The reference pays an O(T)
        dequant materialization per STEP (ops.py:212-269); round 1 of this
        engine paid it per chunk; now it is never paid.
        """
        model = self.model
        P = self.pool_cfg
        H, D, Hq, L = model.n_kv_head, model.head_dim, model.n_head, model.n_layer
        G = Hq // H
        Tpast = n_past_blocks * P.block_size  # bucketed gather/attend span
        Tcap = P.max_blocks_per_seq * P.block_size  # full slot capacity
        NEG = float(jnp.finfo(jnp.float32).min)

        quant = P.quant
        attn = P.attn if quant != "none" else "dequant"
        if attn == "pallas" and self.mesh is not None:
            attn = "xla"  # the Pallas kernel has no shard_map wrapper
        fused = attn in ("xla", "pallas")
        interp = not self._on_tpu

        def chunk(params, k_pool, v_pool, k_scale, v_scale, tables, lengths,
                  active, tokens):
            B = tokens.shape[0]
            lengths0 = lengths
            tables_g = tables[:, :n_past_blocks]

            # 1. gather the frozen past ONCE per chunk (still quantized —
            # compressed size): pool -> past [L, B, H, Tpast, Ds]
            def gather(pool):
                g = pool[:, :, tables_g]  # [L, H, B, mb, bs, Ds]
                g = g.reshape(L, H, B, Tpast, g.shape[-1])
                return g.transpose(0, 2, 1, 3, 4)

            def gather_scale(sc):
                g = sc[:, tables_g]  # [L, B, mb, bs]
                return g.reshape(L, B, Tpast)

            k_past, v_past = gather(k_pool), gather(v_pool)
            k_psc, v_psc = gather_scale(k_scale), gather_scale(v_scale)
            if not fused:
                k_past = self._dequant_gathered(k_past, k_psc)
                v_past = self._dequant_gathered(v_past, v_psc)
            elif quant == "int4":
                # unpack nibbles ONCE per chunk (values stay integer, scales
                # stay separate): the pool keeps its 4x memory win, while the
                # per-step kernel runs the int8 path — per-step nibble ALU
                # work on quarter-utilized lanes measured ~2x slower than
                # this amortized unpack
                from ..ops.quantization import unpack_int4

                k_past = unpack_int4(k_past)  # [L, B, H, Tpast, D] int8
                v_past = unpack_int4(v_past)
            st_shape = (L, B, H, n_steps, D)
            st_dt = self.dtype
            staging_k = jnp.zeros(st_shape, st_dt)
            staging_v = jnp.zeros(st_shape, st_dt)

            class _StagedStrategy:
                def cache_layer_slices(self_s, cache):
                    return (
                        cache["k_past"],
                        cache["v_past"],
                        cache["k_psc"],
                        cache["v_psc"],
                        cache["st_k"],
                        cache["st_v"],
                    )

                def cache_with_layer_slices(self_s, cache, new_slices, T):
                    st_k, st_v = new_slices
                    return {**cache, "st_k": st_k, "st_v": st_v}

                def set_length(self_s, cache, n):
                    return cache

                def layer_attend(self_s, layer_cache, cache, q, k_new, v_new, sm):
                    kp, vp, ksc, vsc, sk, sv = layer_cache
                    i = cache["i"]
                    sk = jax.lax.dynamic_update_slice(
                        sk, k_new.astype(sk.dtype), (0, 0, i, 0)
                    )
                    sv = jax.lax.dynamic_update_slice(
                        sv, v_new.astype(sv.dtype), (0, 0, i, 0)
                    )
                    if attn == "xla":
                        # two-region attention as batched einsums with an
                        # explicit online-softmax merge: no [past|staging]
                        # concat, no dequantized past — XLA fuses the
                        # int8->bf16 convert into the QK/PV dots and the
                        # per-token scales fold into scores/probs
                        dt = q.dtype
                        qg = q.reshape(B, H, G, D)
                        scale = 1.0 / jnp.sqrt(jnp.float32(D))
                        s_p = jnp.einsum(
                            "bhgd,bhcd->bhgc", qg, kp.astype(dt),
                            preferred_element_type=jnp.float32,
                        ) * ksc[:, None, None, :] * scale
                        c_idx = jax.lax.broadcasted_iota(
                            jnp.int32, (B, 1, 1, Tpast), 3
                        )
                        s_p = jnp.where(
                            c_idx < lengths0[:, None, None, None], s_p, NEG
                        )
                        s_s = jnp.einsum(
                            "bhgd,bhsd->bhgs", qg, sk,
                            preferred_element_type=jnp.float32,
                        ) * scale
                        j_idx = jax.lax.broadcasted_iota(
                            jnp.int32, (1, 1, 1, n_steps), 3
                        )
                        s_s = jnp.where(j_idx <= i, s_s, NEG)
                        m = jnp.maximum(
                            jnp.max(s_p, -1, keepdims=True),
                            jnp.max(s_s, -1, keepdims=True),
                        )
                        p_p = jnp.exp(s_p - m)
                        p_s = jnp.exp(s_s - m)
                        denom = (
                            jnp.sum(p_p, -1, keepdims=True)
                            + jnp.sum(p_s, -1, keepdims=True)
                        )
                        out = jnp.einsum(
                            "bhgc,bhcd->bhgd",
                            (p_p * vsc[:, None, None, :]).astype(dt),
                            vp.astype(dt),
                            preferred_element_type=jnp.float32,
                        ) + jnp.einsum(
                            "bhgs,bhsd->bhgd", p_s.astype(dt), sv,
                            preferred_element_type=jnp.float32,
                        )
                        out = (out / denom).reshape(B, Hq, 1, D)
                        return out, (sk, sv)
                    if attn == "pallas":
                        from ..ops.pallas.attention import (
                            fused_quant_attention_batched,
                        )

                        out = fused_quant_attention_batched(
                            q[:, :, 0],  # [B, Hq, D]
                            kp,  # [B, H, Tpast, D] int8 (int4 pre-unpacked)
                            jnp.broadcast_to(ksc[:, None], (B, H, Tpast)),
                            vp,
                            jnp.broadcast_to(vsc[:, None], (B, H, Tpast)),
                            sk,  # [B, H, n_steps, D] fp staging
                            sv,
                            lengths0,
                            i + 1,
                            k_bits=8,
                            v_bits=8,
                            interpret=interp,
                        )
                        return out[:, :, None, :], (sk, sv)
                    k_all = jnp.concatenate([kp, sk], axis=2)  # [B,H,Tp+n,D]
                    v_all = jnp.concatenate([vp, sv], axis=2)
                    scale = 1.0 / jnp.sqrt(jnp.float32(D))
                    qg = q.reshape(B, H, G, 1, D)
                    sc = jnp.einsum(
                        "bhgtd,bhcd->bhgtc", qg, k_all,
                        preferred_element_type=jnp.float32,
                    ) * scale
                    t_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (B, 1, 1, 1, Tpast + n_steps), 4
                    )
                    past_ok = t_idx < lengths0[:, None, None, None, None]
                    stage_ok = (t_idx >= Tpast) & ((t_idx - Tpast) <= i)
                    mask = jnp.where(t_idx < Tpast, past_ok, stage_ok)
                    sc = jnp.where(mask, sc, NEG)
                    pr = jax.nn.softmax(sc, axis=-1)
                    out = jnp.einsum(
                        "bhgtc,bhcd->bhgtd", pr, v_all,
                        preferred_element_type=jnp.float32,
                    )
                    return out.reshape(B, Hq, 1, D), (sk, sv)

            strategy = _StagedStrategy()

            def body(carry, i):
                st_k, st_v, toks_in = carry
                pos = jnp.minimum(lengths0 + i, model.n_positions - 1)
                cache = {
                    "k_past": k_past,
                    "v_past": v_past,
                    "k_psc": k_psc,
                    "v_psc": v_psc,
                    "st_k": st_k,
                    "st_v": st_v,
                    "i": i,
                }
                logits, cache = model.forward(
                    params, toks_in[:, None], pos[:, None], cache, strategy, None
                )
                nxt = jnp.clip(
                    jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32),
                    0,
                    model.vocab_size - 1,
                )
                nxt = jnp.where(active, nxt, toks_in)
                return (cache["st_k"], cache["st_v"], nxt), nxt

            (staging_k, staging_v, _), toks = jax.lax.scan(
                body,
                (staging_k, staging_v, tokens),
                jnp.arange(n_steps, dtype=jnp.int32),
            )

            # 3. scatter the whole staging buffer into the pool once
            j = jnp.arange(n_steps, dtype=jnp.int32)[None, :]  # [1, n]
            pos_t = lengths0[:, None] + j  # [B, n]
            blk_idx = jnp.minimum(pos_t // P.block_size, P.max_blocks_per_seq - 1)
            blk = jnp.take_along_axis(tables, blk_idx, axis=1)  # [B, n]
            valid = active[:, None] & (pos_t < Tcap)
            blk = jnp.where(valid, blk, P.n_blocks)  # drop sentinel
            off = pos_t % P.block_size
            blk_f = blk.reshape(-1)
            off_f = off.reshape(-1)

            if quant != "none":
                # quantize per token over (H, D): staging [L, B, H, n, D]
                k_vals, k_sc = self._quantize_rows(staging_k)  # sc [L, B, n]
                v_vals, v_sc = self._quantize_rows(staging_v)
                k_scale = k_scale.at[:, blk_f, off_f].set(
                    k_sc.reshape(L, -1), mode="drop"
                )
                v_scale = v_scale.at[:, blk_f, off_f].set(
                    v_sc.reshape(L, -1), mode="drop"
                )
                staging_k, staging_v = k_vals, v_vals
            Ds = staging_k.shape[-1]
            st_k_f = staging_k.transpose(0, 2, 1, 3, 4).reshape(L, H, -1, Ds)
            st_v_f = staging_v.transpose(0, 2, 1, 3, 4).reshape(L, H, -1, Ds)
            k_pool = k_pool.at[:, :, blk_f, off_f].set(
                st_k_f.astype(k_pool.dtype), mode="drop"
            )
            v_pool = v_pool.at[:, :, blk_f, off_f].set(
                st_v_f.astype(v_pool.dtype), mode="drop"
            )
            return toks, k_pool, v_pool, k_scale, v_scale

        return chunk

    def _suffix_prefill(self, s_bucket: int, n_past_blocks: int):
        key = ("suffix", s_bucket, n_past_blocks)
        if key not in self._chunks:
            self._chunks[key] = jax.jit(
                self._make_suffix_prefill(s_bucket, n_past_blocks)
            )
        return self._chunks[key]

    def _make_suffix_prefill(self, S: int, n_past_blocks: int):
        """Compute-saving prefix-cache prefill: forward ONLY the suffix.

        When admitted prompts share cached prefix blocks, the plain prefill
        still recomputes the whole padded prompt (the writes are skipped but
        the matmuls are not). This program embeds just the suffix tokens
        (bucketed to S) and attends over [shared prefix from the pool |
        causal suffix], so prefill FLOPs scale with the un-cached suffix:
        the compute-saving form of prefix caching the round-1 roadmap
        deferred. Shared-prefix KV is read back at pool precision (for
        quantized pools that is the same dequantized KV decode reads).
        """
        model = self.model
        P = self.pool_cfg
        H, D, Hq, L = model.n_kv_head, model.head_dim, model.n_head, model.n_layer
        G = Hq // H
        Tp = n_past_blocks * P.block_size
        NEG = float(jnp.finfo(jnp.float32).min)
        quant = P.quant

        def prefill(params, k_pool, v_pool, k_scale, v_scale, tables,
                    suffix_tokens, reused_lens, true_lens, admit):
            B = suffix_tokens.shape[0]
            suf_lens = true_lens - reused_lens  # [B], >= 1 by construction
            tables_g = tables[:, :n_past_blocks]

            def gather(pool):
                g = pool[:, :, tables_g]  # [L, H, B, nb, bs, Ds]
                g = g.reshape(L, H, B, Tp, g.shape[-1])
                return g.transpose(0, 2, 1, 3, 4)

            def gather_scale(sc):
                return sc[:, tables_g].reshape(L, B, Tp)

            k_past = self._dequant_gathered(gather(k_pool), gather_scale(k_scale))
            v_past = self._dequant_gathered(gather(v_pool), gather_scale(v_scale))

            col = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
            pos = jnp.minimum(
                reused_lens[:, None] + col, model.n_positions - 1
            )
            seq_mask = col < suf_lens[:, None]

            class _SuffixStrategy:
                def cache_layer_slices(self_s, cache):
                    return (
                        cache["kp"], cache["vp"],
                        cache["k_pool"], cache["v_pool"],
                        cache["k_scale"], cache["v_scale"],
                    )

                def cache_with_layer_slices(self_s, cache, new_slices, T):
                    return {
                        **cache,
                        "k_pool": new_slices[0],
                        "v_pool": new_slices[1],
                        "k_scale": new_slices[2],
                        "v_scale": new_slices[3],
                    }

                def set_length(self_s, cache, n):
                    return cache

                def layer_attend(self_s, layer_cache, cache, q, k_new, v_new, sm):
                    kp, vp, k_pool_l, v_pool_l, ks_l, vs_l = layer_cache
                    # two-region causal attention: [shared past | suffix]
                    k_all = jnp.concatenate(
                        [kp, k_new.astype(kp.dtype)], axis=2
                    )  # [B, H, Tp+S, D]
                    v_all = jnp.concatenate([vp, v_new.astype(vp.dtype)], axis=2)
                    scale = 1.0 / jnp.sqrt(jnp.float32(D))
                    qg = q.reshape(B, H, G, S, D)
                    sc = jnp.einsum(
                        "bhgsd,bhcd->bhgsc", qg, k_all,
                        preferred_element_type=jnp.float32,
                    ) * scale
                    c_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (B, 1, 1, 1, Tp + S), 4
                    )
                    s_idx = jax.lax.broadcasted_iota(
                        jnp.int32, (B, 1, 1, S, 1), 3
                    )
                    past_ok = c_idx < reused_lens[:, None, None, None, None]
                    suf_ok = (c_idx - Tp) <= s_idx  # causal within suffix
                    mask = jnp.where(c_idx < Tp, past_ok, suf_ok)
                    sc = jnp.where(mask, sc, NEG)
                    pr = jax.nn.softmax(sc, axis=-1)
                    out = jnp.einsum(
                        "bhgsc,bhcd->bhgsd", pr, v_all,
                        preferred_element_type=jnp.float32,
                    ).reshape(B, Hq, S, D)

                    # scatter suffix KV into the slots' blocks
                    p_abs = reused_lens[:, None] + col  # [B, S]
                    blk_idx = jnp.minimum(
                        p_abs // P.block_size, P.max_blocks_per_seq - 1
                    )
                    blk = jnp.take_along_axis(tables, blk_idx, axis=1)
                    off = p_abs % P.block_size
                    valid = seq_mask & admit[:, None]
                    blk = jnp.where(valid, blk, P.n_blocks)  # drop sentinel
                    blk_f = blk.reshape(-1)
                    off_f = off.reshape(-1)
                    kn, vn = k_new, v_new
                    if quant != "none":
                        kn, k_sc = self._quantize_rows(kn)
                        vn, v_sc = self._quantize_rows(vn)
                        ks_l = ks_l.at[blk_f, off_f].set(
                            k_sc.reshape(-1), mode="drop"
                        )
                        vs_l = vs_l.at[blk_f, off_f].set(
                            v_sc.reshape(-1), mode="drop"
                        )
                    Ds = kn.shape[-1]
                    kn = kn.transpose(1, 0, 2, 3).reshape(H, -1, Ds)
                    vn = vn.transpose(1, 0, 2, 3).reshape(H, -1, Ds)
                    k_pool_l = k_pool_l.at[:, blk_f, off_f].set(
                        kn.astype(k_pool_l.dtype), mode="drop"
                    )
                    v_pool_l = v_pool_l.at[:, blk_f, off_f].set(
                        vn.astype(v_pool_l.dtype), mode="drop"
                    )
                    return out, (k_pool_l, v_pool_l, ks_l, vs_l)

            strategy = _SuffixStrategy()
            cache = {"kp": k_past, "vp": v_past,
                     "k_pool": k_pool, "v_pool": v_pool,
                     "k_scale": k_scale, "v_scale": v_scale}
            logits, cache = model.forward(
                params, suffix_tokens, pos, cache, strategy, seq_mask
            )
            idx = jnp.broadcast_to(
                (suf_lens - 1)[:, None, None], (B, 1, logits.shape[-1])
            )
            last = jnp.take_along_axis(logits, jnp.clip(idx, 0, None), axis=1)[:, 0]
            nxt = jnp.clip(
                jnp.argmax(last, axis=-1).astype(jnp.int32),
                0, model.vocab_size - 1,
            )
            return (nxt, cache["k_pool"], cache["v_pool"],
                    cache["k_scale"], cache["v_scale"])

        return prefill

    def _make_prefill(self):
        """Batched admission prefill: ALL slots in one dispatch.

        Admitting one request per dispatch costs ~tens of ms each through
        the remote runtime; this program prefills every newly-admitted slot
        at once (an admit mask drops writes for the others), so an
        admission wave is one dispatch regardless of its size.
        """
        model = self.model
        P = self.pool_cfg
        H, D = model.n_kv_head, model.head_dim

        quant = P.quant

        def prefill(params, k_pool, v_pool, k_scale, v_scale, tables, tokens,
                    true_lens, admit, reused_lens):
            # tokens: [n_slots, bucket]; tables: [n_slots, max_blocks]
            B, Tpad = tokens.shape
            pos = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
                model.n_positions - 1,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1)
            seq_mask = col < true_lens[:, None]

            class _PrefillStrategy:
                def cache_layer_slices(self_s, cache):
                    return (k_pool, v_pool, k_scale, v_scale)

                def cache_with_layer_slices(self_s, cache, new_slices, T):
                    return {
                        "k_pool": new_slices[0],
                        "v_pool": new_slices[1],
                        "k_scale": new_slices[2],
                        "v_scale": new_slices[3],
                    }

                def set_length(self_s, cache, n):
                    return cache

                def layer_attend(self_s, layer_cache, cache, q, k_new, v_new, sm):
                    k_pool_l, v_pool_l, ks_l, vs_l = layer_cache
                    from ..cache.kvcache import _attend

                    out = _attend(q, k_new, v_new, jnp.zeros((), jnp.int32))
                    # scatter each admitted slot's prompt KV into its blocks
                    t = jnp.arange(Tpad)[None, :]  # [1, Tpad]
                    blk = jnp.take_along_axis(
                        tables,
                        jnp.broadcast_to(t // P.block_size, (B, Tpad)),
                        axis=1,
                    )  # [B, Tpad]
                    off = jnp.broadcast_to(t % P.block_size, blk.shape)
                    # skip writes for prefix-cached (shared, read-only)
                    # positions — their KV already lives in the pool
                    valid = (
                        (t < true_lens[:, None])
                        & (t >= reused_lens[:, None])
                        & admit[:, None]
                    )
                    blk = jnp.where(valid, blk, P.n_blocks)  # drop sentinel
                    blk_f = blk.reshape(-1)
                    off_f = off.reshape(-1)
                    kn, vn = k_new, v_new  # [B, H, Tpad, D]
                    if quant != "none":
                        kn, k_sc = self._quantize_rows(kn)  # sc [B, Tpad]
                        vn, v_sc = self._quantize_rows(vn)
                        ks_l = ks_l.at[blk_f, off_f].set(
                            k_sc.reshape(-1), mode="drop"
                        )
                        vs_l = vs_l.at[blk_f, off_f].set(
                            v_sc.reshape(-1), mode="drop"
                        )
                    Ds = kn.shape[-1]
                    kn = kn.transpose(1, 0, 2, 3).reshape(H, -1, Ds)
                    vn = vn.transpose(1, 0, 2, 3).reshape(H, -1, Ds)
                    k_pool_l = k_pool_l.at[:, blk_f, off_f].set(
                        kn.astype(k_pool_l.dtype), mode="drop"
                    )
                    v_pool_l = v_pool_l.at[:, blk_f, off_f].set(
                        vn.astype(v_pool_l.dtype), mode="drop"
                    )
                    return out, (k_pool_l, v_pool_l, ks_l, vs_l)

            strategy = _PrefillStrategy()
            cache = {"k_pool": k_pool, "v_pool": v_pool,
                     "k_scale": k_scale, "v_scale": v_scale}
            logits, cache = model.forward(
                params, tokens, pos, cache, strategy, seq_mask
            )
            idx = jnp.broadcast_to(
                (true_lens - 1)[:, None, None], (B, 1, logits.shape[-1])
            )
            last = jnp.take_along_axis(logits, jnp.clip(idx, 0, None), axis=1)[:, 0]
            nxt = jnp.clip(
                jnp.argmax(last, axis=-1).astype(jnp.int32), 0, model.vocab_size - 1
            )
            return (nxt, cache["k_pool"], cache["v_pool"],
                    cache["k_scale"], cache["v_scale"])

        return prefill

    # ------------------------------------------------------------------
    # host-side scheduler
    # ------------------------------------------------------------------
    def _plan_wave(self, queue: List[Request]) -> Optional[dict]:
        """Decide an admission wave (host-side allocation only, no dispatch).

        Returns None when nothing can be admitted, else a plan dict with the
        device-ready arrays and the wave bookkeeping. The caller dispatches
        the prefill (fused with the first decode chunk, see `run`) and then
        commits with `_commit_wave`.
        """
        P = self.pool_cfg
        bs = P.block_size
        # prefixes COMMITTED by earlier dispatches: only these may skip
        # compute — blocks registered within this same wave are written by
        # this wave's own prefill dispatch, so reading them back as "past"
        # would see pre-dispatch (stale) pool contents
        committed_map = dict(self._prefix_map)
        wave = []  # (slot, req, ids, blocks, n_shared, n_committed)
        for req in list(queue):
            try:
                slot = next(
                    i for i in range(P.n_slots)
                    if not self.active[i] and all(i != w[0] for w in wave)
                )
            except StopIteration:
                break
            slot_cap = P.max_blocks_per_seq * bs
            max_prompt = min(P.prompt_bucket, slot_cap - req.max_new_tokens)
            if max_prompt <= 0:
                raise ValueError(
                    f"max_new_tokens={req.max_new_tokens} exceeds slot capacity "
                    f"{slot_cap} (max_blocks_per_seq * block_size)"
                )
            if len(req.prompt_ids) > max_prompt:
                import warnings

                warnings.warn(
                    f"request {req.rid}: prompt of {len(req.prompt_ids)} tokens "
                    f"truncated to {max_prompt} (prompt_bucket={P.prompt_bucket}, "
                    f"slot capacity {slot_cap} - max_new_tokens="
                    f"{req.max_new_tokens})",
                    stacklevel=2,
                )
            ids = req.prompt_ids[:max_prompt]
            n_blocks = -(-(len(ids) + req.max_new_tokens) // bs)

            # prefix cache walk: reuse shared blocks while the CUMULATIVE
            # prompt prefix (context determines KV, not just own tokens)
            # matches a registered full chunk. At least one suffix token
            # must remain un-cached: the admission step needs its logits.
            shared: List[int] = []
            n_committed = 0
            if self.enable_prefix_cache:
                for i in range((len(ids) - 1) // bs):
                    key = tuple(ids[: (i + 1) * bs])
                    blk = self._prefix_map.get(key)
                    if blk is None:
                        break
                    shared.append(blk)
                    if n_committed == i and key in committed_map:
                        n_committed += 1
            # retain BEFORE alloc: shared blocks may be parked in the LRU
            # cache (refcount 0) and alloc would otherwise reclaim them
            for blk in shared:
                self.allocator.retain(blk)
            fresh = self.allocator.alloc(n_blocks - len(shared))
            # alloc may have evicted parked blocks a LATER walk would find
            self._prune_evicted()
            if fresh is None:
                self.allocator.release(shared, cacheable=self._block_prefix.keys())
                break
            blocks = shared + fresh
            # register this request's own full-prompt blocks so later
            # requests (including in this same wave) can share them
            if self.enable_prefix_cache:
                for i in range(len(shared), len(ids) // bs):
                    key = tuple(ids[: (i + 1) * bs])
                    if key not in self._prefix_map:
                        self._prefix_map[key] = blocks[i]
                        self._block_prefix.setdefault(blocks[i], []).append(key)
            wave.append((slot, req, ids, blocks, len(shared), n_committed))

        if not wave:
            return None

        tokens = np.zeros((P.n_slots, P.prompt_bucket), np.int32)
        true_lens = np.ones((P.n_slots,), np.int32)
        reused_lens = np.zeros((P.n_slots,), np.int32)
        admit = np.zeros((P.n_slots,), bool)
        tables = self.tables.copy()
        for slot, req, ids, blocks, n_shared, n_committed in wave:
            table = np.full((P.max_blocks_per_seq,), P.n_blocks, np.int32)
            table[: len(blocks)] = blocks
            tables[slot] = table
            tokens[slot, : len(ids)] = ids
            true_lens[slot] = len(ids)
            # only prefixes committed by EARLIER dispatches skip compute and
            # writes; in-wave twins recompute and write identical values
            reused_lens[slot] = n_committed * bs
            admit[slot] = True

        plan = {
            "wave": wave,
            "tables": tables,
            "tokens": tokens,
            "true_lens": true_lens,
            "reused_lens": reused_lens,
            "admit": admit,
            "suffix": None,
        }
        if reused_lens.any():
            # compute-saving path: forward ONLY the suffixes, attending over
            # the shared prefix blocks already in the pool
            from .generate import bucket_for

            max_suffix = max(
                len(ids) - n_c * bs for _, _, ids, _, _, n_c in wave
            )
            s_bucket = min(bucket_for(max_suffix), P.prompt_bucket)
            max_committed = max(n_c for *_, n_c in wave)
            n_past = 1
            while n_past < max_committed:
                n_past *= 2
            n_past = min(n_past, P.max_blocks_per_seq)
            suffix_tokens = np.zeros((P.n_slots, s_bucket), np.int32)
            for slot, req, ids, blocks, n_shared, n_c in wave:
                suf = ids[n_c * bs:][:s_bucket]
                suffix_tokens[slot, : len(suf)] = suf
            plan["suffix"] = (s_bucket, n_past)
            plan["suffix_tokens"] = suffix_tokens
        return plan

    def _prefill_args(self, plan: dict) -> tuple:
        """(prefill_fn, device args) for a planned wave (plain or suffix)."""
        if plan["suffix"] is not None:
            fn = self._make_suffix_prefill(*plan["suffix"])
            args = (
                self._slot_arr(plan["tables"]),
                self._slot_arr(plan["suffix_tokens"]),
                self._slot_arr(plan["reused_lens"]),
                self._slot_arr(plan["true_lens"]),
                self._slot_arr(plan["admit"]),
            )
        else:
            fn = self._make_prefill()
            args = (
                self._slot_arr(plan["tables"]),
                self._slot_arr(plan["tokens"]),
                self._slot_arr(plan["true_lens"]),
                self._slot_arr(plan["admit"]),
                self._slot_arr(plan["reused_lens"]),
            )
        return fn, args

    def _commit_wave(self, plan: dict, queue: List[Request]) -> None:
        """Update host mirrors for a dispatched wave (tokens arrive later:
        `run` appends each admitted slot's first token at harvest time)."""
        for slot, req, ids, blocks, n_shared, n_c in plan["wave"]:
            self.tables[slot] = plan["tables"][slot]
            self.lengths[slot] = len(ids)
            self.active[slot] = True
            self.slot_req[slot] = req
            self.slot_blocks[slot] = blocks
            queue.remove(req)

    def _admit_wave(self, queue: List[Request]) -> int:
        """Standalone (unfused) admission: plan, dispatch the batched
        prefill, commit, and record each admitted slot's first token.
        `run` fuses this with the first decode chunk instead; this method
        remains the one-dispatch admission API. Returns #admitted."""
        plan = self._plan_wave(queue)
        if plan is None:
            return 0
        if plan["suffix"] is not None:
            fn = self._suffix_prefill(*plan["suffix"])
        else:
            fn = self._prefill
        _, args = self._prefill_args(plan)
        nxt, self.k_pool, self.v_pool, self.k_scale, self.v_scale = fn(
            self.params, self.k_pool, self.v_pool, self.k_scale,
            self.v_scale, *args,
        )
        self._commit_wave(plan, queue)
        nxt = np.asarray(nxt)
        for slot, req, *_ in plan["wave"]:
            self.last_token[slot] = int(nxt[slot])
            req.out_ids.append(int(nxt[slot]))
        return len(plan["wave"])

    def _retire(self, slot: int) -> None:
        req = self.slot_req[slot]
        req.done = True
        # registered-prefix blocks park in the allocator's LRU cache so the
        # next wave can reuse their KV; everything else frees immediately
        freed = self.allocator.release(
            self.slot_blocks[slot], cacheable=self._block_prefix.keys()
        )
        for blk in freed:
            for key in self._block_prefix.pop(blk, []):
                if self._prefix_map.get(key) == blk:
                    del self._prefix_map[key]
        self.slot_blocks[slot] = []
        self.active[slot] = False
        self.slot_req[slot] = None

    def _prune_evicted(self) -> None:
        """Drop prefix-registry entries for cache blocks the allocator
        reclaimed to satisfy a fresh allocation."""
        for blk in self.allocator.pop_evicted():
            for key in self._block_prefix.pop(blk, []):
                if self._prefix_map.get(key) == blk:
                    del self._prefix_map[key]

    def run(self, requests: List[Request], progress: Optional[Callable] = None):
        """Serve all requests to completion; returns them (with out_ids).

        Dispatch-pipelined scheduler: each admission wave's prefill is FUSED
        with its first decode chunk (one program, one round-trip), token
        fetches are deferred to a single `device_get` per dispatch, and when
        active slots still need more tokens the next chunk is dispatched
        with the device-resident last tokens BEFORE the previous chunk's
        results are fetched — the host-side fetch + bookkeeping overlaps
        device compute. Slots that finish (EOS / budget) inside an
        already-dispatched chunk overshoot harmlessly: their extra tokens
        are discarded at harvest, their zombie writes land in blocks no
        later reader observes un-overwritten, and they retire one harvest
        late.
        """
        queue = list(requests)
        total_steps = 0
        chunk = self.pool_cfg.max_chunk
        # dispatched-but-unfetched work, oldest first:
        # (nxt_dev|None, toks_dev, snapshot of slot->req at dispatch)
        inflight: List[tuple] = []
        last_dev = None  # device-resident last_token after the newest chunk
        # tokens dispatched (incl. in flight) for each slot's current request
        dispatched = np.zeros((self.pool_cfg.n_slots,), np.int64)

        def harvest():
            nonlocal total_steps
            nxt_dev, toks_dev, snapshot = inflight.pop(0)
            if nxt_dev is not None:
                nxt, toks = jax.device_get((nxt_dev, toks_dev))
            else:
                nxt, toks = None, jax.device_get(toks_dev)
            total_steps += chunk
            for slot in range(self.pool_cfg.n_slots):
                req = snapshot[slot]
                if req is None or req.done:
                    continue
                first = [int(nxt[slot])] if nxt is not None and not req.out_ids else []
                hit_eos = False
                for tok in first + [int(toks[i, slot]) for i in range(chunk)]:
                    if len(req.out_ids) >= req.max_new_tokens:
                        break
                    req.out_ids.append(tok)
                    self.last_token[slot] = tok
                    if self.eos_id is not None and tok == self.eos_id:
                        hit_eos = True
                        break
                if hit_eos or len(req.out_ids) >= req.max_new_tokens:
                    if self.slot_req[slot] is req:  # slot not yet reused
                        self._retire(slot)
            if progress:
                progress(total_steps, self)

        def last_in():
            return (
                last_dev if last_dev is not None
                else self._slot_arr(self.last_token)
            )

        while queue or self.active.any() or inflight:
            plan = self._plan_wave(queue) if queue else None
            if plan is not None:
                # fused admission prefill + first chunk, ONE dispatch
                lengths_v = self.lengths.copy()
                active_v = self.active.copy()
                for slot, req, ids, *_ in plan["wave"]:
                    lengths_v[slot] = len(ids)
                    active_v[slot] = True
                n_past = self._past_blocks_bucket(lengths_v, active_v)
                _, pre_args = self._prefill_args(plan)
                fused = self._admit_chunk(plan["suffix"], chunk, n_past)
                lengths_arg = self._slot_arr(self.lengths)
                active_arg = self._slot_arr(self.active)
                last_arg = last_in()
                self._commit_wave(plan, queue)
                (nxt_dev, toks_dev, self.k_pool, self.v_pool, self.k_scale,
                 self.v_scale) = fused(
                    self.params, self.k_pool, self.v_pool, self.k_scale,
                    self.v_scale, pre_args, lengths_arg, active_arg,
                    last_arg, self._slot_arr(plan["true_lens"]),
                    self._slot_arr(plan["admit"]),
                )
                for slot, req, ids, *_ in plan["wave"]:
                    dispatched[slot] = 1 + chunk
                for slot in range(self.pool_cfg.n_slots):
                    if active_v[slot] and self.slot_req[slot] is not None \
                            and not (plan["admit"][slot]):
                        dispatched[slot] += chunk
                self.lengths[active_v] = lengths_v[active_v] + chunk
                last_dev = toks_dev[-1]
                inflight.append((nxt_dev, toks_dev, list(self.slot_req)))
            elif self.active.any() and any(
                self.active[s]
                and self.slot_req[s] is not None
                and not self.slot_req[s].done
                and dispatched[s] < self.slot_req[s].max_new_tokens
                for s in range(self.pool_cfg.n_slots)
            ):
                # plain chunk: some active slot still needs tokens beyond
                # what's already dispatched
                (toks_dev, self.k_pool, self.v_pool, self.k_scale,
                 self.v_scale) = self._decode_chunk(
                    chunk, self._past_blocks_bucket()
                )(
                    self.params, self.k_pool, self.v_pool, self.k_scale,
                    self.v_scale, self._slot_arr(self.tables),
                    self._slot_arr(self.lengths),
                    self._slot_arr(self.active), last_in(),
                )
                for s in range(self.pool_cfg.n_slots):
                    if self.active[s]:
                        dispatched[s] += chunk
                        self.lengths[s] += chunk
                last_dev = toks_dev[-1]
                inflight.append((None, toks_dev, list(self.slot_req)))
            elif inflight:
                harvest()
                continue
            elif queue:  # nothing active, nothing in flight, queue stuck
                raise RuntimeError(
                    "Block pool too small for the smallest pending request"
                )
            else:
                break
            # depth-1 pipeline: keep at most one chunk queued behind the
            # one executing; harvest (fetch + host bookkeeping) overlaps it
            while len(inflight) > 1:
                harvest()
        while inflight:
            harvest()
        return requests
