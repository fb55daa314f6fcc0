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
    # max decode steps fused into one dispatch (amortizes dispatch overhead);
    # capped at 4 while requests are queued so slots free up sooner
    max_chunk: int = 16


class BlockAllocator:
    """Host-side free-list over the shared pool (block-granular)."""

    def __init__(self, n_blocks: int):
        self.free = list(range(n_blocks - 1, -1, -1))

    def alloc(self, n: int) -> Optional[List[int]]:
        if len(self.free) < n:
            return None
        return [self.free.pop() for _ in range(n)]

    def release(self, blocks: List[int]) -> None:
        self.free.extend(blocks)

    @property
    def n_free(self) -> int:
        return len(self.free)


class ContinuousBatchingEngine:
    """Paged, continuously-batched greedy decoding."""

    def __init__(
        self,
        model: ModelSpec,
        params,
        pool: PoolConfig = PoolConfig(),
        dtype=jnp.bfloat16,
        eos_id: Optional[int] = None,
        use_paged_kernel: Optional[bool] = None,
    ):
        self.model = model
        self.params = params
        self.pool_cfg = pool
        self.dtype = dtype
        self.eos_id = eos_id
        self.allocator = BlockAllocator(pool.n_blocks)

        L, H, D = model.n_layer, model.n_kv_head, model.head_dim
        P = pool
        # (head, block)-major so a pool block is a contiguous [bs, D] tile —
        # the layout ops/pallas/paged.py walks via the block table
        self.k_pool = jnp.zeros((L, H, P.n_blocks, P.block_size, D), dtype)
        self.v_pool = jnp.zeros((L, H, P.n_blocks, P.block_size, D), dtype)
        from ..core.config import default_device_kind

        self._on_tpu = default_device_kind() == "tpu"
        self.use_paged_kernel = use_paged_kernel if use_paged_kernel is not None else self._on_tpu
        # per-slot state (host mirrors + device arrays)
        self.tables = np.zeros((P.n_slots, P.max_blocks_per_seq), np.int32)
        self.lengths = np.zeros((P.n_slots,), np.int32)
        self.active = np.zeros((P.n_slots,), bool)
        self.last_token = np.zeros((P.n_slots,), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * P.n_slots
        self.slot_blocks: List[List[int]] = [[] for _ in range(P.n_slots)]

        self._decode_step = jax.jit(self._make_decode_step())
        self._prefill = jax.jit(self._make_prefill())
        self._chunks: Dict[int, Callable] = {}

    def _decode_chunk(self, n_steps: int):
        if n_steps not in self._chunks:
            self._chunks[n_steps] = jax.jit(self._make_decode_chunk(n_steps))
        return self._chunks[n_steps]

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------
    def _logical_kv(self, k_pool_l, v_pool_l, tables):
        """Gather per-slot logical KV [B, Tcap, H, D] from the pool."""
        P = self.pool_cfg
        # [B, max_blocks, bs, H, D] -> [B, Tcap, H, D]
        k = k_pool_l[tables]
        v = v_pool_l[tables]
        B = tables.shape[0]
        Tcap = P.max_blocks_per_seq * P.block_size
        return (
            k.reshape(B, Tcap, *k.shape[3:]),
            v.reshape(B, Tcap, *v.shape[3:]),
        )

    def _make_decode_step(self):
        model = self.model
        P = self.pool_cfg
        H, D, Hq = model.n_kv_head, model.head_dim, model.n_head
        G = Hq // H
        Tcap = P.max_blocks_per_seq * P.block_size
        use_kernel = self.use_paged_kernel
        interpret = not self._on_tpu

        def step(params, k_pool, v_pool, tables, lengths, active, tokens):
            """One batched decode step for all slots.

            tokens: [B] int32 (last emitted token per slot)
            Returns (next_tokens [B], k_pool, v_pool).
            """
            B = tokens.shape[0]
            pos = jnp.minimum(lengths, model.n_positions - 1)

            class _PoolStrategy:
                """Adapter: model's strategy interface over the block pool."""

                def cache_layer_slices(self_s, cache):
                    return (k_pool, v_pool)

                def cache_with_layer_slices(self_s, cache, new_slices, T):
                    return {
                        "k_pool": new_slices[0],
                        "v_pool": new_slices[1],
                        "length": cache["length"],
                    }

                def set_length(self_s, cache, n):
                    return cache

                def layer_attend(self_s, layer_cache, cache, q, k_new, v_new, seq_mask):
                    k_pool_l, v_pool_l = layer_cache  # [H, n_blocks, bs, D]
                    # scatter each slot's new token into its current block;
                    # inactive slots write to the drop sentinel so a retired
                    # slot's stale table can never corrupt recycled blocks
                    blk = tables[jnp.arange(B), lengths // P.block_size]
                    blk = jnp.where(active, blk, P.n_blocks)
                    off = lengths % P.block_size
                    kn = k_new[:, :, 0, :].transpose(1, 0, 2)  # [H, B, D]
                    vn = v_new[:, :, 0, :].transpose(1, 0, 2)
                    k_pool_l = k_pool_l.at[:, blk, off].set(
                        kn.astype(k_pool_l.dtype), mode="drop"
                    )
                    v_pool_l = v_pool_l.at[:, blk, off].set(
                        vn.astype(v_pool_l.dtype), mode="drop"
                    )
                    if use_kernel:
                        from ..ops.pallas.paged import paged_attention_decode

                        out = paged_attention_decode(
                            q[:, :, 0, :],
                            k_pool_l,
                            v_pool_l,
                            tables,
                            lengths,
                            interpret=interpret,
                        )
                        return out[:, :, None, :], (k_pool_l, v_pool_l)
                    # jnp fallback: gather logical KV and attend
                    k_log = k_pool_l[:, tables].reshape(H, B, Tcap, D)
                    v_log = v_pool_l[:, tables].reshape(H, B, Tcap, D)
                    k_log = k_log.transpose(1, 0, 2, 3)  # [B, H, Tcap, D]
                    v_log = v_log.transpose(1, 0, 2, 3)
                    scale = 1.0 / jnp.sqrt(jnp.float32(D))
                    qg = q.reshape(B, H, G, 1, D)
                    s = jnp.einsum(
                        "bhgtd,bhcd->bhgtc",
                        qg,
                        k_log,
                        preferred_element_type=jnp.float32,
                    ) * scale
                    idx = jax.lax.broadcasted_iota(jnp.int32, (B, 1, 1, 1, Tcap), 4)
                    mask = idx <= lengths[:, None, None, None, None]
                    s = jnp.where(mask, s, jnp.float32(jnp.finfo(jnp.float32).min))
                    p = jax.nn.softmax(s, axis=-1)
                    out = jnp.einsum(
                        "bhgtc,bhcd->bhgtd",
                        p,
                        v_log,
                        preferred_element_type=jnp.float32,
                    )
                    return out.reshape(B, Hq, 1, D), (k_pool_l, v_pool_l)

            strategy = _PoolStrategy()
            cache = {"k_pool": k_pool, "v_pool": v_pool, "length": lengths}
            logits, cache = model.forward(
                params, tokens[:, None], pos[:, None], cache, strategy, None
            )
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            nxt = jnp.clip(nxt, 0, model.vocab_size - 1)
            nxt = jnp.where(active, nxt, tokens)
            return nxt, cache["k_pool"], cache["v_pool"]

        return step

    def _make_decode_chunk(self, n_steps: int):
        """Scan `n_steps` batched decode steps in ONE dispatch.

        Per-dispatch overhead through the remote runtime is ~tens of ms;
        chunking amortizes it across steps. `active` is constant within a
        chunk (the scheduler sizes chunks so no slot overruns its budget).
        """
        step = self._make_decode_step()

        def chunk(params, k_pool, v_pool, tables, lengths, active, tokens):
            def body(carry, _):
                k_pool, v_pool, lengths, tokens = carry
                nxt, k_pool, v_pool = step(
                    params, k_pool, v_pool, tables, lengths, active, tokens
                )
                lengths = lengths + active.astype(jnp.int32)
                tokens = jnp.where(active, nxt, tokens)
                return (k_pool, v_pool, lengths, tokens), nxt

            (k_pool, v_pool, lengths, tokens), toks = jax.lax.scan(
                body, (k_pool, v_pool, lengths, tokens), None, length=n_steps
            )
            return toks, k_pool, v_pool

        return chunk

    def _make_prefill(self):
        """Prefill one request into its allocated blocks; returns last logits."""
        model = self.model
        P = self.pool_cfg
        H, D = model.n_kv_head, model.head_dim

        def prefill(params, k_pool, v_pool, table, tokens, true_len):
            # tokens: [1, bucket]; table: [max_blocks_per_seq]
            B, Tpad = tokens.shape
            pos = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1),
                model.n_positions - 1,
            )
            seq_mask = jax.lax.broadcasted_iota(jnp.int32, (B, Tpad), 1) < true_len

            class _PrefillStrategy:
                def cache_layer_slices(self_s, cache):
                    return (k_pool, v_pool)

                def cache_with_layer_slices(self_s, cache, new_slices, T):
                    return {"k_pool": new_slices[0], "v_pool": new_slices[1]}

                def set_length(self_s, cache, n):
                    return cache

                def layer_attend(self_s, layer_cache, cache, q, k_new, v_new, sm):
                    k_pool_l, v_pool_l = layer_cache
                    # dense causal attention within the prompt
                    from ..cache.kvcache import _attend

                    out = _attend(q, k_new, v_new, jnp.zeros((), jnp.int32))
                    # scatter prompt KV into the slot's blocks
                    t = jnp.arange(Tpad)
                    blk = table[t // P.block_size]
                    off = t % P.block_size
                    # mask pad positions to a dropped index
                    blk = jnp.where(t < true_len, blk, P.n_blocks)
                    kn = k_new[0]  # [H, Tpad, D]
                    vn = v_new[0]
                    k_pool_l = k_pool_l.at[:, blk, off].set(
                        kn.astype(k_pool_l.dtype), mode="drop"
                    )
                    v_pool_l = v_pool_l.at[:, blk, off].set(
                        vn.astype(v_pool_l.dtype), mode="drop"
                    )
                    return out, (k_pool_l, v_pool_l)

            strategy = _PrefillStrategy()
            cache = {"k_pool": k_pool, "v_pool": v_pool}
            logits, cache = model.forward(
                params, tokens, pos, cache, strategy, seq_mask
            )
            idx = jnp.broadcast_to((true_len - 1)[None, None, None], (B, 1, 1))
            last = jnp.take_along_axis(logits, idx, axis=1)[:, 0]
            nxt = jnp.clip(
                jnp.argmax(last, axis=-1).astype(jnp.int32), 0, model.vocab_size - 1
            )
            return nxt[0], cache["k_pool"], cache["v_pool"]

        return prefill

    # ------------------------------------------------------------------
    # host-side scheduler
    # ------------------------------------------------------------------
    def _admit(self, req: Request) -> bool:
        P = self.pool_cfg
        try:
            slot = next(i for i in range(P.n_slots) if not self.active[i])
        except StopIteration:
            return False
        slot_cap = P.max_blocks_per_seq * P.block_size
        max_prompt = min(P.prompt_bucket, slot_cap - req.max_new_tokens)
        if max_prompt <= 0:
            raise ValueError(
                f"max_new_tokens={req.max_new_tokens} exceeds slot capacity "
                f"{slot_cap} (max_blocks_per_seq * block_size)"
            )
        ids = req.prompt_ids[:max_prompt]
        total = len(ids) + req.max_new_tokens
        n_blocks = -(-total // P.block_size)
        blocks = self.allocator.alloc(n_blocks)
        if blocks is None:
            return False

        table = np.full((P.max_blocks_per_seq,), P.n_blocks, np.int32)
        table[: len(blocks)] = blocks
        buf = np.zeros((1, P.prompt_bucket), np.int32)
        buf[0, : len(ids)] = ids

        nxt, self.k_pool, self.v_pool = self._prefill(
            self.params,
            self.k_pool,
            self.v_pool,
            jnp.asarray(table),
            jnp.asarray(buf),
            jnp.int32(len(ids)),
        )
        self.tables[slot] = table
        self.lengths[slot] = len(ids)
        self.active[slot] = True
        self.last_token[slot] = int(nxt)
        self.slot_req[slot] = req
        self.slot_blocks[slot] = blocks
        req.out_ids.append(int(nxt))
        return True

    def _retire(self, slot: int) -> None:
        req = self.slot_req[slot]
        req.done = True
        self.allocator.release(self.slot_blocks[slot])
        self.slot_blocks[slot] = []
        self.active[slot] = False
        self.slot_req[slot] = None

    def run(self, requests: List[Request], progress: Optional[Callable] = None):
        """Serve all requests to completion; returns them (with out_ids)."""
        queue = list(requests)
        total_steps = 0
        while queue or self.active.any():
            # admit as many as fit
            while queue and self._admit(queue[0]):
                queue.pop(0)

            if not self.active.any():
                if queue:  # could not admit anything -> pool exhausted
                    raise RuntimeError(
                        "Block pool too small for the smallest pending request"
                    )
                break

            # chunked batched decode: as many steps per dispatch as every
            # active slot can absorb (power-of-two sizes bound recompiles)
            remaining = min(
                self.slot_req[s_].max_new_tokens - len(self.slot_req[s_].out_ids)
                for s_ in range(self.pool_cfg.n_slots)
                if self.active[s_]
            )
            # a slot whose budget is exhausted retires without stepping
            if remaining <= 0:
                for slot in range(self.pool_cfg.n_slots):
                    if self.active[slot] and (
                        self.slot_req[slot].max_new_tokens
                        <= len(self.slot_req[slot].out_ids)
                    ):
                        self._retire(slot)
                continue
            # only two chunk programs compile ({1, max_chunk}): remote
            # compiles cost ~a minute each, so variety is expensive
            chunk = (
                self.pool_cfg.max_chunk
                if remaining >= self.pool_cfg.max_chunk
                else 1
            )

            toks, self.k_pool, self.v_pool = self._decode_chunk(chunk)(
                self.params,
                self.k_pool,
                self.v_pool,
                jnp.asarray(self.tables),
                jnp.asarray(self.lengths),
                jnp.asarray(self.active),
                jnp.asarray(self.last_token),
            )
            toks = np.asarray(toks)  # [chunk, B]
            total_steps += chunk

            for slot in range(self.pool_cfg.n_slots):
                if not self.active[slot]:
                    continue
                req = self.slot_req[slot]
                self.lengths[slot] += chunk
                hit_eos = False
                for i in range(chunk):
                    tok = int(toks[i, slot])
                    req.out_ids.append(tok)
                    self.last_token[slot] = tok
                    if self.eos_id is not None and tok == self.eos_id:
                        hit_eos = True
                        break
                if hit_eos or len(req.out_ids) >= req.max_new_tokens:
                    self._retire(slot)
            if progress:
                progress(total_steps, self)
        return requests
