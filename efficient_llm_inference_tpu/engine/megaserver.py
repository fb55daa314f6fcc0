"""Continuous batching over the batched whole-step megakernel.

`ContinuousBatchingEngine` (engine/batching.py) serves from a paged block
pool with XLA two-region attention — the right shape for ragged, quantized,
long-context pools. This engine is its dense sibling for the uniform case:
per-slot [C] panes in ONE [L, B, C, E] pool, and every decode chunk is a
`lax.scan` of batched whole-step megakernel programs
(ops/pallas/megakernel_batch.py) — the per-step weight stream is paid once
for all active slots, which measured 3.2–4.0x the paged engine's aggregate
at equal slot counts on GPT-2 (docs/BENCHMARKS.md "Batched whole-step
megakernel"). No reference counterpart (the reference is strictly batch-1
single-stream, /root/reference/src/benchmarking/benchmarker.py:63-639).

Scheduling model:
* admission happens BETWEEN decode chunks: a wave of queued requests is
  prefilled in one dispatch (per-row prompt lengths, as
  engine/generate.py:make_generate_batch) and its panes are written into
  the admitted slots;
* a decode chunk advances every slot `chunk` steps in one dispatch; slots
  that finish (budget / EOS) inside a chunk overshoot harmlessly — their
  extra tokens are discarded at harvest and their zombie writes land in
  their own pane, which the next admission's prefill overwrites;
* inactive slots hold cursor 0 and write junk into their own column 0 —
  never observed, overwritten on admission.

With `kv_mode` in {"int8", "int4", "mixed"} the pool holds QUANTIZED panes
(ops/pallas/megakernel_batch_quant.py): admission prefills dense then
quantizes the wave once (reference scale math), decode chunks scan the
batched quant-KV kernel. The pane DMA is the serving bandwidth bound, so
int8 panes measure FASTER than bf16 even at short context (14,255 vs
12,543 tok/s aggregate, docs/BENCHMARKS.md) and int4 doubles the
(slots x capacity) envelope that fits the VMEM ring — long-context
compressed pools no longer need the slower paged engine.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.registry import ModelSpec
from .batching import Request
from .generate import bucket_for


@dataclasses.dataclass(frozen=True)
class MegaPoolConfig:
    n_slots: int = 16
    capacity: int = 128  # per-slot pane length (tokens), multiple of 8
    max_chunk: int = 32  # decode steps fused into one dispatch
    prompt_bucket: int = 256


_WAVE_BUCKETS = (1, 2, 4, 8, 16, 32)


class MegaBatchServer:
    """Dense-pane continuous batching: megakernel decode for full waves."""

    # with an eos_id, bursts are speculative (EOS retirements are only
    # discovered at the fetch): cap them so zombie decode and admission
    # delay stay bounded while fetches amortize over several chunks
    _EOS_BURST_CAP = 4

    def __init__(
        self,
        model: ModelSpec,
        params,
        pool: MegaPoolConfig = MegaPoolConfig(),
        dtype=jnp.bfloat16,
        eos_id: Optional[int] = None,
        kv_mode: Optional[str] = None,
        interpret: bool = False,
        spec: Optional[str] = None,
        spec_k: int = 8,
        ngram_n: int = 2,
        enable_prefix_cache: bool = False,
        prefix_grain: int = 64,
        prefix_cache_max: int = 4,
    ):
        """`spec="ngram"` turns every decode chunk into SPECULATIVE rounds:
        per-slot prompt-lookup proposals (mined on-device from each slot's
        own token stream, zero model cost) verified by the B-slot R-row
        verify megakernel (ops/pallas/megakernel_batch_verify.py), so a
        round advances each slot 1..spec_k tokens for ~one batched weight
        pass. Greedy acceptance keeps per-request outputs IDENTICAL to the
        plain server (same kv_mode) for any proposal source. Quant pools
        compose (round 5): with kv_mode set, rounds ride the quant-pane
        verify kernel (gpt2_megabatch_verify_quant) whose numerics equal
        the sequential quant stepper's exactly. gpt2- AND llama-family
        (llama: bf16 pools); `spec_k <= 8` (one RMW window). The verify
        width adapts per burst (`_ladder_next`): low acceptance shrinks R
        toward the near-parity R=2 floor, saturation climbs it back.
        Size panes so prompt + 1 + max_new <= capacity - 8: the spec
        cursor clamps at C-8 (in-pane RMW window), so tokens scheduled
        past that are computed against a frozen context — the spec
        analogue of the plain path's C-1 cursor-clamp contract."""
        from ..ops.pallas.megakernel_batch import (
            llama_mega_batch_supported,
            mega_batch_supported,
        )
        from ..ops.pallas.megakernel_batch_quant import (
            llama_mega_batch_quant_supported,
            mega_batch_quant_supported,
        )

        assert pool.capacity % 8 == 0, "pane length must be 8-aligned"
        self.model = model
        self.params = params
        self.pool_cfg = pool
        self.dtype = dtype
        self.eos_id = eos_id
        self.kv_mode = kv_mode  # None = bf16 panes; int8/int4/mixed = quant
        self.interpret = interpret
        self.spec = spec
        self.spec_k = spec_k
        self.ngram_n = ngram_n
        # live acceptance estimate (booked tokens / productive round),
        # persists across run() calls so warmed servers schedule well
        self._acc_est = 2.0
        # adaptive verify width: start optimistic at spec_k, shrink toward
        # 2 on low-acceptance streams (R=2 rounds cost ~a plain step, so
        # the worst case is near-parity instead of paying spec_k wasted
        # rows/round), climb back when the current width saturates
        self._spec_R = spec_k
        self.spec_stats = {"rounds": 0, "tokens": 0}
        if spec is not None:
            from ..ops.pallas.megakernel_batch_verify import (
                mega_batch_verify_supported,
            )

            if spec != "ngram":
                raise ValueError(f"unknown spec mode: {spec!r}")
            if model.name == "gpt2":
                if kv_mode:  # spec x compressed pools (round 5)
                    from ..ops.pallas.megakernel_batch_verify import (
                        mega_batch_verify_quant_supported,
                    )

                    ok_spec = mega_batch_verify_quant_supported(
                        model.config, pool.capacity, params, pool.n_slots,
                        spec_k, kv_mode,
                    )
                else:
                    ok_spec = mega_batch_verify_supported(
                        model.config, pool.capacity, params, pool.n_slots,
                        spec_k,
                    )
            elif model.name == "llama":
                if kv_mode:
                    from ..ops.pallas.megakernel_batch_verify import (
                        llama_mega_batch_verify_quant_supported,
                    )

                    ok_spec = llama_mega_batch_verify_quant_supported(
                        model.config, pool.capacity, params, pool.n_slots,
                        spec_k, kv_mode,
                    )
                else:
                    from ..ops.pallas.megakernel_batch_verify import (
                        llama_mega_batch_verify_supported,
                    )

                    ok_spec = llama_mega_batch_verify_supported(
                        model.config, pool.capacity, params, pool.n_slots,
                        spec_k,
                    )
            else:
                raise ValueError(
                    "spec serving needs a gpt2- or llama-family model"
                )
            if not ok_spec:
                raise ValueError(
                    "batched verify megakernel unsupported at this "
                    "(model, n_slots, capacity, spec_k)"
                )
        cfg = model.config
        if model.name == "gpt2":
            from ..ops.pallas.megakernel import pack_gpt2_mega as pack

            ok = (
                mega_batch_quant_supported(
                    cfg, pool.capacity, params, pool.n_slots, kv_mode)
                if kv_mode else
                mega_batch_supported(cfg, pool.capacity, params, pool.n_slots)
            )
        elif model.name == "llama":
            from ..ops.pallas.megakernel_llama import pack_llama_mega as pack

            ok = (
                llama_mega_batch_quant_supported(
                    cfg, pool.capacity, params, pool.n_slots, kv_mode)
                if kv_mode else
                llama_mega_batch_supported(
                    cfg, pool.capacity, params, pool.n_slots)
            )
        else:
            raise ValueError(f"unsupported model family: {model.name}")
        if not ok:
            raise ValueError(
                "batched megakernel unsupported at this (model, n_slots, "
                "capacity) — use ContinuousBatchingEngine"
            )
        self.packed = pack(params, cfg)
        assert self.packed is not None, "params not packable"

        B, C = pool.n_slots, pool.capacity
        L = model.n_layer
        KW = model.n_kv_head * model.head_dim
        if kv_mode:
            from ..ops.pallas.megakernel_quant import _kv_kinds, _pane_width

            k_kind, v_kind = _kv_kinds(kv_mode)
            self.k_pool = jnp.zeros(
                (L, B, C, _pane_width(k_kind, KW)), jnp.int8)
            self.v_pool = jnp.zeros(
                (L, B, C, _pane_width(v_kind, KW)), jnp.int8)
            self.ks_pool = jnp.ones((L, B, C), jnp.float32)
            self.vs_pool = jnp.ones((L, B, C), jnp.float32)
        else:
            self.k_pool = jnp.zeros((L, B, C, KW), dtype)
            self.v_pool = jnp.zeros((L, B, C, KW), dtype)
            self.ks_pool = self.vs_pool = None
        # host mirrors
        self.lengths = np.zeros((B,), np.int32)
        self.active = np.zeros((B,), bool)
        self.last_token = np.zeros((B,), np.int32)
        self.slot_req: List[Optional[Request]] = [None] * B
        # spec mode: the per-slot token stream (prompt + emitted) LIVES ON
        # DEVICE (seq_dev [B, C], slen_dev [B]) — admission prefills write
        # the prompt AND the prefill token into it device-side, so
        # admitting a wave costs no blocking device_get (the first burst
        # fetch books the prefill token: `pending` marks slots whose first
        # token is still device-only, `plen` remembers where it sits)
        self.slen = np.ones((B,), np.int32)  # host mirror (scheduling)
        if spec is not None:
            self.seq_dev = jnp.zeros((B, C), jnp.int32)
            self.slen_dev = jnp.ones((B,), jnp.int32)
        self.pending = np.zeros((B,), bool)
        self.plen = np.zeros((B,), np.int32)
        # shared-prefix cache: grain-aligned prompt prefix (token tuple) ->
        # POOL-format pane slices, LRU-bounded. Admission groups its wave
        # by prefix hit and prefills ONLY the suffix of hit requests (the
        # cached prefix is written into the slot pane, dense pools read it
        # back exactly; quant pools read it back at pool precision — the
        # same divergence class as the paged engine's prefix path).
        self.enable_prefix_cache = enable_prefix_cache
        self.prefix_grain = prefix_grain
        self.prefix_cache_max = prefix_cache_max
        from collections import OrderedDict

        self._prefix_reg: "OrderedDict[tuple, dict]" = OrderedDict()

        self._prefills: Dict = {}
        self._chunks: Dict = {}

    # ------------------------------------------------------------------
    def _make_wave_prefill(self, W: int, Tpad: int) -> Callable:
        """Prefill W prompts (per-row lengths) into W slots, one dispatch."""
        from ..cache.kvcache import DenseKV
        from ..ops.pallas.megakernel_batch import to_mega_layout_batch

        model = self.model
        C = self.pool_cfg.capacity
        strategy = DenseKV(
            n_layer=model.n_layer,
            n_head=model.n_kv_head,
            head_dim=model.head_dim,
            capacity=C,
            batch=W,
            dtype=self.dtype,
        )

        kv_mode = self.kv_mode
        if kv_mode:
            from ..ops.pallas.megakernel_batch_quant import (
                quantize_panes_batch,
            )

        spec_stream = self.spec is not None

        def prefill(params, tokens, true_lens, slots, k_pool, v_pool,
                    ks_pool=None, vs_pool=None, seq=None, slen=None):
            cache = strategy.init()
            pos = jnp.minimum(
                jax.lax.broadcasted_iota(jnp.int32, (W, Tpad), 1),
                model.n_positions - 1,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (W, Tpad), 1)
            seq_mask = col < true_lens[:, None]
            logits, cache = model.forward(
                params, tokens, pos, cache, strategy, seq_mask
            )
            last = jnp.take_along_axis(
                logits, (true_lens - 1)[:, None, None], axis=1
            )[:, 0]
            tok0 = jnp.clip(
                jnp.argmax(last, axis=-1).astype(jnp.int32), 0,
                model.vocab_size - 1,
            )
            kb = to_mega_layout_batch(cache["k"])  # [L, W, C, KW]
            vb = to_mega_layout_batch(cache["v"])
            if kv_mode:  # one-time wave quantization (reference scale math)
                kb, vb, ksw, vsw = quantize_panes_batch(kb, vb, kv_mode)
            for w in range(W):  # waves are small; W static
                k_pool = jax.lax.dynamic_update_slice(
                    k_pool, kb[:, w:w + 1], (0, slots[w], 0, 0)
                )
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, vb[:, w:w + 1], (0, slots[w], 0, 0)
                )
                if kv_mode:
                    ks_pool = jax.lax.dynamic_update_slice(
                        ks_pool, ksw[:, w:w + 1], (0, slots[w], 0)
                    )
                    vs_pool = jax.lax.dynamic_update_slice(
                        vs_pool, vsw[:, w:w + 1], (0, slots[w], 0)
                    )
            if spec_stream:
                # write the prompt + prefill token into the DEVICE token
                # stream — no host fetch at admission (the first burst
                # fetch books tok0; see __init__'s `pending`)
                for w in range(W):
                    seq = jax.lax.dynamic_update_slice(
                        seq, tokens[w:w + 1], (slots[w], 0)
                    )
                    seq = jax.lax.dynamic_update_slice(
                        seq, tok0[w][None, None], (slots[w], true_lens[w])
                    )
                    slen = slen.at[slots[w]].set(true_lens[w] + 1)
                if kv_mode:
                    return k_pool, v_pool, ks_pool, vs_pool, seq, slen
                return k_pool, v_pool, seq, slen
            if kv_mode:
                return k_pool, v_pool, ks_pool, vs_pool, tok0
            return k_pool, v_pool, tok0

        if spec_stream and kv_mode:
            donate = (4, 5, 6, 7, 8, 9)
        elif spec_stream:
            donate = (4, 5, 8, 9)
        elif kv_mode:
            donate = (4, 5, 6, 7)
        else:
            donate = (4, 5)
        return jax.jit(prefill, donate_argnums=donate)

    def _make_wave_prefill_suffix(
        self, W: int, Spad: int, P: int, Fpad: int
    ) -> Callable:
        """Suffix-only prefill against a cached shared prefix.

        W suffixes (per-row lengths) forward with the prefix KV as
        attention context (cache pre-loaded at length P); the
        [prefix | suffix] panes land in the admitted slots. Quant pools:
        the prefix region is overwritten with the cached RAW pool bytes +
        scales, so pool contents are bit-identical to the run that
        registered the prefix; the suffix forward reads the prefix at
        pool precision (dense pools: exact)."""
        from ..cache.kvcache import DenseKV
        from ..ops.pallas.megakernel_batch import to_mega_layout_batch

        model = self.model
        C = self.pool_cfg.capacity
        H, D = model.n_kv_head, model.head_dim
        L = model.n_layer
        strategy = DenseKV(
            n_layer=L, n_head=H, head_dim=D, capacity=C, batch=W,
            dtype=self.dtype,
        )
        kv_mode = self.kv_mode
        spec_stream = self.spec is not None
        dtype = self.dtype
        if kv_mode:
            from ..ops.pallas.megakernel_batch_quant import (
                quantize_panes_batch,
            )
            from ..ops.pallas.megakernel_quant import _kv_kinds

            k_kind, v_kind = _kv_kinds(kv_mode)

        def dense_prefix(store, scales, kind):
            """Pool-format [L, P, Wp] + [L, P] scales -> dense [L, P, KW]."""
            if kind == "int8":
                vals = store.astype(jnp.float32)
            else:  # kernel half-split packing — THE decode lives in
                # ops/pallas/megakernel_quant.unpack_halves
                from ..ops.pallas.megakernel_quant import unpack_halves

                hi, lo = unpack_halves(store, jnp.float32)
                vals = jnp.concatenate([hi, lo], axis=-1)
            return (vals * scales[..., None]).astype(dtype)

        def prefill(params, suffix, slens, slots, pk, pv, pks, pvs,
                    k_pool, v_pool, ks_pool=None, vs_pool=None,
                    seq=None, slen=None, prompt=None, flens=None):
            if kv_mode:
                kd = dense_prefix(pk, pks, k_kind)  # [L, P, KW]
                vd = dense_prefix(pv, pvs, v_kind)
            else:
                kd, vd = pk.astype(dtype), pv.astype(dtype)
            kd_c = kd.reshape(L, P, H, D).transpose(0, 2, 1, 3)[:, None]
            vd_c = vd.reshape(L, P, H, D).transpose(0, 2, 1, 3)[:, None]
            cache = strategy.init()
            cache["k"] = jax.lax.dynamic_update_slice(
                cache["k"], jnp.broadcast_to(
                    kd_c, (L, W, H, P, D)).astype(cache["k"].dtype),
                (0, 0, 0, 0, 0),
            )
            cache["v"] = jax.lax.dynamic_update_slice(
                cache["v"], jnp.broadcast_to(
                    vd_c, (L, W, H, P, D)).astype(cache["v"].dtype),
                (0, 0, 0, 0, 0),
            )
            cache = strategy.set_length(cache, P)
            pos = jnp.minimum(
                P + jax.lax.broadcasted_iota(jnp.int32, (W, Spad), 1),
                model.n_positions - 1,
            )
            col = jax.lax.broadcasted_iota(jnp.int32, (W, Spad), 1)
            seq_mask = col < slens[:, None]
            logits, cache = model.forward(
                params, suffix, pos, cache, strategy, seq_mask
            )
            last = jnp.take_along_axis(
                logits, (slens - 1)[:, None, None], axis=1
            )[:, 0]
            tok0 = jnp.clip(
                jnp.argmax(last, axis=-1).astype(jnp.int32), 0,
                model.vocab_size - 1,
            )
            kb = to_mega_layout_batch(cache["k"])  # [L, W, C, KW]
            vb = to_mega_layout_batch(cache["v"])
            if kv_mode:
                kb, vb, ksw, vsw = quantize_panes_batch(kb, vb, kv_mode)
                # prefix region: cached RAW pool bytes + scales, verbatim
                kb = jax.lax.dynamic_update_slice(
                    kb, jnp.broadcast_to(
                        pk[:, None], (L, W) + pk.shape[1:]),
                    (0, 0, 0, 0),
                )
                vb = jax.lax.dynamic_update_slice(
                    vb, jnp.broadcast_to(
                        pv[:, None], (L, W) + pv.shape[1:]),
                    (0, 0, 0, 0),
                )
                ksw = jax.lax.dynamic_update_slice(
                    ksw, jnp.broadcast_to(pks[:, None], (L, W, P)),
                    (0, 0, 0),
                )
                vsw = jax.lax.dynamic_update_slice(
                    vsw, jnp.broadcast_to(pvs[:, None], (L, W, P)),
                    (0, 0, 0),
                )
            for w in range(W):
                k_pool = jax.lax.dynamic_update_slice(
                    k_pool, kb[:, w:w + 1], (0, slots[w], 0, 0)
                )
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, vb[:, w:w + 1], (0, slots[w], 0, 0)
                )
                if kv_mode:
                    ks_pool = jax.lax.dynamic_update_slice(
                        ks_pool, ksw[:, w:w + 1], (0, slots[w], 0)
                    )
                    vs_pool = jax.lax.dynamic_update_slice(
                        vs_pool, vsw[:, w:w + 1], (0, slots[w], 0)
                    )
            if spec_stream:
                for w in range(W):
                    seq = jax.lax.dynamic_update_slice(
                        seq, prompt[w:w + 1], (slots[w], 0)
                    )
                    seq = jax.lax.dynamic_update_slice(
                        seq, tok0[w][None, None], (slots[w], flens[w])
                    )
                    slen = slen.at[slots[w]].set(flens[w] + 1)
                if kv_mode:
                    return k_pool, v_pool, ks_pool, vs_pool, seq, slen
                return k_pool, v_pool, seq, slen
            if kv_mode:
                return k_pool, v_pool, ks_pool, vs_pool, tok0
            return k_pool, v_pool, tok0

        if spec_stream and kv_mode:
            donate = (8, 9, 10, 11, 12, 13)
        elif spec_stream:
            donate = (8, 9, 12, 13)
        elif kv_mode:
            donate = (8, 9, 10, 11)
        else:
            donate = (8, 9)
        return jax.jit(prefill, donate_argnums=donate)

    def _dispatch_suffix_group(self, wave, P: int, entry) -> int:
        """Admit a prefix-HIT group: one suffix-only prefill dispatch."""
        C = self.pool_cfg.capacity
        margin = 16 if self.spec else 8
        sufs = [(slot, req, ids, ids[P:]) for slot, req, ids in wave]
        Smax = max(len(s) for *_, s in sufs)
        Spad = min(bucket_for(Smax), C - P - margin)
        Spad = max(Spad, 8)
        W = next(w for w in _WAVE_BUCKETS if w >= len(wave))
        Fpad = min(-(-(P + Spad) // 8) * 8, C)
        key = ("sfx", W, Spad, P, Fpad)
        if key not in self._prefills:
            self._prefills[key] = self._make_wave_prefill_suffix(
                W, Spad, P, Fpad
            )
        buf = np.zeros((W, Spad), np.int32)
        lens = np.zeros((W,), np.int32)
        slots = np.zeros((W,), np.int32)
        pbuf = np.zeros((W, Fpad), np.int32)
        flens = np.zeros((W,), np.int32)
        for w in range(W):
            slot, req, ids, suf = sufs[min(w, len(sufs) - 1)]
            suf = suf[:Spad]
            buf[w, : len(suf)] = suf
            lens[w] = len(suf)
            slots[w] = slot
            pbuf[w, : len(ids)] = ids[:Fpad]
            flens[w] = min(len(ids), Fpad)
        none_s = jnp.zeros((1,), jnp.float32)
        args = (
            self.params, jnp.asarray(buf), jnp.asarray(lens),
            jnp.asarray(slots), entry["k"], entry["v"],
            entry.get("ks", none_s), entry.get("vs", none_s),
            self.k_pool, self.v_pool,
        )
        if self.spec:
            if self.kv_mode:
                (self.k_pool, self.v_pool, self.ks_pool, self.vs_pool,
                 self.seq_dev, self.slen_dev) = self._prefills[key](
                    *args, self.ks_pool, self.vs_pool,
                    self.seq_dev, self.slen_dev,
                    jnp.asarray(pbuf), jnp.asarray(flens),
                )
            else:
                (self.k_pool, self.v_pool, self.seq_dev,
                 self.slen_dev) = self._prefills[key](
                    *args, None, None, self.seq_dev, self.slen_dev,
                    jnp.asarray(pbuf), jnp.asarray(flens),
                )
            for slot, req, ids, _ in sufs[: len(wave)]:
                self.slot_req[slot] = req
                self.active[slot] = True
                self.pending[slot] = True
                self.plen[slot] = len(ids)
                self.lengths[slot] = len(ids)
                self.slen[slot] = len(ids) + 1
                self._register_prefix(slot, ids)
            return len(wave)
        if self.kv_mode:
            (self.k_pool, self.v_pool, self.ks_pool, self.vs_pool,
             tok0) = self._prefills[key](
                *args, self.ks_pool, self.vs_pool,
            )
        else:
            self.k_pool, self.v_pool, tok0 = self._prefills[key](*args)
        tok0 = np.asarray(jax.device_get(tok0))
        for w, (slot, req, ids, _) in enumerate(sufs[: len(wave)]):
            self.slot_req[slot] = req
            self.active[slot] = True
            self.lengths[slot] = len(ids)
            self.last_token[slot] = int(tok0[w])
            req.out_ids.append(int(tok0[w]))
            self._register_prefix(slot, ids)
            if len(req.out_ids) >= req.max_new_tokens or (
                self.eos_id is not None and req.out_ids[-1] == self.eos_id
            ):
                req.done = True
                self.active[slot] = False
                self.slot_req[slot] = None
                self.lengths[slot] = 0
        return len(wave)

    def _make_chunk(self, n_steps: int) -> Callable:
        """One dispatch = n_steps batched megakernel decode steps."""
        from ..ops.pallas.megakernel_batch import (
            gpt2_megabatch,
            llama_megabatch,
        )
        from ..ops.pallas.megakernel_batch_quant import (
            gpt2_megabatch_quant,
            llama_megabatch_quant,
        )

        model = self.model
        cfg = model.config
        C = self.pool_cfg.capacity
        llama = model.name == "llama"
        interpret = self.interpret
        kv_mode = self.kv_mode
        if llama:
            from ..models.llama import rope_cos_sin

        def chunk(params, packed, pools, lengths, toks, active):
            def step(carry, _):
                pools, lengths, toks = carry
                pos = jnp.minimum(lengths, model.n_positions - 1)
                if llama:
                    embed = params["embed"]
                    x = embed[toks].astype(embed.dtype)
                    cos, sin = rope_cos_sin(pos[:, None], cfg.head_dim,
                                            cfg.rope_theta)
                    cos_q = jnp.tile(cos[:, 0], (1, cfg.n_head))
                    sin_q = jnp.tile(sin[:, 0], (1, cfg.n_head))
                    if kv_mode:
                        tok2, *pools = llama_megabatch_quant(
                            packed, *pools, lengths, x, cos_q, sin_q,
                            cfg=cfg, capacity=C, kv_mode=kv_mode,
                            interpret=interpret,
                        )
                    else:
                        tok2, *pools = llama_megabatch(
                            packed, *pools, lengths, x, cos_q, sin_q,
                            cfg=cfg, capacity=C, interpret=interpret,
                        )
                else:
                    wte, wpe = params["wte"], params["wpe"]
                    x = (wte[toks] + wpe[pos]).astype(wte.dtype)
                    if kv_mode:
                        tok2, *pools = gpt2_megabatch_quant(
                            packed, *pools, lengths, x,
                            cfg=cfg, capacity=C, kv_mode=kv_mode,
                            interpret=interpret,
                        )
                    else:
                        tok2, *pools = gpt2_megabatch(
                            packed, *pools, lengths, x,
                            cfg=cfg, capacity=C, interpret=interpret,
                        )
                tok2 = jnp.clip(tok2, 0, model.vocab_size - 1)
                # inactive slots idle at their cursor; finished-in-chunk
                # slots overshoot but never past the pane end
                lengths = jnp.minimum(
                    lengths + active.astype(jnp.int32), C - 1
                )
                toks = jnp.where(active, tok2, toks)
                return (tuple(pools), lengths, toks), tok2

            (pools, lengths, toks), toks_all = jax.lax.scan(
                step, (tuple(pools), lengths, toks), None, length=n_steps
            )
            return pools, lengths, toks, toks_all

        return jax.jit(chunk, donate_argnums=(2,))

    def _make_spec_chunk(self, n_rounds: int, R: int) -> Callable:
        """One dispatch = n_rounds speculative verify rounds (all slots).

        Each round: per-slot n-gram proposals mined from the slot's own
        token stream (`seq`), ONE batched R-row verify megakernel pass,
        per-slot greedy acceptance (emit accepted prefix + the target's
        own token at the first mismatch), rollback as a pure per-slot
        length update. Inactive slots verify junk into their own pane
        (cursor clamped in-pane) and emit nothing — the zombie contract
        of the plain chunk path. With a quant pool (kv_mode) the round
        rides the quant-pane verify kernel and the scale tables thread
        through the scan alongside the panes. R is the verify width this
        chunk compiles at (the adaptive ladder picks it per burst).
        """
        from ..ops.pallas.megakernel_batch_verify import (
            gpt2_megabatch_verify,
            gpt2_megabatch_verify_quant,
            llama_megabatch_verify,
            llama_megabatch_verify_quant,
        )

        model = self.model
        cfg = model.config
        C = self.pool_cfg.capacity
        Bn = self.pool_cfg.n_slots
        ngram = self.ngram_n
        kv_mode = self.kv_mode
        llama = model.name == "llama"
        interpret = self.interpret
        if llama:
            from ..models.llama import rope_cos_sin
        S = C  # stream buffer: prompt + emitted fits the pane by admission

        def propose(seq, slen):
            """Per-slot prompt-lookup: [B, S], [B] -> [B, R] proposals.

            Latest earlier position whose trailing `ngram` tokens match
            the slot's current tail proposes the R tokens that followed
            it; falls back to repeating the slot's last token (any
            proposal is correct — acceptance just drops)."""
            idx = jnp.arange(S, dtype=jnp.int32)[None]  # [1, S]
            L = slen[:, None]
            valid = (idx >= ngram - 1) & (idx < L - 1)
            match = jnp.ones(seq.shape, bool)
            for j in range(ngram):
                shifted = jnp.roll(seq, j, axis=1)
                tail = jnp.take_along_axis(
                    seq, jnp.maximum(slen - 1 - j, 0)[:, None], axis=1
                )  # [B, 1]
                match = match & (shifted == tail)
            match = match & valid
            q = jnp.max(jnp.where(match, idx, -1), axis=1)  # [B]
            found = q >= 0
            base = jnp.where(found, q + 1, 0)
            cont = jax.vmap(
                lambda s, b: jax.lax.dynamic_slice(s, (b,), (R,))
            )(seq, base)
            last = jnp.take_along_axis(seq, (slen - 1)[:, None], axis=1)
            return jnp.where(
                found[:, None], cont, jnp.broadcast_to(last, (Bn, R))
            )

        def chunk(params, packed, pools, seq, slen, active):
            def round_(carry, _):
                pools, seq, slen = carry
                props = propose(seq, slen)  # [B, R]
                cur = jnp.take_along_axis(seq, (slen - 1)[:, None], axis=1)
                vin = jnp.concatenate([cur, props[:, :-1]], axis=1)  # [B, R]
                vin = jnp.clip(vin, 0, model.vocab_size - 1)
                pos = jnp.minimum(
                    (slen - 1)[:, None]
                    + jnp.arange(R, dtype=jnp.int32)[None],
                    model.n_positions - 1,
                )
                if llama:
                    embed = params["embed"]
                    x = embed[vin].astype(embed.dtype)  # [B, R, E]
                    cosb, sinb = rope_cos_sin(
                        pos, cfg.head_dim, cfg.rope_theta
                    )  # [B, R, D]
                    cos_q = jnp.tile(cosb, (1, 1, cfg.n_head)).reshape(
                        Bn * R, cfg.n_head * cfg.head_dim
                    )
                    sin_q = jnp.tile(sinb, (1, 1, cfg.n_head)).reshape(
                        Bn * R, cfg.n_head * cfg.head_dim
                    )
                    if kv_mode:
                        k_pool, v_pool, ks_pool, vs_pool = pools
                        (greedy, k_pool, v_pool, ks_pool,
                         vs_pool) = llama_megabatch_verify_quant(
                            packed, k_pool, v_pool, ks_pool, vs_pool,
                            slen - 1, x.reshape(Bn * R, cfg.hidden_size),
                            cos_q, sin_q,
                            cfg=cfg, capacity=C, rows=R, kv_mode=kv_mode,
                            interpret=interpret,
                        )
                        pools = (k_pool, v_pool, ks_pool, vs_pool)
                    else:
                        k_pool, v_pool = pools
                        greedy, k_pool, v_pool = llama_megabatch_verify(
                            packed, k_pool, v_pool, slen - 1,
                            x.reshape(Bn * R, cfg.hidden_size), cos_q,
                            sin_q,
                            cfg=cfg, capacity=C, rows=R,
                            interpret=interpret,
                        )
                        pools = (k_pool, v_pool)
                elif kv_mode:
                    wte, wpe = params["wte"], params["wpe"]
                    x = (wte[vin] + wpe[pos]).astype(wte.dtype)
                    k_pool, v_pool, ks_pool, vs_pool = pools
                    (greedy, k_pool, v_pool, ks_pool,
                     vs_pool) = gpt2_megabatch_verify_quant(
                        packed, k_pool, v_pool, ks_pool, vs_pool, slen - 1,
                        x.reshape(Bn * R, cfg.n_embd),
                        cfg=cfg, capacity=C, rows=R, kv_mode=kv_mode,
                        interpret=interpret,
                    )
                    pools = (k_pool, v_pool, ks_pool, vs_pool)
                else:
                    wte, wpe = params["wte"], params["wpe"]
                    x = (wte[vin] + wpe[pos]).astype(wte.dtype)
                    k_pool, v_pool = pools
                    greedy, k_pool, v_pool = gpt2_megabatch_verify(
                        packed, k_pool, v_pool, slen - 1,
                        x.reshape(Bn * R, cfg.n_embd),
                        cfg=cfg, capacity=C, rows=R, interpret=interpret,
                    )  # greedy: [B, R]
                    pools = (k_pool, v_pool)
                greedy = jnp.clip(greedy, 0, model.vocab_size - 1)
                agree = props == greedy
                n_acc = jnp.argmin(
                    jnp.concatenate(
                        [agree, jnp.zeros((Bn, 1), bool)], axis=1
                    ).astype(jnp.int32),
                    axis=1,
                ).astype(jnp.int32)  # [B] first mismatch (== R if none)
                ar = jnp.arange(R + 1, dtype=jnp.int32)[None]
                prop_pad = jnp.concatenate(
                    [props, jnp.zeros((Bn, 1), jnp.int32)], axis=1
                )
                greedy_pad = jnp.concatenate([greedy, greedy[:, -1:]],
                                             axis=1)
                emitted = jnp.where(
                    ar < n_acc[:, None], prop_pad,
                    jnp.where(ar == n_acc[:, None], greedy_pad, 0),
                )  # [B, R+1]
                n_new = jnp.where(n_acc == R, R, n_acc + 1)
                n_new = jnp.where(active, n_new, 0)
                seq = jax.vmap(
                    lambda s, e, L: jax.lax.dynamic_update_slice(s, e, (L,))
                )(seq, emitted[:, :R], slen)
                # rollback = length update; the clamp keeps the verify RMW
                # window in-pane (slen <= C-8 makes gbase <= C-16; zombie
                # past the clamp, as the plain path's C-1 cursor clamp)
                slen = jnp.minimum(slen + n_new, C - 8)
                return (pools, seq, slen), (emitted[:, :R], n_new)

            (pools, seq, slen), (em, nn) = jax.lax.scan(
                round_, (pools, seq, slen), None, length=n_rounds
            )
            return pools, seq, slen, em, nn

        return jax.jit(chunk, donate_argnums=(2,))

    # ------------------------------------------------------------------
    def _match_prefix(self, ids):
        """Longest registered grain-aligned prefix of ids that leaves at
        least one suffix token. Returns (P, key) or (0, None)."""
        g = self.prefix_grain
        for k in range((len(ids) - 1) // g, 0, -1):
            key = tuple(ids[: k * g])
            if key in self._prefix_reg:
                self._prefix_reg.move_to_end(key)  # LRU touch
                return k * g, key
        return 0, None

    def _register_prefix(self, slot, ids) -> None:
        """Cache the slot's grain-aligned prompt-prefix pane slices."""
        g = self.prefix_grain
        P = ((len(ids) - 1) // g) * g
        if P < g:
            return
        key = tuple(ids[:P])
        if key in self._prefix_reg:
            return
        entry = {
            "k": self.k_pool[:, slot, :P],
            "v": self.v_pool[:, slot, :P],
        }
        if self.kv_mode:
            entry["ks"] = self.ks_pool[:, slot, :P]
            entry["vs"] = self.vs_pool[:, slot, :P]
        self._prefix_reg[key] = entry
        while len(self._prefix_reg) > self.prefix_cache_max:
            self._prefix_reg.popitem(last=False)

    def _admit(self, queue: List[Request]) -> int:
        """Prefill a wave of queued requests into free slots."""
        C = self.pool_cfg.capacity
        # spec mode needs room for a 16-row verify RMW window at the cursor
        margin = 16 if self.spec else 8
        free = [s for s in range(self.pool_cfg.n_slots) if not self.active[s]]
        wave = []
        while queue and free:
            req = queue[0]
            ids = req.prompt_ids[: self.pool_cfg.prompt_bucket]
            if len(ids) >= C - (margin - 8):  # cannot fit prompt + 1 token
                ids = ids[: C - margin]
            wave.append((free.pop(0), queue.pop(0), ids))
        if not wave:
            return 0
        if self.enable_prefix_cache:
            groups: Dict = {}
            for slot, req, ids in wave:
                P, pkey = self._match_prefix(ids)
                # capture the registry ENTRY now: an earlier group's
                # registrations in this same admission may LRU-evict the
                # key before this group dispatches
                entry = self._prefix_reg[pkey] if pkey is not None else None
                groups.setdefault((P, pkey), (entry, []))[1].append(
                    (slot, req, ids)
                )
            n = 0
            for (P, pkey), (entry, members) in groups.items():
                n += self._dispatch_group(members, P, entry)
            return n
        return self._dispatch_group(wave, 0, None)

    def _dispatch_group(self, wave, P: int, entry) -> int:
        """Prefill one admission group (shared prefix length P) in one
        dispatch; P == 0 is the plain full-prompt path."""
        C = self.pool_cfg.capacity
        margin = 16 if self.spec else 8
        if P > 0:
            return self._dispatch_suffix_group(wave, P, entry)
        Tmax = max(len(ids) for _, _, ids in wave)
        Tpad = min(bucket_for(Tmax), self.pool_cfg.prompt_bucket)
        Tpad = min(Tpad, C - margin)
        W = next(w for w in _WAVE_BUCKETS if w >= len(wave))
        key = (W, Tpad)
        if key not in self._prefills:
            self._prefills[key] = self._make_wave_prefill(W, Tpad)
        buf = np.zeros((W, Tpad), np.int32)
        lens = np.zeros((W,), np.int32)
        slots = np.zeros((W,), np.int32)
        for w in range(W):
            slot, req, ids = wave[min(w, len(wave) - 1)]  # pad = repeat last
            ids = ids[:Tpad]
            buf[w, : len(ids)] = ids
            lens[w] = len(ids)
            slots[w] = slot
        if self.spec:
            # fully device-side admission: prompt + prefill token land in
            # seq_dev; NO blocking fetch here (the first burst fetch books
            # tok0 for `pending` slots)
            args = (
                self.params, jnp.asarray(buf), jnp.asarray(lens),
                jnp.asarray(slots), self.k_pool, self.v_pool,
            )
            if self.kv_mode:
                (self.k_pool, self.v_pool, self.ks_pool, self.vs_pool,
                 self.seq_dev, self.slen_dev) = self._prefills[key](
                    *args, self.ks_pool, self.vs_pool,
                    self.seq_dev, self.slen_dev,
                )
            else:
                (self.k_pool, self.v_pool, self.seq_dev,
                 self.slen_dev) = self._prefills[key](
                    *args, None, None, self.seq_dev, self.slen_dev,
                )
            for slot, req, ids in wave:
                ids = ids[:Tpad]
                self.slot_req[slot] = req
                self.active[slot] = True
                self.pending[slot] = True
                self.plen[slot] = len(ids)
                self.lengths[slot] = len(ids)
                self.slen[slot] = len(ids) + 1
                if self.enable_prefix_cache:
                    self._register_prefix(slot, ids)
            return len(wave)
        if self.kv_mode:
            (self.k_pool, self.v_pool, self.ks_pool, self.vs_pool,
             tok0) = self._prefills[key](
                self.params, jnp.asarray(buf), jnp.asarray(lens),
                jnp.asarray(slots), self.k_pool, self.v_pool,
                self.ks_pool, self.vs_pool,
            )
        else:
            self.k_pool, self.v_pool, tok0 = self._prefills[key](
                self.params, jnp.asarray(buf), jnp.asarray(lens),
                jnp.asarray(slots), self.k_pool, self.v_pool,
            )
        tok0 = np.asarray(jax.device_get(tok0))
        for w, (slot, req, ids) in enumerate(wave):
            ids = ids[:Tpad]
            self.slot_req[slot] = req
            self.active[slot] = True
            self.lengths[slot] = len(ids)
            self.last_token[slot] = int(tok0[w])
            req.out_ids.append(int(tok0[w]))
            if self.enable_prefix_cache:
                self._register_prefix(slot, ids)
            if len(req.out_ids) >= req.max_new_tokens or (
                self.eos_id is not None and req.out_ids[-1] == self.eos_id
            ):  # satisfied by the prefill token alone
                req.done = True
                self.active[slot] = False
                self.slot_req[slot] = None
                self.lengths[slot] = 0
        return len(wave)

    def _harvest(self, toks_all: np.ndarray) -> None:
        """Book a fetched [chunk, B] token block; retire finished slots."""
        n_steps = toks_all.shape[0]
        for slot in range(self.pool_cfg.n_slots):
            req = self.slot_req[slot]
            if req is None or not self.active[slot]:
                continue
            for i in range(n_steps):
                if len(req.out_ids) >= req.max_new_tokens:
                    break
                if (self.eos_id is not None and req.out_ids
                        and req.out_ids[-1] == self.eos_id):
                    break
                # last_token is NOT updated here: the device carry already
                # holds the next feed token for continuing slots
                req.out_ids.append(int(toks_all[i, slot]))
            hit_eos = (
                self.eos_id is not None
                and req.out_ids
                and req.out_ids[-1] == self.eos_id
            )
            if hit_eos or len(req.out_ids) >= req.max_new_tokens:
                req.done = True
                self.active[slot] = False
                self.slot_req[slot] = None
                self.lengths[slot] = 0
                self.last_token[slot] = 0

    def _harvest_spec(self, em: np.ndarray, nn: np.ndarray):
        """Book a fetched spec block (em [rounds, B, R], nn [rounds, B]).

        Returns (rounds_used, tokens_booked) summed over slots — the live
        acceptance sample that drives burst scheduling (zombie rounds
        after a slot met its budget are excluded, so the estimate is the
        true emitted-tokens-per-round of productive rounds)."""
        n_rounds = em.shape[0]
        rounds_used = 0
        tokens_booked = 0
        for slot in range(self.pool_cfg.n_slots):
            req = self.slot_req[slot]
            if req is None or not self.active[slot]:
                continue
            for i in range(n_rounds):
                if len(req.out_ids) >= req.max_new_tokens:
                    break
                if (self.eos_id is not None and req.out_ids
                        and req.out_ids[-1] == self.eos_id):
                    break
                rounds_used += 1
                take = int(nn[i, slot])
                for j in range(take):
                    if len(req.out_ids) >= req.max_new_tokens:
                        break
                    if (self.eos_id is not None and req.out_ids
                            and req.out_ids[-1] == self.eos_id):
                        break
                    req.out_ids.append(int(em[i, slot, j]))
                    tokens_booked += 1
            hit_eos = (
                self.eos_id is not None
                and req.out_ids
                and req.out_ids[-1] == self.eos_id
            )
            if hit_eos or len(req.out_ids) >= req.max_new_tokens:
                req.done = True
                self.active[slot] = False
                self.slot_req[slot] = None
                self.lengths[slot] = 0
                self.slen[slot] = 1
                self.last_token[slot] = 0
        return rounds_used, tokens_booked

    def _ladder_next(self, R_cur: int) -> int:
        """Adaptive verify-width policy from the live acceptance EMA.

        Widen when the current width saturates (acceptance near R_cur
        caps the observable signal, so climbing needs no separate probe
        burst); shrink toward the near-parity R=2 floor on non-echoing
        streams, where wide rounds pay spec_k wasted verify rows each
        (measured -19% at acc~1.2, R=8 on the Llama-1B random protocol —
        docs/BENCHMARKS.md "Llama-family spec serving")."""
        if self._acc_est >= 0.75 * R_cur and R_cur < self.spec_k:
            return min(R_cur * 2, self.spec_k)
        if self._acc_est < 1.3 and R_cur > 2:
            return max(2, R_cur // 2)
        return R_cur

    # every chunk advances each slot >= chunk rounds >= chunk tokens, but
    # actual progress (1..spec_k tok/round) is only known at the fetch:
    # cap spec bursts so zombie rounds and admission delay stay bounded.
    # chunk length trades zombie overshoot (scheduling granularity is one
    # chunk; a round can emit up to spec_k tokens) against per-dispatch
    # relay cost + fetches: measured on protocol 2, 8-round chunks spent
    # the whole kernel-time win on extra dispatches/fetches
    _SPEC_BURST_CAP = 8
    _SPEC_CHUNK = 16

    def _run_spec(
        self, requests: List[Request], progress: Optional[Callable]
    ) -> List[Request]:
        """Speculative serve loop: chunks count verify ROUNDS; bursts are
        sized from a live acceptance estimate (EMA of booked tokens per
        productive round) — worst-case 1-token/round scheduling dispatched
        up to spec_k x the needed rounds as zombie work. Over-estimating
        just ends a burst early (another burst follows); overshoot is
        discarded at harvest, so per-request outputs match the plain
        server exactly either way."""
        queue = list(requests)
        chunk = min(self.pool_cfg.max_chunk, self._SPEC_CHUNK)
        total_steps = 0
        self.spec_stats = {"rounds": 0, "tokens": 0}
        while queue or self.active.any():
            self._admit(queue)
            if not self.active.any():
                continue
            R_cur = max(2, min(self._spec_R, self.spec_k))
            key = ("spec", chunk, R_cur)
            if key not in self._chunks:
                self._chunks[key] = self._make_spec_chunk(chunk, R_cur)
            step_fn = self._chunks[key]
            rem = {
                s: self.slot_req[s].max_new_tokens
                - len(self.slot_req[s].out_ids)
                for s in range(self.pool_cfg.n_slots) if self.active[s]
            }
            est = min(max(self._acc_est, 1.0), float(R_cur))
            rounds_needed = [-(-r // est) for r in rem.values()]
            need = min(rounds_needed) if queue else max(rounds_needed)
            n_burst = -(-int(need) // chunk)
            n_burst = max(1, min(n_burst, self._SPEC_BURST_CAP))
            active_c = jnp.asarray(self.active.copy())
            pools = (self.k_pool, self.v_pool)
            if self.kv_mode:
                pools += (self.ks_pool, self.vs_pool)
            seq_c, slen_c = self.seq_dev, self.slen_dev
            blocks = []
            for _ in range(n_burst):
                pools, seq_c, slen_c, em, nn = step_fn(
                    self.params, self.packed, pools, seq_c, slen_c, active_c
                )
                blocks.append((em, nn))
            if self.kv_mode:
                (self.k_pool, self.v_pool,
                 self.ks_pool, self.vs_pool) = pools
            else:
                self.k_pool, self.v_pool = pools
            self.seq_dev, self.slen_dev = seq_c, slen_c
            fetched, seq_np, slen_np = jax.device_get(
                (blocks, seq_c, slen_c)
            )
            was_active = self.active.copy()
            # book the prefill token of freshly admitted slots first (it
            # lives at seq[plen] — admission never fetched it)
            for s in range(self.pool_cfg.n_slots):
                if self.pending[s] and self.active[s]:
                    req = self.slot_req[s]
                    req.out_ids.append(int(seq_np[s, self.plen[s]]))
                    self.pending[s] = False
                    if len(req.out_ids) >= req.max_new_tokens or (
                        self.eos_id is not None
                        and req.out_ids[-1] == self.eos_id
                    ):  # satisfied by the prefill token alone
                        req.done = True
                        self.active[s] = False
                        self.slot_req[s] = None
                        self.lengths[s] = 0
                        self.slen[s] = 1
            b_rounds = b_tokens = 0
            for em, nn in fetched:
                r_used, t_booked = self._harvest_spec(
                    np.asarray(em), np.asarray(nn)
                )
                b_rounds += r_used
                b_tokens += t_booked
            if b_rounds:
                obs = b_tokens / b_rounds
                self._acc_est = 0.5 * self._acc_est + 0.5 * obs
                self.spec_stats["rounds"] += b_rounds
                self.spec_stats["tokens"] += b_tokens
                self._spec_R = self._ladder_next(R_cur)
            # mirror device state for slots still running
            for s in range(self.pool_cfg.n_slots):
                if was_active[s] and self.active[s]:
                    self.slen[s] = int(slen_np[s])
                    self.lengths[s] = int(slen_np[s]) - 1
                    self.last_token[s] = int(seq_np[s][slen_np[s] - 1])
            total_steps += chunk * n_burst
            if progress:
                progress(total_steps, self)
        return requests

    def run(
        self, requests: List[Request], progress: Optional[Callable] = None
    ) -> List[Request]:
        """Serve all requests to completion; returns them (with out_ids).

        Burst scheduling: the budget-based retirement schedule is known
        host-side, so every chunk up to the next (budget) slot retirement
        is dispatched back-to-back — device arrays thread from chunk to
        chunk and ONE device_get fetches the whole burst (each fetch
        through the remote relay costs ~26 ms). With an eos_id the burst
        is SPECULATIVE: it assumes no early EOS; a slot that does hit EOS
        mid-burst keeps decoding as a zombie into its own pane (clamped at
        the pane end, discarded at harvest, overwritten by the next
        admission), so per-request outputs are token-identical to the
        per-chunk schedule. The burst length is additionally capped at
        _EOS_BURST_CAP chunks so a fetch confirms EOS retirements every
        few chunks (bounds zombie work and admission delay).
        """
        if self.spec is not None:
            return self._run_spec(requests, progress)
        queue = list(requests)
        chunk = self.pool_cfg.max_chunk
        if chunk not in self._chunks:
            self._chunks[chunk] = self._make_chunk(chunk)
        step_fn = self._chunks[chunk]
        total_steps = 0
        while queue or self.active.any():
            self._admit(queue)
            if not self.active.any():
                continue
            rem = {
                s: self.slot_req[s].max_new_tokens
                - len(self.slot_req[s].out_ids)
                for s in range(self.pool_cfg.n_slots) if self.active[s]
            }
            per_slot = [-(-r // chunk) for r in rem.values()]
            # drain until a slot frees by budget (admit sooner) or, with
            # nothing queued, until every active slot's budget expires
            n_burst = min(per_slot) if queue else max(per_slot)
            if self.eos_id is not None:
                n_burst = min(n_burst, self._EOS_BURST_CAP)
            active_mask = self.active.copy()
            lengths_c = jnp.asarray(self.lengths.copy())
            toks_c = jnp.asarray(self.last_token.copy())
            blocks = []
            for _ in range(n_burst):
                pools = (
                    (self.k_pool, self.v_pool, self.ks_pool, self.vs_pool)
                    if self.kv_mode else (self.k_pool, self.v_pool)
                )
                pools, lengths_c, toks_c, toks_all = step_fn(
                    self.params, self.packed, pools,
                    lengths_c, toks_c, jnp.asarray(active_mask.copy()),
                )
                if self.kv_mode:
                    (self.k_pool, self.v_pool, self.ks_pool,
                     self.vs_pool) = pools
                else:
                    self.k_pool, self.v_pool = pools
                blocks.append(toks_all)
                for s in list(rem):  # evolve the mask as budgets expire
                    rem[s] -= chunk
                    if rem[s] <= 0:
                        del rem[s]
                        active_mask[s] = False
            fetched, lengths_np, last_np = jax.device_get(
                (blocks, lengths_c, toks_c)
            )
            for block in fetched:
                self._harvest(np.asarray(block))
            # mirror device bookkeeping for slots still running
            for s in range(self.pool_cfg.n_slots):
                if self.active[s]:
                    self.lengths[s] = int(lengths_np[s])
                    self.last_token[s] = int(last_np[s])
            total_steps += chunk * n_burst
            if progress:
                progress(total_steps, self)
        return requests
